"""`python -m jegal_tpu.cli` == the `jegal-tpu` console script."""
from jegal_tpu.cli import main

if __name__ == "__main__":
    main()
