from jegal_tpu.cli.main import main
