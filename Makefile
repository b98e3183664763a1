# Developer ergonomics (the CI contract is: pytest green, bench prints JSON)
.PHONY: test slow bench dryrun lint

test:
	python -m pytest tests/ -q

slow:
	python -m pytest tests/ -m slow -q

bench:
	python bench.py

dryrun:
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
