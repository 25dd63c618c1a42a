# Dev targets (reference analog: Makefile.dev + .travis.yml/appveyor.yml)
PY ?= python

.PHONY: test lint verify bench matrix dryrun all

test:
	$(PY) -m pytest tests/ -q

lint:
	$(PY) tools/lint.py

verify:            ## packet-kernel parity on real TPU
	$(PY) tools/verify_pallas.py

bench:             ## headline benchmark (real TPU)
	$(PY) bench.py

matrix:            ## full tracked benchmark matrix (real TPU, slow)
	$(PY) bench_matrix.py

dryrun:            ## driver hooks: entry compile + multichip dryrun
	$(PY) __graft_entry__.py

all: lint test
