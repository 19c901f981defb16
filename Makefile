# Development targets (the reference ships a Makefile for deps/test/models)

PYTHON ?= python

help:
	@echo "targets: test, test-cpu, bench, native, entry, clean"

# worker-per-file distribution (pytest-xdist): bounds per-process XLA
# compile-cache accumulation (a single process segfaulted inside XLA CPU
# compilation at ~87% of the suite under accumulated load — same issue
# the reference solves with pytest-isolate) and parallelizes the run
XDIST ?= -n 4 --dist loadfile

test:
	$(PYTHON) -m pytest tests/ -q $(XDIST)

# force the real host-CPU backend (drops the axon TPU plugin injected
# via PYTHONPATH sitecustomize) — works even when the TPU tunnel is down
# and makes the 8-device virtual mesh in tests/conftest.py effective
test-cpu:
	env -u PYTHONPATH JAX_PLATFORMS=cpu $(PYTHON) -m pytest tests/ -q $(XDIST)

bench:
	$(PYTHON) bench.py

native:
	$(MAKE) -C cor_asv_ann_tpu/native

entry:
	$(PYTHON) __graft_entry__.py

clean:
	$(MAKE) -C cor_asv_ann_tpu/native clean
	find . -name __pycache__ -type d -exec rm -rf {} +

.PHONY: help test bench native entry clean
