# Development targets (the reference ships a Makefile for deps/test/models)

PYTHON ?= python

help:
	@echo "targets: test, bench, native, entry, clean"

test:
	$(PYTHON) -m pytest tests/ -q

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
