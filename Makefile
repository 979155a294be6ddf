# Dev loop helpers. The axon TPU plugin registration costs ~2min per interpreter;
# the PALLAS_AXON_POOL_IPS= prefix skips it for CPU runs.
CPU_ENV := PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu

test:
	$(CPU_ENV) python -m pytest tests/ -x -q

test-all:
	$(CPU_ENV) python -m pytest tests/ -q

native:
	python csrc/build.py

bench:
	python bench.py
.PHONY: test test-all native bench
