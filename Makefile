# Dev loop helpers. The axon TPU plugin registration costs ~2min per interpreter;
# the PALLAS_AXON_POOL_IPS= prefix skips it for CPU runs.
CPU_ENV := PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu

test:            # fast dev loop (~3 min): host-side + small-jit tests
	$(CPU_ENV) python -m pytest tests/ -x -q -m "not slow"

test-slow:       # the compile-heavy e2e/parity tier
	$(CPU_ENV) python -m pytest tests/ -q -m slow

test-all:        # everything (~45 min serial)
	$(CPU_ENV) python -m pytest tests/ -q

native:
	python csrc/build.py

bench:
	python bench.py
.PHONY: test test-slow test-all native bench
