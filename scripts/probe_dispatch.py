"""Measure axon-relay primitives: dispatch RTT, host->device transfer RTT,
readback RTT, and a jitted-call overhead with N host args.

Hypothesis (r4 wave 5): each batch-2 prefill call costs ~0.43 s of fixed
overhead on top of its FLOPs because ~9 small host arrays are uploaded per
call, each transfer a serialized relay round trip; steady decode chunks
(all-device-resident args) show only ~0.15 s fixed.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(label, f, n=10):
    f()                                     # warm
    t0 = time.perf_counter()
    for _ in range(n):
        f()
    dt = (time.perf_counter() - t0) / n
    print(f"[probe] {label}: {dt * 1e3:.1f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"[probe] device {dev}", flush=True)

    one = jnp.ones((8, 128), jnp.float32)
    one.block_until_ready()

    # 1. trivial dispatch (device-resident arg, tiny compute)
    f_add = jax.jit(lambda x: x + 1)
    f_add(one).block_until_ready()
    timeit("jit dispatch (device arg) + block", lambda: f_add(one).block_until_ready())

    # 2. small host->device transfer
    host_small = np.ones((8, 128), np.float32)
    timeit("device_put 4KB + block",
           lambda: jax.device_put(host_small, dev).block_until_ready())
    host_1m = np.ones((512, 512), np.float32)
    timeit("device_put 1MB + block",
           lambda: jax.device_put(host_1m, dev).block_until_ready())

    # 3. readback
    timeit("readback 4KB", lambda: np.asarray(f_add(one)))

    # 4. jitted call with K separate HOST args (the prefill shape) vs 1
    for k in (1, 4, 9):
        args = [np.full((64, 64), i, np.float32) for i in range(k)]

        def f(*xs):
            s = xs[0]
            for x in xs[1:]:
                s = s + x
            return s.sum()

        fk = jax.jit(f)
        fk(*args).block_until_ready()
        timeit(f"jit call with {k} host args + block",
               lambda: fk(*args).block_until_ready())

    # 5. same with device-resident args
    dargs = [jax.device_put(np.full((64, 64), i, np.float32), dev)
             for i in range(9)]
    for a in dargs:
        a.block_until_ready()

    def f9(*xs):
        s = xs[0]
        for x in xs[1:]:
            s = s + x
        return s.sum()

    f9j = jax.jit(f9)
    f9j(*dargs).block_until_ready()
    timeit("jit call with 9 DEVICE args + block",
           lambda: f9j(*dargs).block_until_ready())


if __name__ == "__main__":
    main()
