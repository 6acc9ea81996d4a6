"""Isolate lax.scan per-iteration overhead on this backend.

Times: (a) trivial scan (vector add, no gather), (b) gather scan, (c) gather
scan with K steps unrolled per lax.scan iteration.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp


def bench(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(5):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.time() - t0) / 5


def main():
    R, C = 15782, 16
    plane = jnp.asarray(np.random.randint(0, 1000, (R, C), dtype=np.int32))
    steps = 104

    @jax.jit
    def trivial(q0):
        def step(q, _):
            return (q * 3 + 1) % R, ()

        qf, _ = jax.lax.scan(step, q0, None, length=steps)
        return qf

    @jax.jit
    def gather1(q0):
        def step(q, _):
            rows = plane[q]
            return (q + rows[:, 0] + 1) % R, ()

        qf, _ = jax.lax.scan(step, q0, None, length=steps)
        return qf

    def gatherk(k):
        @jax.jit
        def f(q0):
            def step(q, _):
                for _ in range(k):
                    rows = plane[q]
                    q = (q + rows[:, 0] + 1) % R
                return q, ()

            qf, _ = jax.lax.scan(step, q0, None, length=steps // k)
            return qf

        return f

    for Q in (32768, 131072):
        q0 = jnp.asarray(np.random.randint(0, R, Q, dtype=np.int32))
        t = bench(trivial, q0)
        print(f"Q={Q:6d} trivial scan   : {t*1e3:8.2f} ms ({t/steps*1e6:6.1f} us/step)")
        t = bench(gather1, q0)
        print(f"Q={Q:6d} gather scan    : {t*1e3:8.2f} ms ({t/steps*1e6:6.1f} us/step)")
        for k in (4, 8, 13):
            t = bench(gatherk(k), q0)
            print(
                f"Q={Q:6d} gather unroll{k:2d}: {t*1e3:8.2f} ms "
                f"({t/steps*1e6:6.1f} us/step-equivalent)"
            )


if __name__ == "__main__":
    main()
