"""Isolate the per-scan-step fixed cost seen in pair_parts.py.

Variants (50-step lax.scan, 18MB 57-col table unless noted):
  novpu-nogather : state-only arithmetic step (loop overhead alone)
  gather QN      : one gather of N rows per step
  2xgather Q/2   : two gathers of N/2 rows per step (fixed cost per gather?)
  unrolled       : 50 steps unrolled without lax.scan (loop vs op cost)
"""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 50


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(np.asarray(jax.tree.leaves(out)[0]))
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        best = min(best, time.time() - t0)
    return best


@partial(jax.jit, static_argnums=(0,))
def no_gather(q, idx0):
    def step(idx, _):
        return (idx * 1103515245 + 12345) % 999983, ()

    out, _ = jax.lax.scan(step, idx0, None, length=STEPS)
    return out


@partial(jax.jit, static_argnums=(0, 1))
def gather_scan(nrows, ng, table, idx0):
    Q = idx0.shape[0]

    def step(idx, _):
        s = jnp.zeros((), jnp.int32)
        per = Q // ng
        for gthr in range(ng):
            rows = table[idx[gthr * per : (gthr + 1) * per]]
            s = s + rows[:, :4].sum()
        return (idx + s) % nrows, ()

    out, _ = jax.lax.scan(step, idx0, None, length=STEPS)
    return out


@partial(jax.jit, static_argnums=(0,))
def gather_unrolled(nrows, table, idx0):
    idx = idx0
    for _ in range(STEPS):
        rows = table[idx]
        idx = (idx + rows[:, :4].sum()) % nrows
    return idx


def main():
    rng = np.random.default_rng(0)
    print(f"platform: {jax.devices()[0].platform}", flush=True)
    nrows = 18 * 1024 * 1024 // 228
    table = jnp.asarray(rng.integers(0, 1000, (nrows, 57), dtype=np.int32))

    idx0 = jnp.asarray(rng.integers(0, nrows, 100_000, dtype=np.int32))
    dt = timeit(no_gather, 100_000, idx0)
    print(f"[no-gather 100k state]    {dt*1e3:7.1f}ms ({dt/STEPS*1e3:.3f}ms/step)",
          flush=True)

    for Q in (25_000, 100_000, 400_000, 1_600_000):
        idx0 = jnp.asarray(rng.integers(0, nrows, Q, dtype=np.int32))
        dt = timeit(gather_scan, nrows, 1, table, idx0)
        print(f"[gather Q={Q:7d}]        {dt*1e3:7.1f}ms ({dt/STEPS*1e3:.3f}ms/step"
              f" {STEPS*Q/dt/1e9:.3f} Grows/s)", flush=True)

    idx0 = jnp.asarray(rng.integers(0, nrows, 100_000, dtype=np.int32))
    dt = timeit(gather_scan, nrows, 2, table, idx0)
    print(f"[2 gathers of 50k]        {dt*1e3:7.1f}ms ({dt/STEPS*1e3:.3f}ms/step)",
          flush=True)
    dt = timeit(gather_scan, nrows, 4, table, idx0)
    print(f"[4 gathers of 25k]        {dt*1e3:7.1f}ms ({dt/STEPS*1e3:.3f}ms/step)",
          flush=True)
    dt = timeit(gather_unrolled, nrows, table, idx0)
    print(f"[unrolled 100k]           {dt*1e3:7.1f}ms ({dt/STEPS*1e3:.3f}ms/step)",
          flush=True)


if __name__ == "__main__":
    main()
