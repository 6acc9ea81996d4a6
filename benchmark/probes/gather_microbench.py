#!/usr/bin/env python3
"""Microbenchmark of XLA TPU gather shapes for the FM occ inner loop.

Models one stage-A scan: a lax.scan of STEPS iterations; each step gathers
rows for Q queries from a [N, W] table with a data dependency between steps
(like backward search).  Varies row width W, table split, dtype packing, and
axis orientation to find the cheapest layout per occ query.
"""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 100
Q = 65536
N = 16384


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    return best


@partial(jax.jit, static_argnums=())
def scan_gather_rows(table, idx0):
    def step(idx, _):
        rows = table[idx]  # [Q, W]
        s = rows.sum(axis=-1)
        nidx = (idx * 1103515245 + s) % N
        return nidx, ()

    final, _ = jax.lax.scan(step, idx0, None, length=STEPS)
    return final


@partial(jax.jit, static_argnums=())
def scan_gather_3tables(t1, t2, t3, idx0):
    def step(idx, _):
        s = t1[idx].sum(axis=-1) + t2[idx].sum(axis=-1) + t3[idx].sum(axis=-1)
        nidx = (idx * 1103515245 + s) % N
        return nidx, ()

    final, _ = jax.lax.scan(step, idx0, None, length=STEPS)
    return final


@partial(jax.jit, static_argnums=())
def scan_gather_transposed(tableT, idx0):
    def step(idx, _):
        rows = jnp.take(tableT, idx, axis=1)  # [W, Q]
        s = rows.sum(axis=0)
        nidx = (idx * 1103515245 + s) % N
        return nidx, ()

    final, _ = jax.lax.scan(step, idx0, None, length=STEPS)
    return final


@partial(jax.jit, static_argnums=())
def scan_no_gather(table, idx0):
    w = table.shape[1]
    def step(idx, _):
        rows = jnp.broadcast_to(table[0], (idx.shape[0], w))
        s = rows.sum(axis=-1) + idx
        nidx = (idx * 1103515245 + s) % N
        return nidx, ()

    final, _ = jax.lax.scan(step, idx0, None, length=STEPS)
    return final


def main():
    rng = np.random.default_rng(0)
    idx0 = jnp.asarray(rng.integers(0, N, Q, dtype=np.int32))

    print(f"Q={Q} queries, N={N} rows, {STEPS} dependent steps", flush=True)
    for W in (4, 8, 16, 32):
        table = jnp.asarray(rng.integers(0, 100, (N, W), dtype=np.int32))
        dt = timeit(scan_gather_rows, table, idx0)
        per = dt / STEPS / Q * 1e9
        print(f"single table W={W:3d} int32: {dt*1e3:7.1f}ms  {per:6.2f} ns/query", flush=True)

    # three separate tables totalling 17 elements (current layout)
    t1 = jnp.asarray(rng.integers(0, 100, (N, 8), dtype=np.int32))
    t2 = jnp.asarray(rng.integers(0, 100, (N, 4), dtype=np.int32))
    t3 = jnp.asarray(rng.integers(0, 100, (N, 5), dtype=np.int32))
    dt = timeit(scan_gather_3tables, t1, t2, t3, idx0)
    print(f"3 tables 8+4+5 int32:  {dt*1e3:7.1f}ms  {dt/STEPS/Q*1e9:6.2f} ns/query", flush=True)

    # transposed (minor-dim gather)
    for W in (8,):
        tableT = jnp.asarray(rng.integers(0, 100, (W, N), dtype=np.int32))
        try:
            dt = timeit(scan_gather_transposed, tableT, idx0)
            print(f"transposed W={W} take(axis=1): {dt*1e3:7.1f}ms  {dt/STEPS/Q*1e9:6.2f} ns/query", flush=True)
        except Exception as e:
            print(f"transposed failed: {type(e).__name__}", flush=True)

    # no-gather floor
    table = jnp.asarray(rng.integers(0, 100, (N, 8), dtype=np.int32))
    dt = timeit(scan_no_gather, table, idx0)
    print(f"no-gather floor:       {dt*1e3:7.1f}ms  {dt/STEPS/Q*1e9:6.2f} ns/query", flush=True)

    # smaller Q to see fixed overhead per step
    idx_small = idx0[:8192]
    table = jnp.asarray(rng.integers(0, 100, (N, 8), dtype=np.int32))
    dt = timeit(scan_gather_rows, table, idx_small)
    print(f"W=8 Q=8192:            {dt*1e3:7.1f}ms  {dt/STEPS/8192*1e9:6.2f} ns/query", flush=True)


if __name__ == "__main__":
    main()
