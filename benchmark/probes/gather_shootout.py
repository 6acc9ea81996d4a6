#!/usr/bin/env python3
"""Shoot-out of occ-gather formulations on the real chip.

The stage-A scan is bound by: gather [ncols=17, Q] from planeT [17, nblocks]
with random block indices, ~104 sequential steps.  Measure candidates:
  A  take_along_axis on transposed plane (current production form)
  B  row gather plane[idx] of [nblocks, 17]
  C  17 separate 1-D takes
  D  flat 1-D take of [17*nblocks] with computed flat indices
  E  one fused scan step (occ + update) as used in production
  F  full 104-step scan (what production runs per chunk)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

Q = 65536
NBLOCKS = 15782
NCOLS = 17
STEPS = 104


def timeit(fn, *args, rep=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(rep):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / rep


def main():
    rng = np.random.default_rng(0)
    planeT = jnp.asarray(rng.integers(0, 2**31, (NCOLS, NBLOCKS), dtype=np.int64).astype(np.int32))
    plane = jnp.asarray(np.ascontiguousarray(np.asarray(planeT).T))
    flat = planeT.reshape(-1)
    idx = jnp.asarray(rng.integers(0, NBLOCKS, Q).astype(np.int32))

    @jax.jit
    def variant_a(planeT, idx):
        ii = jnp.broadcast_to(idx[None, :], (NCOLS, Q))
        return jnp.take_along_axis(planeT, ii, axis=1)

    @jax.jit
    def variant_b(plane, idx):
        return plane[idx]

    @jax.jit
    def variant_c(planeT, idx):
        return jnp.stack([jnp.take(planeT[c], idx) for c in range(NCOLS)])

    @jax.jit
    def variant_d(flat, idx):
        ii = idx[None, :] + (jnp.arange(NCOLS, dtype=jnp.int32) * NBLOCKS)[:, None]
        return jnp.take(flat, ii.reshape(-1)).reshape(NCOLS, Q)

    out_bytes = NCOLS * Q * 4
    for name, fn, args in [
        ("A take_along_T", variant_a, (planeT, idx)),
        ("B row-gather  ", variant_b, (plane, idx)),
        ("C 17x 1-D take", variant_c, (planeT, idx)),
        ("D flat take   ", variant_d, (flat, idx)),
    ]:
        dt = timeit(fn, *args)
        print(f"{name}: {dt*1e3:8.3f} ms  {out_bytes/dt/1e9:7.2f} GB/s (output)")

    # E: one fused production-like step
    from siga_tpu.ops.fm_device import _occ_from_cols, _update_left_T

    pred = jnp.asarray(np.array([0, 100, 200, 300, 400], np.int32))

    @jax.jit
    def one_step(planeT, lo, hi, rlo, rhi, c):
        i = jnp.concatenate([lo - 1, hi])
        pos = i + 1
        block = pos // 128
        ii = jnp.broadcast_to(block[None, :], (NCOLS, 2 * (Q // 2)))
        rowsT = jnp.take_along_axis(planeT, ii, axis=1)
        counts = _occ_from_cols(rowsT, pos - block * 128, 128)
        l_counts = counts[:, : Q // 2]
        u_counts = counts[:, Q // 2 :]
        return _update_left_T(lo, hi, rlo, rhi, c, l_counts, u_counts, pred)

    lo = jnp.asarray(rng.integers(1, NBLOCKS * 128 - 1, Q // 2).astype(np.int32))
    hi = lo + 50
    c = jnp.asarray(rng.integers(0, 5, Q // 2).astype(np.int32))
    dt = timeit(one_step, planeT, lo, hi, lo, hi, c)
    print(f"E fused step  : {dt*1e3:8.3f} ms  ({STEPS} steps -> {dt*STEPS*1e3:.0f} ms/chunk)")

    # F: the scan as production compiles it
    @jax.jit
    def full_scan(planeT, lo, hi, c):
        def step(state, t):
            lo, hi, rlo, rhi = state
            return one_step.__wrapped__(planeT, lo, hi, rlo, rhi, c), ()

        state, _ = jax.lax.scan(step, (lo, hi, lo, hi), jnp.arange(STEPS))
        return state

    dt = timeit(full_scan, planeT, lo, hi, c, rep=3)
    print(f"F full scan   : {dt*1e3:8.3f} ms/chunk")


if __name__ == "__main__":
    main()
