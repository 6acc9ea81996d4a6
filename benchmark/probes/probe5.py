#!/usr/bin/env python3
"""Fifth probe: synthetic stage-A scan in the transposed (SoA) layout.

Hypothesis: the production scan's 0.4 ms/step comes from (a) minor-dim-17
row-gathers and [Q,17] elementwise math (13% lane utilization), and (b)
strided chars[:, t] column reads.  This probe runs a shape-faithful scan
with plane stored transposed [17, NB] (gather = take_along_axis along the
lane axis), state as [Q] vectors, chars consumed as scan xs rows.
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

Q = 32768          # lanes
NB = 16384         # stacked plane rows (fwd+rev, 1M chars @ SAMPLE=128)
W = 17             # 8 words + 4 dollar words + 5 checkpoints
T = 104            # scan depth
T2 = 60            # emitting steps


def make_step(planeT, pred):
    nwords, ndwords = 8, 4
    popcount = jax.lax.population_count
    lo_bits = jnp.uint32(0x55555555)

    def occ(i):  # i: [2Q] int32 -> [5, 2Q] counts
        pos = i + 1
        block = jnp.clip(pos // 128, 0, NB - 1)
        idx = jnp.broadcast_to(block[None, :], (W, i.shape[0]))
        rows = jnp.take_along_axis(planeT, idx, axis=1)  # [17, 2Q]
        tail = (pos - (pos // 128) * 128).astype(jnp.uint32)
        w = rows[:nwords].astype(jnp.uint32)
        d = rows[nwords:nwords + ndwords].astype(jnp.uint32)
        base = rows[nwords + ndwords:]
        widx = (jnp.arange(nwords, dtype=jnp.uint32) * 16)[:, None]
        valid = jnp.clip(
            tail[None, :].astype(jnp.int32) - widx.astype(jnp.int32), 0, 16
        ).astype(jnp.uint32)
        wmask = jnp.where(valid == 16, jnp.uint32(0xFFFFFFFF),
                          (jnp.uint32(1) << (2 * valid)) - 1)
        didx = (jnp.arange(ndwords, dtype=jnp.uint32) * 32)[:, None]
        dvalid = jnp.clip(
            tail[None, :].astype(jnp.int32) - didx.astype(jnp.int32), 0, 32
        ).astype(jnp.uint32)
        dmask = jnp.where(dvalid == 32, jnp.uint32(0xFFFFFFFF),
                          (jnp.uint32(1) << dvalid) - 1)
        n_dollar = popcount(d & dmask).sum(axis=0).astype(jnp.int32)

        def count2(pattern):
            x = w ^ pattern
            matched = ~(x | (x >> 1)) & lo_bits
            return popcount(matched & wmask).sum(axis=0).astype(jnp.int32)

        c_a = count2(jnp.uint32(0)) - n_dollar
        c_c = count2(lo_bits)
        c_g = count2(jnp.uint32(0xAAAAAAAA))
        c_t = count2(jnp.uint32(0xFFFFFFFF))
        return base + jnp.stack([n_dollar, c_a, c_c, c_g, c_t], axis=0)

    def step(state, xs):
        c, emit_t = xs  # c: [Q] chars; emit flag as traced scalar
        lo, hi, rlo, rhi = state
        both = occ(jnp.concatenate([lo - 1, hi]))  # [5, 2Q]
        l_counts = both[:, :Q]
        u_counts = both[:, Q:]
        diff = u_counts - l_counts
        # one-hot rank selects, unrolled over 5 (static python loop)
        below = jnp.zeros_like(lo)
        dc = jnp.zeros_like(lo)
        lc = jnp.zeros_like(lo)
        uc = jnp.zeros_like(lo)
        pb = jnp.zeros_like(lo)
        for r in range(5):
            sel = c == r
            lt = c > r
            below = below + jnp.where(lt, diff[r], 0)
            dc = jnp.where(sel, diff[r], dc)
            lc = jnp.where(sel, l_counts[r], lc)
            uc = jnp.where(sel, u_counts[r], uc)
            pb = jnp.where(sel, pred[r], pb)
        nrlo = rlo + below
        nrhi = nrlo + dc - 1
        nlo = pb + lc
        nhi = pb + uc - 1
        active = c > 0
        ns = (jnp.where(active, nlo, lo), jnp.where(active, nhi, hi),
              jnp.where(active, nrlo, rlo), jnp.where(active, nrhi, rhi))
        psize = u_counts[0] - l_counts[0]
        emit_valid = (psize > 0) & (rlo + psize - 1 >= 0) & active & (emit_t > 0)
        return ns, (jnp.stack([lo, rlo, hi - lo], 0), emit_valid)

    return step


@partial(jax.jit, static_argnums=())
def scan_v3(planeT, pred, charsT, emit_flags, state0):
    step = make_step(planeT, pred)
    final, (emitted, valid) = jax.lax.scan(step, state0, (charsT, emit_flags))
    # compaction: flat nonzero over [T, Q]
    vflat = valid.reshape(-1)
    count = vflat.sum(dtype=jnp.int32)
    (idx,) = jnp.nonzero(vflat, size=65536, fill_value=T * Q - 1)
    eflat = emitted.transpose(0, 2, 1).reshape(T * Q, 3)
    data = eflat[idx]
    return count, idx.astype(jnp.int32), data, final


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    planeT = jnp.asarray(rng.integers(0, 2**31 - 1, (W, NB), dtype=np.int32))
    pred = jnp.asarray(np.array([0, 2000, 250000, 500000, 750000], np.int32))
    charsT = jnp.asarray(rng.integers(0, 5, (T, Q), dtype=np.int32))
    emit_flags = jnp.asarray((np.arange(T) >= T - T2).astype(np.int32))
    lo0 = jnp.asarray(rng.integers(0, NB * 100, Q, dtype=np.int32))
    state0 = (lo0, lo0 + 5, lo0, lo0 + 5)

    r = scan_v3(planeT, pred, charsT, emit_flags, state0)
    jax.block_until_ready(r[0])
    t0 = time.time()
    reps = 10
    for _ in range(reps):
        r = scan_v3(planeT, pred, charsT, emit_flags, state0)
        jax.block_until_ready(r[0])
    dt = (time.time() - t0) / reps
    print(f"scan_v3 T={T} Q={Q}: {dt*1e3:.2f} ms total, {dt/T*1e6:.1f} us/step",
          flush=True)

    # without compaction (isolate): scan only
    @jax.jit
    def scan_only(planeT, pred, charsT, emit_flags, state0):
        step = make_step(planeT, pred)
        final, (emitted, valid) = jax.lax.scan(step, state0, (charsT, emit_flags))
        return final, valid.sum()

    r = scan_only(planeT, pred, charsT, emit_flags, state0)
    jax.block_until_ready(r[1])
    t0 = time.time()
    for _ in range(reps):
        r = scan_only(planeT, pred, charsT, emit_flags, state0)
        jax.block_until_ready(r[1])
    dt2 = (time.time() - t0) / reps
    print(f"scan_only: {dt2*1e3:.2f} ms, {dt2/T*1e6:.1f} us/step", flush=True)

    # occ-only loop: isolate gather+popcount cost
    @jax.jit
    def occ_loop(planeT, pred, state0):
        step = make_step(planeT, pred)
        lo, hi, rlo, rhi = state0

        def body(t, carry):
            lo, hi = carry
            _, (e, v) = step((lo, hi, lo, hi),
                             (jnp.full((Q,), 2, jnp.int32), jnp.int32(1)))
            return (lo + v.astype(jnp.int32), hi + e[0] % 3)

        return jax.lax.fori_loop(0, T, body, (lo, hi))

    r = occ_loop(planeT, pred, state0)
    jax.block_until_ready(r[0])
    t0 = time.time()
    for _ in range(reps):
        jax.block_until_ready(occ_loop(planeT, pred, state0)[0])
    dt3 = (time.time() - t0) / reps
    print(f"fori occ loop: {dt3*1e3:.2f} ms, {dt3/T*1e6:.1f} us/step", flush=True)


if __name__ == "__main__":
    main()
