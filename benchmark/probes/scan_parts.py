"""Probe: cost of each component inside one scan step, at bench shapes.

Variants, each a 99-step lax.scan over Q lanes with a fake-but-data-dependent
state so XLA can't hoist anything:
  A gather-only        : 2Q row gathers, sum rows into state
  B gather+popcount    : + _occ_from_rows ([Q,16] -> [5,Q] incl. transpose)
  C gather+pc+update   : + _update_left_T (full step, no emission)
  D full emit          : + per-step emission stack (phase-2 behaviour)
  E no-transpose pc    : popcount math in [Q,16] layout, reduce axis=-1
"""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import simulate_reads
from siga_tpu.index import sa as sa_mod
from siga_tpu.index.fm import FMIndex
from siga_tpu.ops.fm_device import DeviceFM, _occ_from_rows, _update_left_T

T = 99


def occ_noT(rows, block0, tail_len, sample):
    """popcount occ in [Q, ncols] layout, reductions over the minor axis."""
    nwords = sample // 16
    ndwords = sample // 32
    popcount = jax.lax.population_count
    w = rows[:, :nwords].astype(jnp.uint32)          # [Q, nwords]
    d = rows[:, nwords:nwords + ndwords].astype(jnp.uint32)
    base_acgt = rows[:, nwords + ndwords:]           # [Q, 4]
    tail = tail_len.astype(jnp.int32)
    widx = (jnp.arange(nwords, dtype=jnp.int32) * 16)[None, :]
    valid = jnp.clip(tail[:, None] - widx, 0, 16).astype(jnp.uint32)
    wmask = jnp.where(valid == 16, jnp.uint32(0xFFFFFFFF),
                      (jnp.uint32(1) << (2 * valid)) - 1)
    didx = (jnp.arange(ndwords, dtype=jnp.int32) * 32)[None, :]
    dvalid = jnp.clip(tail[:, None] - didx, 0, 32).astype(jnp.uint32)
    dmask = jnp.where(dvalid == 32, jnp.uint32(0xFFFFFFFF),
                      (jnp.uint32(1) << dvalid) - 1)
    n_dollar = popcount(d & dmask).sum(axis=-1).astype(jnp.int32)
    lo_bits = jnp.uint32(0x55555555)

    def count2(pattern):
        x = w ^ pattern
        matched = ~(x | (x >> 1)) & lo_bits
        return popcount(matched & wmask).sum(axis=-1).astype(jnp.int32)

    c_a = count2(jnp.uint32(0)) - n_dollar
    c_c = count2(lo_bits)
    c_g = count2(jnp.uint32(0xAAAAAAAA))
    c_t = count2(jnp.uint32(0xFFFFFFFF))
    base_dollar = block0 * sample - base_acgt.sum(axis=-1)
    acgt = base_acgt + jnp.stack([c_a, c_c, c_g, c_t], axis=-1)  # [Q, 4]
    return jnp.concatenate([(base_dollar + n_dollar)[:, None], acgt], axis=-1)


@partial(jax.jit, static_argnums=(0,))
def variant(which, plane, pred, length, q0):
    Q = q0.shape[0]
    sample = 128
    nblocks = plane.shape[0]

    def step(state, t):
        lo, hi = state
        i = jnp.concatenate([lo - 1, hi]) + t * 0
        pos = i + 1
        block = jnp.clip(pos // sample, 0, nblocks - 1)
        rows = plane[block]
        if which == "A":
            s = rows.sum(axis=-1)
            nlo = (lo + s[:Q]) % length
            nhi = (hi + s[Q:]) % length
            return (nlo, nhi), ()
        tail = pos - (pos // sample) * sample
        if which == "E":
            counts = occ_noT(rows, pos // sample, tail, sample)  # [2Q, 5]
            s = counts.sum(axis=-1)
            nlo = (lo + s[:Q]) % length
            nhi = (hi + s[Q:]) % length
            return (nlo, nhi), ()
        counts = _occ_from_rows(rows, pos // sample, tail, sample)  # [5, 2Q]
        if which == "B":
            s = counts.sum(axis=0)
            nlo = (lo + s[:Q]) % length
            nhi = (hi + s[Q:]) % length
            return (nlo, nhi), ()
        l_counts = counts[:, :Q]
        u_counts = counts[:, Q:]
        c = (lo + t) % 4 + 1
        nlo, nhi, nrlo, nrhi = _update_left_T(
            lo, hi, lo, hi, c, l_counts, u_counts, pred
        )
        nlo = jnp.clip(nlo, 0, length - 1)
        nhi = jnp.clip(nhi, 0, length - 1)
        if which == "C":
            return (nlo, nhi), ()
        psize = u_counts[0] - l_counts[0]
        emit_valid = psize > 0
        emitted = jnp.stack([lo, hi, hi - lo], axis=0)
        return (nlo, nhi), (emitted, emit_valid)

    out = jax.lax.scan(step, (q0, q0), jnp.arange(T, dtype=jnp.int32))
    return out[0]


def main():
    n_reads, readlen = 10000, 100
    reads = simulate_reads(n_reads, readlen)
    fwd_codes, _p, rev_codes, _rp, ns = sa_mod.build_index_arrays_pair(
        reads, use_device=True
    )
    fmi = FMIndex(fwd_codes, ns)
    dfm = DeviceFM(fmi)
    plane = dfm.occ_plane
    pred = dfm.pred
    length = jnp.int32(fmi.length)
    for Q in (40000, 160000):
        rng = np.random.default_rng(0)
        q0 = jnp.asarray(rng.integers(0, fmi.length - 1, Q, dtype=np.int32))
        for which in ("A", "B", "E", "C", "D"):
            r = variant(which, plane, pred, length, q0)
            jax.block_until_ready(r)
            t0 = time.perf_counter()
            for _ in range(3):
                r = variant(which, plane, pred, length, q0)
                jax.block_until_ready(r)
            dt = (time.perf_counter() - t0) / 3
            gb = T * 2 * Q * 64 / 1e9
            print(f"Q={Q} {which}: {dt*1000:7.1f} ms  "
                  f"{gb/dt:6.1f} GB/s-gather  {dt/T*1e6:7.1f} us/step")


if __name__ == "__main__":
    main()
