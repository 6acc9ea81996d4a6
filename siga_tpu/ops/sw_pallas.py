"""Pallas TPU kernel: batched anti-diagonal Smith-Waterman scoring.

The affine-gap local-alignment wavefront (ops/sw_device.py) as a hand-written
TPU kernel: all m+n-1 anti-diagonals advance inside one kernel with the H/E/F
wavefront state held in VMEM scratch — no HBM round trips, VPU-only ops
(shift/compare/max).  Two Mosaic-friendliness tricks:
  * the reference symbols of diagonal d are a fixed, lane-aligned window of
    the reversed ref rolled right once per step (static rolls/slices only —
    dynamic-offset lane ops and gathers do not lower);
  * the state lives in scratch refs, not loop carries (splat-initialized
    carries infer replicated register layouts the body cannot produce).

Returns best scores per (query, ref) pair; end positions and traceback stay
with align/sw.py (only reported alignments need them).  TPU equivalent of the
reference's vendored SSE2 striped SW (/root/reference/3rdparty/ssw.c).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import dna

NEG = -(2**20)


def _sw_kernel(
    m, n, match, mismatch, gap_open, gap_extend,
    q_ref, r_ref, out_ref,
    h_ref, h2_ref, ef_ref, best_ref, r_roll_ref,
):
    """q_ref: [B, cells] query symbol at cell i (= query[i-1], 0 at i=0);
    r_ref: [B, W] reversed ref placed so the window offset is lane-aligned;
    out_ref: [B, 1] best scores.  Scratch: H / H(d-2) / packed E+F / best /
    the rolled reversed ref."""
    B = q_ref.shape[0]
    cells = m + 1
    ii = jax.lax.broadcasted_iota(jnp.int32, (B, cells), 1)
    win = cells + n - 2  # 128-aligned by construction (see PallasAligner)

    h_ref[:] = ii * 0 + NEG
    h2_ref[:] = ii * 0 + NEG
    ef_ref[:] = jax.lax.broadcasted_iota(jnp.int32, ef_ref.shape, 1) * 0 + NEG
    best_ref[:] = ii * 0
    r_roll_ref[:] = r_ref[:]

    def shift_down(x):
        rolled = pltpu.roll(x, 1, 1)
        return jnp.where(ii == 0, NEG, rolled)

    def step(d, _):
        h_prev = h_ref[:]
        h_prev2 = h2_ref[:]
        e_prev = ef_ref[0:B, :]
        f_prev = ef_ref[B : 2 * B, :]
        j = d - ii
        valid = (ii >= 1) & (j >= 1) & (j <= n)
        # r_sym[b, i] = ref[b, d-1-i]: fixed window of the rolled ref
        r_sym = r_roll_ref[:, win : win + cells]
        q_sym = q_ref[:]
        is_match = (q_sym == r_sym) & (q_sym > 0)
        sub = jnp.where(is_match, match, -mismatch)

        e = jnp.maximum(
            shift_down(h_prev) - gap_open, shift_down(e_prev) - gap_extend
        )
        f = jnp.maximum(h_prev - gap_open, f_prev - gap_extend)
        h_diag = shift_down(h_prev2)
        h_diag = jnp.where(ii == 1, 0, h_diag)
        h_diag = jnp.where((j == 1) & (ii >= 1), 0, h_diag)
        h = jnp.maximum(jnp.maximum(h_diag + sub, e), f)
        h = jnp.maximum(h, 0)
        h = jnp.where(valid, h, NEG)
        e = jnp.where(valid, e, NEG)
        f = jnp.where(valid, f, NEG)
        best_ref[:] = jnp.maximum(best_ref[:], jnp.where(valid, h, 0))
        h2_ref[:] = h_prev
        h_ref[:] = h
        ef_ref[0:B, :] = e
        ef_ref[B : 2 * B, :] = f
        r_roll_ref[:] = pltpu.roll(r_roll_ref[:], 1, 1)
        return 0

    jax.lax.fori_loop(2, m + n + 1, step, 0)
    out_ref[:] = jnp.max(best_ref[:], axis=1, keepdims=True)


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _sw_pallas(q_shift, r_revpad, n, match, mismatch, gap_open, gap_extend):
    B, cells = q_shift.shape
    m = cells - 1
    w = r_revpad.shape[1]
    kernel = partial(_sw_kernel, m, n, match, mismatch, gap_open, gap_extend)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((B, cells), jnp.int32),      # H (previous diagonal)
            pltpu.VMEM((B, cells), jnp.int32),      # H (diagonal - 2)
            pltpu.VMEM((2 * B, cells), jnp.int32),  # E / F packed
            pltpu.VMEM((B, cells), jnp.int32),      # best
            pltpu.VMEM(r_revpad.shape, jnp.int32),  # rolled reversed ref
        ],
    )(q_shift, r_revpad)


class PallasAligner:
    """Batched SW scores via the Pallas wavefront kernel."""

    def __init__(self, match=2, mismatch=2, gap_open=3, gap_extend=1):
        self.params = (match, mismatch, gap_open, gap_extend)

    def scores(self, queries, refs) -> np.ndarray:
        assert len(queries) == len(refs)
        B = len(queries)
        m = max(len(q) for q in queries)
        n = max(len(r) for r in refs)

        def align_up(x, a):
            return ((x + a - 1) // a) * a

        # Mosaic wants lane-aligned shapes: cells multiple of 128; n chosen
        # so the kernel's static window offset (cells + n - 2) is 128-aligned;
        # batch padded to the 8-deep sublane
        cells = align_up(m + 1, 128)
        n = align_up(n + 126, 128) + 2 - 128
        if n < 2:
            n += 128
        w = align_up(2 * cells + n, 128)
        b_pad = align_up(B, 8)
        # q_shift[b, i] = query[b][i-1] (0 at i = 0)
        q_shift = np.zeros((b_pad, cells), dtype=np.int32)
        # reversed ref window ending at cells + n
        r_revpad = np.zeros((b_pad, w), dtype=np.int32)
        for i, (q, r) in enumerate(zip(queries, refs)):
            q_shift[i, 1 : len(q) + 1] = dna.encode(q)
            enc = dna.encode(r)[::-1]
            # reversed symbols occupy [cells + n - len(r), cells + n)
            r_revpad[i, cells + n - len(r) : cells + n] = enc
        out = _sw_pallas(
            jnp.asarray(q_shift), jnp.asarray(r_revpad), n, *self.params
        )
        return np.asarray(out)[:B, 0]
