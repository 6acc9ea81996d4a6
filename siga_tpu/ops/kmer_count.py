"""Batched k-mer counting: one backward-search scan over lanes of k-mers.

The device analog of FMIndex::Interval::occurrences
(/root/reference/src/fmindex.h:80-86) — every lane runs the k-step backward
search in lockstep; each step is two batched occ gathers.  Used by the
corrector (all (n-k+1) k-mers of a read batch in one call) and by `match` /
`preqc`.
"""
from __future__ import annotations

from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core import dna
from .fm_device import DeviceFM, occ_all


@partial(jax.jit, static_argnums=(0,))
def _count_scan(k, codes, checkpoints, pred, length, kmers):
    """kmers: int32 [Q, k] rank codes.  Returns int32 [Q] occurrence counts."""

    def occ(i):
        return occ_all(codes, checkpoints, length, i)

    c_last = kmers[:, k - 1]
    lo0 = pred[c_last]
    full = occ(jnp.full((kmers.shape[0],), length - 1, dtype=jnp.int32))
    hi0 = lo0 + jnp.take_along_axis(full, c_last[..., None], axis=-1)[..., 0] - 1

    def step(state, j):
        lo, hi = state
        c = kmers[:, k - 2 - j]
        pb = pred[c]
        both = occ(jnp.concatenate([lo - 1, hi]))
        l_counts = both[: lo.shape[0]]
        u_counts = both[lo.shape[0] :]
        nlo = pb + jnp.take_along_axis(l_counts, c[..., None], axis=-1)[..., 0]
        nhi = pb + jnp.take_along_axis(u_counts, c[..., None], axis=-1)[..., 0] - 1
        # once invalid, stay invalid (reference stops updating; counts clamp)
        invalid = hi < lo
        nlo = jnp.where(invalid, lo, nlo)
        nhi = jnp.where(invalid, hi, nhi)
        return (nlo, nhi), None

    (lo, hi), _ = jax.lax.scan(
        step, (lo0, hi0), jnp.arange(k - 1, dtype=jnp.int32)
    )
    return jnp.maximum(hi - lo + 1, 0)


class KmerCounter:
    """Callable batching counter: list[str] -> list[int]."""

    def __init__(self, dfm: DeviceFM, batch: int = 8192):
        self.dfm = dfm
        self.batch = batch

    def __call__(self, kmers: Sequence[str]) -> List[int]:
        if not kmers:
            return []
        k = len(kmers[0])
        assert all(len(w) == k for w in kmers)
        packed = np.zeros((len(kmers), k), dtype=np.int32)
        for i, w in enumerate(kmers):
            packed[i] = dna.encode(w)
        out: List[int] = []
        for s in range(0, len(kmers), self.batch):
            chunk = packed[s : s + self.batch]
            pad = 0
            if chunk.shape[0] < self.batch and len(kmers) > self.batch:
                pad = self.batch - chunk.shape[0]
                chunk = np.pad(chunk, ((0, pad), (0, 0)))
            counts = _count_scan(
                k,
                self.dfm.codes,
                self.dfm.checkpoints,
                self.dfm.pred,
                jnp.int32(self.dfm.length),
                jnp.asarray(chunk),
            )
            counts = np.asarray(counts)
            out.extend(int(c) for c in (counts[:-pad] if pad else counts))
        return out
