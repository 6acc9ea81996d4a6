"""Device (JAX) FM-index: HBM-resident BWT codes + checkpoint occ tables.

The layout matches the host FMIndex (index/fm.py) bit-for-bit: codes as uint8
rank symbols, cumulative checkpoint counts every SAMPLE symbols, C array.  A
batched occ query is a checkpoint gather + masked tail reduce, one lane per
query — the shape XLA tiles well on TPU (gathers of SAMPLE-wide blocks,
VPU compare+sum).  All interval arithmetic is int32 (indices < 2^31).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..index.fm import SAMPLE, FMIndex


class DeviceFM:
    """Immutable device mirror of a host FMIndex.

    BWT symbols live as a (nblocks, SAMPLE) row matrix so an occ query is a
    contiguous row gather (fast on TPU) instead of an element gather.
    """

    def __init__(self, host: FMIndex):
        self.length = host.length
        self.num_strings = host.num_strings
        n = host.length
        nblocks = n // SAMPLE + 1
        padded = np.zeros(nblocks * SAMPLE, dtype=np.uint8)
        padded[:n] = host.codes
        self.codes = jnp.asarray(padded.reshape(nblocks, SAMPLE))
        self.checkpoints = jnp.asarray(host.checkpoints, dtype=jnp.int32)
        self.pred = jnp.asarray(host.pred, dtype=jnp.int32)
        self.totals = jnp.asarray(host.totals, dtype=jnp.int32)
        # 2-bit-packed symbol words + '$' bitmask for popcount occ:
        # word j of a block covers symbols [16j, 16j+16), little-end first;
        # '$' packs as 0 (alias of A) and is corrected via the mask plane.
        sym = padded.reshape(nblocks, SAMPLE).astype(np.uint32)
        two_bit = np.where(sym == 0, 0, sym - 1)  # $->0(A), A..T -> 0..3
        shifts = (2 * (np.arange(SAMPLE) % 16)).astype(np.uint32)
        words = np.zeros((nblocks, SAMPLE // 16), dtype=np.uint32)
        np.add.at(
            words,
            (np.arange(nblocks)[:, None], np.arange(SAMPLE)[None, :] // 16),
            two_bit << shifts[None, :],
        )
        dollar = np.zeros((nblocks, SAMPLE // 32), dtype=np.uint32)
        dbit = (sym == 0).astype(np.uint32)
        np.add.at(
            dollar,
            (np.arange(nblocks)[:, None], np.arange(SAMPLE)[None, :] // 32),
            dbit << (np.arange(SAMPLE) % 32).astype(np.uint32),
        )
        self.packed_words = jnp.asarray(words.view(np.int32))
        self.dollar_words = jnp.asarray(dollar.view(np.int32))

    def occ_args(self):
        return (
            self.packed_words,
            self.dollar_words,
            self.checkpoints,
            jnp.int32(self.length),
        )

    def tree(self):
        return (self.codes, self.checkpoints, self.pred, jnp.int32(self.length))


def occ_all(codes, checkpoints, length, i):
    """Batched inclusive occ counts: i int32 [...], -> [..., 5] int32.

    codes is the (nblocks, SAMPLE) row matrix; one row gather + masked
    compare-sum per query.  The '$' count is derived from the tail length so
    only 4 compare passes run.  occ(c, -1) == 0 by construction (pos=0 ->
    empty tail, checkpoint 0).
    """
    pos = i + 1
    block = pos // SAMPLE
    base = checkpoints[block]
    rows = codes[block]  # [..., SAMPLE] contiguous row gather
    offs = jnp.arange(SAMPLE, dtype=jnp.int32)
    tail_len = pos - block * SAMPLE
    mask = offs < tail_len[..., None]
    counts = [
        jnp.sum((rows == c) & mask, axis=-1, dtype=jnp.int32) for c in range(1, 5)
    ]
    acgt = jnp.stack(counts, axis=-1)
    dollar = tail_len - acgt.sum(axis=-1)
    return base + jnp.concatenate([dollar[..., None], acgt], axis=-1)


_NWORDS = SAMPLE // 16
_NDWORDS = SAMPLE // 32


def occ_all_packed(words, dollars, checkpoints, length, i, tab=None):
    """popcount occ over 2-bit-packed words: i int32 [Q] -> [Q, 5] int32.

    Each query gathers 8 symbol words + 4 '$'-mask words + 1 checkpoint row
    (68 bytes) instead of a 128-byte tail row; counting is
    lax.population_count on the VPU.
    """
    popcount = jax.lax.population_count
    pos = i + 1
    block0 = pos // SAMPLE
    block = block0 if tab is None else block0 + tab
    base = checkpoints[block]
    w = words[block].astype(jnp.uint32)  # [Q, 8]
    d = dollars[block].astype(jnp.uint32)  # [Q, 4]
    tail_len = (pos - block0 * SAMPLE).astype(jnp.uint32)  # 0..SAMPLE

    # per-word valid-symbol masks
    widx = jnp.arange(_NWORDS, dtype=jnp.uint32) * 16
    valid = jnp.clip(
        tail_len[..., None].astype(jnp.int32) - widx[None, :].astype(jnp.int32), 0, 16
    ).astype(jnp.uint32)
    full = valid == 16
    wmask = jnp.where(full, jnp.uint32(0xFFFFFFFF), (jnp.uint32(1) << (2 * valid)) - 1)

    didx = jnp.arange(_NDWORDS, dtype=jnp.uint32) * 32
    dvalid = jnp.clip(
        tail_len[..., None].astype(jnp.int32) - didx[None, :].astype(jnp.int32), 0, 32
    ).astype(jnp.uint32)
    dfull = dvalid == 32
    dmask = jnp.where(dfull, jnp.uint32(0xFFFFFFFF), (jnp.uint32(1) << dvalid) - 1)

    n_dollar = popcount(d & dmask).sum(axis=-1).astype(jnp.int32)

    lo_bits = jnp.uint32(0x55555555)

    def count2(pattern):
        x = w ^ pattern
        matched = ~(x | (x >> 1)) & lo_bits
        return popcount(matched & wmask).sum(axis=-1).astype(jnp.int32)

    c_a = count2(jnp.uint32(0x00000000)) - n_dollar  # '$' packs as 0
    c_c = count2(lo_bits)
    c_g = count2(jnp.uint32(0xAAAAAAAA))
    c_t = count2(jnp.uint32(0xFFFFFFFF))
    return base + jnp.stack([n_dollar, c_a, c_c, c_g, c_t], axis=-1)


def update_left_core(lo, hi, rlo, rhi, c, l_counts, u_counts, pred):
    """IntervalPair.updateL with precomputed occ counts at lo-1 and hi.

    c: int32 [...] symbol rank.  Returns (lo, hi, rlo, rhi) after prepending c.
    Mirrors src/overlap_builder.cpp:112-122.
    """
    diff = u_counts - l_counts  # [..., 5]
    # prefix-sum of diff below rank c
    ranks = jnp.arange(5, dtype=jnp.int32)
    below = jnp.sum(jnp.where(ranks < c[..., None], diff, 0), axis=-1)
    dc = jnp.take_along_axis(diff, c[..., None], axis=-1)[..., 0]
    lc = jnp.take_along_axis(l_counts, c[..., None], axis=-1)[..., 0]
    uc = jnp.take_along_axis(u_counts, c[..., None], axis=-1)[..., 0]
    nrlo = rlo + below
    nrhi = nrlo + dc - 1
    pb = pred[c]
    nlo = pb + lc
    nhi = pb + uc - 1
    return nlo, nhi, nrlo, nrhi


@partial(jax.jit, static_argnums=(0, 1, 2))
def _scan_stage_a_compact(
    max_t, min_overlap, cap, words, dollars, checkpoints, pred, length, chars, lens,
    lane_tab=None,
):
    """Like _scan_stage_a but compacts the sparse valid blocks on device so
    only ~cap block records cross the host link (the tunnel transfer is the
    bottleneck, not compute)."""
    emitted, valid, final, lext = _scan_stage_a(
        max_t, min_overlap, words, dollars, checkpoints, pred, length, chars, lens,
        lane_tab,
    )
    t_dim, lanes = valid.shape
    flat_valid = valid.reshape(-1)
    count = flat_valid.sum(dtype=jnp.int32)
    (idx,) = jnp.nonzero(flat_valid, size=cap, fill_value=t_dim * lanes - 1)
    data = emitted.reshape(t_dim * lanes, 8)[idx]
    # substring pre-classification: any DNA left-extension of the full
    # interval (the other index's rext check happens host-side)
    lext_has_dna = (lext[:, 1:].sum(axis=-1) > 0).astype(jnp.int8)
    return count, idx.astype(jnp.int32), data, final, lext_has_dna


@partial(jax.jit, static_argnums=(0, 1))
def _scan_stage_a(max_t, min_overlap, words, dollars, checkpoints, pred, length, chars, lens, lane_tab=None):
    """Backward-search scan with '$'-probes over a batch of lanes.

    chars: int32 [L, T] update symbols (chars[:, t] = seq[l-2-t], garbage when
      t >= l-1); lens: int32 [L] read lengths.
    Returns per-step probe/raw intervals + validity and the final full-length
    interval state per lane.
    """
    num_lanes = chars.shape[0]
    tab1 = lane_tab
    tab2 = None if lane_tab is None else jnp.concatenate([lane_tab, lane_tab])

    def occ(i, tab):
        return occ_all_packed(words, dollars, checkpoints, length, i, tab)

    # init with the last character of each read: interval over all of fmi
    c0 = chars[:, max_t]  # by construction chars[:, T] holds seq[l-1]
    lo0 = pred[c0]
    # totals = checkpoints-based full counts via occ(length-1)
    full = occ(jnp.full((num_lanes,), length - 1, dtype=jnp.int32), tab1)
    hi0 = lo0 + jnp.take_along_axis(full, c0[..., None], axis=-1)[..., 0] - 1
    state0 = (lo0, hi0, lo0, hi0)

    def step(state, t):
        lo, hi, rlo, rhi = state
        both = occ(jnp.concatenate([lo - 1, hi]), tab2)
        l_counts = both[:num_lanes]
        u_counts = both[num_lanes:]
        # probe: extend left with '$' (rank 0)
        zeros = jnp.zeros_like(lo)
        plo, phi, prlo, prhi = update_left_core(
            lo, hi, rlo, rhi, zeros, l_counts, u_counts, pred
        )
        probe_valid = (prhi >= prlo) & (prhi >= 0)
        active = t <= lens - 2
        overlap_len = t + 1
        emit_valid = probe_valid & active & (overlap_len >= min_overlap)
        emitted = jnp.stack([plo, phi, prlo, prhi, lo, hi, rlo, rhi], axis=-1)
        # update with the actual character
        c = chars[:, t]
        nlo, nhi, nrlo, nrhi = update_left_core(
            lo, hi, rlo, rhi, c, l_counts, u_counts, pred
        )
        new_state = (
            jnp.where(active, nlo, lo),
            jnp.where(active, nhi, hi),
            jnp.where(active, nrlo, rlo),
            jnp.where(active, nrhi, rhi),
        )
        return new_state, (emitted, emit_valid)

    final_state, (emitted, valid) = jax.lax.scan(
        step, state0, jnp.arange(max_t, dtype=jnp.int32)
    )
    flo, fhi, frlo, frhi = final_state
    # containment classification on the full-length interval
    both = occ(jnp.concatenate([flo - 1, fhi]), tab2)
    l_counts = both[:num_lanes]
    u_counts = both[num_lanes:]
    lext = u_counts - l_counts
    zeros = jnp.zeros_like(flo)
    plo, phi, prlo, prhi = update_left_core(
        flo, fhi, frlo, frhi, zeros, l_counts, u_counts, pred
    )
    final = jnp.stack([flo, fhi, frlo, frhi, plo, phi, prlo, prhi], axis=-1)
    return emitted, valid, final, lext


def _next_pow2(n: int) -> int:
    p = 1024
    while p < n:
        p *= 2
    return p


class StageAScanner:
    """Runs the stage-A scan for one (index, rindex) orientation pair.

    With a mesh, read lanes shard over the `data` axis and the index tables
    replicate (GSPMD partitions the scan; lanes are independent) — the TPU
    analog of the reference's per-thread read fan-out
    (src/parallel_framework.h:16-59).
    """

    def __init__(self, dfm: DeviceFM, mesh=None):
        self.dfm = dfm
        self.mesh = mesh
        self._cap = 1024  # adaptive: grows to fit the observed block count
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            self.dfm.codes = jax.device_put(self.dfm.codes, repl)
            self.dfm.checkpoints = jax.device_put(self.dfm.checkpoints, repl)
            self.dfm.pred = jax.device_put(self.dfm.pred, repl)
            self.dfm.packed_words = jax.device_put(self.dfm.packed_words, repl)
            self.dfm.dollar_words = jax.device_put(self.dfm.dollar_words, repl)
            self._lane_sharding = NamedSharding(mesh, P("data", None))
            self._vec_sharding = NamedSharding(mesh, P("data"))

    def _put(self, chars: np.ndarray, lens: np.ndarray):
        if self.mesh is None:
            return jnp.asarray(chars), jnp.asarray(lens)
        return (
            jax.device_put(chars, self._lane_sharding),
            jax.device_put(lens, self._vec_sharding),
        )

    def dispatch(self, seqs_ranks: np.ndarray, lens: np.ndarray, min_overlap: int):
        """Launch the scan asynchronously; returns a handle for collect()."""
        num_lanes, maxlen = seqs_ranks.shape
        max_t = maxlen - 1
        # chars[:, t] = seq[l-2-t] for t < l-1; chars[:, max_t] = seq[l-1]
        chars = np.zeros((num_lanes, max_t + 1), dtype=np.int32)
        for c_t in range(max_t):
            idx = lens - 2 - c_t
            ok = idx >= 0
            chars[ok, c_t] = seqs_ranks[ok, idx[ok]]
        chars[np.arange(num_lanes), max_t] = seqs_ranks[
            np.arange(num_lanes), lens - 1
        ]
        chars_d, lens_d = self._put(chars, lens.astype(np.int32))

        cap = self._cap
        out = _scan_stage_a_compact(
            max_t,
            min_overlap,
            cap,
            self.dfm.packed_words,
            self.dfm.dollar_words,
            self.dfm.checkpoints,
            self.dfm.pred,
            jnp.int32(self.dfm.length),
            chars_d,
            lens_d,
        )
        return (out, cap, num_lanes, max_t, min_overlap, chars_d, lens_d)

    def collect(self, handle):
        (count, idx, data, final, lext), cap, num_lanes, max_t, min_overlap, chars_d, lens_d = handle
        nblocks = int(count)
        while nblocks > cap:
            cap = _next_pow2(nblocks)
            self._cap = cap  # remember for future dispatches
            count, idx, data, final, lext = _scan_stage_a_compact(
                max_t,
                min_overlap,
                cap,
                self.dfm.packed_words,
                self.dfm.dollar_words,
                self.dfm.checkpoints,
                self.dfm.pred,
                jnp.int32(self.dfm.length),
                chars_d,
                lens_d,
            )
            nblocks = int(count)

        # device-side slice before transfer (pow2 buckets bound the number of
        # distinct slice shapes): only ~real blocks cross the link
        k = min(_next_pow2(max(nblocks, 1)), cap)
        idx = np.asarray(idx[:k])[:nblocks].astype(np.int64)
        data = np.asarray(data[:k])[:nblocks]
        final = np.asarray(final)
        lext = np.asarray(lext)
        lane = idx % num_lanes
        t = idx // num_lanes
        order = np.lexsort((t, lane))
        return lane[order], t[order], data[order], final, lext

    def scan(self, seqs_ranks: np.ndarray, lens: np.ndarray, min_overlap: int):
        """Synchronous dispatch+collect (see those methods)."""
        return self.collect(self.dispatch(seqs_ranks, lens, min_overlap))


class DualScanner:
    """One scan call serves both (fwd, rev) orientation pairs: the two
    indexes' tables are stacked and each lane carries a block-table offset.
    The C arrays of the forward and reversed text are identical (same symbol
    totals), so `pred` is shared.  Halves dispatch/transfer round trips."""

    def __init__(self, dfwd: DeviceFM, drev: DeviceFM, mesh=None):
        assert dfwd.length == drev.length
        self.length = dfwd.length
        self.nblocks = dfwd.packed_words.shape[0]
        words = jnp.concatenate([dfwd.packed_words, drev.packed_words], axis=0)
        dollars = jnp.concatenate([dfwd.dollar_words, drev.dollar_words], axis=0)
        ckpt = jnp.concatenate([dfwd.checkpoints, drev.checkpoints], axis=0)
        self.pred = dfwd.pred
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            words = jax.device_put(words, repl)
            dollars = jax.device_put(dollars, repl)
            ckpt = jax.device_put(ckpt, repl)
            self.pred = jax.device_put(self.pred, repl)
            self._lane_sharding = NamedSharding(mesh, P("data", None))
            self._vec_sharding = NamedSharding(mesh, P("data"))
        self.words = words
        self.dollars = dollars
        self.checkpoints = ckpt
        self._cap = 2048

    def _put(self, chars, lens, tab):
        if self.mesh is None:
            return jnp.asarray(chars), jnp.asarray(lens), jnp.asarray(tab)
        return (
            jax.device_put(chars, self._lane_sharding),
            jax.device_put(lens, self._vec_sharding),
            jax.device_put(tab, self._vec_sharding),
        )

    def dispatch(
        self,
        f_ranks: np.ndarray,
        f_lens: np.ndarray,
        r_ranks: np.ndarray,
        r_lens: np.ndarray,
        min_overlap: int,
    ):
        """Both scanners' lanes in one launch: [fwd lanes..., rev lanes...]."""
        seqs_ranks = np.concatenate([f_ranks, r_ranks], axis=0)
        lens = np.concatenate([f_lens, r_lens]).astype(np.int64)
        half = f_ranks.shape[0]
        tab = np.zeros(2 * half, dtype=np.int32)
        tab[half:] = self.nblocks

        num_lanes, maxlen = seqs_ranks.shape
        max_t = maxlen - 1
        chars = np.zeros((num_lanes, max_t + 1), dtype=np.int32)
        for c_t in range(max_t):
            idx = lens - 2 - c_t
            ok = idx >= 0
            chars[ok, c_t] = seqs_ranks[ok, idx[ok]]
        chars[np.arange(num_lanes), max_t] = seqs_ranks[
            np.arange(num_lanes), lens - 1
        ]
        chars_d, lens_d, tab_d = self._put(
            chars, lens.astype(np.int32), tab
        )
        cap = self._cap
        out = _scan_stage_a_compact(
            max_t,
            min_overlap,
            cap,
            self.words,
            self.dollars,
            self.checkpoints,
            self.pred,
            jnp.int32(self.length),
            chars_d,
            lens_d,
            tab_d,
        )
        return (out, cap, num_lanes, max_t, min_overlap, chars_d, lens_d, tab_d, half)

    def collect(self, handle):
        (count, idx, data, final, lext), cap, num_lanes, max_t, min_overlap, chars_d, lens_d, tab_d, half = handle
        nblocks = int(count)
        while nblocks > cap:
            cap = _next_pow2(nblocks)
            self._cap = cap
            count, idx, data, final, lext = _scan_stage_a_compact(
                max_t,
                min_overlap,
                cap,
                self.words,
                self.dollars,
                self.checkpoints,
                self.pred,
                jnp.int32(self.length),
                chars_d,
                lens_d,
                tab_d,
            )
            nblocks = int(count)

        k = min(_next_pow2(max(nblocks, 1)), cap)
        idx = np.asarray(idx[:k])[:nblocks].astype(np.int64)
        data = np.asarray(data[:k])[:nblocks]
        final = np.asarray(final)
        lext = np.asarray(lext)
        lane = idx % num_lanes
        t = idx // num_lanes
        order = np.lexsort((t, lane))
        lane, t, data = lane[order], t[order], data[order]
        # split back into the fwd and rev scanner views
        is_f = lane < half
        f_view = (lane[is_f], t[is_f], data[is_f], final[:half], lext[:half])
        r_view = (lane[~is_f] - half, t[~is_f], data[~is_f], final[half:], lext[half:])
        return f_view, r_view
