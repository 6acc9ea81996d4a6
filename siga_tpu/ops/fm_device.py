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
        # fused occ plane: one row gather serves symbol words + '$' mask +
        # checkpoint counts (3 gathers -> 1; gathers are issue-rate bound)
        self.occ_plane = jnp.asarray(
            np.concatenate(
                [
                    words.view(np.int32),
                    dollar.view(np.int32),
                    np.asarray(host.checkpoints, dtype=np.int32),
                ],
                axis=1,
            )
        )

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
PLANE_COLS = _NWORDS + _NDWORDS + 5  # symbol words | '$' words | checkpoints


def occ_all_fused(plane, length, i, tab=None):
    """popcount occ over the fused (nblocks, 17) plane: ONE row gather per
    query (symbol words + '$'-mask words + checkpoint counts), then VPU
    popcount — the minimal-gather form of occ_all_packed."""
    popcount = jax.lax.population_count
    pos = i + 1
    block0 = pos // SAMPLE
    block = block0 if tab is None else block0 + tab
    rows = plane[block]  # [Q, 17] single gather
    w = rows[..., :_NWORDS].astype(jnp.uint32)
    d = rows[..., _NWORDS:_NWORDS + _NDWORDS].astype(jnp.uint32)
    base = rows[..., _NWORDS + _NDWORDS:]
    tail_len = (pos - block0 * SAMPLE).astype(jnp.uint32)

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
    Mirrors src/overlap_builder.cpp:112-122.  All rank selections are one-hot
    masked reductions (VPU) — per-element gathers (take_along_axis, pred[c])
    are issue-rate bound on TPU and dominate the scan step if used here.
    """
    diff = u_counts - l_counts  # [..., 5]
    ranks = jnp.arange(5, dtype=jnp.int32)
    onehot = ranks == c[..., None]
    below = jnp.sum(jnp.where(ranks < c[..., None], diff, 0), axis=-1)
    dc = jnp.sum(jnp.where(onehot, diff, 0), axis=-1)
    lc = jnp.sum(jnp.where(onehot, l_counts, 0), axis=-1)
    uc = jnp.sum(jnp.where(onehot, u_counts, 0), axis=-1)
    pb = jnp.sum(jnp.where(onehot, pred, 0), axis=-1)
    nrlo = rlo + below
    nrhi = nrlo + dc - 1
    nlo = pb + lc
    nhi = pb + uc - 1
    return nlo, nhi, nrlo, nrhi


def _compact_blocks(emitted, valid, lext, cap):
    """Compact the sparse valid blocks on device so only ~cap block records
    cross the host link (the tunnel transfer is a bottleneck, not compute)."""
    t_dim, lanes = valid.shape
    flat_valid = valid.reshape(-1)
    count = flat_valid.sum(dtype=jnp.int32)
    (idx,) = jnp.nonzero(flat_valid, size=cap, fill_value=t_dim * lanes - 1)
    data = emitted.reshape(t_dim * lanes, emitted.shape[-1])[idx]
    # substring pre-classification: any DNA left-extension of the full
    # interval (the other index's rext check happens host-side)
    lext_has_dna = (lext[:, 1:].sum(axis=-1) > 0).astype(jnp.int8)
    return count, idx.astype(jnp.int32), data, lext_has_dna


@partial(jax.jit, static_argnums=(0,))
def _pack_outputs(k, idx, data, final):
    """Slice the compacted scan outputs to the observed block count and fuse
    them into ONE int32 buffer: a single device->host transfer replaces four
    (each transfer through the dev tunnel pays a round trip).  Only the raw
    final interval columns cross; probe/'$'-extension columns are closed-form
    host reconstructions (ops/search.py::_final8/_lext_dna)."""
    return jnp.concatenate(
        [
            idx[:k].astype(jnp.int32),
            data[:k].reshape(-1).astype(jnp.int32),
            final[:, :4].reshape(-1).astype(jnp.int32),
        ]
    )


@partial(jax.jit, static_argnums=(0, 1, 2))
def _scan_stage_a_compact(
    max_t, min_overlap, cap, plane, pred, length, chars, lens, lane_tab=None,
):
    emitted, valid, final, lext = _scan_stage_a(
        max_t, min_overlap, plane, pred, length, chars, lens, lane_tab
    )
    count, idx, data, lext_has_dna = _compact_blocks(emitted, valid, lext, cap)
    return count, idx, data, final, lext_has_dna


def _unpack_2bit(words, lens, maxlen, right_align):
    """(n, maxlen//16) packed 2-bit words -> (n, maxlen) int32 ranks 1..4,
    0 outside the read span."""
    w = words.astype(jnp.uint32)
    j = jnp.arange(maxlen, dtype=jnp.int32)
    sym = ((jnp.repeat(w, 16, axis=1) >> (2 * (j % 16))[None, :].astype(jnp.uint32))
           & 3).astype(jnp.int32) + 1
    if right_align:
        mask = j[None, :] >= (maxlen - lens)[:, None]
    else:
        mask = j[None, :] < lens[:, None]
    return jnp.where(mask, sym, 0)


def _complement_ranks(c):
    # A<->T, C<->G on ranks 1..4; '$'/pad (0) unchanged
    return jnp.where(c == 0, 0, 5 - c)


# Lane-group transform ids: how a lane's scan sequence derives from the read.
GROUP_ID = 0       # seq itself (suffix search in the forward index)
GROUP_RC = 1       # reverse_complement(seq) (forward index)
GROUP_REV = 2      # reverse(seq) (reverse index)
GROUP_COMP = 3     # complement(seq) (reverse index)


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _scan_packed_compact(
    max_t, min_overlap, cap, fwd_groups, rev_groups,
    plane, pred, length, nblocks,
    la_words, ra_words, lens,
):
    """Stage-A scan taking 2-bit packed reads; the per-step character matrix
    of every orientation group is derived on device with flips/static rolls
    (what crosses the host link is ~2 bits/char instead of a 32-bit char per
    scan step — the dev-tunnel host link is ~10MB/s).

    la_words/ra_words: left-/right-aligned packings (n, maxlen//16) int32.
    For a lane scanning transformed sequence s' the scan wants
    chars[:, t] = s'[l-2-t] and chars[:, max_t] = s'[l-1]
    (src/overlap_builder.cpp:846-906 reads the query right-to-left); with
    ra[j] = seq[j-(L-l)] those are static columns:
      identity:   seq[l-2-t]        = roll(flip(ra), -1)
      rc:         comp(seq[t+1])    = comp(roll(la, -1))
      reverse:    seq[t+1]          = roll(la, -1)
      complement: comp(seq[l-2-t])  = comp(roll(flip(ra), -1))
    """
    maxlen = max_t + 1
    la = _unpack_2bit(la_words, lens, maxlen, right_align=False)
    ra = _unpack_2bit(ra_words, lens, maxlen, right_align=True)
    rra_roll = jnp.roll(jnp.flip(ra, axis=1), -1, axis=1)
    la_roll = jnp.roll(la, -1, axis=1)
    group_chars = {
        GROUP_ID: lambda: rra_roll,
        GROUP_RC: lambda: _complement_ranks(la_roll),
        GROUP_REV: lambda: la_roll,
        GROUP_COMP: lambda: _complement_ranks(rra_roll),
    }
    n = lens.shape[0]
    groups = tuple(fwd_groups) + tuple(rev_groups)
    chars = jnp.concatenate([group_chars[g]() for g in groups], axis=0)
    lens_all = jnp.tile(lens, (len(groups),))
    tab = jnp.concatenate(
        [jnp.zeros(n * len(fwd_groups), jnp.int32),
         jnp.zeros(n * len(rev_groups), jnp.int32) + nblocks]
    )
    emitted, valid, final, lext = _scan_stage_a(
        max_t, min_overlap, plane, pred, length, chars, lens_all, tab
    )
    count, idx, data, lext_has_dna = _compact_blocks(emitted, valid, lext, cap)
    return count, idx, data, final, lext_has_dna


@partial(jax.jit, static_argnums=(0, 1))
def _scan_stage_a(max_t, min_overlap, plane, pred, length, chars, lens, lane_tab=None):
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
        return occ_all_fused(plane, length, i, tab)

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
        # emit only [lo, rlo, size]: hi = lo+size and rhi = rlo+size by the
        # IntervalPair size invariant, and the '$'-probe (capped) columns are
        # a closed-form function of (lo, hi, rlo) + occ_$ rebuilt on host for
        # just the emitted blocks (ops/search.py::_with_probe) — cutting the
        # scan's HBM writes and the host-link transfer to 3/8 of the naive
        # 8-column emission
        emitted = jnp.stack([lo, rlo, hi - lo], axis=-1)
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


def _slice_size(nblocks: int, cap: int) -> int:
    """Device-side slice size before transfer: pow2 buckets up to 1024, then
    4096 granules (bounded distinct shapes, at most ~46%% over-transfer for
    small counts and ~9%% for large)."""
    if nblocks <= 1024:
        p = 1
        while p < max(nblocks, 1):
            p *= 2
        return min(p, cap)
    return min(-(-nblocks // 4096) * 4096, cap)


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
            self.dfm.occ_plane = jax.device_put(self.dfm.occ_plane, repl)
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
            self.dfm.occ_plane,
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
                self.dfm.occ_plane,
                self.dfm.pred,
                jnp.int32(self.dfm.length),
                chars_d,
                lens_d,
            )
            nblocks = int(count)

        # device-side slice before transfer (pow2 buckets bound the number of
        # distinct slice shapes): only ~real blocks cross the link
        k = _slice_size(nblocks, cap)
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


def pack_reads_2bit(seqs, n: int, maxlen: int):
    """Host-side 2-bit packing of a chunk of reads, both alignments.

    Returns (la_words, ra_words, lens): (n, maxlen//16) int32 packed words
    (symbol j in bits [2j%32, 2j%32+2) of word j//16) and int32 lengths.
    Empty/padding rows get length 1 (their lanes never emit)."""
    from ..core import dna

    la = np.zeros((n, maxlen), dtype=np.uint32)
    ra = np.zeros((n, maxlen), dtype=np.uint32)
    lens = np.ones(n, dtype=np.int32)
    for i, s in enumerate(seqs):
        if not s:
            continue
        codes = dna.encode(s).astype(np.uint32) - 1
        la[i, : len(s)] = codes
        ra[i, maxlen - len(s):] = codes
        lens[i] = len(s)
    shifts = (2 * np.arange(16, dtype=np.uint32))[None, None, :]
    w = maxlen // 16
    la_w = (la.reshape(n, w, 16) << shifts).sum(axis=2, dtype=np.uint32)
    ra_w = (ra.reshape(n, w, 16) << shifts).sum(axis=2, dtype=np.uint32)
    return la_w.view(np.int32), ra_w.view(np.int32), lens


class DualScanner:
    """One scan call serves both (fwd, rev) orientation pairs: the two
    indexes' tables are stacked and each lane carries a block-table offset.
    The C arrays of the forward and reversed text are identical (same symbol
    totals), so `pred` is shared.

    Reads cross the host link 2-bit packed (la/ra alignments); the per-step
    character matrices of all orientation lane groups are derived on device
    (_scan_packed_compact).  Lane layout: fwd-index groups first, then
    rev-index groups, each with stride n."""

    def __init__(self, dfwd: DeviceFM, drev: DeviceFM, mesh=None,
                 fwd_groups=(GROUP_ID, GROUP_RC),
                 rev_groups=(GROUP_REV, GROUP_COMP)):
        assert dfwd.length == drev.length
        self.length = dfwd.length
        self.nblocks = dfwd.packed_words.shape[0]
        self.fwd_groups = tuple(fwd_groups)
        self.rev_groups = tuple(rev_groups)
        plane = jnp.concatenate([dfwd.occ_plane, drev.occ_plane], axis=0)
        self.pred = dfwd.pred
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            plane = jax.device_put(plane, repl)
            self.pred = jax.device_put(self.pred, repl)
            self._lane_sharding = NamedSharding(mesh, P("data", None))
            self._vec_sharding = NamedSharding(mesh, P("data"))
        self.plane = plane
        # start at the cap a coverage~5 short-read chunk needs: a too-small
        # cap costs a full re-scan + a fresh compile on the first chunk,
        # while an oversized cap only costs device-side scratch (transfers
        # slice to the observed count)
        self._cap = 65536

    def _put(self, la_w, ra_w, lens):
        if self.mesh is None:
            return jnp.asarray(la_w), jnp.asarray(ra_w), jnp.asarray(lens)
        return (
            jax.device_put(la_w, self._lane_sharding),
            jax.device_put(ra_w, self._lane_sharding),
            jax.device_put(lens, self._vec_sharding),
        )

    def _run(self, cap, max_t, min_overlap, la_d, ra_d, lens_d):
        return _scan_packed_compact(
            max_t, min_overlap, cap, self.fwd_groups, self.rev_groups,
            self.plane, self.pred,
            jnp.int32(self.length), jnp.int32(self.nblocks),
            la_d, ra_d, lens_d,
        )

    def dispatch(self, seqs, n: int, maxlen: int, min_overlap: int):
        """All orientation lanes of a chunk of (at most n) reads in one
        launch.  maxlen must be a multiple of 16 and > the longest read."""
        la_w, ra_w, lens = pack_reads_2bit(seqs, n, maxlen)
        la_d, ra_d, lens_d = self._put(la_w, ra_w, lens)
        max_t = maxlen - 1
        cap = self._cap
        out = self._run(cap, max_t, min_overlap, la_d, ra_d, lens_d)
        return (out, cap, n, max_t, min_overlap, la_d, ra_d, lens_d)

    def collect(self, handle):
        (count, idx, data, final, lext), cap, n, max_t, min_overlap, la_d, ra_d, lens_d = handle
        nblocks = int(count)
        while nblocks > cap:
            cap = _next_pow2(nblocks)
            self._cap = cap
            count, idx, data, final, lext = self._run(
                cap, max_t, min_overlap, la_d, ra_d, lens_d
            )
            nblocks = int(count)

        num_lanes = n * (len(self.fwd_groups) + len(self.rev_groups))
        half = n * len(self.fwd_groups)
        k = _slice_size(nblocks, cap)
        packed = np.asarray(_pack_outputs(k, idx, data, final))
        idx = packed[:k][:nblocks].astype(np.int64)
        data3 = packed[k : 4 * k].reshape(k, 3)[:nblocks]
        final4 = packed[4 * k :].reshape(num_lanes, 4)
        # reconstruct [lo, hi, rlo, rhi] from [lo, rlo, size]
        data = np.empty((nblocks, 4), dtype=np.int64)
        data[:, 0] = data3[:, 0]
        data[:, 1] = data3[:, 0] + data3[:, 2]
        data[:, 2] = data3[:, 1]
        data[:, 3] = data3[:, 1] + data3[:, 2]
        lane = idx % num_lanes
        t = idx // num_lanes
        order = np.lexsort((t, lane))
        lane, t, data = lane[order], t[order], data[order]
        # split back into the fwd and rev scanner views
        is_f = lane < half
        f_view = (lane[is_f], t[is_f], data[is_f], final4[:half])
        r_view = (lane[~is_f] - half, t[~is_f], data[~is_f], final4[half:])
        return f_view, r_view
