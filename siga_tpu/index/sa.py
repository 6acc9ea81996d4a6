"""Suffix-array construction by batched prefix doubling.

The reference default builder ("sais2",
/root/reference/src/suffix_array_builder.cpp:472-674) suffix-sorts the
concatenation of all reads (ranks $=0<A<C<G<T, one sentinel per read) with
sentinel-vs-sentinel ties broken by text position
(src/suffix_array_builder.cpp:579-592).  That order is identical to the suffix
array of the text where the t-th sentinel is a distinct symbol `t` and base
rank r maps to `S-1+r` (S = number of sentinels): every suffix comparison
resolves at or before the first sentinel, which is unique.

This file implements that order two ways:
  * `suffix_array_numpy` — host prefix doubling via np.lexsort (correctness
    anchor + small-input path);
  * `suffix_array_jax`   — the same algorithm as ~log2(readlen) rounds of
    64-bit key sorts on the TPU, static shapes, no data-dependent control
    flow beyond a host-side round count.

Both return the suffix array over the concatenated text (dtype int).  The BWT
and the `.sai` permutation are derived in `bwt_from_sa` / `sai_perm_from_sa`:
BWT char = '$' if sa[i]==0 or the preceding char is a sentinel, else the
preceding char (src/suffix_array_builder.cpp:548-553); the `.sai` permutation
keeps whole-read suffixes in SA order (src/suffix_array_builder.cpp:523-531).
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from ..core import dna


def concat_reads(seqs: Sequence[str]) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Concatenate reads with one sentinel (rank 0) after each.

    Returns (codes, starts, lengths): codes is the rank text (uint8),
    starts[i] the text offset of read i, lengths[i] its length.
    """
    lengths = np.array([len(s) for s in seqs], dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lengths + 1)[:-1]))
    n = int((lengths + 1).sum())
    # one pass over the joined bytes ('$' separators map to rank 0)
    joined = "$".join(seqs) + "$"
    codes = dna.RANK_LUT[np.frombuffer(joined.encode(), dtype=np.uint8)].copy()
    assert codes.size == n
    return codes, starts, lengths


def _pad_size(n_real: int) -> int:
    """Pad the text to a bounded set of shapes: pow2 up to 1M, then multiples
    of pow2/8 (at most 12.5% padding waste, <=8 distinct shapes per octave).
    Pow2 padding above ~64M wasted up to 1.5x HBM during the sort (enough to
    OOM a 90M-char build on one chip)."""
    n = 1024
    while n < n_real and n < (1 << 20):
        n *= 2
    if n_real <= n:
        return n
    step = 1 << 17
    while step * 8 < n_real:
        step *= 2
    return ((n_real + step - 1) // step) * step


def _initial_ranks(codes: np.ndarray) -> np.ndarray:
    """Distinct-sentinel initial ranks: t-th sentinel -> t, base r -> S-1+r."""
    is_sent = codes == 0
    sent_idx = np.cumsum(is_sent) - 1
    s = int(is_sent.sum())
    return np.where(is_sent, sent_idx, (s - 1) + codes.astype(np.int64))


def suffix_array_numpy(codes: np.ndarray) -> np.ndarray:
    """Host prefix-doubling suffix array of the sentinel-separated rank text."""
    n = codes.size
    rank = _initial_ranks(codes)
    order = np.argsort(rank, kind="stable")
    if n <= 1:
        return order
    h = 1
    while True:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - h] = rank[h:]
        order = np.lexsort((key2, rank))
        r1 = rank[order]
        r2 = key2[order]
        boundary = np.empty(n, dtype=np.int64)
        boundary[0] = 0
        boundary[1:] = (r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])
        new_rank = np.cumsum(boundary)
        if new_rank[-1] == n - 1:
            return order
        rank_next = np.empty(n, dtype=np.int64)
        rank_next[order] = new_rank
        rank = rank_next
        h *= 2


def suffix_array_jax(codes: np.ndarray) -> np.ndarray:
    """Device suffix array (gram-seeded batched prefix doubling, B=1)."""
    import jax.numpy as jnp

    n_real = int(codes.size)
    if n_real <= 1:
        return np.arange(n_real, dtype=np.int64)
    rounds = _sa_rounds(_max_span(codes))
    n = _pad_size(n_real)
    order = _sa_build_v2(rounds, n, jnp.asarray(_pad_codes(codes, n)[None, :]))
    out = np.asarray(order[0], dtype=np.int64)
    return out[:n_real] if n > n_real else out


from functools import partial as _partial

GRAM = 16  # seeding width: one 2-word-key sort ranks 16-symbol prefixes
_PAD_SYM = 7  # padding symbol, sorts after every real rank


def _sa_rounds(max_span: int) -> int:
    """Doubling rounds after the GRAM-wide seed: ranks are distinct once
    GRAM * 2^rounds >= the longest distance to the next sentinel."""
    r = 0
    while (GRAM << r) < max_span:
        r += 1
    return r


@_partial(__import__("jax").jit, static_argnums=(0, 1))
def _sa_build_v2(rounds, n, codes):
    """Batched suffix sort: codes uint8 [B, n] (ranks 0..4, pad=_PAD_SYM) ->
    suffix order int32 [B, n].  All int32 (x64 is off; TPU int64 is emulated).

    Round structure (all rows sorted together in each lax.sort call; payloads
    ride the sort network instead of permutation gathers, which are
    issue-rate-bound on TPU):
      seed: one stable 2-key sort on the 16-symbol gram (3 bits/symbol,
        10+6 symbols across two int32 words).  The gram zero-fills fields
        after the first sentinel, so suffix comparisons the reference
        resolves AT a sentinel (src/suffix_array_builder.cpp:579-592: '$'
        ties break by text position) compare equal here; stability puts
        them in position order (= sentinel-id order), and the has_term flag
        forces distinct ranks for those (equal-gram runs are homogeneous: a
        terminator gram always carries a 0 field, a pure-base gram never
        does).
      doubling: one 2-key (rank, next-rank) sort + one unsort per round —
        the pairs tie exactly where the new rank ties, so neither sort needs
        stability.
      final round: ranks are distinct by construction, so the (rank,
        next-rank) sort IS the suffix order — the unsort and the trailing
        order-by-rank sort are skipped.
    """
    import jax
    import jax.numpy as jnp

    B = codes.shape[0]
    sym = codes.astype(jnp.int32)
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (B, n))
    pos = jnp.arange(n, dtype=jnp.int32)[None, :]

    g_hi = jnp.zeros((B, n), dtype=jnp.int32)
    g_lo = jnp.zeros((B, n), dtype=jnp.int32)
    alive = jnp.ones((B, n), dtype=bool)
    has_term = jnp.zeros((B, n), dtype=bool)
    for k in range(GRAM):
        w = jnp.where(pos + k < n, jnp.roll(sym, -k, axis=-1), _PAD_SYM)
        v = jnp.where(alive, w, 0)
        if k < 10:
            g_hi = (g_hi << 3) | v
        else:
            g_lo = (g_lo << 3) | v
        has_term = has_term | (w == 0)
        alive = alive & (w != 0)
    needs_distinct = (has_term | (sym == _PAD_SYM)).astype(jnp.int32)

    def unsort(order, payload):
        # back to position order: co-sort by the (distinct) position ids —
        # no random scatter
        _, out = jax.lax.sort((order, payload), dimension=-1, num_keys=1)
        return out

    def rank_sorted(b1, b2):
        boundary = jnp.concatenate(
            [jnp.zeros((B, 1), dtype=jnp.int32), (b1 | b2).astype(jnp.int32)],
            axis=-1,
        )
        return jnp.cumsum(boundary, axis=-1, dtype=jnp.int32)

    hi_s, lo_s, idx_s, nd_s = jax.lax.sort(
        (g_hi, g_lo, idx, needs_distinct), dimension=-1, num_keys=2,
        is_stable=True,
    )
    new_rank = rank_sorted(
        (hi_s[:, 1:] != hi_s[:, :-1]) | (lo_s[:, 1:] != lo_s[:, :-1]),
        nd_s[:, 1:] == 1,
    )
    rank = unsort(idx_s, new_rank)

    def round_sort(r, rank):
        h = jnp.asarray(GRAM, jnp.int32) << r
        key2 = jnp.where(pos + h < n, jnp.roll(rank, -h, axis=-1), -1)
        return jax.lax.sort((rank, key2, idx), dimension=-1, num_keys=2)

    def body(r, rank):
        r_s, k2_s, i_s = round_sort(r, rank)
        new_rank = rank_sorted(
            r_s[:, 1:] != r_s[:, :-1], k2_s[:, 1:] != k2_s[:, :-1]
        )
        return unsort(i_s, new_rank)

    if rounds == 0:
        _, order = jax.lax.sort((rank, idx), dimension=-1, num_keys=1)
        return order
    rank = jax.lax.fori_loop(0, rounds - 1, body, rank)
    _, _, order = round_sort(rounds - 1, rank)
    return order


def _pad_codes(codes: np.ndarray, n: int) -> np.ndarray:
    out = np.full(n, _PAD_SYM, dtype=np.uint8)
    out[: codes.size] = codes
    return out


def _max_span(codes: np.ndarray) -> int:
    sent_pos = np.flatnonzero(codes == 0)
    prev = np.concatenate(([-1], sent_pos[:-1]))
    return int((sent_pos - prev).max())


def bwt_from_sa(codes: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """BWT rank codes in SA order (sentinels collapse to rank 0)."""
    prev = np.where(sa == 0, 0, codes[np.maximum(sa - 1, 0)].astype(np.int64))
    return np.where(sa == 0, 0, prev).astype(np.uint8)


def sai_perm_from_sa(sa: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Read ids of whole-read suffixes, in SA order (the .sai permutation)."""
    n = sa.size
    is_start = np.zeros(n, dtype=bool)
    is_start[starts] = True
    read_of_start = np.zeros(n, dtype=np.int64)
    read_of_start[starts] = np.arange(starts.size)
    mask = is_start[sa]
    return read_of_start[sa[mask]]


@_partial(__import__("jax").jit, static_argnums=(0, 1, 2, 3))
def _sa_bwt_perm_v2(rounds, n, n_real, num_strings, codes, starts):
    """Suffix sort + BWT/perm derivation in one device program: only BWT
    bytes (1/char) and the read permutations cross the host link."""
    import jax.numpy as jnp

    order = _sa_build_v2(rounds, n, codes)  # [B, n] int32
    sa = order[:, :n_real]
    codes_real = codes[:, :n_real]
    prev = jnp.take_along_axis(codes_real, jnp.clip(sa - 1, 0, n_real - 1), axis=-1)
    bwt = jnp.where(sa == 0, jnp.uint8(0), prev)
    # read-start membership and read ids via searchsorted against the small
    # starts table (avoids a 4-byte/char read-id map on device)
    B = codes.shape[0]
    idx = jnp.searchsorted(starts, sa.reshape(-1)).reshape(B, n_real)
    s = starts.shape[0]
    hit = (idx < s) & (starts[jnp.clip(idx, 0, s - 1)] == sa)
    # each row has exactly num_strings whole-read suffixes; row-major nonzero
    # keeps rows contiguous and ascending
    (pos_idx,) = jnp.nonzero(hit.reshape(-1), size=B * num_strings, fill_value=0)
    perm = idx.reshape(-1)[pos_idx].reshape(B, num_strings)
    return bwt, perm


def _device_index_build(texts: List[np.ndarray], starts: np.ndarray, num_strings: int):
    """Run the batched device build over B rank texts of equal length."""
    import jax.numpy as jnp

    n_real = int(texts[0].size)
    rounds = max(_sa_rounds(_max_span(c)) for c in texts)
    n = _pad_size(n_real)
    codes = np.stack([_pad_codes(c, n) for c in texts])
    bwt, perm = _sa_bwt_perm_v2(
        rounds, n, n_real, num_strings,
        jnp.asarray(codes), jnp.asarray(starts.astype(np.int32)),
    )
    bwt = np.asarray(bwt, dtype=np.uint8)
    perm = np.asarray(perm, dtype=np.int64)
    return [(bwt[b], perm[b]) for b in range(len(texts))]


def build_index_arrays(
    seqs: Sequence[str], use_device: bool = False
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Build (bwt_codes, sai_perm, num_strings) for a read set."""
    codes, starts, _lengths = concat_reads(seqs)
    if use_device:
        (one,) = _device_index_build([codes], starts, len(seqs))
        return one[0], one[1], len(seqs)
    sa = suffix_array_numpy(codes)
    return bwt_from_sa(codes, sa), sai_perm_from_sa(sa, starts), len(seqs)


def build_index_arrays_pair(
    seqs: Sequence[str], use_device: bool = True
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, int]:
    """Build forward AND reversed-read indexes in one batched device program
    (the `siga index` product: .sai/.bwt + .rsai/.rbwt, src/indexer.cpp:51-65).

    Returns (fwd_bwt, fwd_perm, rev_bwt, rev_perm, num_strings)."""
    codes, starts, _lengths = concat_reads(seqs)
    rcodes, rstarts, _ = concat_reads([s[::-1] for s in seqs])
    assert np.array_equal(starts, rstarts)
    if not use_device:
        sa = suffix_array_numpy(codes)
        rsa = suffix_array_numpy(rcodes)
        return (
            bwt_from_sa(codes, sa), sai_perm_from_sa(sa, starts),
            bwt_from_sa(rcodes, rsa), sai_perm_from_sa(rsa, starts),
            len(seqs),
        )
    (f, r) = _device_index_build([codes, rcodes], starts, len(seqs))
    return f[0], f[1], r[0], r[1], len(seqs)
