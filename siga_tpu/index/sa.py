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
    """Pad the text to a bounded set of shapes: pow2 up to 4M, then multiples
    of 4M.  Pow2 padding above ~64M wasted up to 1.5x HBM during the sort
    (enough to OOM a 90M-char build on one chip)."""
    n = 1024
    while n < n_real and n < (1 << 22):
        n *= 2
    if n_real <= n:
        return n
    step = 1 << 22
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
    """Device prefix-doubling suffix array (jnp; one 64-bit key sort per round).

    The number of rounds is ceil(log2(max distance to the next sentinel)) + 1,
    computed on host so the device program has static shape per round count.
    """
    import jax
    import jax.numpy as jnp

    n_real = int(codes.size)
    if n_real <= 1:
        return np.arange(n_real, dtype=np.int64)

    # max rounds: ranks become distinct once h exceeds the longest read span
    sent_pos = np.flatnonzero(codes == 0)
    prev = np.concatenate(([-1], sent_pos[:-1]))
    max_span = int((sent_pos - prev).max())  # read length + 1
    rounds = max(1, int(np.ceil(np.log2(max(2, max_span)))) + 1)

    # Pad the text to a bounded shape bucket so the sort compiles once per
    # bucket.  Pad symbols get distinct initial ranks above every real rank
    # and increasing with position, so they occupy the SA tail in position
    # order and never perturb the real suffix order.
    n = _pad_size(n_real)

    init = _initial_ranks(codes)
    top = int(init.max()) + 1
    padded = np.empty(n, dtype=np.int64)
    padded[:n_real] = init
    padded[n_real:] = top + np.arange(n - n_real)

    itype = jnp.int32 if n < 2**31 else jnp.int64
    # convert on host: uploading int64 then casting would hold an extra
    # 8-byte/char temp on device through the first sort round
    host_ranks = padded.astype(np.int32) if itype == jnp.int32 else padded
    order = _prefix_doubling(rounds, n, jnp.asarray(host_ranks))
    out = np.asarray(order, dtype=np.int64)
    return out[:n_real] if n > n_real else out


from functools import partial as _partial


@_partial(__import__("jax").jit, static_argnums=(0, 1))
def _prefix_doubling(rounds, n, rank):
    """All doubling rounds in one device program (a host sync per round costs
    a full tunnel round trip).  Ranks are provably distinct after `rounds`
    doublings; converged rounds are no-ops on already-distinct ranks."""
    import jax
    import jax.numpy as jnp

    itype = rank.dtype
    idx = jnp.arange(n, dtype=itype)

    def body(r, carry):
        rank, order = carry
        h = jnp.asarray(1, itype) << r
        key2 = jnp.where(idx + h < n, jnp.roll(rank, -h), -1)
        # lexicographic (rank, key2) sort as two stable single-key argsorts
        # (LSD radix): XLA's single-key sort is fast everywhere, variadic
        # multi-key sort is not.
        ord2 = jnp.argsort(key2, stable=True)
        order = ord2[jnp.argsort(rank[ord2], stable=True)]
        r1 = rank[order]
        r2 = key2[order]
        boundary = jnp.concatenate(
            [
                jnp.zeros(1, dtype=itype),
                ((r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])).astype(itype),
            ]
        )
        new_rank = jnp.cumsum(boundary)
        rank = jnp.zeros(n, dtype=itype).at[order].set(new_rank)
        return rank, order

    _, order = jax.lax.fori_loop(
        0, rounds, body, (rank, jnp.arange(n, dtype=itype))
    )
    return order


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


def build_index_arrays(
    seqs: Sequence[str], use_device: bool = False
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Build (bwt_codes, sai_perm, num_strings) for a read set."""
    codes, starts, _lengths = concat_reads(seqs)
    if use_device:
        return _build_index_arrays_device(codes, starts, len(seqs))
    sa = suffix_array_numpy(codes)
    return bwt_from_sa(codes, sa), sai_perm_from_sa(sa, starts), len(seqs)


def _build_index_arrays_device(codes, starts, num_strings):
    """Device SA build with BWT/perm derivation on device too: only the BWT
    bytes (1/char) and the read permutation cross the host link, not the
    4-8 byte/char suffix array."""
    import jax.numpy as jnp

    n_real = int(codes.size)
    sent_pos = np.flatnonzero(codes == 0)
    prev = np.concatenate(([-1], sent_pos[:-1]))
    max_span = int((sent_pos - prev).max())
    rounds = max(1, int(np.ceil(np.log2(max(2, max_span)))) + 1)

    n = _pad_size(n_real)
    init = _initial_ranks(codes)
    top = int(init.max()) + 1
    padded = np.empty(n, dtype=np.int64)
    padded[:n_real] = init
    padded[n_real:] = top + np.arange(n - n_real)

    itype = jnp.int32 if n < 2**31 else jnp.int64
    host_ranks = padded.astype(np.int32) if itype == jnp.int32 else padded
    order = _prefix_doubling(rounds, n, jnp.asarray(host_ranks))

    sa = order[:n_real]
    codes_d = jnp.asarray(codes)  # uint8, 1 byte/char
    bwt = jnp.where(
        sa == 0, jnp.uint8(0), codes_d[jnp.clip(sa - 1, 0, n_real - 1)]
    )
    # read-start membership and read ids via searchsorted against the small
    # starts table (avoids a 4-byte/char read-id map on device)
    starts_d = jnp.asarray(starts.astype(np.int32))
    idx = jnp.searchsorted(starts_d, sa.astype(jnp.int32))
    hit = (idx < starts_d.shape[0]) & (
        starts_d[jnp.clip(idx, 0, starts_d.shape[0] - 1)] == sa.astype(jnp.int32)
    )
    (pos_idx,) = jnp.nonzero(hit, size=num_strings, fill_value=0)
    perm = idx[pos_idx]
    return (
        np.asarray(bwt, dtype=np.uint8),
        np.asarray(perm, dtype=np.int64),
        num_strings,
    )
