"""Batched overlap detection: device stage-A scan + host finish.

Stage A (the O(reads x readlen) backward-search with '$'-probes) runs on
device via ops/fm_device.py — all reads of a chunk advance one backward-search
step per scan tick, 2 occ gathers per lane per tick shared between probe and
update.  The irregular stages (submaximal filtering, irreducible extension)
reuse the exact host implementations in overlap/builder.py, so both paths emit
identical blocks.
"""
from __future__ import annotations

from typing import Iterator, List, Sequence

import numpy as np

from ..core import dna
from ..index.fm import FMIndex, IntervalPair
from ..overlap.builder import (
    AF_PREFIX_PREFIX,
    AF_PREFIX_SUFFIX,
    AF_SUFFIX_PREFIX,
    AF_SUFFIX_SUFFIX,
    Hit,
    OverlapBlock,
    OverlapBuilder,
    OverlapResult,
)
from .fm_device import DeviceFM, StageAScanner

CHUNK_READS = 2048


def _pack_lanes(seqs: Sequence[str]) -> (np.ndarray, np.ndarray):
    maxlen = max(len(s) for s in seqs)
    out = np.zeros((len(seqs), maxlen), dtype=np.int32)
    lens = np.zeros(len(seqs), dtype=np.int64)
    for i, s in enumerate(seqs):
        out[i, : len(s)] = dna.encode(s)
        lens[i] = len(s)
    return out, lens


def _blocks_from_scan(emitted, valid, af, lane, min_overlap) -> List[OverlapBlock]:
    """Reconstruct OverlapBlocks in ascending-length order (matching the host
    finder's emission order)."""
    blocks = []
    ts = np.flatnonzero(valid[:, lane])
    for t in ts:
        e = emitted[t, lane]
        blocks.append(
            OverlapBlock(
                IntervalPair(int(e[0]), int(e[1]), int(e[2]), int(e[3])),
                IntervalPair(int(e[4]), int(e[5]), int(e[6]), int(e[7])),
                int(t) + 1,
                af,
            )
        )
    return blocks


def _containment_from_scan(
    final_row, lext_row, seqlen, af, rindex: FMIndex, result: OverlapResult
):
    """Containment/substring classification from a lane's full-length interval
    (host side: needs the other index's occ for rext and the final '$'
    right-update)."""
    flo, fhi, frlo, frhi, plo, phi, prlo, prhi = (int(v) for v in final_row)
    raw = IntervalPair(flo, fhi, frlo, frhi)
    rext = rindex.interval_ext(frlo, frhi)
    if lext_row[1:].sum() > 0 or rext[1:].sum() > 0:
        result.substring = True
        return None
    probe = IntervalPair(plo, phi, prlo, prhi)
    if probe.valid():
        probe.update_right(0, rindex)
        assert probe.valid()
        return OverlapBlock(probe, raw, seqlen, af)
    return None


def batch_overlap_hits(
    builder: OverlapBuilder, records, min_overlap: int
) -> Iterator[Hit]:
    """Yield one Hit per read, device stage A + host stages B/C."""
    fmi, rfmi = builder.fmi, builder.rfmi
    dfwd = DeviceFM(fmi)
    drev = DeviceFM(rfmi)
    fwd_scanner = StageAScanner(dfwd)
    rev_scanner = StageAScanner(drev)

    for start in range(0, len(records), CHUNK_READS):
        chunk = records[start : start + CHUNK_READS]
        seqs = [r.seq for r in chunk]
        n = len(seqs)

        # forward-index lanes: [seq, rc(seq)]; reverse-index lanes:
        # [reverse(seq), complement(seq)]
        fwd_lane_seqs = list(seqs)
        rev_lane_seqs = [s[::-1] for s in seqs]
        if builder.rc:
            fwd_lane_seqs += [dna.reverse_complement(s) for s in seqs]
            rev_lane_seqs += [dna.complement(s) for s in seqs]

        f_ranks, f_lens = _pack_lanes(fwd_lane_seqs)
        r_ranks, r_lens = _pack_lanes(rev_lane_seqs)
        f_em, f_va, f_fi, f_le = fwd_scanner.scan(f_ranks, f_lens, min_overlap)
        r_em, r_va, r_fi, r_le = rev_scanner.scan(r_ranks, r_lens, min_overlap)

        for k, rec in enumerate(chunk):
            seqlen = len(rec.seq)
            result = OverlapResult()
            hit = Hit(idx=start + k)

            suffixfwd = _blocks_from_scan(f_em, f_va, AF_SUFFIX_PREFIX, k, min_overlap)
            prefixrev = _blocks_from_scan(r_em, r_va, AF_PREFIX_SUFFIX, k, min_overlap)
            containfwd: List[OverlapBlock] = []
            containrev: List[OverlapBlock] = []
            prefixfwd: List[OverlapBlock] = []
            suffixrev: List[OverlapBlock] = []

            cb = _containment_from_scan(
                f_fi[k], f_le[k], seqlen, AF_SUFFIX_PREFIX, rfmi, result
            )
            if cb is not None:
                containfwd.append(cb)
            cb = _containment_from_scan(
                r_fi[k], r_le[k], seqlen, AF_PREFIX_SUFFIX, fmi, result
            )
            if cb is not None:
                containrev.append(cb)

            if builder.rc:
                prefixfwd = _blocks_from_scan(
                    f_em, f_va, AF_PREFIX_PREFIX, n + k, min_overlap
                )
                suffixrev = _blocks_from_scan(
                    r_em, r_va, AF_SUFFIX_SUFFIX, n + k, min_overlap
                )
                cb = _containment_from_scan(
                    f_fi[n + k], f_le[n + k], seqlen, AF_PREFIX_PREFIX, rfmi, result
                )
                if cb is not None:
                    containfwd.append(cb)
                cb = _containment_from_scan(
                    r_fi[n + k], r_le[n + k], seqlen, AF_SUFFIX_SUFFIX, fmi, result
                )
                if cb is not None:
                    containrev.append(cb)

            result = builder.finish(
                seqlen,
                result,
                suffixfwd,
                suffixrev,
                prefixfwd,
                prefixrev,
                containfwd,
                containrev,
                hit.blocks,
            )
            hit.substring = result.substring
            yield hit
