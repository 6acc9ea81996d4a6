#!/usr/bin/env python3
"""Profile the overlap pipeline: device scan vs transfer vs native stage B/C.

Usage: python benchmark/profile_overlap.py [num_reads]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def simulate_reads(num_reads=10_000, readlen=100, genome_size=200_000, seed=7):
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, genome_size, dtype=np.int8)
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
    starts = rng.integers(0, genome_size - readlen, num_reads)
    return [
        alphabet[genome[s : s + readlen]].tobytes().decode() for s in starts
    ]


def main():
    num_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    readlen = 100
    min_overlap = 45

    from siga_tpu.core import dna
    from siga_tpu.index import sa as sa_mod
    from siga_tpu.index.fm import FMIndex
    from siga_tpu.io.fastx import DNASeq
    from siga_tpu.overlap.builder import OverlapBuilder
    from siga_tpu.ops import search as search_mod
    from siga_tpu.ops.fm_device import DeviceFM, DualScanner

    import jax
    import jax.numpy as jnp

    t0 = time.time()
    _ = int(jnp.zeros((8,)).sum())
    print(f"backend init: {time.time()-t0:.2f}s", flush=True)

    seqs = simulate_reads(num_reads, readlen)
    t0 = time.time()
    fwd_codes, _p, ns = sa_mod.build_index_arrays(seqs, use_device=True)
    rev_codes, _rp, _ = sa_mod.build_index_arrays([s[::-1] for s in seqs], use_device=True)
    print(f"index build: {time.time()-t0:.2f}s", flush=True)

    fmi = FMIndex(fwd_codes, ns)
    rfmi = FMIndex(rev_codes, ns)
    builder = OverlapBuilder(fmi, rfmi)
    records = [DNASeq(name=f"r{i}", seq=s) for i, s in enumerate(seqs)]

    t0 = time.time()
    dfwd = DeviceFM(fmi)
    drev = DeviceFM(rfmi)
    scanner = DualScanner(dfwd, drev)
    print(f"DeviceFM setup: {time.time()-t0:.2f}s", flush=True)

    chunk_reads = min(search_mod.CHUNK_READS, num_reads)
    chunk = records[:chunk_reads]
    seqs_c = [r.seq for r in chunk]
    maxlen = 128
    n = chunk_reads

    # warmup/compile
    t0 = time.time()
    h = scanner.dispatch(seqs_c, n, maxlen, min_overlap)
    scanner.collect(h)
    print(f"scan compile+first run: {time.time()-t0:.2f}s  (cap={scanner._cap})", flush=True)

    # timed: dispatch only (host pack + transfer + async launch)
    t0 = time.time()
    h = scanner.dispatch(seqs_c, n, maxlen, min_overlap)
    t_dispatch = time.time() - t0
    # device completion: block on the count scalar
    (out, *_rest) = h
    t0 = time.time()
    jax.block_until_ready(out)
    t_device = time.time() - t0
    t0 = time.time()
    f_view, r_view = scanner.collect(h)
    t_collect = time.time() - t0
    nblk = len(f_view[0]) + len(r_view[0])
    print(
        f"scan: dispatch {t_dispatch*1e3:.0f}ms  device-wait {t_device*1e3:.0f}ms  "
        f"collect {t_collect*1e3:.0f}ms  ({nblk} blocks, {chunk_reads} reads)",
        flush=True,
    )

    # pure device time: re-run with inputs already on device, block
    (out2, cap, fcap, _n, max_t, mo, la_d, lens_d) = scanner.dispatch(
        seqs_c, n, maxlen, min_overlap
    )
    jax.block_until_ready(out2)
    for trial in range(3):
        t0 = time.time()
        out3 = scanner._run(cap, fcap, max_t, mo, la_d, lens_d)
        jax.block_until_ready(out3)
        print(f"pure device scan (inputs resident): {(time.time()-t0)*1e3:.0f}ms", flush=True)

    # native stage B/C
    proc = search_mod._native_chunk_processor(builder)
    f_lane, f_t, f_data, f_cl, f_cr, f_sub = f_view
    r_lane, r_t, r_data, r_cl, r_cr, r_sub = r_view
    f_data = search_mod._with_probe(fmi, f_data)
    r_data = search_mod._with_probe(rfmi, r_data)
    f_fi = search_mod._final8_from_cands(2 * n, f_cl, f_cr)
    r_fi = search_mod._final8_from_cands(2 * n, r_cl, r_cr)
    lens_chunk = np.array([len(r.seq) for r in chunk], dtype=np.int64)
    f_starts = np.searchsorted(f_lane, np.arange(2 * n + 1))
    r_starts = np.searchsorted(r_lane, np.arange(2 * n + 1))
    for trial in range(3):
        t0 = time.time()
        outs, substr, failed = proc.run(
            lens_chunk, True, True, n,
            (f_starts, f_t, f_data, f_fi, f_sub),
            (r_starts, r_t, r_data, r_fi, r_sub),
        )
        print(f"native stage B/C: {(time.time()-t0)*1e3:.0f}ms", flush=True)

    # full pipeline timed
    t0 = time.time()
    cnt = 0
    for _hit in search_mod.batch_overlap_hits(builder, records, min_overlap):
        cnt += 1
    el = time.time() - t0
    print(f"full batch_overlap_hits: {el:.2f}s  ({cnt/el:.0f} reads/s)", flush=True)

    # serialization cost
    hits = list(search_mod.batch_overlap_hits(builder, records, min_overlap))
    t0 = time.time()
    total = sum(len(h.serialize()) for h in hits)
    print(f"serialize all hits: {time.time()-t0:.2f}s ({total} bytes)", flush=True)


if __name__ == "__main__":
    main()
