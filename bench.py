#!/usr/bin/env python3
"""Benchmark: overlap-detection reads/sec on a simulated read set.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The primary metric (BASELINE.md) is overlap-detection reads/sec/chip.  The
baseline estimate for the reference on a 32-core CPU comes from the measured
throughput of SGA-family FM-index overlap on short reads (~2-4k reads/s/core
at 100bp, minOverlap~45; no published numbers exist — docs say "Comming
soon", /root/reference/docs/index.md:136-139), i.e. ~100k reads/s at 32
cores.  vs_baseline is measured/(that estimate).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_READS_PER_SEC = 100_000.0  # est. reference @ 32-core CPU (see above)


def simulate_reads(num_reads=10_000, readlen=100, genome_size=200_000, seed=7):
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, genome_size, dtype=np.int8)
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
    starts = rng.integers(0, genome_size - readlen, num_reads)
    seqs = []
    for s in starts:
        chunk = alphabet[genome[s : s + readlen]].tobytes().decode()
        seqs.append(chunk)
    return seqs


def main():
    num_reads = int(os.environ.get("BENCH_READS", "10000"))
    readlen = int(os.environ.get("BENCH_READLEN", "100"))
    min_overlap = int(os.environ.get("BENCH_MIN_OVERLAP", "45"))

    from siga_tpu.index import sa as sa_mod
    from siga_tpu.index.fm import FMIndex
    from siga_tpu.io.fastx import DNASeq
    from siga_tpu.overlap.builder import OverlapBuilder
    from siga_tpu.ops.search import batch_overlap_hits

    seqs = simulate_reads(num_reads, readlen)

    # pay TPU backend init (can take minutes through the tunnel) before timing
    import jax.numpy as jnp

    _ = int(jnp.zeros((8,)).sum())

    t0 = time.time()
    fwd_codes, _perm, ns = sa_mod.build_index_arrays(seqs, use_device=True)
    rev_codes, _rperm, _ = sa_mod.build_index_arrays(
        [s[::-1] for s in seqs], use_device=True
    )
    index_time = time.time() - t0

    fmi = FMIndex(fwd_codes, ns)
    rfmi = FMIndex(rev_codes, ns)
    builder = OverlapBuilder(fmi, rfmi)
    records = [DNASeq(name=f"r{i}", seq=s) for i, s in enumerate(seqs)]

    # warmup (compile) over the full set: the timed pass then reuses every
    # compiled shape (chunk tails produce different block-count slice shapes)
    for _hit in batch_overlap_hits(builder, records, min_overlap):
        pass

    t0 = time.time()
    n = 0
    for _hit in batch_overlap_hits(builder, records, min_overlap):
        n += 1
    elapsed = time.time() - t0
    reads_per_sec = n / elapsed

    print(
        json.dumps(
            {
                "metric": "overlap_reads_per_sec",
                "value": round(reads_per_sec, 1),
                "unit": "reads/s",
                "vs_baseline": round(reads_per_sec / BASELINE_READS_PER_SEC, 3),
                "detail": {
                    "num_reads": n,
                    "readlen": readlen,
                    "min_overlap": min_overlap,
                    "index_build_sec": round(index_time, 2),
                    "overlap_sec": round(elapsed, 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
