#!/usr/bin/env python3
"""Benchmark: overlap-detection reads/sec on a simulated read set.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The primary metric (BASELINE.md) is overlap-detection reads/sec/chip, measured
three ways so the number is honest:
  * engine        — batch_overlap_hits: device stage A + native stage B/C,
                    warm (the compiled shapes are reused), hits not serialized;
  * end_to_end    — the full `siga overlap` command: FM-index load, engine,
                    .hits.gz write, VT/ED ASQG emission;
  * index_build   — fwd+rev device index build (one batched program), warm.

The baseline estimate for the reference on a 32-core CPU comes from the
measured throughput of SGA-family FM-index overlap on short reads
(~2-4k reads/s/core at 100bp, minOverlap~45; no published numbers exist —
"Comming soon", /root/reference/docs/index.md:136-139), i.e. ~100k reads/s at
32 cores.  vs_baseline is engine/(that estimate).

Roofline context: the stage-A scan is random-gather bound, not FLOP bound —
each backward-search step gathers two 68-byte occ-plane rows per lane
(4 orientation lanes/read).  occ_gbps reports the achieved gather bandwidth
over the engine pass against the ~819 GB/s v5e HBM peak (hbm_frac); the gap
is gather issue rate, the known ceiling of this op on TPU.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_READS_PER_SEC = 100_000.0  # est. reference @ 32-core CPU (see above)
HBM_PEAK_GBPS = 819.0  # TPU v5e


def simulate_reads(num_reads=10_000, readlen=100, genome_size=200_000, seed=7):
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, genome_size, dtype=np.int8)
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
    starts = rng.integers(0, genome_size - readlen, num_reads)
    return [
        alphabet[genome[s : s + readlen]].tobytes().decode() for s in starts
    ]


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

    # index build: first run may compile (persistent cache), second is warm
    t0 = time.time()
    out = sa_mod.build_index_arrays_pair(seqs, use_device=True)
    index_cold = time.time() - t0
    t0 = time.time()
    fwd_codes, _perm, rev_codes, _rperm, ns = sa_mod.build_index_arrays_pair(
        seqs, use_device=True
    )
    index_warm = time.time() - t0
    del out

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
    engine_sec = time.time() - t0
    engine_rps = n / engine_sec

    # end-to-end `siga overlap` command (FM load + engine + hits + VT/ED)
    import gzip
    import tempfile

    from siga_tpu import cli

    cmd_rps = None
    with tempfile.TemporaryDirectory() as td:
        prefix = os.path.join(td, "reads")
        with open(prefix + ".fa", "w") as f:
            for i, s in enumerate(seqs):
                f.write(f">r{i}\n{s}\n")
        rc = cli.main(["index", "-p", prefix, prefix + ".fa"])
        assert rc in (0, None)
        # warm the command path once (compile shapes differ from engine pass
        # only in the first chunk; cheap)
        t0 = time.time()
        rc = cli.main(
            ["overlap", "-m", str(min_overlap), "-p", prefix, prefix + ".fa"]
        )
        assert rc in (0, None)
        cmd_sec = time.time() - t0
        cmd_rps = num_reads / cmd_sec

    # gather-bandwidth roofline for the engine pass
    lanes_per_read = 4  # ID/RC lanes on fwd index, REV/COMP on rev index
    maxlen16 = -(-readlen // 16) * 16
    occ_bytes = (
        2 * 68.0 * lanes_per_read * num_reads * (maxlen16 - 1)
    )  # 2 row-gathers/lane-step, 17 int32 per fused occ row
    occ_gbps = occ_bytes / engine_sec / 1e9

    print(
        json.dumps(
            {
                "metric": "overlap_reads_per_sec",
                "value": round(engine_rps, 1),
                "unit": "reads/s",
                "vs_baseline": round(engine_rps / BASELINE_READS_PER_SEC, 3),
                "detail": {
                    "num_reads": n,
                    "readlen": readlen,
                    "min_overlap": min_overlap,
                    "engine_sec": round(engine_sec, 3),
                    "end_to_end_cmd_sec": round(cmd_sec, 3),
                    "end_to_end_cmd_reads_per_sec": round(cmd_rps, 1),
                    "index_build_warm_sec": round(index_warm, 3),
                    "index_build_first_sec": round(index_cold, 3),
                    "index_mchar_per_sec": round(
                        2 * (readlen + 1) * num_reads / index_warm / 1e6, 2
                    ),
                    "occ_gather_gbps": round(occ_gbps, 1),
                    "hbm_frac": round(occ_gbps / HBM_PEAK_GBPS, 3),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
