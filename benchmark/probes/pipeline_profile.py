#!/usr/bin/env python3
"""Main-thread time split of the PIPELINED engine loop (lookahead active).

Wraps DualScanner.dispatch/collect and the native processor with wall-clock
accumulators, then runs batch_overlap_hits as production does.  Because the
loop is pipelined, `collect` time = transfer wait not hidden by the device
running ahead; `dispatch` = host pack + enqueue.
Usage: python benchmark/probes/pipeline_profile.py [num_reads]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import numpy as np

from bench import simulate_reads


def main():
    num_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    from siga_tpu.index import sa as sa_mod
    from siga_tpu.index.fm import FMIndex
    from siga_tpu.io.fastx import DNASeq
    from siga_tpu.overlap.builder import OverlapBuilder
    from siga_tpu.ops import search as search_mod
    from siga_tpu.ops.fm_device import DualScanner

    seqs = simulate_reads(num_reads, 100, genome_size=max(200_000, num_reads * 20))
    f, _p, r, _rp, ns = sa_mod.build_index_arrays_pair(seqs, use_device=True)
    fmi, rfmi = FMIndex(f, ns), FMIndex(r, ns)
    builder = OverlapBuilder(fmi, rfmi)
    records = [DNASeq(name=f"r{i}", seq=s) for i, s in enumerate(seqs)]

    # warm
    for _ in search_mod.batch_overlap_hits(builder, records, 45):
        pass

    tm = {"dispatch": 0.0, "collect": 0.0, "native": 0.0}
    orig_dispatch = DualScanner.dispatch
    orig_collect = DualScanner.collect

    def timed(name, orig):
        def wrapper(self, *a, **k):
            t0 = time.time()
            out = orig(self, *a, **k)
            tm[name] += time.time() - t0
            return out
        return wrapper

    DualScanner.dispatch = timed("dispatch", orig_dispatch)
    DualScanner.collect = timed("collect", orig_collect)

    orig_proc = search_mod._native_chunk_processor

    def patched_proc(builder):
        proc = orig_proc(builder)
        if proc is None or getattr(proc, "_timed", False):
            return proc
        orig_run = proc.run

        def run(*a, **k):
            t0 = time.time()
            out = orig_run(*a, **k)
            tm["native"] += time.time() - t0
            return out

        proc.run = run
        proc._timed = True
        return proc

    search_mod._native_chunk_processor = patched_proc

    t0 = time.time()
    n = 0
    for _ in search_mod.batch_overlap_hits(builder, records, 45):
        n += 1
    total = time.time() - t0
    other = total - sum(tm.values())
    print(f"reads={n} total={total:.3f}s -> {n/total:.0f} reads/s")
    for k, v in tm.items():
        print(f"  {k:9s} {v:7.3f}s ({100*v/total:5.1f}%)")
    print(f"  {'other':9s} {other:7.3f}s ({100*other/total:5.1f}%)")


if __name__ == "__main__":
    main()
