"""Profile pe-assemble at the 1 Mb config: per-phase walls + cProfile tops.

Drives the same schedule as commands/assemble_cmd.py (pe-mode=1, m=111,
max-distance=100, min-branch-length=150) over the round-4 artifacts in
.scale_test/ecoli_1.0_25_0.005/reads.ec.asqg.gz.
"""
import cProfile
import io
import pstats
import sys
import time

sys.path.insert(0, "/root/repo")

from siga_tpu.graph.bigraph import Bigraph
from siga_tpu.graph.visitors import (
    InsertSizeEstimateVisitor,
    LoopRemoveVisitor,
    MaximumOverlapVisitor,
    PairedReadVisitor,
    StatisticsVisitor,
    TrimVisitor,
)
from siga_tpu.io import fastx

PATH = "/root/repo/.scale_test/ecoli_1.0_25_0.005/reads.ec.asqg.gz"


def main():
    t = {}
    t0 = time.time()
    with fastx.xopen(PATH, "rt") as stream:
        g = Bigraph.load(stream, 111, True, -1)
    t["load"] = time.time() - t0
    print(f"load: {t['load']:.1f}s, {len(g.vertices)} vertices", flush=True)

    t0 = time.time()
    g.validate()
    t["validate"] = time.time() - t0

    t0 = time.time()
    ise = InsertSizeEstimateVisitor()
    g.visit(ise)
    t["insert_size"] = time.time() - t0
    avg, delta = (ise.average, int(ise.delta)) if ise.samples else (500, 100)
    print(f"ise: {t['insert_size']:.1f}s avg={avg} delta={delta}", flush=True)

    pr = PairedReadVisitor(100, avg, delta, 100)
    prof = cProfile.Profile()
    t0 = time.time()
    prof.enable()
    g.visit(pr)
    prof.disable()
    t["paired_read"] = time.time() - t0
    print(f"paired_read: {t['paired_read']:.1f}s", flush=True)
    s = io.StringIO()
    pstats.Stats(prof, stream=s).sort_stats("cumulative").print_stats(25)
    print(s.getvalue(), flush=True)

    t0 = time.time()
    g.simplify()
    t["simplify1"] = time.time() - t0
    print(f"simplify1: {t['simplify1']:.1f}s -> {len(g.vertices)} vertices",
          flush=True)

    trim = TrimVisitor(150, -1)
    stats = StatisticsVisitor()
    t0 = time.time()
    rounds = 0
    for _ in range(10):
        if not g.visit(trim):
            break
        g.simplify()
        rounds += 1
        g.visit(stats)
    t["trim_rounds"] = time.time() - t0
    print(f"trim_rounds({rounds}): {t['trim_rounds']:.1f}s", flush=True)
    print({k: round(v, 1) for k, v in t.items()}, flush=True)


if __name__ == "__main__":
    main()
