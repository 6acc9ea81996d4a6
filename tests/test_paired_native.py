"""Native PairedReadVisitor (native/paired.cpp) vs the Python oracle.

Both paths must produce the identical post-visitor graph (same confirmed
edges, same sweeps) — asserted by byte-comparing the saved ASQG after the
visitor, on a realistic pe graph built by the actual pipeline."""
import io
import os
import random

import pytest

from siga_tpu import native
from siga_tpu.commands import index_cmd, overlap_cmd, preprocess
from siga_tpu.graph.bigraph import Bigraph
from siga_tpu.graph.visitors import InsertSizeEstimateVisitor, PairedReadVisitor
from siga_tpu.io import fastx


def _make_graph(tmp_path, drop_some_mates=False):
    os.chdir(tmp_path)
    rng = random.Random(77)
    genome = "".join(rng.choice("ACGT") for _ in range(4000))
    readlen, insert = 100, 297
    r1s, r2s = [], []
    for k, pos in enumerate(range(0, len(genome) - insert - readlen, 7)):
        r1s.append((f"q{k:04d}/1", genome[pos : pos + readlen]))
        r2s.append((f"q{k:04d}/2", genome[pos + insert : pos + insert + readlen]))
    with open("R1.fastq", "w") as f:
        for n, s in r1s:
            f.write(f"@{n}\n{s}\n+\n{'I' * len(s)}\n")
    with open("R2.fastq", "w") as f:
        for n, s in r2s:
            f.write(f"@{n}\n{s}\n+\n{'I' * len(s)}\n")
    assert preprocess.run(
        {"pe-mode": "1", "pe-orientation": "ff", "no-primer-check": True,
         "out": "pe.fastq"},
        ["R1.fastq", "R2.fastq"],
    ) == 0
    assert index_cmd.run({"prefix": "pe"}, ["pe.fastq"]) == 0
    assert overlap_cmd.run(
        {"prefix": "pe", "min-overlap": "60", "no-opposite-strand": True,
         "engine": "tpu"},
        ["pe.fastq"],
    ) == 0

    def load():
        with fastx.xopen("pe.asqg.gz", "rt") as stream:
            g = Bigraph.load(stream, 60, True, -1)
        if drop_some_mates:
            # simulate rmdup removing mates: unpaired vertices exercise the
            # documented skip path in both implementations
            for vid in list(g.vertices)[::17]:
                v = g.vertices[vid]
                v.delete_edges()
                g.remove_vertex(v)
        return g

    return load


def _run_visitor(load, native_on):
    g = load()
    ise = InsertSizeEstimateVisitor()
    g.visit(ise)
    avg, delta = (ise.average, int(ise.delta)) if ise.samples else (300, 60)
    pr = PairedReadVisitor(100, avg, delta, 100)
    old = os.environ.get("SIGA_PAIRED_NATIVE")
    os.environ["SIGA_PAIRED_NATIVE"] = "1" if native_on else "0"
    try:
        g.visit(pr)
    finally:
        if old is None:
            os.environ.pop("SIGA_PAIRED_NATIVE", None)
        else:
            os.environ["SIGA_PAIRED_NATIVE"] = old
    out = io.StringIO()
    g.save(out)
    return out.getvalue()


@pytest.mark.skipif(not native.available(), reason="no native lib")
@pytest.mark.parametrize("drop", [False, True])
def test_paired_native_matches_python(tmp_path, drop):
    load = _make_graph(tmp_path, drop_some_mates=drop)
    a = _run_visitor(load, native_on=False)
    b = _run_visitor(load, native_on=True)
    assert a == b
    assert "ED" in a  # the visitor kept confirmed edges
