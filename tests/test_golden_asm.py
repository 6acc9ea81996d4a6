"""Golden ASQG + contig regression (BASELINE gates 2/4 fixtures).

tests/golden/asm780* were generated from a fixed 780-read simulated set
(index -> rmdup -> index -> overlap -m 45 -> assemble -m 45 -x 0), cross-
checked once against the independent contig walker (tests/naive.py::
naive_contigs) and frozen.  A refactor of either implementation that
changes output bytes fails here without re-running any oracle."""
import gzip
import os

import pytest

from siga_tpu.commands import assemble_cmd, overlap_cmd

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    td = tmp_path_factory.mktemp("goldasm")
    os.link(
        os.path.join(GOLDEN, "asm780-reads.fa"), td / "reads.rmdup.fa"
    )
    from siga_tpu import cli

    cwd = os.getcwd()
    os.chdir(td)
    try:
        assert cli.main(
            ["index", "-p", "reads.rmdup", "reads.rmdup.fa"]
        ) in (0, None)
        assert cli.main(
            ["overlap", "-m", "45", "-p", "reads.rmdup", "reads.rmdup.fa"]
        ) in (0, None)
        assert cli.main(
            ["assemble", "-m", "45", "-x", "0", "-p", "asm",
             "reads.rmdup.asqg.gz"]
        ) in (0, None)
    finally:
        os.chdir(cwd)
    return td


def test_overlap_asqg_bytes(workdir):
    got = gzip.open(workdir / "reads.rmdup.asqg.gz").read()
    want = open(os.path.join(GOLDEN, "asm780.asqg"), "rb").read()
    assert got == want, "overlap ASQG drifted from the frozen fixture"


def test_contig_bytes(workdir):
    got = open(workdir / "asm-contigs.fa", "rb").read()
    want = open(os.path.join(GOLDEN, "asm780-contigs.fa"), "rb").read()
    assert got == want, "contigs drifted from the frozen fixture"


def test_graph_asqg_bytes(workdir):
    got = gzip.open(workdir / "asm-graph.asqg.gz").read()
    want = open(os.path.join(GOLDEN, "asm780-graph.asqg"), "rb").read()
    assert got == want, "assembled graph ASQG drifted from the fixture"
