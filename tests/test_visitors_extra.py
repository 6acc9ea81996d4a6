"""AIVisitor / UnitigVisitor / GANVisitor / hifi / ml / kmerdistr / CLI."""
import io
import os
import random

import numpy as np
import pytest

from siga_tpu.core.coord import Overlap, SeqCoord
from siga_tpu.graph import hifi
from siga_tpu.graph.bigraph import ED_ANTISENSE, ED_SENSE, Bigraph, EdgeCreator, Vertex
from siga_tpu.graph.visitors import (
    AIVisitor,
    GANVisitor,
    StatisticsVisitor,
    UnitigVisitor,
    _edge_features,
)
from siga_tpu.ml.model import BaggingModel, train_bagging


def chain_graph(seqs, overlap):
    """Build a simple suffix-prefix chain graph."""
    g = Bigraph()
    for i, s in enumerate(seqs):
        g.add_vertex(Vertex(f"v{i}", s))
    creator = EdgeCreator(g, True, -1)
    for i in range(len(seqs) - 1):
        l1, l2 = len(seqs[i]), len(seqs[i + 1])
        ovr = Overlap.make(
            f"v{i}",
            SeqCoord(l1 - overlap, l1 - 1, l1),
            f"v{i+1}",
            SeqCoord(0, overlap - 1, l2),
            False,
            0,
        )
        creator.create(ovr)
    return g


def test_hifi_parse_pair():
    x = [("bc1", 1), ("bc2", 5), ("bc3", 2)]
    y = [("bc2", 3), ("bc4", 1)]
    cnt = hifi.parse_pair(x, y)
    assert cnt[hifi.K_LINK_ALL_X] == 3
    assert cnt[hifi.K_LINK_ALL_Y] == 2
    assert cnt[hifi.K_LINK_COMMON_X] == 1
    assert cnt[hifi.K_LINK_COMMON_Y] == 1
    assert cnt[hifi.K_LINK_MIN] == 1  # 3 < 5 is mid... bc2: x value 5, y 3
    # y=3 < vmin=5 -> min
    assert hifi.linkr(1, 1, 1) == 1.0
    assert hifi.linkr(1, 0, 1) == 0.0


def test_bagging_model_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(200, 5))
    y = (x[:, 0] + x[:, 2] > 0).astype(int)
    model = train_bagging(x, y, n_trees=7)
    acc = (model.classify_batch(x) > model.size // 2) == (y == 1)
    assert acc.mean() > 0.8
    path = str(tmp_path / "model.json")
    model.save(path)
    back = BaggingModel.load(path)
    assert np.array_equal(back.classify_batch(x), model.classify_batch(x))


def test_edge_features_shape():
    genome = "ACGTACGGTTACACGGATTACAGGATTTACAGGT" * 3
    seqs = [genome[i : i + 30] for i in range(0, 60, 10)]
    g = chain_graph(seqs, 20)
    v = g.get_vertex("v0")
    edge = v.edges_dir(ED_SENSE)[0]
    vec = _edge_features(v, edge, 0, 100, 10000)
    assert len(vec) == 46
    assert vec[0] == 30.0  # lenx


def test_ai_visitor_removes_zero_vote_edges():
    genome = "ACGTACGGTTACACGGATTACAGGATTTACAGGT" * 3
    seqs = [genome[i : i + 30] for i in range(0, 60, 10)]
    g = chain_graph(seqs, 20)

    class RejectAll:
        size = 3

        def classify(self, vec):
            return 0

    before = sum(len(v.edges) for v in g.vertices.values())
    assert before > 0
    g.visit(AIVisitor(RejectAll()))
    after = sum(len(v.edges) for v in g.vertices.values())
    assert after == 0

    g2 = chain_graph(seqs, 20)

    class AcceptAll:
        size = 3

        def classify(self, vec):
            return 3

    g2.visit(AIVisitor(AcceptAll()))
    assert sum(len(v.edges) for v in g2.vertices.values()) == before


def test_gan_visitor_with_ref():
    from siga_tpu.index import sa as sa_mod
    from siga_tpu.index.fm import FMIndex

    rng = random.Random(3)
    genome = "".join(rng.choice("ACGT") for _ in range(200))
    seqs = [genome[i : i + 40] for i in range(0, 120, 20)]
    g = chain_graph(seqs, 20)
    # reference index over the genome: every chained merge is a true positive
    codes, _p, ns = sa_mod.build_index_arrays([genome])
    ref = FMIndex(codes, ns)
    out = io.StringIO()
    gan = GANVisitor(out, ref)
    g.visit(gan)
    rows = [l.split("\t") for l in out.getvalue().strip().split("\n")]
    assert rows
    assert all(r[0] == "1" for r in rows)  # all edges match the reference

    # without a reference everything is a negative and gets removed
    g2 = chain_graph(seqs, 20)
    out2 = io.StringIO()
    g2.visit(GANVisitor(out2, None))
    rows2 = [l.split("\t") for l in out2.getvalue().strip().split("\n")]
    assert all(r[0] == "0" for r in rows2)
    assert sum(len(v.edges) for v in g2.vertices.values()) == 0


def test_unitig_visitor_duplicates_repeat():
    # x -> r <- y ; r -> z1, z2 : r is a "repeat" with branching
    g = Bigraph()
    # build: a(unique) -SENSE-> r(repeat, high coverage), r branches to b, c
    seq_a = "AAAACCCCGGGG"
    seq_r = "CCCCGGGGTTTT"
    seq_b = "GGGGTTTTAAAC"
    seq_c = "GGGGTTTTACGT"
    for vid, s, cov in [("a", seq_a, 1), ("r", seq_r, 50), ("b", seq_b, 1), ("c", seq_c, 1)]:
        v = Vertex(vid, s, coverage=cov)
        g.add_vertex(v)
    creator = EdgeCreator(g, True, -1)

    def link(v1, v2, o):
        l1, l2 = len(g.get_vertex(v1).seq), len(g.get_vertex(v2).seq)
        creator.create(
            Overlap.make(
                v1,
                SeqCoord(l1 - o, l1 - 1, l1),
                v2,
                SeqCoord(0, o - 1, l2),
                False,
                0,
            )
        )

    link("a", "r", 8)
    link("r", "b", 8)
    link("r", "c", 8)
    uv = UnitigVisitor(n=100, g=1000, t=0.0)
    g.visit(uv)
    # the repeat was duplicated ('r_copy') and 'a' merged through it
    assert uv.unitigs >= 1


def test_kmerdistr_sampling():
    from siga_tpu.index import sa as sa_mod
    from siga_tpu.index.fm import FMIndex
    from siga_tpu.index.kmerdistr import KmerDistribution

    seqs = ["ACGTACGTACGTACGT", "TACGTACGTACGTACG"]
    codes, _p, ns = sa_mod.build_index_arrays(seqs)
    index = FMIndex(codes, ns)
    distr = KmerDistribution()
    total = KmerDistribution.sample(index, 4, 10, distr)
    assert total > 0
    assert sum(distr.data.values()) > 0


def test_cli_dispatch(tmp_path, capsys):
    from siga_tpu import cli

    assert cli.main([]) == 1
    assert cli.main(["--help"]) == 0
    out = capsys.readouterr().out
    assert "preprocess" in out and "assemble" in out
    assert "gan" not in out.split("The most")[1].split("See")[0]  # hidden
    # option parsing: short/long mapping + repeats
    opts, args = cli.parse_options(
        "overlap", ["-m", "45", "--threads", "4", "reads.fa"]
    )
    assert opts["min-overlap"] == "45"
    assert opts["threads"] == "4"
    assert args == ["reads.fa"]
