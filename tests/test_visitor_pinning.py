"""Pin documented divergences from the reference's visitor semantics.

1. PairedReadVisitor: the reference asserts a vertex's mate exists
   (src/bigraph_visitors.cpp:694) and aborts when rmdup/trimming removed
   one mate; we document skip-and-continue (graph/visitors.py).
2. MaximumOverlap/Chimeric fall back to hardcoded E. coli-ish repeat-score
   constants (n=1751447, g=59128983, src/bigraph_visitors.cpp:441-450);
   the fallback must be surfaced with a warning.
"""
import logging

from siga_tpu.core.coord import Overlap, SeqCoord
from siga_tpu.graph.bigraph import Bigraph, EdgeCreator, Vertex
from siga_tpu.graph.visitors import (
    ChimericVisitor,
    MaximumOverlapVisitor,
    PairedReadVisitor,
    _warn_repeat_score_defaults,
)


def _chain(ids_seqs, overlap):
    g = Bigraph()
    for vid, s in ids_seqs:
        g.add_vertex(Vertex(vid, s))
    creator = EdgeCreator(g, True, -1)
    for (id1, s1), (id2, s2) in zip(ids_seqs, ids_seqs[1:]):
        ovr = Overlap.make(
            id1, SeqCoord(len(s1) - overlap, len(s1) - 1, len(s1)),
            id2, SeqCoord(0, overlap - 1, len(s2)),
            False, 0,
        )
        creator.create(ovr)
    return g


def test_paired_read_visitor_skips_unpaired_vertices():
    """Post-rmdup graph where x/1's mate x/2 was removed: the reference
    would assert; we skip the unpaired vertex and keep going."""
    import random

    rng = random.Random(5)
    genome = "".join(rng.choice("ACGT") for _ in range(260))
    seqs = [genome[0:120], genome[60:180], genome[120:240]]
    g = _chain(
        [("q0/1", seqs[0]), ("x/1", seqs[1]), ("q0/2", seqs[2])], 60
    )
    v = PairedReadVisitor(max_distance=100, insert_size=120, insert_delta=40)
    g.visit(v)  # must not raise
    # the unpaired vertex was skipped, the paired ones processed
    ids = {w.id for w in v._vertices}
    assert ids == {"q0/1", "q0/2"}
    # graph intact: no vertex lost, edges still validate
    assert g.get_vertex("x/1") is not None
    g.validate()


def test_repeat_score_default_warning(caplog):
    # the siga root logger has propagate=False (log4cxx-style single
    # handler) and lazily self-configures, clearing handlers; force the
    # configure first, THEN hook caplog's handler onto it
    from siga_tpu.core.logconf import get_logger

    get_logger("test")
    siga_root = logging.getLogger("siga")
    siga_root.addHandler(caplog.handler)
    try:
        for who in ("MaximumOverlapVisitor", "ChimericVisitor"):
            setattr(_warn_repeat_score_defaults, f"_warned_{who}", False)
        g = _chain([("a/1", "ACGTACGTACGT"), ("a/2", "ACGTACGTACGT")], 8)
        with caplog.at_level(logging.WARNING):
            MaximumOverlapVisitor().previsit(g)
            ChimericVisitor().previsit(g)
        text = caplog.text
        assert text.count("falling back to the reference's hardcoded") == 2
        # explicit constants are silent
        for who in ("MaximumOverlapVisitor", "ChimericVisitor"):
            setattr(_warn_repeat_score_defaults, f"_warned_{who}", False)
        caplog.clear()
        with caplog.at_level(logging.WARNING):
            MaximumOverlapVisitor(n=1000, g=1000000).previsit(g)
            ChimericVisitor(n=1000, g=1000000).previsit(g)
        assert "falling back" not in caplog.text
    finally:
        siga_root.removeHandler(caplog.handler)
