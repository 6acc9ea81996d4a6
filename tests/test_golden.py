"""Golden-file regression: index artifacts for a fixed input are checked in
(tests/golden/); any byte drift in the .sai/.bwt writers or the suffix order
fails here.  The fixture BWT was hand-verified against the naive multi-string
suffix sort (tests/naive.py) when generated."""
import os

from siga_tpu.index import sa as sa_mod
from siga_tpu.io import bwtio, sai

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
SEQS = ["ACGTACGTAC", "CGTACGTACC", "TTACGGACGT", "ACGTACGTAC", "GGGTTTACAC"]


def _build(tmp_path, seqs, prefix):
    bwt_codes, perm, ns = sa_mod.build_index_arrays(seqs)
    sai.save_sai(str(tmp_path / f"{prefix}.sai"), perm, ns)
    bwtio.save_bwt(str(tmp_path / f"{prefix}.bwt"), bwt_codes, ns)


def test_golden_index_artifacts(tmp_path):
    _build(tmp_path, SEQS, "fwd")
    _build(tmp_path, [s[::-1] for s in SEQS], "rev")
    pairs = [
        ("fwd.sai", "fixed.sai"),
        ("fwd.bwt", "fixed.bwt"),
        ("rev.sai", "fixed.rsai"),
        ("rev.bwt", "fixed.rbwt"),
    ]
    for got, want in pairs:
        got_bytes = open(tmp_path / got, "rb").read()
        want_bytes = open(os.path.join(GOLDEN, want), "rb").read()
        assert got_bytes == want_bytes, f"{got} drifted from {want}"


def test_golden_matches_naive_order():
    from naive import naive_bwt

    from siga_tpu.core import dna

    codes, _ns, _n = bwtio.load_bwt(os.path.join(GOLDEN, "fixed.bwt"))
    assert dna.decode(codes) == naive_bwt(SEQS)
