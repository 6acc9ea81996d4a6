import io

import numpy as np
import pytest

from siga_tpu.core import dna, quality
from siga_tpu.io import bwtio, fastx, sai


def test_rank_roundtrip():
    for i, c in enumerate("$ACGT"):
        assert dna.torank(c) == i
        assert dna.tochar(i) == c
    assert dna.torank("N") == 0
    assert dna.decode(dna.encode("ACGTACGT")) == "ACGTACGT"


def test_revcomp():
    assert dna.reverse_complement("ACGT") == "ACGT"
    assert dna.reverse_complement("AACG") == "CGTT"
    assert dna.complement("ACGTN") == "TGCAN"


def test_rle_roundtrip():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 5, size=1000).astype(np.uint8)
    # inject long runs to exercise the 31-cap splitting
    codes[100:200] = 3
    units = bwtio.rle_encode(codes)
    assert np.array_equal(bwtio.rle_decode(units), codes)
    # all unit counts within 1..31
    counts = units & 0x1F
    assert counts.min() >= 1 and counts.max() <= 31
    # a 100-long run must split into 3 full units + remainder 7
    run = bwtio.rle_encode(np.full(100, 2, dtype=np.uint8))
    assert list(run & 0x1F) == [31, 31, 31, 7]
    assert all((run >> 5) == 2)


def test_bwt_file_layout(tmp_path):
    codes = np.array([0, 1, 1, 2, 3, 4, 4, 4], dtype=np.uint8)
    path = str(tmp_path / "t.bwt")
    bwtio.save_bwt(path, codes, num_strings=2)
    raw = open(path, "rb").read()
    # header: u16 magic, u64 strings, u64 suffixes, u64 runs, u32 flag
    assert raw[:2] == (0xCACA).to_bytes(2, "little")
    assert int.from_bytes(raw[2:10], "little") == 2
    assert int.from_bytes(raw[10:18], "little") == 8
    nruns = int.from_bytes(raw[18:26], "little")
    assert int.from_bytes(raw[26:30], "little") == 0
    assert len(raw) == 30 + nruns
    back, ns, nsuf = bwtio.load_bwt(path)
    assert ns == 2 and nsuf == 8
    assert np.array_equal(back, codes)


def test_sai_layout(tmp_path):
    path = str(tmp_path / "t.sai")
    sai.save_sai(path, np.array([2, 0, 1]), 3)
    text = open(path).read()
    assert text == "51914\n3\n3\n2 0\n0 0\n1 0\n"
    perm, ns = sai.load_sai(path)
    assert ns == 3
    assert list(perm) == [2, 0, 1]


def test_fastq_reader_writer():
    data = "@r1 comment here\nACGT\n+\nIIII\n@r2\nTTTT\n+r2\nJJJJ\n"
    reader = fastx.FASTQReader(io.StringIO(data))
    recs = list(reader)
    assert len(recs) == 2
    assert recs[0].name == "r1"
    assert recs[0].comment == "comment here"
    assert recs[0].seq == "ACGT"
    assert recs[0].quality == "IIII"
    assert recs[1].name == "r2"
    out = recs[0].format()
    assert out == "@r1 comment here\nACGT\n+\nIIII\n"


def test_fasta_reader_multiline():
    data = ">a x\nACG\nT\n>b\nGGG\n"
    recs = list(fastx.FASTAReader(io.StringIO(data)))
    assert [(r.name, r.seq) for r in recs] == [("a", "ACGT"), ("b", "GGG")]
    assert recs[0].comment == "x"
    assert recs[0].format() == ">a x\nACGT\n"


def test_reader_factory_sniffing():
    assert isinstance(fastx.make_reader(io.StringIO("@x\nA\n+\nI\n")), fastx.FASTQReader)
    assert isinstance(fastx.make_reader(io.StringIO(">x\nA\n")), fastx.FASTAReader)
    assert fastx.make_reader(io.StringIO("#bad")) is None


def test_pairend_id():
    assert fastx.pairend_id("read/1") == "read/2"
    assert fastx.pairend_id("read/2") == "read/1"
    assert fastx.pairend_id("x/A") == "x/B"
    assert fastx.pairend_id("x/f") == "x/r"
    assert fastx.pairend_id("plain") == ""


def test_stem():
    assert fastx.stem("dir/reads.fastq.gz") == "reads"
    assert fastx.stem("reads.fa.bz2") == "reads"
    assert fastx.stem("reads.ec.fa") == "reads.ec"


def test_quality():
    assert quality.fromchar("I") == 40
    assert quality.tochar(40) == "I"
    assert quality.phred64to33(chr(ord("I") + 31)) == "I"
    assert quality.is_valid("!") and not quality.is_valid(" ")


def test_dnaseq_ops():
    r = fastx.DNASeq.make("n c", "ACGT", "IJKL")
    assert (r.name, r.comment) == ("n", "c")
    r.make_reverse()
    assert r.seq == "TGCA" and r.quality == "LKJI"
    r.make_complement()
    assert r.seq == "ACGT"


def test_asqg_records():
    from siga_tpu.io import asqg
    from siga_tpu.core.coord import Overlap

    h = asqg.HeaderRecord(overlap=45, containment=1, infile="reads.fa")
    assert h.format() == "HT\tVN:i:1\tOL:i:45\tIN:Z:reads.fa\tCN:i:1"
    back = asqg.HeaderRecord.parse(h.format())
    assert back.overlap == 45 and back.containment == 1 and back.infile == "reads.fa"

    v = asqg.VertexRecord(id="r1", seq="ACGT", substring=0, coverage=3)
    assert v.format() == "VT\tr1\tACGT\tSS:i:0\tCR:i:3"
    vb = asqg.VertexRecord.parse(v.format())
    assert vb.id == "r1" and vb.coverage == 3 and vb.substring == 0

    o = Overlap.parse("a b 5 9 10 0 4 8 1 0")
    e = asqg.EdgeRecord(overlap=o)
    assert e.format() == "ED\ta b 5 9 10 0 4 8 1 0"
    eb = asqg.EdgeRecord.parse(e.format())
    assert str(eb.overlap) == str(o)
    assert o.match.is_rc and o.match.length() == 5

    # float tags use %g like std::ostream's 6-sigfig default
    assert asqg.float_tag("ER", 0.05) == "ER:f:0.05"
    assert asqg.float_tag("ER", 1e-06) == "ER:f:1e-06"

    assert asqg.record_type("HT\t...") == "header"
    assert asqg.record_type("VT\t...") == "vertex"
    assert asqg.record_type("ED\t...") == "edge"
    assert asqg.record_type("XX") == "none"


def test_fast_fastq_bulk_matches_strict():
    import io as _io

    from siga_tpu.io import fastx

    # records the fast path must reject -> falls back to the state machine
    tricky = "@r1\nACGT\n+\nIIII\n\n@r2\nGG\n+r2\nJJ\n"
    recs = fastx.read_sequences(_io.StringIO(tricky))
    assert [(r.name, r.seq) for r in recs] == [("r1", "ACGT"), ("r2", "GG")]

    clean = "@a 1\nACG\n+\nIII\n@b\nTT\n+\nJJ\n"
    recs = fastx.read_sequences(_io.StringIO(clean))
    assert [(r.name, r.comment, r.seq, r.quality) for r in recs] == [
        ("a", "1", "ACG", "III"),
        ("b", "", "TT", "JJ"),
    ]
    recs = fastx.read_sequences(_io.StringIO(clean), with_quality=False, with_comment=False)
    assert recs[0].quality == "" and recs[0].comment == ""
