"""subgraph / match / preqc / gan command tests."""
import gzip
import json
import os
import random

import pytest

from siga_tpu.commands import gan_cmd, index_cmd, match_cmd, overlap_cmd, preqc_cmd, subgraph_cmd
from siga_tpu.io import fastx


def random_genome(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def write_fastq(path, reads, qual="I"):
    with open(path, "w") as f:
        for name, seq in reads:
            f.write(f"@{name}\n{seq}\n+\n{qual * len(seq)}\n")


@pytest.fixture()
def graph_env(tmp_path):
    os.chdir(tmp_path)
    rng = random.Random(77)
    genome = random_genome(rng, 800)
    reads = [(f"g{i:03d}", genome[p : p + 80]) for i, p in enumerate(range(0, 700, 20))]
    write_fastq("g.fastq", reads)
    assert index_cmd.run({"prefix": "g"}, ["g.fastq"]) == 0
    assert (
        overlap_cmd.run({"prefix": "g", "min-overlap": "40", "engine": "host"}, ["g.fastq"])
        == 0
    )
    return genome, reads


def test_subgraph(graph_env, capsys):
    genome, reads = graph_env
    assert (
        subgraph_cmd.run(
            {"out": "sub.asqg.gz", "size": "2"}, ["g005", "g.asqg.gz"]
        )
        == 0
    )
    with gzip.open("sub.asqg.gz", "rt") as f:
        lines = f.read().splitlines()
    vts = [l for l in lines if l.startswith("VT")]
    eds = [l for l in lines if l.startswith("ED")]
    assert any("g005" in v for v in vts)
    assert 1 < len(vts) < len(reads)  # a neighborhood, not the whole graph
    assert eds


def test_match(graph_env, capsys):
    assert match_cmd.run({"prefix": "g"}, ["g.fastq"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert len(out) == 35  # reads tile 0..680 step 20
    # every read occurs at least once in the index
    assert all(int(l.split("\t")[-1]) >= 1 for l in out)


def test_preqc(graph_env, capsys):
    assert preqc_cmd.run({"sample-rate": "1.0", "prefix": "g"}, ["g.fastq"]) == 0
    doc = json.loads(capsys.readouterr().out)
    assert "QualityScores" in doc
    assert len(doc["QualityScores"]["mean_quality"]) == 80
    assert doc["QualityScores"]["mean_quality"][0] == 40.0
    assert "GenomeSize" in doc


def test_gan_with_ref(graph_env, tmp_path, capsys):
    genome, _reads = graph_env
    with open("ref.fa", "w") as f:
        f.write(f">ref\n{genome}\n")
    assert index_cmd.run({"prefix": "ref", "no-reverse": True}, ["ref.fa"]) == 0
    assert gan_cmd.run({"prefix": "gg", "ref": "ref"}, ["g.asqg.gz"]) == 0
    rows = [l for l in capsys.readouterr().out.splitlines() if "\t" in l]
    assert rows
    # every true edge of a clean tiling matches the reference genome
    assert all(r.split("\t")[0] == "1" for r in rows)
    assert os.path.exists("gg-gan.fa")
    assert os.path.exists("gg-gan.asqg.gz")
