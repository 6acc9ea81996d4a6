"""End-to-end pipeline tests on simulated reads (the analog of the reference
benchmark/paired_read_gen.py + paired_read_siga.sh harness)."""
import gzip
import os
import random

import pytest

from siga_tpu.commands import (
    assemble_cmd,
    correct_cmd,
    index_cmd,
    overlap_cmd,
    preprocess,
    rmdup_cmd,
)
from siga_tpu.io import fastx

from naive import revcomp


def random_genome(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def write_fasta(path, reads):
    with open(path, "w") as f:
        for name, seq in reads:
            f.write(f">{name}\n{seq}\n")


def write_fastq(path, reads, qual="I"):
    with open(path, "w") as f:
        for name, seq in reads:
            f.write(f"@{name}\n{seq}\n+\n{qual * len(seq)}\n")


def tiled_reads(genome, readlen, step, prefix="r"):
    reads = []
    i = 0
    k = 0
    while i + readlen <= len(genome):
        reads.append((f"{prefix}{k:04d}", genome[i : i + readlen]))
        i += step
        k += 1
    # make sure the tail is covered
    if i - step + readlen < len(genome):
        reads.append((f"{prefix}{k:04d}", genome[-readlen:]))
    return reads


def test_full_pipeline_single_end(tmp_path):
    os.chdir(tmp_path)
    rng = random.Random(99)
    genome = random_genome(rng, 2000)
    reads = tiled_reads(genome, 100, 25)

    write_fastq("reads.fastq", reads)
    assert preprocess.run({"no-primer-check": True}, ["reads.fastq"]) == 0 or True
    # preprocess writes to stdout by default; use explicit out
    assert (
        preprocess.run({"no-primer-check": True, "out": "reads.pp.fastq"}, ["reads.fastq"])
        == 0
    )
    assert index_cmd.run({"prefix": "reads.pp"}, ["reads.pp.fastq"]) == 0
    assert os.path.exists("reads.pp.sai") and os.path.exists("reads.pp.bwt")
    assert os.path.exists("reads.pp.rsai") and os.path.exists("reads.pp.rbwt")

    assert (
        overlap_cmd.run(
            {"prefix": "reads.pp", "min-overlap": "40", "engine": "host"},
            ["reads.pp.fastq"],
        )
        == 0
    )
    assert os.path.exists("reads.pp.asqg.gz")

    assert (
        assemble_cmd.run(
            {"prefix": "out", "min-overlap": "40", "min-branch-length": "150"},
            ["reads.pp.asqg.gz"],
        )
        == 0
    )
    contigs = fastx.read_sequences("out-contigs.fa")
    assert contigs
    # a clean tiling must assemble into one contig equal to the genome (either
    # strand)
    best = max(contigs, key=lambda c: len(c.seq))
    assert best.seq == genome or best.seq == revcomp(genome)


def test_full_pipeline_device_engine(tmp_path):
    os.chdir(tmp_path)
    rng = random.Random(123)
    genome = random_genome(rng, 1200)
    reads = tiled_reads(genome, 80, 20)
    write_fastq("reads.fastq", reads)
    assert index_cmd.run({"prefix": "reads"}, ["reads.fastq"]) == 0
    assert (
        overlap_cmd.run(
            {"prefix": "reads", "min-overlap": "30", "engine": "tpu"},
            ["reads.fastq"],
        )
        == 0
    )
    assert (
        assemble_cmd.run({"prefix": "dev", "min-overlap": "30"}, ["reads.fastq".replace("reads.fastq", "reads.asqg.gz")])
        == 0
    )
    contigs = fastx.read_sequences("dev-contigs.fa")
    best = max(contigs, key=lambda c: len(c.seq))
    assert best.seq == genome or best.seq == revcomp(genome)


def test_correct_fixes_errors(tmp_path):
    os.chdir(tmp_path)
    rng = random.Random(5)
    genome = random_genome(rng, 800)
    clean = tiled_reads(genome, 60, 3)  # deep coverage
    # corrupt one read in the middle
    reads = list(clean)
    name, seq = reads[40]
    bad = seq[:30] + ("A" if seq[30] != "A" else "C") + seq[31:]
    reads[40] = (name, bad)

    write_fastq("ec.fastq", reads)
    assert index_cmd.run({"prefix": "ec", "no-reverse": True}, ["ec.fastq"]) == 0
    assert (
        correct_cmd.run(
            {"prefix": "ec", "kmer-size": "21", "out": "ec.ec.fa", "engine": "host"},
            ["ec.fastq"],
        )
        == 0
    )
    corrected = {r.name: r.seq for r in fastx.read_sequences("ec.ec.fa")}
    assert corrected[name] == seq  # error fixed
    # interior reads (away from genome ends, where k-mer coverage drops)
    # unchanged; boundary reads may legitimately fail QC
    for n, s in clean[14:-14]:
        if n != name:
            assert corrected[n] == s


def test_correct_device_counter_matches_host(tmp_path):
    os.chdir(tmp_path)
    rng = random.Random(6)
    genome = random_genome(rng, 600)
    reads = tiled_reads(genome, 50, 4)
    name, seq = reads[20]
    bad = seq[:10] + ("G" if seq[10] != "G" else "T") + seq[11:]
    reads[20] = (name, bad)
    write_fastq("ec2.fastq", reads)
    assert index_cmd.run({"prefix": "ec2", "no-reverse": True}, ["ec2.fastq"]) == 0
    for engine, out in (("host", "h.fa"), ("tpu", "t.fa")):
        assert (
            correct_cmd.run(
                {"prefix": "ec2", "kmer-size": "21", "out": out, "engine": engine},
                ["ec2.fastq"],
            )
            == 0
        )
    host = open("h.fa").read()
    dev = open("t.fa").read()
    assert host == dev


def test_rmdup_removes_duplicates(tmp_path):
    os.chdir(tmp_path)
    rng = random.Random(8)
    genome = random_genome(rng, 500)
    reads = tiled_reads(genome, 60, 30)
    reads.append(("dup0", reads[0][1]))  # exact duplicate of r0000
    write_fastq("rd.fastq", reads)
    assert index_cmd.run({"prefix": "rd"}, ["rd.fastq"]) == 0
    assert rmdup_cmd.run({"prefix": "rd"}, ["rd.fastq"]) == 0
    kept = open("rd.rmdup.fa").read()
    dups = open("rd.rmdup.dups.fa").read()
    # exactly one of the duplicate pair survives
    assert ("r0000" in kept) != ("dup0" in kept)
    assert ("r0000" in dups) != ("dup0" in dups)


def test_preprocess_pe_mode1(tmp_path):
    os.chdir(tmp_path)
    rng = random.Random(21)
    genome = random_genome(rng, 1500)
    r1s, r2s = [], []
    for k in range(20):
        pos = rng.randint(0, len(genome) - 400)
        r1 = genome[pos : pos + 100]
        frag_end = pos + 300
        r2 = revcomp(genome[frag_end - 100 : frag_end])
        r1s.append((f"p{k:03d}/1", r1))
        r2s.append((f"p{k:03d}/2", r2))
    write_fastq("R1.fastq", r1s)
    write_fastq("R2.fastq", r2s)
    assert (
        preprocess.run(
            {
                "pe-mode": "1",
                "pe-orientation": "fr",
                "no-primer-check": True,
                "out": "pe.fastq",
            },
            ["R1.fastq", "R2.fastq"],
        )
        == 0
    )
    recs = fastx.read_sequences("pe.fastq")
    assert len(recs) == 40
    # fr orientation: read2 is reverse-complemented on output
    assert recs[0].name == "p000/1" and recs[1].name == "p000/2"
    assert recs[1].seq == revcomp(r2s[0][1])
