"""pe-mode=1 assembly: InsertSizeEstimateVisitor + PairedReadVisitor."""
import os
import random

from siga_tpu.commands import assemble_cmd, index_cmd, overlap_cmd, preprocess
from siga_tpu.io import fastx

from naive import revcomp


def random_genome(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def write_fastq(path, reads, qual="I"):
    with open(path, "w") as f:
        for name, seq in reads:
            f.write(f"@{name}\n{seq}\n+\n{qual * len(seq)}\n")


def test_assemble_pe_mode1(tmp_path):
    os.chdir(tmp_path)
    rng = random.Random(31)
    genome = random_genome(rng, 3000)
    readlen = 100
    insert = 305  # mate-start distance; odd offset so r1/r2 positions interleave
    r1s, r2s = [], []
    k = 0
    for pos in range(0, len(genome) - insert - readlen, 10):
        r1 = genome[pos : pos + readlen]
        r2 = genome[pos + insert : pos + insert + readlen]
        r1s.append((f"q{k:04d}/1", r1))
        r2s.append((f"q{k:04d}/2", r2))
        k += 1
    write_fastq("R1.fastq", r1s)
    write_fastq("R2.fastq", r2s)
    # mirror benchmark/paired_read_siga.sh: ff orientation, no-opposite-strand
    # overlap, min-overlap high relative to read length
    assert (
        preprocess.run(
            {
                "pe-mode": "1",
                "pe-orientation": "ff",
                "no-primer-check": True,
                "out": "pe.fastq",
            },
            ["R1.fastq", "R2.fastq"],
        )
        == 0
    )
    assert index_cmd.run({"prefix": "pe"}, ["pe.fastq"]) == 0
    assert (
        overlap_cmd.run(
            {
                "prefix": "pe",
                "min-overlap": "70",
                "no-opposite-strand": True,
                "engine": "tpu",
            },
            ["pe.fastq"],
        )
        == 0
    )
    assert (
        assemble_cmd.run(
            {
                "prefix": "peout",
                "min-overlap": "70",
                "pe-mode": "1",
                "max-distance": "100",
            },
            ["pe.asqg.gz"],
        )
        == 0
    )
    contigs = fastx.read_sequences("peout-contigs.fa")
    assert contigs
    best = max(contigs, key=lambda c: len(c.seq))
    # pe-mode-1 assembly of a clean tiling should produce one dominant contig
    # covering most of the genome on either strand
    assert len(best.seq) >= 2000
    assert best.seq in genome or revcomp(best.seq) in genome
