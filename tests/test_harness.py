"""End-to-end harness: generator -> siga CLI pipeline -> contig evaluation,
driven through the actual shell scripts and CLI binary."""
import os
import random
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, **kw):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    return subprocess.run(
        cmd, check=True, capture_output=True, text=True, env=env, **kw
    )


def test_benchmark_harness(tmp_path):
    os.chdir(tmp_path)
    rng = random.Random(42)
    genome = "".join(rng.choice("ACGT") for _ in range(4000))
    with open("new_ref.fa", "w") as f:
        f.write(f">ref\n{genome}\n")

    # generate simulated paired reads: readlen 100, coverage 40, insert 300
    out = run(
        [
            sys.executable,
            os.path.join(REPO, "benchmark", "paired_read_gen.py"),
            "new_ref.fa",
            "100",
            "40",
            "300",
            "0",
            "7",
        ]
    )
    prefix = out.stdout.strip().splitlines()[-1]
    assert os.path.exists(f"{prefix}_R1.fasta")

    siga = os.path.join(REPO, "siga")
    f = "run"
    run(
        [
            siga,
            "preprocess",
            "--pe-mode=1",
            "--pe-orientation=ff",
            "--no-primer-check",
            "-o",
            f"{f}.fastq",
            f"{prefix}_R1.fasta",
            f"{prefix}_R2.fasta",
        ]
    )
    run([siga, "index", "-p", f, f"{f}.fastq"])
    run([siga, "overlap", "-m", "70", "--no-opposite-strand", "-p", f, f"{f}.fastq"])
    run(
        [
            siga,
            "assemble",
            "-m",
            "70",
            "--pe-mode=1",
            "--max-distance=100",
            "-p",
            f,
            f"{f}.asqg.gz",
        ]
    )
    assert os.path.exists(f"{f}-contigs.fa")

    # second stage like the reference harness: rmdup the contigs and
    # re-assemble them into larger pieces
    run([siga, "index", "-p", f"{f}-contigs", f"{f}-contigs.fa"])
    run([siga, "rmdup", "-p", f"{f}-contigs", f"{f}-contigs.fa"])
    run([siga, "index", "-p", f"{f}-contigs.rmdup", f"{f}-contigs.rmdup.fa"])
    run(
        [
            siga,
            "overlap",
            "-m",
            "10",
            "--no-opposite-strand",
            "-p",
            f"{f}-contigs.rmdup",
            f"{f}-contigs.rmdup.fa",
        ]
    )
    run(
        [
            siga,
            "assemble",
            "--pe-mode=0",
            "-m",
            "10",
            "-p",
            f"{f}-final",
            f"{f}-contigs.rmdup.asqg.gz",
        ]
    )

    # evaluate with the mapping harness: all contigs must be real genome
    # substrings and together cover nearly all of it
    with open(f"{f}-final-contigs.fa") as contigs:
        out = run(
            [
                sys.executable,
                os.path.join(REPO, "benchmark", "contigs_mapping.py"),
                "0",
                "new_ref.fa",
                "fasta",
            ],
            stdin=contigs,
        )
    stats = dict(
        line.split(": ")
        for line in out.stdout.splitlines()
        if ": " in line and not line.startswith("ref")
    )
    assert int(stats["contig_number"]) >= 1
    assert int(stats["unmatched_contig"]) == 0
    covered = float(stats["genome_covered"].split("(")[1].rstrip(")"))
    assert covered > 0.9

    # graphviz dot conversion runs
    import gzip

    with gzip.open(f"{f}.asqg.gz", "rt") as g:
        out = run(
            [sys.executable, os.path.join(REPO, "benchmark", "graphviz.py")],
            stdin=g,
        )
    assert out.stdout.startswith("digraph {")
