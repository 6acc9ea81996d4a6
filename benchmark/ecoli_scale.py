#!/usr/bin/env python3
"""E. coli-scale full-pipeline gate (BASELINE config 4).

Real MG1655 MiSeq data is not fetchable in this environment (zero egress),
so this drives the reference recipe (/root/reference/examples/
siga-ecoli-miseq.sh: correction k=41, min overlap 85, assembly overlap 111,
trim 150) over a simulated E. coli-sized genome with paired 2x150bp reads
and substitution errors, then evaluates contigs with contigs_mapping.py
(contig_number / matched / N50 / N90 / MAX).

usage: ecoli_scale.py [GENOME_MB] [COVERAGE] [ERR] [WORKDIR]
Prints one JSON line with per-stage wall seconds and contig metrics.
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
SIGA = os.path.join(REPO, "siga")


def sh(args, **kw):
    t0 = time.time()
    subprocess.run(args, check=True, **kw)
    return time.time() - t0


def main():
    genome_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 4.6
    coverage = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    err = float(sys.argv[3]) if len(sys.argv) > 3 else 0.005
    work = sys.argv[4] if len(sys.argv) > 4 else os.path.join(
        REPO, ".scale_test", f"ecoli_{genome_mb}_{coverage}_{err}"
    )
    os.makedirs(work, exist_ok=True)
    os.chdir(work)

    import numpy as np

    readlen, insert, sigma, seed = 150, 400, 20, 1
    n = int(genome_mb * 1e6)
    rng = np.random.default_rng(42)
    genome = np.frombuffer(b"ACGT", dtype=np.uint8)[
        rng.integers(0, 4, n)
    ].tobytes().decode()
    with open("ref.fa", "w") as f:
        f.write(">ref\n")
        for i in range(0, n, 80):
            f.write(genome[i : i + 80] + "\n")

    t = {}
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "paired_read_gen.py"),
         "ref.fa", str(readlen), str(coverage), str(insert), str(sigma),
         str(seed), str(err)],
        check=True, capture_output=True, text=True,
    )
    prefix = out.stdout.strip().splitlines()[-1]
    t["generate"] = time.time() - t0

    # Stage layout follows the reference's own working benchmark pipeline
    # (/root/reference/benchmark/paired_read_siga.sh:65-82 — the shipped
    # siga-ecoli-miseq.sh references a `filter.pass` file no stage
    # produces), with the MiSeq recipe's parameters (correction k=41,
    # min overlap 85, assembly overlap 111, trim 150,
    # examples/siga-ecoli-miseq.sh:23-37): pe-mode=1 primary assembly,
    # then contig rmdup + re-overlap + final assembly.
    t["preprocess"] = sh([SIGA, "preprocess", "--pe-mode=1",
                          "--pe-orientation=ff", "--no-primer-check",
                          "-o", "reads.pp.fastq",
                          f"{prefix}_R1.fasta", f"{prefix}_R2.fasta"])
    t["index_pp"] = sh([SIGA, "index", "--no-reverse", "-p", "reads.pp",
                        "reads.pp.fastq"])
    t["correct"] = sh([SIGA, "correct", "-k", "41", "-p", "reads.pp",
                       "-o", "reads.ec.fa", "reads.pp.fastq"])
    t["index_ec"] = sh([SIGA, "index", "-p", "reads.ec", "reads.ec.fa"])
    t["overlap"] = sh([SIGA, "overlap", "-m", "85", "--no-opposite-strand",
                       "-p", "reads.ec", "reads.ec.fa"])
    t["assemble_pe"] = sh([SIGA, "assemble", "-m", "111", "--pe-mode=1",
                           "--max-distance=100",
                           "--min-branch-length", "150", "-p", "primary",
                           "reads.ec.asqg.gz"])
    t["index_ctg"] = sh([SIGA, "index", "-p", "primary-contigs",
                         "primary-contigs.fa"])
    t["rmdup"] = sh([SIGA, "rmdup", "-p", "primary-contigs",
                     "primary-contigs.fa"])
    t["index_rmdup"] = sh([SIGA, "index", "-p", "primary-contigs.rmdup",
                           "primary-contigs.rmdup.fa"])
    t["overlap_ctg"] = sh([SIGA, "overlap", "-m", "10",
                           "--no-opposite-strand",
                           "-p", "primary-contigs.rmdup",
                           "primary-contigs.rmdup.fa"])
    t["assemble_final"] = sh([SIGA, "assemble", "-m", "111", "--pe-mode=0",
                              "--min-branch-length", "150", "-p", "final",
                              "primary-contigs.rmdup.asqg.gz"])

    n_reads = sum(1 for line in open("reads.ec.fa") if line.startswith(">"))
    with open("final-contigs.fa") as f:
        stats = subprocess.run(
            [sys.executable, os.path.join(HERE, "contigs_mapping.py"),
             "300", "ref.fa", "fasta", "unmatched.fa"],
            stdin=f, check=True, capture_output=True, text=True,
        ).stdout
    metrics = {}
    for line in stats.strip().splitlines():
        if ":" in line:
            k, v = line.split(":", 1)
            metrics[k.strip()] = v.strip()
    result = {
        "genome_mb": genome_mb,
        "coverage": coverage,
        "error_rate": err,
        "n_reads_corrected": n_reads,
        "stage_sec": {k: round(v, 1) for k, v in t.items()},
        "total_pipeline_sec": round(sum(v for k, v in t.items()
                                        if k != "generate"), 1),
        "contig_metrics": metrics,
        "overlap_reads_per_sec": round(n_reads / t["overlap"], 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
