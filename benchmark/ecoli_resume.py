#!/usr/bin/env python3
"""Resume the 4.6 Mb E. coli-scale gate run from its rmdup artifacts.

The full pipeline is file-staged (SURVEY.md section 5.4) precisely so a died
run can resume from its last artifact. The round-4 run in
.scale_test/ecoli_full stopped after `siga rmdup`; the remaining stages are
index_rmdup -> overlap_ctg -> assemble_final -> contigs_mapping evaluation
(/root/reference/benchmark/paired_read_siga.sh:65-82 stage layout,
/root/reference/examples/siga-ecoli-miseq.sh:23-37 parameters).

Prints one JSON line with the resumed stage walls + contig metrics.
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
    work = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".scale_test", "ecoli_full")
    os.chdir(work)
    t = {}
    if not os.path.exists("primary-contigs.rmdup.bwt"):
        t["index_rmdup"] = sh([SIGA, "index", "-p", "primary-contigs.rmdup",
                               "primary-contigs.rmdup.fa"])
    if not os.path.exists("primary-contigs.rmdup.asqg.gz"):
        t["overlap_ctg"] = sh([SIGA, "overlap", "-m", "10",
                               "--no-opposite-strand",
                               "-p", "primary-contigs.rmdup",
                               "primary-contigs.rmdup.fa"])
    if not os.path.exists("final-contigs.fa"):
        t["assemble_final"] = sh([SIGA, "assemble", "-m", "111",
                                  "--pe-mode=0",
                                  "--min-branch-length", "150",
                                  "-p", "final",
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
        "resumed_from": "rmdup artifacts (round-4 partial run)",
        "n_reads_corrected": n_reads,
        "resumed_stage_sec": {k: round(v, 1) for k, v in t.items()},
        "contig_metrics": metrics,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
