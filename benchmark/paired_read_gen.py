#!/usr/bin/env python3
"""Simulated paired-read generator.

Python-3 equivalent of the reference harness
(/root/reference/benchmark/paired_read_gen.py): sample non-repeating random
positions from a reference FASTA at the requested coverage, emit r1/r2 pairs
separated by a (normally distributed) insert, dedupe identical fragments.

usage: paired_read_gen.py REF.fa READLEN [COVERAGE] [INSERT] [SIGMA] [SEED] [ERR]
Writes R1/R2 FASTA records to <prefix>_R1.fasta/<prefix>_R2.fasta.
ERR (default 0) adds uniform substitution errors at that per-base rate —
an extension over the reference harness so `siga correct` has real work.
"""
import random
import sys

import numpy as np


def fasta_read(stream):
    name, parts = None, []
    for line in stream:
        line = line.strip()
        if not line:
            continue
        if line.startswith(">"):
            if name is not None and parts:
                yield name, "".join(parts)
            name, parts = line[1:], []
        else:
            parts.append(line)
    if name is not None and parts:
        yield name, "".join(parts)


def main():
    ref_path = sys.argv[1]
    k = int(sys.argv[2])
    coverage = int(sys.argv[3]) if len(sys.argv) > 3 else k
    insert = int(sys.argv[4]) if len(sys.argv) > 4 else 1000
    sigma = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    seed = int(sys.argv[6]) if len(sys.argv) > 6 else 0
    err = float(sys.argv[7]) if len(sys.argv) > 7 else 0.0
    rng = random.Random(seed)
    deltas = (
        np.random.default_rng(seed).normal(0, sigma, 10000).astype(int)
        if sigma
        else None
    )

    prefix = f"read_{k}_{coverage}_{insert}_{sigma}_paired"
    out1 = open(prefix + "_R1.fasta", "w")
    out2 = open(prefix + "_R2.fasta", "w")

    with open(ref_path) as f:
        for _name, seq in fasta_read(f):
            ref = seq.upper()
            n = len(ref)
            if n < 2 * k + insert + 5 * sigma:
                continue
            seen_pos = set()
            seen_read = set()
            pairs = []
            idx = 0
            for _ in range(n * coverage // (2 * k)):
                pos = rng.randint(0, n - 2 * k - insert)
                while pos in seen_pos:
                    pos = rng.randint(0, n - 2 * k - insert)
                seen_pos.add(pos)
                delta = int(deltas[rng.randint(0, 9999)]) if sigma else 0
                if pos + 2 * k + insert + delta > n:
                    continue
                r1 = ref[pos : pos + k]
                r2 = ref[pos + k + insert + delta : pos + 2 * k + insert + delta]
                frag = r1 + r2
                if frag in seen_read or frag.count("N") >= 10:
                    continue
                seen_read.add(frag)
                pairs.append(frag)
                idx += 1
    # vectorized substitution errors + output
    nr = len(pairs)
    if nr:
        arr = np.frombuffer("".join(pairs).encode(), dtype=np.uint8).reshape(nr, 2 * k).copy()
        if err > 0:
            erng = np.random.default_rng(seed + 1)
            mask = erng.random(arr.shape) < err
            rank = np.zeros(256, dtype=np.uint8)
            for i, c in enumerate("ACGT"):
                rank[ord(c)] = i
            shift = erng.integers(1, 4, arr.shape, dtype=np.uint8)
            alts = np.frombuffer(b"ACGT", dtype=np.uint8)[
                (rank[arr] + shift) % 4
            ]
            acgt = (arr != ord("N"))
            arr = np.where(mask & acgt, alts, arr)
        for i in range(nr):
            row = arr[i].tobytes().decode()
            out1.write(f">p{i:07d}/1\n{row[:k]}\n")
            out2.write(f">p{i:07d}/2\n{row[k:]}\n")
    out1.close()
    out2.close()
    print(prefix)


if __name__ == "__main__":
    main()
