#!/usr/bin/env python3
"""Contig-quality evaluation: contig_number / matched / N50 / N90 / MAX.

Python-3 equivalent of /root/reference/benchmark/contigs_mapping.py, with the
(commented-out there) exact substring matching enabled on both strands.

usage: contigs_mapping.py MIN_LENGTH REF.fa [fasta|txt] [UNMATCHED_OUT] < contigs
"""
import sys

COMP = str.maketrans("ACGTN", "TGCAN")


def revcomp(s):
    return s.translate(COMP)[::-1]


def fasta_read(stream):
    name, parts = None, []
    for line in stream:
        line = line.strip()
        if not line:
            continue
        if line.startswith(">"):
            if name is not None:
                yield name, "".join(parts)
            name, parts = line[1:], []
        else:
            parts.append(line)
    if name is not None:
        yield name, "".join(parts)


def contig_read(stream, fmt):
    if fmt == "txt":
        for i, line in enumerate(l.strip() for l in stream):
            if line:
                yield f"c{i}", line
    else:
        yield from fasta_read(stream)


def contig_find(refs, mapping, contig):
    found = False
    for i, ref in enumerate(refs):
        r = ref.find(contig)
        while r != -1:
            for k in range(len(contig)):
                mapping[i][r + k] = 1
            found = True
            r = ref.find(contig, r + 1)
    return found


def main():
    min_length = int(sys.argv[1])
    refs = []
    with open(sys.argv[2]) as f:
        print("ref:")
        for name, seq in fasta_read(f):
            print(f"{name}: {len(seq)}")
            refs.append(seq.upper())
    fmt = sys.argv[3] if len(sys.argv) > 3 else "txt"
    unmatched_path = sys.argv[4] if len(sys.argv) > 4 else "unmatched_contigs"

    contig_number = 0
    matched = 0
    total = 0
    lengths = []
    mapping = [[0] * len(r) for r in refs]
    with open(unmatched_path, "w") as unmatched:
        for name, contig in contig_read(sys.stdin, fmt):
            if len(contig) < min_length:
                continue
            contig_number += 1
            total += len(contig)
            lengths.append(len(contig))
            if contig_find(refs, mapping, contig) or contig_find(
                refs, mapping, revcomp(contig)
            ):
                matched += 1
            else:
                unmatched.write(f">{name}\n{contig}\n")

    print(f"contig_number: {contig_number}")
    print(f"matched_contig: {matched}")
    print(f"unmatched_contig: {contig_number - matched}")
    lengths.sort(reverse=True)
    acc = 0
    n50_done = False
    for l in lengths:
        acc += l
        if not n50_done and acc > total / 2:
            print(f"N50: {l}")
            n50_done = True
        if acc > total * 9 / 10:
            print(f"N90: {l}")
            break
    if lengths:
        print(f"MAX_contig: {lengths[0]}")
    # genome coverage from the mapping table
    covered = sum(sum(m) for m in mapping)
    ref_total = sum(len(r) for r in refs)
    if ref_total:
        print(f"genome_covered: {covered} ({covered / ref_total:.4f})")


if __name__ == "__main__":
    main()
