#!/usr/bin/env python3
"""ASQG -> Graphviz dot (equivalent of /root/reference/benchmark/graphviz.awk).

usage: zcat graph.asqg.gz | python graphviz.py [--min-overlap N] > graph.dot
"""
import argparse
import re
import sys


def clean(s):
    return re.sub(r"[-/\.|:]", "_", s)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-overlap", type=int, default=0)
    args = ap.parse_args()

    lengths = {}
    edge_nodes = set()
    lines = []
    print("digraph {")
    for line in sys.stdin:
        fields = line.rstrip("\n").split("\t")
        if fields[0] == "VT" and len(fields) >= 3:
            vid = clean(fields[1])
            lengths[vid] = len(fields[2])
            if len(fields[2]) >= 1000:
                print(f"{vid}_{len(fields[2])}[style=filled,color=green];")
            else:
                print(f"{vid}_{len(fields[2])};")
        elif fields[0] == "ED" and len(fields) >= 2:
            t = fields[1].split()
            v1, v2 = clean(t[0]), clean(t[1])
            s1, e1 = int(t[2]), int(t[3])
            s2, e2 = int(t[5]), int(t[6])
            rc = t[8]
            if e1 - s1 + 1 < args.min_overlap:
                continue
            edge_nodes.add(v1)
            edge_nodes.add(v2)
            l1, l2 = lengths.get(v1, 0), lengths.get(v2, 0)
            if s1 == 0 and s2 == 0:
                pass  # head-to-head (rc) edges omitted like the reference
            elif s1 == 0:
                print(f"{v2}_{l2}->{v1}_{l1}[label=\"{e1 - s1 + 1}_{rc}\"];")
            elif s2 == 0:
                print(f"{v1}_{l1}->{v2}_{l2}[label=\"{e2 - s2 + 1}_{rc}\"];")
            else:
                print(f"{v2}_{l2}->{v1}_{l1}[label=\"{e1 - s1 + 1}_{rc}F\"];")
                print(f"{v1}_{l1}->{v2}_{l2}[label=\"{e2 - s2 + 1}_{rc}F\"];")
    for vid, l in lengths.items():
        if vid not in edge_nodes:
            print(f"{vid}_{l};")
    print("}")


if __name__ == "__main__":
    main()
