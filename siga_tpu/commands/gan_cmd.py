"""`siga gan` — emit labeled ML training rows for graph edges
(/root/reference/src/gan.cpp + GANVisitor).

The reference command runs GANVisitor rounds over the loaded graph, emitting
one feature row per edge with a true/false-positive label derived from a
reference FM-index (--ref) or EX-tag alignments.  Hidden from help like the
reference (registered with rank kUnknown, src/gan.cpp:107).
"""
from __future__ import annotations

import sys
from typing import List

from ..graph.bigraph import Bigraph, ED_SENSE
from ..io import fastx


def run(opts: dict, arguments: List[str]) -> int:
    if len(arguments) != 1:
        print("usage: siga gan [OPTION] ... ASQGFILE", file=sys.stderr)
        return 256
    input_path = arguments[0]
    with fastx.xopen(input_path, "rt") as stream:
        g = Bigraph.load(stream, int(opts.get("min-overlap", 0)), True, -1)

    ref_index = None
    if opts.get("ref"):
        from ..constants import BWT_EXT
        from ..core import dna
        from ..index.fm import FMIndex

        ref_index = FMIndex.load(str(opts["ref"]) + BWT_EXT)

    # one row per canonical edge: overlap length, vertex lengths, coverages,
    # degrees, and (when a reference is given) a ground-truth label from an
    # exact-match lookup of the merged sequence.
    for v in g.vertices.values():
        for edge in v.edges:
            if edge.start().id > edge.end.id:
                continue
            o = edge.coord.length()
            label = ""
            if ref_index is not None:
                from ..core import dna

                merged = edge.start().seq + edge.label()
                n = ref_index.occurrences(merged) + ref_index.occurrences(
                    dna.reverse_complement(merged)
                )
                label = f"\t{1 if n > 0 else 0}"
            print(
                f"{edge.start().id}\t{edge.end.id}\t{o}"
                f"\t{len(edge.start().seq)}\t{len(edge.end.seq)}"
                f"\t{edge.start().coverage}\t{edge.end.coverage}"
                f"\t{edge.start().degrees()}\t{edge.end.degrees()}{label}"
            )
    return 0
