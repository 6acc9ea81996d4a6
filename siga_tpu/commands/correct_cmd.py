"""`siga correct` — k-mer error correction.

Mirrors /root/reference/src/correct.cpp: load the forward FM-index only, run
the corrector over the reads, write only validQC reads to <prefix>.ec.fa.
"""
from __future__ import annotations

import sys
from typing import List

from ..constants import BWT_EXT, EC_EXT, FA_EXT
from ..correct.kmer import correct_reads
from ..index.fm import FMIndex
from ..io import fastx


def run(opts: dict, arguments: List[str]) -> int:
    if len(arguments) != 1:
        print("usage: siga correct [OPTION] ... READSFILE", file=sys.stderr)
        return 256
    input_path = arguments[0]
    prefix = opts.get("prefix") or fastx.stem(input_path)
    output = opts.get("out") or (prefix + EC_EXT + FA_EXT)

    algorithm = str(opts.get("algorithm", "kmer"))
    if algorithm != "kmer":
        print(f"correct algorithm {algorithm} is not supported", file=sys.stderr)
        return 255

    index = FMIndex.load(prefix + BWT_EXT)
    reads = fastx.read_sequences(input_path)
    kmer_size = int(opts.get("kmer-size", 31))

    # The vectorized batch corrector's count oracle is the read set itself,
    # valid exactly when the index was built from these reads (the standard
    # `siga correct` invocation, /root/reference/src/correct.cpp:44-53).
    consistent = (
        index.num_strings == len(reads)
        and index.length == sum(len(r.seq) + 1 for r in reads)
        and kmer_size <= 64
    )
    engine = str(opts.get("engine", "auto"))
    # big inputs stream: the one-shot window table costs O(total bases)
    # host memory, the streaming build O(chunk + distinct k-mers)
    stream = engine == "stream" or (
        engine in ("auto", "tpu") and len(reads) > 300_000
    )
    if consistent and stream:
        from ..correct.batch import correct_reads_streaming

        corrected = correct_reads_streaming(
            reads,
            kmer_size=kmer_size,
            rounds=int(opts.get("kmer-rounds", 10)),
            count_offset=int(opts.get("kmer-count-offset", 1)),
            threshold=int(opts.get("kmer-threshold", 3)),
        )
    elif consistent and engine in ("auto", "tpu", "batch"):
        from ..correct.batch import correct_reads_batch

        corrected = correct_reads_batch(
            reads,
            kmer_size=kmer_size,
            rounds=int(opts.get("kmer-rounds", 10)),
            count_offset=int(opts.get("kmer-count-offset", 1)),
            threshold=int(opts.get("kmer-threshold", 3)),
        )
    else:
        counter = None
        if engine in ("auto", "tpu"):
            from ..ops.fm_device import DeviceFM
            from ..ops.kmer_count import KmerCounter

            counter = KmerCounter(DeviceFM(index))
        corrected = correct_reads(
            index,
            reads,
            kmer_size=kmer_size,
            rounds=int(opts.get("kmer-rounds", 10)),
            count_offset=int(opts.get("kmer-count-offset", 1)),
            threshold=int(opts.get("kmer-threshold", 3)),
            counter=counter,
        )

    with fastx.xopen(output, "wt") as out:
        for rec in corrected:
            out.write(rec.format())
    return 0
