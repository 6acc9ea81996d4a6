"""Native (C++) extraction engine vs the Python batched extractor."""
import random

import numpy as np
import pytest

from siga_tpu import native
from siga_tpu.index import sa as sa_mod
from siga_tpu.index.fm import FMIndex
from siga_tpu.overlap.builder import Hit, OverlapBuilder

from naive import revcomp


def random_genome(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_matches_python_extractor():
    rng = random.Random(77)
    genome = random_genome(rng, 400)
    seqs = []
    i = 0
    while i + 60 <= len(genome):
        seqs.append(genome[i : i + 60])
        i += 13
    seqs.append(revcomp(seqs[3]))
    fwd, _p, ns = sa_mod.build_index_arrays(seqs)
    rev, _rp, _ = sa_mod.build_index_arrays([s[::-1] for s in seqs])
    fmi, rfmi = FMIndex(fwd, ns), FMIndex(rev, ns)
    builder = OverlapBuilder(fmi, rfmi)

    # host-exact hits (per-read python extractor)
    host_lines = []
    for i, s in enumerate(seqs):
        hit = Hit(idx=i)
        res = builder.overlap(s, 25, hit.blocks)
        hit.substring = res.substring
        host_lines.append(hit.serialize())

    # device path (uses the native extractor when available)
    from siga_tpu.io.fastx import DNASeq
    from siga_tpu.ops.search import batch_overlap_hits

    records = [DNASeq(name=f"r{i}", seq=s) for i, s in enumerate(seqs)]
    dev_lines = [h.serialize() for h in batch_overlap_hits(builder, records, 25)]
    assert dev_lines == host_lines


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_extractor_direct():
    """Drive NativeExtractor and BatchedExtractor on identical tasks."""
    rng = random.Random(5)
    genome = random_genome(rng, 300)
    seqs = [genome[i : i + 50] for i in range(0, 250, 11)]
    fwd, _p, ns = sa_mod.build_index_arrays(seqs)
    rev, _rp, _ = sa_mod.build_index_arrays([s[::-1] for s in seqs])
    fmi, rfmi = FMIndex(fwd, ns), FMIndex(rev, ns)
    builder = OverlapBuilder(fmi, rfmi)

    from siga_tpu.overlap.batch_extract import BatchedExtractor, make_task
    from siga_tpu.overlap.builder import OverlapResult
    from siga_tpu.ops.search import _blocks_to_array

    def collect(seq):
        result = OverlapResult()
        sf, sr, pf, pr, cf, cr = [], [], [], [], [], []
        from siga_tpu.core import dna
        from siga_tpu.overlap.builder import (
            AF_PREFIX_PREFIX,
            AF_PREFIX_SUFFIX,
            AF_SUFFIX_PREFIX,
            AF_SUFFIX_SUFFIX,
            BlockFinder,
        )

        finder = BlockFinder(fmi, rfmi, 20)
        rfinder = BlockFinder(rfmi, fmi, 20)
        finder.find(seq, AF_SUFFIX_PREFIX, sf, cf, result)
        finder.find(dna.reverse_complement(seq), AF_PREFIX_PREFIX, pf, cf, result)
        rfinder.find(dna.reverse(seq), AF_PREFIX_SUFFIX, pr, cr, result)
        rfinder.find(dna.complement(seq), AF_SUFFIX_SUFFIX, sr, cr, result)
        blocks = []
        return builder.prepare_lists(len(seq), sf, sr, pf, pr, cf, cr, blocks)

    py_tasks = []
    nat_arrays = []
    for s in seqs:
        sj, pj = collect(s)
        py_tasks.append(make_task(None, [b.copy() for b in sj]))
        py_tasks.append(make_task(None, [b.copy() for b in pj]))
        nat_arrays.append(_blocks_to_array(sorted(sj, key=lambda b: -b.length)))
        nat_arrays.append(_blocks_to_array(sorted(pj, key=lambda b: -b.length)))

    BatchedExtractor(fmi, rfmi).run(py_tasks)
    outs, failed = native.NativeExtractor(fmi, rfmi).run(nat_arrays)
    assert not failed.any()
    for t, out in zip(py_tasks, outs):
        got = [b.serialize() for b in t.out]
        want = [
            f"{v[0]} {v[1]} {v[2]} {v[3]} {v[4]} {v[5]} {v[6]} {v[7]} {v[8]} "
            + format(v[9], "03b")
            for v in out.tolist()
        ]
        assert got == want


def test_format_hits_matches_python_serialize():
    """C++ hits text serialization == Hit.serialize() + newline."""
    import numpy as np

    from siga_tpu import native
    from siga_tpu.overlap.builder import Hit
    from siga_tpu.ops.search import _array_to_blocks

    if not native.available():
        return
    rng = np.random.default_rng(3)
    idxs, subs, arrays, want = [], [], [], []
    for i in range(50):
        k = int(rng.integers(0, 6))
        arr = rng.integers(0, 1_000_000, size=(k, 10)).astype(np.int64)
        arr[:, 9] = rng.integers(0, 8, size=k)
        hit = Hit(idx=1000 + i, substring=bool(rng.integers(0, 2)))
        hit.blocks = _array_to_blocks(arr)
        idxs.append(hit.idx)
        subs.append(hit.substring)
        arrays.append(arr)
        want.append(hit.serialize() + "\n")
    blob, offs = native.format_hits(idxs, subs, arrays)
    got = [blob[offs[i] : offs[i + 1]].decode() for i in range(len(idxs))]
    assert got == want
