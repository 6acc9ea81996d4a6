#!/usr/bin/env python3
"""A/B the device occ block width (SIGA_DEV_SAMPLE) on the bench config."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import simulate_reads


def main():
    import jax

    from siga_tpu.index import sa as sa_mod
    from siga_tpu.index.fm import FMIndex
    from siga_tpu.io.fastx import DNASeq
    from siga_tpu.overlap.builder import OverlapBuilder
    from siga_tpu.ops.search import batch_overlap_hits

    seqs = simulate_reads(10_000, 100)
    fwd_codes, _p, rev_codes, _rp, ns = sa_mod.build_index_arrays_pair(
        seqs, use_device=True
    )
    fmi = FMIndex(fwd_codes, ns)
    rfmi = FMIndex(rev_codes, ns)
    records = [DNASeq(name=f"r{i}", seq=s) for i, s in enumerate(seqs)]

    base = None
    for sample in [128, 64, 32, 64, 128]:
        os.environ["SIGA_DEV_SAMPLE"] = str(sample)
        builder = OverlapBuilder(fmi, rfmi)
        out = []
        for h in batch_overlap_hits(builder, records, 45):
            out.append(h.serialize())
        t0 = time.time()
        out2 = []
        for h in batch_overlap_hits(builder, records, 45):
            out2.append(h.serialize())
        dt = time.time() - t0
        if base is None:
            base = out
        assert out == base == out2, f"sample={sample} diverged"
        print(f"sample={sample}: {dt*1e3:.0f} ms, {len(seqs)/dt/1e3:.1f}k reads/s",
              flush=True)


if __name__ == "__main__":
    main()
