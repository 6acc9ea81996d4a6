"""Round-3 stage profiling: where does engine time go in the driver env?

Breaks batch_overlap_hits into: device scan (block_until_ready), pack+host
transfer, host-side prep (_with_probe etc.), native stage B/C, hit yield.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import numpy as np


def simulate_reads(num_reads=10_000, readlen=100, genome_size=200_000, seed=7):
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, genome_size, dtype=np.int8)
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
    starts = rng.integers(0, genome_size - readlen, num_reads)
    return [alphabet[genome[s : s + readlen]].tobytes().decode() for s in starts]


def main():
    num_reads = int(os.environ.get("BENCH_READS", "10000"))
    readlen = 100
    min_overlap = 45

    from siga_tpu.index import sa as sa_mod
    from siga_tpu.index.fm import FMIndex
    from siga_tpu.io.fastx import DNASeq
    from siga_tpu.overlap.builder import OverlapBuilder
    from siga_tpu.ops import search as search_mod
    from siga_tpu.ops.fm_device import DeviceFM, DualScanner, pack_reads_2bit
    import jax

    seqs = simulate_reads(num_reads, readlen)
    _ = jax.numpy.zeros((8,)).sum().block_until_ready()

    fwd_codes, _perm, rev_codes, _rperm, ns = sa_mod.build_index_arrays_pair(
        seqs, use_device=True
    )
    fmi = FMIndex(fwd_codes, ns)
    rfmi = FMIndex(rev_codes, ns)
    builder = OverlapBuilder(fmi, rfmi)
    records = [DNASeq(name=f"r{i}", seq=s) for i, s in enumerate(seqs)]

    from siga_tpu.ops.search import batch_overlap_hits

    # full warm pass
    for _ in batch_overlap_hits(builder, records, min_overlap):
        pass
    t0 = time.time()
    n = 0
    for _ in batch_overlap_hits(builder, records, min_overlap):
        n += 1
    total = time.time() - t0
    print(f"engine total: {total:.3f}s  ({n/total:.0f} reads/s)")

    # --- manual per-stage breakdown (serialized, no lookahead overlap) ---
    dfwd = DeviceFM(fmi)
    drev = DeviceFM(rfmi)
    scanner = DualScanner(dfwd, drev)
    chunk_reads = 8192
    maxlen = 112

    # stage 0: host 2-bit packing
    t0 = time.time()
    packs = []
    for s in range(0, len(records), chunk_reads):
        chunk = [r.seq for r in records[s : s + chunk_reads]]
        nb = search_mod._bucket_reads(len(chunk), chunk_reads, 1)
        packs.append((pack_reads_2bit(chunk, nb, maxlen), nb, len(chunk)))
    t_pack = time.time() - t0

    # warm the scan shapes
    for (la_w, lens), nb, _nc in packs:
        la_d, lens_d = scanner._put(la_w, lens)
        out = scanner._run(scanner._cap, nb * 4, maxlen - 1, 104, min_overlap, la_d, lens_d)
        jax.block_until_ready(out)

    # stage 1: device upload
    t0 = time.time()
    ups = []
    for (la_w, lens), nb, _nc in packs:
        ups.append(scanner._put(la_w, lens))
    jax.block_until_ready(ups)
    t_up = time.time() - t0

    # stage 2: device scan only
    t0 = time.time()
    outs = []
    for (la_d, lens_d), ((la_w, lens), nb, _nc) in zip(ups, packs):
        outs.append(
            scanner._run(scanner._cap, nb * 4, maxlen - 1, 104, min_overlap, la_d, lens_d)
        )
    jax.block_until_ready(outs)
    t_scan = time.time() - t0

    # stage 3: pack + transfer to host
    kb, kc = scanner._kb or 49152, scanner._kc or 20480
    t0 = time.time()
    packed = []
    for out in outs:
        packed.append(np.asarray(scanner._pack_ship(out, kb, kc)))
    t_xfer = time.time() - t0
    sizes = [p.nbytes for p in packed]

    # stage 4: everything after collect() — run full loop again and subtract
    print(f"host 2-bit pack : {t_pack:.3f}s")
    print(f"upload          : {t_up:.3f}s ({sum((p[0][0].nbytes + p[0][1].nbytes) for p in packs)/1e6:.2f} MB)")
    print(f"device scan     : {t_scan:.3f}s")
    print(f"pack+transfer   : {t_xfer:.3f}s ({sum(sizes)/1e6:.2f} MB)")
    print(f"rest (B/C etc.) : {total - t_pack - t_up - t_scan - t_xfer:.3f}s (by difference vs overlapped total)")

    # how many blocks emitted?
    tot_blocks = sum(int(p[0]) for p in packed)
    tot_cands = sum(int(p[1]) for p in packed)
    print(f"blocks={tot_blocks} cands={tot_cands}")


if __name__ == "__main__":
    main()
