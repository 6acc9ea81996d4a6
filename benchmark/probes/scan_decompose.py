"""Probe: decompose dispatch+collect at large n into pack/scan/ship, and
measure raw link bandwidth.  Identifies the binding constraint for the
stage-A engine on this backend."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import simulate_reads
from siga_tpu.index import sa as sa_mod
from siga_tpu.index.fm import FMIndex
from siga_tpu.ops.fm_device import DeviceFM, DualScanner, pack_reads_2bit


def main():
    # --- link probes ---
    x = jnp.zeros((8,), jnp.int32)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(10):
        _ = int(jnp.sum(x))
    print(f"round-trip latency: {(time.perf_counter()-t0)/10*1000:.1f} ms")
    for mb in (1, 8):
        n = mb * 1024 * 1024 // 4
        h = np.arange(n, dtype=np.int32)
        t0 = time.perf_counter()
        xd = jax.device_put(h)
        jax.block_until_ready(xd)
        up = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = np.asarray(xd)
        down = time.perf_counter() - t0
        print(f"{mb:3d} MB  up {mb/up:7.1f} MB/s  down {mb/down:7.1f} MB/s")

    # --- scan decomposition at n=10000 ---
    n_reads, readlen, min_overlap = 10000, 100, 45
    reads = simulate_reads(n_reads, readlen)
    fwd_codes, _p, rev_codes, _rp, ns = sa_mod.build_index_arrays_pair(
        reads, use_device=True
    )
    fmi = FMIndex(fwd_codes, ns)
    rfmi = FMIndex(rev_codes, ns)
    sc = DualScanner(DeviceFM(fmi), DeviceFM(rfmi))
    maxlen = 112
    for n in (10000, 40000):
        seqs = (reads * ((n // len(reads)) + 1))[:n]
        h = sc.dispatch(seqs, n, maxlen, min_overlap)
        sc.collect(h)  # warm: compiles + sticky caps settle

        REP = 3
        tm = dict(pack=0.0, upload=0.0, scan=0.0, shippack=0.0, fetch=0.0)
        for _ in range(REP):
            t0 = time.perf_counter()
            la_w, lens = pack_reads_2bit(seqs, n, maxlen)
            tm["pack"] += time.perf_counter() - t0
            t0 = time.perf_counter()
            la_d, lens_d = sc._put(la_w, lens)
            jax.block_until_ready(la_d)
            tm["upload"] += time.perf_counter() - t0
            max_t = maxlen - 1
            lim_t = min(max_t, -(-(int(lens.max()) - 1) // 8) * 8)
            cap, fcap = sc._cap, 4 * n
            kb, kc = min(sc._kb, cap), min(sc._kc, fcap)
            t0 = time.perf_counter()
            out = sc._run(cap, fcap, max_t, lim_t, min_overlap, la_d, lens_d)
            jax.block_until_ready(out)
            tm["scan"] += time.perf_counter() - t0
            t0 = time.perf_counter()
            packed = sc._pack_ship(out, kb, kc)
            jax.block_until_ready(packed)
            tm["shippack"] += time.perf_counter() - t0
            t0 = time.perf_counter()
            host = np.asarray(packed)
            tm["fetch"] += time.perf_counter() - t0
        nb = int(host[0])
        print(f"n={n}: kb={kb} kc={kc} blocks={nb} "
              f"packed_bytes={packed.size*4}")
        for k, v in tm.items():
            print(f"  {k:9s} {v/REP*1000:8.1f} ms")
        total = sum(tm.values()) / REP
        print(f"  total     {total*1000:8.1f} ms -> {n/total:.0f} reads/s")


if __name__ == "__main__":
    main()
