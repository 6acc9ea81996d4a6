"""Probe: per-step cost of the stage-A scan vs lane count.

Hypothesis (VERDICT r3): the scan is step-overhead bound — each of the ~99
sequential lax.scan steps pays a fixed cost regardless of lane count, so
fewer+fatter chunks amortize it.  Measures wall time of the jitted scan at
several lane counts on the real chip.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")

from siga_tpu.index.fm import FMIndex
from siga_tpu.ops.fm_device import DeviceFM, DualScanner, pack_reads_2bit

def main():
    n_reads = 10000
    readlen = 100
    sys.path.insert(0, "/root/repo")
    from bench import simulate_reads
    from siga_tpu.index import sa as sa_mod

    reads = simulate_reads(n_reads, readlen)
    fwd_codes, _p, rev_codes, _rp, ns = sa_mod.build_index_arrays_pair(
        reads, use_device=True
    )
    fmi = FMIndex(fwd_codes, ns)
    rfmi = FMIndex(rev_codes, ns)
    dfwd, drev = DeviceFM(fmi), DeviceFM(rfmi)
    sc = DualScanner(dfwd, drev)
    min_overlap = 45
    maxlen = 112
    for n in (1250, 2500, 5000, 10000, 20000, 40000):
        seqs = (reads * ((n // len(reads)) + 1))[:n]
        # warm
        h = sc.dispatch(seqs, n, maxlen, min_overlap)
        sc.collect(h)
        t0 = time.perf_counter()
        REP = 3
        for _ in range(REP):
            h = sc.dispatch(seqs, n, maxlen, min_overlap)
            sc.collect(h)
        dt = (time.perf_counter() - t0) / REP
        lanes = 4 * n
        print(f"n={n:6d} lanes={lanes:6d} wall={dt*1000:8.1f} ms "
              f"per-step={dt/99*1e6:8.1f} us reads/s={n/dt:10.0f}")


if __name__ == "__main__":
    main()
