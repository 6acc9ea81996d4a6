#!/usr/bin/env python3
"""Microbenchmarks for the stage-A redesign: where does the 0.92s go, and
which TPU gather strategy is fastest?

Run on the real chip:  python benchmark/probe_gather.py
Everything runs in one process (one TPU claim).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

def timeit(fn, *args, reps=5, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
        jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(reps):
        r = fn(*args)
        jax.block_until_ready(r)
    return (time.time() - t0) / reps


def main():
    print("devices:", jax.devices())
    results = {}

    # ---- 1. current engine breakdown on the bench config ----
    from bench import simulate_reads
    from siga_tpu.index import sa as sa_mod
    from siga_tpu.index.fm import FMIndex
    from siga_tpu.io.fastx import DNASeq
    from siga_tpu.overlap.builder import OverlapBuilder
    from siga_tpu.ops.search import batch_overlap_hits
    from siga_tpu.ops import fm_device as fmd

    seqs = simulate_reads(10_000, 100)
    t0 = time.time()
    fwd_codes, _p, rev_codes, _rp, ns = sa_mod.build_index_arrays_pair(
        seqs, use_device=True
    )
    print("index cold:", round(time.time() - t0, 3))
    t0 = time.time()
    out = sa_mod.build_index_arrays_pair(seqs, use_device=True)
    print("index warm:", round(time.time() - t0, 3))
    del out

    fmi = FMIndex(fwd_codes, ns)
    rfmi = FMIndex(rev_codes, ns)
    builder = OverlapBuilder(fmi, rfmi)
    records = [DNASeq(name=f"r{i}", seq=s) for i, s in enumerate(seqs)]

    for _hit in batch_overlap_hits(builder, records, 45):
        pass
    t0 = time.time()
    nhit = 0
    for _hit in batch_overlap_hits(builder, records, 45):
        nhit += 1
    results["engine_total_sec"] = time.time() - t0

    # isolate: device scan only (same shapes as the engine uses)
    dfwd = fmd.DeviceFM(fmi)
    drev = fmd.DeviceFM(rfmi)
    scanner = fmd.DualScanner(dfwd, drev)
    chunk = seqs[:8192]
    h = scanner.dispatch(chunk, 8192, 112, 45)
    scanner.collect(h)  # warm compile
    t0 = time.time()
    h = scanner.dispatch(chunk, 8192, 112, 45)
    jax.block_until_ready(h[0])
    results["scan_device_sec_8k"] = time.time() - t0
    t0 = time.time()
    scanner.collect(h)
    results["scan_collect_host_sec_8k"] = time.time() - t0

    n_text = fmi.length
    nblocks = dfwd.nblocks
    print({k: round(v, 4) for k, v in results.items()}, "nhit", nhit,
          "text", n_text, "nblocks", nblocks, flush=True)

    # ---- 2. XLA row-gather microbench: table (NB, W) int32, Q queries ----
    Q = 65536
    for NB, W in [(8192, 17), (8192, 8), (32768, 8), (131072, 17), (1024, 17)]:
        table = jnp.asarray(np.random.randint(0, 100, (NB, W), dtype=np.int32))
        idx = jnp.asarray(np.random.randint(0, NB, Q, dtype=np.int32))

        @jax.jit
        def row_gather(table, idx):
            return table[idx].sum(axis=0)

        dt = timeit(row_gather, table, idx)
        rate = Q / dt / 1e6
        print(f"xla_row_gather NB={NB} W={W}: {dt*1e3:.2f} ms, {rate:.1f} Mrow/s",
              flush=True)

    # ---- 3. XLA take_along_axis lane-gather: (W, N) layout ----
    for NB in [8192, 32768]:
        W = 17
        N = max(NB, Q)
        table = jnp.asarray(np.random.randint(0, 100, (W, N), dtype=np.int32))
        idx1 = np.random.randint(0, NB, N, dtype=np.int32)
        idx = jnp.asarray(np.broadcast_to(idx1[None, :], (W, N)).copy())

        @jax.jit
        def lane_gather(table, idx):
            return jnp.take_along_axis(table, idx, axis=1).sum(axis=0)

        dt = timeit(lane_gather, table, idx)
        print(f"xla_lane_gather(take_along_axis ax1) NB={NB}: {dt*1e3:.2f} ms, "
              f"{N/dt/1e6:.1f} Mrow/s", flush=True)

    # ---- 4. one-hot matmul gather (bf16) ----
    for NB in [8192]:
        W = 68  # byte planes of 17 int32
        table = jnp.asarray(
            np.random.randint(0, 255, (NB, W)).astype(np.float32), dtype=jnp.bfloat16
        )
        idx = jnp.asarray(np.random.randint(0, NB, Q, dtype=np.int32))

        @jax.jit
        def onehot_gather(table, idx):
            oh = (idx[:, None] == jnp.arange(NB, dtype=jnp.int32)[None, :]).astype(
                jnp.bfloat16
            )
            return oh @ table

        dt = timeit(onehot_gather, table, idx)
        print(f"onehot_matmul NB={NB} Q={Q}: {dt*1e3:.2f} ms, {Q/dt/1e6:.1f} Mrow/s",
              flush=True)

    # ---- 5. Pallas kernels ----
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # 5a. lane-dim dynamic_gather inside a kernel, table resident in VMEM
    NB = 8192
    W = 17
    Wp = 24  # pad sublanes
    tableT = jnp.asarray(np.random.randint(0, 100, (Wp, NB), dtype=np.int32))
    idx1 = jnp.asarray(np.random.randint(0, NB, NB, dtype=np.int32))

    def k_lane(table_ref, idx_ref, out_ref):
        idx = jnp.broadcast_to(idx_ref[:][None, :], (Wp, NB))
        out_ref[:] = jnp.take_along_axis(table_ref[:], idx, axis=1)

    @jax.jit
    def pallas_lane(table, idx):
        return pl.pallas_call(
            k_lane,
            out_shape=jax.ShapeDtypeStruct((Wp, NB), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, idx)

    try:
        dt = timeit(pallas_lane, tableT, idx1)
        print(f"pallas_lane_gather NB={NB}: {dt*1e3:.2f} ms, {NB/dt/1e6:.1f} Mrow/s",
              flush=True)
    except Exception as e:
        print("pallas_lane_gather FAILED:", repr(e)[:300], flush=True)

    # 5b. sublane-dim dynamic_gather: row gather (NB, 128) layout
    table2 = jnp.asarray(np.random.randint(0, 100, (NB, 128), dtype=np.int32))
    idxq = jnp.asarray(np.random.randint(0, NB, NB, dtype=np.int32))

    def k_sub(table_ref, idx_ref, out_ref):
        idx = jnp.broadcast_to(idx_ref[:][:, None], (NB, 128))
        out_ref[:] = jnp.take_along_axis(table_ref[:], idx, axis=0)

    @jax.jit
    def pallas_sub(table, idx):
        return pl.pallas_call(
            k_sub,
            out_shape=jax.ShapeDtypeStruct((NB, 128), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table2, idxq)

    try:
        dt = timeit(pallas_sub, table2, idxq)
        print(f"pallas_sublane_gather NB={NB}: {dt*1e3:.2f} ms, "
              f"{NB/dt/1e6:.1f} Mrow/s", flush=True)
    except Exception as e:
        print("pallas_sublane_gather FAILED:", repr(e)[:300], flush=True)

    # 5c. smaller-table lane gather in a fori loop (scan-like): 112 steps
    steps = 112
    L = 32768  # lanes

    def k_scan(table_ref, c_ref, out_ref):
        def body(t, state):
            # fake backward-search step: two gathers + arithmetic
            idx = jnp.broadcast_to(
                ((state + t) % NB)[None, :], (Wp, NB)
            )
            g = jnp.take_along_axis(table_ref[:], idx, axis=1)
            return (state + g.sum(axis=0) + c_ref[t % 64]) % NB

        init = jnp.zeros((NB,), jnp.int32)
        out_ref[:] = jax.lax.fori_loop(0, steps, body, init)

    @jax.jit
    def pallas_scan(table, c):
        return pl.pallas_call(
            k_scan,
            out_shape=jax.ShapeDtypeStruct((NB,), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, c)

    c = jnp.asarray(np.random.randint(0, NB, 64, dtype=np.int32))
    try:
        dt = timeit(pallas_scan, tableT, c)
        rows = NB * steps
        print(f"pallas_scan_gather {steps} steps: {dt*1e3:.2f} ms, "
              f"{rows/dt/1e6:.1f} Mrow/s", flush=True)
    except Exception as e:
        print("pallas_scan_gather FAILED:", repr(e)[:300], flush=True)


if __name__ == "__main__":
    main()
