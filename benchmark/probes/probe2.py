#!/usr/bin/env python3
"""Second-round probes: link bandwidth, dispatch latency, engine host-side
breakdown, Pallas compile status."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    print("devices:", jax.devices(), flush=True)

    # ---- link bandwidth ----
    for mb in [1, 8]:
        a = np.random.randint(0, 100, (mb * 256 * 1024,), dtype=np.int32)
        d = jax.device_put(a)
        jax.block_until_ready(d)
        t0 = time.time()
        d = jax.device_put(a)
        jax.block_until_ready(d)
        up = time.time() - t0
        t0 = time.time()
        b = np.asarray(d)
        down = time.time() - t0
        print(f"link {mb}MB: up {up*1e3:.1f} ms ({mb/up:.1f} MB/s), "
              f"down {down*1e3:.1f} ms ({mb/down:.1f} MB/s)", flush=True)

    # ---- dispatch latency ----
    x = jnp.zeros((8,), jnp.int32)
    f = jax.jit(lambda x: x + 1)
    jax.block_until_ready(f(x))
    t0 = time.time()
    for _ in range(10):
        jax.block_until_ready(f(x))
    print(f"dispatch RT: {(time.time()-t0)/10*1e3:.1f} ms", flush=True)

    # async chain: 10 dispatches, one sync
    t0 = time.time()
    y = x
    for _ in range(10):
        y = f(y)
    jax.block_until_ready(y)
    print(f"async chain of 10: {(time.time()-t0)*1e3:.1f} ms", flush=True)

    # ---- Pallas compile status: the round-1 SW kernel ----
    try:
        from siga_tpu.ops.sw_pallas import sw_score_pallas

        ref = np.array([[1, 2, 3, 4] * 32], dtype=np.int32)
        qry = np.array([[1, 2, 3, 4] * 32], dtype=np.int32)
        out = sw_score_pallas(jnp.asarray(ref), jnp.asarray(qry))
        jax.block_until_ready(out)
        print("sw_pallas: OK", flush=True)
    except Exception as e:
        print("sw_pallas FAILED:", repr(e)[:200], flush=True)

    # minimal pallas kernel (no gather)
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def k(x_ref, o_ref):
            o_ref[:] = x_ref[:] * 2

        @jax.jit
        def g(x):
            return pl.pallas_call(
                k,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x)

        out = g(jnp.ones((8, 128), jnp.int32))
        jax.block_until_ready(out)
        print("pallas minimal: OK", flush=True)
    except Exception as e:
        print("pallas minimal FAILED:", repr(e)[:200], flush=True)

    # ---- engine host-side breakdown ----
    from bench import simulate_reads
    from siga_tpu.index import sa as sa_mod
    from siga_tpu.index.fm import FMIndex
    from siga_tpu.overlap.builder import OverlapBuilder
    from siga_tpu.ops import fm_device as fmd
    from siga_tpu.ops import search as search_mod

    seqs = simulate_reads(10_000, 100)
    fwd_codes, _p, rev_codes, _rp, ns = sa_mod.build_index_arrays_pair(
        seqs, use_device=True
    )
    fmi = FMIndex(fwd_codes, ns)
    rfmi = FMIndex(rev_codes, ns)
    builder = OverlapBuilder(fmi, rfmi)

    dfwd = fmd.DeviceFM(fmi)
    drev = fmd.DeviceFM(rfmi)
    scanner = fmd.DualScanner(dfwd, drev)
    chunk = seqs[:8192]
    h = scanner.dispatch(chunk, 8192, 112, 45)
    f_view, r_view = scanner.collect(h)  # warm

    h = scanner.dispatch(chunk, 8192, 112, 45)
    jax.block_until_ready(h[0])
    # collect sub-breakdown
    (out, cap, fcap, n, max_t, min_overlap, la_d, lens_d) = h
    counts_d, idx, data, fidx, frows, subwords = out
    t0 = time.time()
    counts = np.asarray(counts_d)
    t_counts = time.time() - t0
    nblocks, fcount = int(counts[0]), int(counts[1])
    k = fmd._slice_size(nblocks, cap)
    fk = fmd._slice_size(fcount, fcap)
    t0 = time.time()
    packed_d = fmd._pack_v2(k, fk, idx, data, fidx, frows, subwords)
    jax.block_until_ready(packed_d)
    t_pack = time.time() - t0
    t0 = time.time()
    packed = np.asarray(packed_d)
    t_xfer = time.time() - t0
    print(f"collect: counts_sync {t_counts*1e3:.1f} ms, pack {t_pack*1e3:.1f} ms, "
          f"xfer {t_xfer*1e3:.1f} ms ({packed.nbytes/1e6:.2f} MB, "
          f"{packed.nbytes/1e6/t_xfer:.1f} MB/s)", flush=True)
    print(f"emitted blocks {nblocks}, containment cands {fcount}, k={k} fk={fk}",
          flush=True)

    # host processing time (everything after collect)
    h = scanner.dispatch(chunk, 8192, 112, 45)
    t0 = time.time()
    f_view, r_view = scanner.collect(h)
    t_collect = time.time() - t0

    from siga_tpu.io.fastx import DNASeq

    records = [DNASeq(name=f"r{i}", seq=s) for i, s in enumerate(chunk)]
    f_lane, f_t, f_data, f_cl, f_cr, f_sub = f_view
    r_lane, r_t, r_data, r_cl, r_cr, r_sub = r_view
    t0 = time.time()
    f_data8 = search_mod._with_probe(fmi, f_data)
    r_data8 = search_mod._with_probe(rfmi, r_data)
    t_probe = time.time() - t0
    n_lanes = len(f_sub) // 2

    proc = search_mod._native_chunk_processor(builder)
    print("native proc:", proc is not None, flush=True)
    if proc is not None:
        lens_chunk = np.array([len(s) for s in chunk], dtype=np.int64)
        f_starts = np.searchsorted(f_lane, np.arange(2 * n_lanes // 1 + 1))
        # use the exact code path shape
        num_lanes = 2 * n_lanes
        f_starts = np.searchsorted(f_lane, np.arange(num_lanes + 1))
        r_starts = np.searchsorted(r_lane, np.arange(num_lanes + 1))
        f_fi = search_mod._final8_from_cands(num_lanes, f_cl, f_cr)
        r_fi = search_mod._final8_from_cands(num_lanes, r_cl, r_cr)
        t0 = time.time()
        outs, substr, failed = proc.run(
            lens_chunk, True, True, n_lanes,
            (f_starts, f_t, f_data8, f_fi, f_sub),
            (r_starts, r_t, r_data8, r_fi, r_sub),
        )
        t_native = time.time() - t0
        nfinal = sum(len(o) for o in outs)
        t0 = time.time()
        hits = [search_mod._LazyHit(kk, bool(substr[kk]), outs[kk])
                for kk in range(len(chunk))]
        lines = [hh.serialize() for hh in hits]
        t_ser = time.time() - t0
        print(f"collect {t_collect*1e3:.1f} ms, with_probe {t_probe*1e3:.1f} ms, "
              f"native_BC {t_native*1e3:.1f} ms ({nfinal} final blocks), "
              f"serialize {t_ser*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
