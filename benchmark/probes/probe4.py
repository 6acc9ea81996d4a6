#!/usr/bin/env python3
"""Fourth probe: where do the engine's 0.3s go?  Breaks the bench engine pass
into device scan / host collect / stage B+C / emission, and times a
synthetic scan identical in shape to production to separate device compute
from host orchestration."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    print("devices:", jax.devices(), flush=True)
    from bench import simulate_reads
    from siga_tpu.index import sa as sa_mod
    from siga_tpu.index.fm import FMIndex
    from siga_tpu.io.fastx import DNASeq
    from siga_tpu.overlap.builder import OverlapBuilder
    from siga_tpu.ops.search import batch_overlap_hits
    from siga_tpu.ops import fm_device as fmd

    seqs = simulate_reads(10_000, 100)
    fwd_codes, _p, rev_codes, _rp, ns = sa_mod.build_index_arrays_pair(
        seqs, use_device=True
    )
    fmi = FMIndex(fwd_codes, ns)
    rfmi = FMIndex(rev_codes, ns)
    builder = OverlapBuilder(fmi, rfmi)
    records = [DNASeq(name=f"r{i}", seq=s) for i, s in enumerate(seqs)]

    # warm
    for _hit in batch_overlap_hits(builder, records, 45):
        pass
    t0 = time.time()
    nhit = 0
    for _hit in batch_overlap_hits(builder, records, 45):
        nhit += 1
    print("engine_total", round(time.time() - t0, 4), flush=True)

    # ---- fine-grained: one 8192-read chunk through the DualScanner ----
    dfwd = fmd.DeviceFM(fmi)
    drev = fmd.DeviceFM(rfmi)
    scanner = fmd.DualScanner(dfwd, drev)
    chunk = seqs[:8192]

    # (a) pack_reads_2bit host time
    t0 = time.time()
    for _ in range(5):
        la_w, lens = fmd.pack_reads_2bit(chunk, 8192, 112)
    t_pack = (time.time() - t0) / 5
    print("pack_reads_2bit", round(t_pack, 4), flush=True)

    # (b) device upload
    t0 = time.time()
    for _ in range(5):
        la_d, lens_d = scanner._put(la_w, lens)
        jax.block_until_ready(la_d)
    print("upload", round((time.time() - t0) / 5, 4), flush=True)

    # (c) raw scan (device only)
    h = scanner.dispatch(chunk, 8192, 112, 45)
    scanner.collect(h)  # warm all shapes
    out = scanner._run(scanner._cap, 8192 * 4, 111, 104, 45, la_d, lens_d)
    jax.block_until_ready(out[0])
    t0 = time.time()
    for _ in range(5):
        out = scanner._run(scanner._cap, 8192 * 4, 111, 104, 45, la_d, lens_d)
        jax.block_until_ready(out[0])
    t_scan = (time.time() - t0) / 5
    print("device_scan_only", round(t_scan, 4), flush=True)

    # (d) pack+ship (device slice + start async copy)
    t0 = time.time()
    for _ in range(5):
        packed = scanner._pack_ship(out, scanner._kb, scanner._kc)
        jax.block_until_ready(packed)
    print("pack_ship", round((time.time() - t0) / 5, 4), flush=True)

    # (e) host fetch (np.asarray of packed)
    t0 = time.time()
    for _ in range(5):
        _ = np.asarray(packed)
    print("host_fetch", round((time.time() - t0) / 5, 4),
          "bytes", packed.size * 4, flush=True)

    # (f) full dispatch+collect
    t0 = time.time()
    for _ in range(5):
        h = scanner.dispatch(chunk, 8192, 112, 45)
        f_view, r_view = scanner.collect(h)
    print("dispatch_collect", round((time.time() - t0) / 5, 4), flush=True)

    # (g) stage B/C native on the collected views
    from siga_tpu.ops.search import (
        _with_probe, _final8_from_cands, _native_chunk_processor,
    )

    f_lane, f_t, f_data, f_cl, f_cr, f_sub = f_view
    r_lane, r_t, r_data, r_cl, r_cr, r_sub = r_view
    t0 = time.time()
    for _ in range(5):
        fd = _with_probe(fmi, f_data)
        rd = _with_probe(rfmi, r_data)
    print("with_probe", round((time.time() - t0) / 5, 4), flush=True)

    proc = _native_chunk_processor(builder)
    lens_chunk = np.array([len(s) for s in chunk], dtype=np.int64)
    num_lanes = 2 * 8192
    f_starts = np.searchsorted(f_lane, np.arange(num_lanes + 1))
    r_starts = np.searchsorted(r_lane, np.arange(num_lanes + 1))
    f_fi = _final8_from_cands(num_lanes, f_cl, f_cr)
    r_fi = _final8_from_cands(num_lanes, r_cl, r_cr)
    t0 = time.time()
    for _ in range(5):
        outs, substr, failed = proc.run(
            lens_chunk, True, True, 8192,
            (f_starts, f_t, fd, f_fi, f_sub),
            (r_starts, r_t, rd, r_fi, r_sub),
        )
    print("native_BC", round((time.time() - t0) / 5, 4), flush=True)

    # (h) scan step count scaling: how does device time scale with lim_t?
    for lim in (48, 64, 104):
        out = scanner._run(scanner._cap, 8192 * 4, 111, lim, 45, la_d, lens_d)
        jax.block_until_ready(out[0])
        t0 = time.time()
        for _ in range(3):
            out = scanner._run(scanner._cap, 8192 * 4, 111, lim, 45, la_d, lens_d)
            jax.block_until_ready(out[0])
        print(f"scan lim_t={lim}", round((time.time() - t0) / 3, 4), flush=True)


if __name__ == "__main__":
    main()
