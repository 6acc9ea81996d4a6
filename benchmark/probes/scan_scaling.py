"""Is the stage-A scan per-step latency-bound or per-lane throughput-bound?

Times _scan_packed_v2 across lane counts and scan depths on a fixed plane,
plus an isolated plane[idx] row-gather scan with the same dependency shape.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import numpy as np


def simulate_reads(num_reads, readlen=100, genome_size=200_000, seed=7):
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, genome_size, dtype=np.int8)
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
    starts = rng.integers(0, genome_size - readlen, num_reads)
    return [alphabet[genome[s : s + readlen]].tobytes().decode() for s in starts]


def main():
    import jax
    import jax.numpy as jnp

    from siga_tpu.index import sa as sa_mod
    from siga_tpu.index.fm import FMIndex
    from siga_tpu.ops.fm_device import DeviceFM, DualScanner, pack_reads_2bit

    readlen, m = 100, 45
    seqs = simulate_reads(10000, readlen)
    _ = jax.numpy.zeros((8,)).sum().block_until_ready()
    fwd, _p, rev, _rp, ns = sa_mod.build_index_arrays_pair(seqs, use_device=True)
    fmi, rfmi = FMIndex(fwd, ns), FMIndex(rev, ns)
    scanner = DualScanner(DeviceFM(fmi), DeviceFM(rfmi))

    maxlen = 112
    for n_bucket in (2048, 4096, 8192, 16384):
        chunk = seqs[:n_bucket] if n_bucket <= len(seqs) else seqs + seqs[: n_bucket - len(seqs)]
        la_w, lens = pack_reads_2bit(chunk, n_bucket, maxlen)
        la_d, lens_d = scanner._put(la_w, lens)
        for lim_t in (104, 56):
            out = scanner._run(scanner._cap, n_bucket * 4, maxlen - 1, lim_t, m, la_d, lens_d)
            jax.block_until_ready(out)
            t0 = time.time()
            reps = 3
            for _ in range(reps):
                out = scanner._run(scanner._cap, n_bucket * 4, maxlen - 1, lim_t, m, la_d, lens_d)
                jax.block_until_ready(out)
            dt = (time.time() - t0) / reps
            lanes = n_bucket * 4
            print(
                f"lanes={lanes:6d} steps={lim_t:4d}  {dt*1e3:8.2f} ms  "
                f"{dt/lim_t*1e6:7.1f} us/step  "
                f"{lanes*lim_t/dt/1e6:7.1f} Mlanestep/s"
            )

    # isolated gather-only scan: same dependency chain, plane[idx] row gather
    plane = scanner.plane
    R = int(plane.shape[0])
    print(f"plane rows={R} cols={plane.shape[1]} bytes={R*plane.shape[1]*4/1e6:.2f} MB")

    def gather_scan(q0, steps, Q):
        def step(q, _):
            rows = plane[q]  # [Q, 16]
            q2 = (q + rows[:, 0] + 1) % R
            return q2, ()

        qf, _ = jax.lax.scan(step, q0, None, length=steps)
        return qf

    gj = jax.jit(gather_scan, static_argnums=(1, 2))
    for Q in (8192, 32768, 65536, 131072):
        q0 = jnp.asarray(np.random.randint(0, R, Q, dtype=np.int32))
        steps = 104
        _ = gj(q0, steps, Q).block_until_ready()
        t0 = time.time()
        for _ in range(3):
            _ = gj(q0, steps, Q).block_until_ready()
        dt = (time.time() - t0) / 3
        gb = Q * 64.0 * steps / 1e9
        print(
            f"gather-only Q={Q:6d} steps={steps}  {dt*1e3:8.2f} ms  "
            f"{dt/steps*1e6:7.1f} us/step  {gb/dt:7.1f} GB/s"
        )


if __name__ == "__main__":
    main()
