"""Why is the production scan 0.31ms on synthetic inputs (probe6) but
~790ms/chunk in the real engine?  Cross real/synthetic plane and reads."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, reps=3):
    r = fn()
    jax.block_until_ready(r)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        r = fn()
        jax.block_until_ready(r)
        best = min(best, time.time() - t0)
    return best


def simulate_reads(num_reads=10_000, readlen=100, genome_size=200_000, seed=7):
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, genome_size, dtype=np.int8)
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
    starts = rng.integers(0, genome_size - readlen, num_reads)
    return [alphabet[genome[s : s + readlen]].tobytes().decode() for s in starts]


def main():
    from siga_tpu.index import sa as sa_mod
    from siga_tpu.index.fm import FMIndex
    from siga_tpu.ops.fm_device import DeviceFM, _scan_packed_v2, pack_reads_2bit

    seqs = simulate_reads(10000, 100)
    fwd_codes, _p, rev_codes, _r, ns = sa_mod.build_index_arrays_pair(
        seqs, use_device=True
    )
    fmi = FMIndex(fwd_codes, ns)
    rfmi = FMIndex(rev_codes, ns)
    dfwd, drev = DeviceFM(fmi), DeviceFM(rfmi)
    real_plane = jnp.concatenate([dfwd.occ_planeT, drev.occ_planeT], axis=1)
    real_pred = dfwd.pred
    NB = dfwd.nblocks
    length = dfwd.length
    print(f"real plane {real_plane.shape} length={length} NB={NB}", flush=True)

    la_w, lens = pack_reads_2bit(seqs[:8192], 8192, 112)
    real_la = jnp.asarray(la_w)
    real_lens = jnp.asarray(lens)

    rng = np.random.default_rng(0)
    synth_plane = jnp.asarray(
        rng.integers(0, 2**31 - 1, real_plane.shape, dtype=np.int32)
    )
    synth_pred = jnp.asarray(np.array([0, 2000, 250000, 500000, 750000], np.int32))
    synth_la = jnp.asarray(rng.integers(0, 2**31 - 1, (8192, 7), dtype=np.int32))
    synth_lens = jnp.full((8192,), 100, jnp.int32)

    def run(plane, pred, la, lens):
        return _scan_packed_v2(
            111, 104, 45, 65536, 32768, (0, 1), (2, 3), None,
            plane, pred, jnp.int32(length), jnp.int32(NB), la, lens,
        )

    for name, args in [
        ("synth plane + synth reads", (synth_plane, synth_pred, synth_la, synth_lens)),
        ("real plane + synth reads", (real_plane, real_pred, synth_la, synth_lens)),
        ("synth plane + real reads", (synth_plane, synth_pred, real_la, real_lens)),
        ("real plane + real reads", (real_plane, real_pred, real_la, real_lens)),
    ]:
        dt = timeit(lambda a=args: run(*a))
        print(f"{name}: {dt*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
