"""Which prior device action makes the stage-A scan 4000x slower?

Timeline test: time the synthetic scan, run a candidate 'poison' step,
time the same scan again (same compiled program).
"""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
import numpy as np
import jax
import jax.numpy as jnp

MODE = sys.argv[1] if len(sys.argv) > 1 else "index"


def timeit(fn, reps=2):
    r = fn(); jax.block_until_ready(r)
    best = 1e9
    for _ in range(reps):
        t0 = time.time(); r = fn(); jax.block_until_ready(r)
        best = min(best, time.time() - t0)
    return best


def simulate_reads(num_reads=10_000, readlen=100, genome_size=200_000, seed=7):
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, genome_size, dtype=np.int8)
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
    starts = rng.integers(0, genome_size - readlen, num_reads)
    return [alphabet[genome[s : s + readlen]].tobytes().decode() for s in starts]


def main():
    from siga_tpu.ops.fm_device import _scan_packed_v2

    rng = np.random.default_rng(0)
    W, NB = 15782, 7891
    pred = jnp.asarray(np.array([0, 2000, 250000, 500000, 750000], np.int32))
    la = jnp.asarray(rng.integers(0, 2**31 - 1, (8192, 7), dtype=np.int32))
    lens = jnp.full((8192,), 100, jnp.int32)
    plane = jnp.asarray(rng.integers(0, 2**31 - 1, (17, W), dtype=np.int32))

    def run():
        return _scan_packed_v2(
            111, 104, 45, 65536, 32768, (0, 1), (2, 3), None,
            plane, pred, jnp.int32(NB * 128), jnp.int32(NB), la, lens,
        )

    print(f"scan before: {timeit(run)*1e3:.2f} ms", flush=True)

    if MODE == "index":
        from siga_tpu.index import sa as sa_mod
        seqs = simulate_reads()
        out = sa_mod.build_index_arrays_pair(seqs, use_device=True)
        del out
        print("poison: device index build done", flush=True)
    elif MODE == "alloc":
        big = jnp.zeros((256, 1 << 20), jnp.int32)  # 1 GB
        jax.block_until_ready(big)
        del big
        print("poison: 1GB alloc+free done", flush=True)
    elif MODE == "alloc_live":
        global _keep
        _keep = jnp.zeros((256, 1 << 20), jnp.int32)
        jax.block_until_ready(_keep)
        print("poison: 1GB alloc kept live", flush=True)
    elif MODE == "sort":
        x = jnp.asarray(rng.integers(0, 2**31 - 1, (2, 1 << 20), dtype=np.int32))
        y = jax.block_until_ready(jax.lax.sort((x, x, x), dimension=-1, num_keys=2))
        del x, y
        print("poison: one big lax.sort done", flush=True)
    elif MODE == "none":
        print("poison: none", flush=True)

    print(f"scan after : {timeit(run)*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
