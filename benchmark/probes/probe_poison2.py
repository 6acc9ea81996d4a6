"""Bisect WHICH op inside the device index build poisons later scans,
and whether recompiling the scan heals it."""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

MODE = sys.argv[1] if len(sys.argv) > 1 else "sa_only"


def timeit(fn, reps=2):
    r = fn(); jax.block_until_ready(r)
    best = 1e9
    for _ in range(reps):
        t0 = time.time(); r = fn(); jax.block_until_ready(r)
        best = min(best, time.time() - t0)
    return best


def simulate_codes(seed=7):
    rng = np.random.default_rng(seed)
    n = 10000
    L = 100
    reads = rng.integers(1, 5, (n, L), dtype=np.uint8)
    codes = np.zeros(n * (L + 1), dtype=np.uint8)
    view = codes.reshape(n, L + 1)
    view[:, :L] = reads
    return codes


def main():
    from siga_tpu.ops.fm_device import _scan_packed_v2
    from siga_tpu.index import sa as sa_mod

    rng = np.random.default_rng(0)
    W, NB = 15782, 7891
    pred = jnp.asarray(np.array([0, 2000, 250000, 500000, 750000], np.int32))
    la = jnp.asarray(rng.integers(0, 2**31 - 1, (8192, 7), dtype=np.int32))
    lens = jnp.full((8192,), 100, jnp.int32)
    plane = jnp.asarray(rng.integers(0, 2**31 - 1, (17, W), dtype=np.int32))

    def run(cap=65536):
        return _scan_packed_v2(
            111, 104, 45, cap, 32768, (0, 1), (2, 3), None,
            plane, pred, jnp.int32(NB * 128), jnp.int32(NB), la, lens,
        )

    print(f"scan before: {timeit(run)*1e3:.2f} ms", flush=True)

    codes = simulate_codes()
    n_real = codes.size
    rounds = sa_mod._sa_rounds(sa_mod._max_span(codes))
    n = sa_mod._pad_size(n_real)
    padded = jnp.asarray(sa_mod._pad_codes(codes, n)[None, :])

    if MODE == "sa_only":
        out = jax.block_until_ready(sa_mod._sa_build_v2(rounds, n, padded))
        del out
    elif MODE == "sa_b2":
        codes2 = jnp.asarray(np.stack([sa_mod._pad_codes(codes, n)] * 2))
        out = jax.block_until_ready(sa_mod._sa_build_v2(rounds, n, codes2))
        del out
    elif MODE == "full_b2_dl":
        starts = np.flatnonzero(np.concatenate(([1], codes[:-1] == 0)))[:10000]
        codes2 = jnp.asarray(np.stack([sa_mod._pad_codes(codes, n)] * 2))
        bwt, perm = sa_mod._sa_bwt_perm_v2(
            rounds, n, n_real, 10000, codes2,
            jnp.asarray(starts.astype(np.int32)),
        )
        bwt = np.asarray(bwt, dtype=np.uint8)
        perm = np.asarray(perm, dtype=np.int64)
        del bwt, perm
    elif MODE == "full":
        starts = np.flatnonzero(np.concatenate(([1], codes[:-1] == 0)))[:10000]
        out = jax.block_until_ready(
            sa_mod._sa_bwt_perm_v2(
                rounds, n, n_real, 10000, padded,
                jnp.asarray(starts.astype(np.int32)),
            )
        )
        del out
    print(f"poison: {MODE} done", flush=True)

    print(f"scan after : {timeit(run)*1e3:.2f} ms", flush=True)
    # force a RECOMPILE of an equivalent scan (cap differs)
    print(f"scan recompiled (cap+8192): {timeit(lambda: run(65536+8192))*1e3:.2f} ms", flush=True)
    print(f"scan original again       : {timeit(run)*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
