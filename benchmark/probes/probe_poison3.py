"""After the poison, is EVERYTHING slow (sync path) or just the scan?
Also: which half — B=2 program, or the np.asarray downloads?"""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
import numpy as np
import jax
import jax.numpy as jnp

MODE = sys.argv[1] if len(sys.argv) > 1 else "dl_only"


def timeit(fn, reps=3):
    r = fn(); jax.block_until_ready(r)
    best = 1e9
    for _ in range(reps):
        t0 = time.time(); r = fn(); jax.block_until_ready(r)
        best = min(best, time.time() - t0)
    return best


def simulate_codes(seed=7):
    rng = np.random.default_rng(seed)
    reads = rng.integers(1, 5, (10000, 100), dtype=np.uint8)
    codes = np.zeros(10000 * 101, dtype=np.uint8)
    codes.reshape(10000, 101)[:, :100] = reads
    return codes


def report(tag, run, trivial, small_dl):
    print(f"[{tag}] scan: {timeit(run)*1e3:9.2f} ms   trivial(+1): "
          f"{timeit(trivial)*1e3:7.2f} ms   small-dl: {timeit(small_dl)*1e3:7.2f} ms",
          flush=True)


def main():
    from siga_tpu.ops.fm_device import _scan_packed_v2
    from siga_tpu.index import sa as sa_mod

    rng = np.random.default_rng(0)
    W, NB = 15782, 7891
    pred = jnp.asarray(np.array([0, 2000, 250000, 500000, 750000], np.int32))
    la = jnp.asarray(rng.integers(0, 2**31 - 1, (8192, 7), dtype=np.int32))
    lens = jnp.full((8192,), 100, jnp.int32)
    plane = jnp.asarray(rng.integers(0, 2**31 - 1, (17, W), dtype=np.int32))
    x_small = jnp.arange(1024, dtype=jnp.int32)

    def run():
        return _scan_packed_v2(
            111, 104, 45, 65536, 32768, (0, 1), (2, 3), None,
            plane, pred, jnp.int32(NB * 128), jnp.int32(NB), la, lens,
        )

    trivial = jax.jit(lambda x: x + 1)

    def trivial_run():
        return trivial(x_small)

    def small_dl():
        return np.asarray(x_small)

    report("before", run, trivial_run, small_dl)

    codes = simulate_codes()
    n_real = codes.size
    rounds = sa_mod._sa_rounds(sa_mod._max_span(codes))
    n = sa_mod._pad_size(n_real)
    starts = np.flatnonzero(np.concatenate(([1], codes[:-1] == 0)))[:10000]
    codes2 = jnp.asarray(np.stack([sa_mod._pad_codes(codes, n)] * 2))
    bwt, perm = sa_mod._sa_bwt_perm_v2(
        rounds, n, n_real, 10000, codes2, jnp.asarray(starts.astype(np.int32))
    )
    if MODE == "dl_only":
        jax.block_until_ready((bwt, perm))
        print("poison candidate: B=2 program, block only (no download)", flush=True)
    elif MODE == "dl_bwt":
        _ = np.asarray(bwt)
        print("poison candidate: download uint8 bwt [2, n]", flush=True)
    elif MODE == "dl_perm":
        _ = np.asarray(perm)
        print("poison candidate: download int32 perm [2, 10000]", flush=True)
    del bwt, perm

    report("after ", run, trivial_run, small_dl)
    # does it heal with time / repeated runs?
    for k in range(3):
        time.sleep(5)
        report(f"heal{k} ", run, trivial_run, small_dl)


if __name__ == "__main__":
    main()
