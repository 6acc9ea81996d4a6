"""Where does the index build's 0.5s go? Sort rounds vs BWT/perm derivation."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp


def simulate_reads(num_reads, readlen=100, genome_size=200_000, seed=7):
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, genome_size, dtype=np.int8)
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
    starts = rng.integers(0, genome_size - readlen, num_reads)
    return [alphabet[genome[s : s + readlen]].tobytes().decode() for s in starts]


def bench(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.time() - t0) / reps


def main():
    from siga_tpu.index import sa as sa_mod

    seqs = simulate_reads(10000, 100)
    codes, starts, _l = sa_mod.concat_reads(seqs)
    rcodes, _s, _l2 = sa_mod.concat_reads([s[::-1] for s in seqs])
    _ = jnp.zeros((8,)).sum().block_until_ready()

    n_real = int(codes.size)
    rounds = max(sa_mod._sa_rounds(sa_mod._max_span(c)) for c in (codes, rcodes))
    n = sa_mod._pad_size(n_real)
    packed = np.stack([sa_mod._pad_codes(c, n) for c in (codes, rcodes)])
    codes_d = jnp.asarray(packed)
    starts_d = jnp.asarray(starts.astype(np.int32))
    print(f"n_real={n_real} n={n} rounds={rounds}")

    # full build
    t = bench(
        lambda: sa_mod._sa_bwt_perm_v2(rounds, n, n_real, len(seqs), codes_d, starts_d)
    )
    print(f"full _sa_bwt_perm_v2 : {t*1e3:8.1f} ms   ({2*n_real/t/1e6:.1f} Mchar/s)")

    # SA sort only
    t = bench(lambda: sa_mod._sa_build_v2(rounds, n, codes_d))
    print(f"_sa_build_v2 only    : {t*1e3:8.1f} ms")

    # single lax.sort calls for scale
    key = jnp.asarray(np.random.randint(0, n, (2, n), dtype=np.int32))
    key2 = jnp.asarray(np.random.randint(0, n, (2, n), dtype=np.int32))
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (2, n))

    f1 = jax.jit(lambda a: jax.lax.sort((a,), dimension=-1, num_keys=1))
    t = bench(f1, key)
    print(f"lax.sort 1 arr       : {t*1e3:8.1f} ms")
    f2 = jax.jit(lambda a, b: jax.lax.sort((a, b), dimension=-1, num_keys=1))
    t = bench(f2, key, idx)
    print(f"lax.sort 2 arr (1key): {t*1e3:8.1f} ms")
    f3 = jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), dimension=-1, num_keys=2))
    t = bench(f3, key, key2, idx)
    print(f"lax.sort 3 arr (2key): {t*1e3:8.1f} ms")

    # derivation alone (given an order)
    order = sa_mod._sa_build_v2(rounds, n, codes_d)
    order.block_until_ready()

    @jax.jit
    def derive(order, codes, starts):
        sa = order[:, :n_real]
        codes_real = codes[:, :n_real]
        prev = jnp.take_along_axis(codes_real, jnp.clip(sa - 1, 0, n_real - 1), axis=-1)
        bwt = jnp.where(sa == 0, jnp.uint8(0), prev)
        B = codes.shape[0]
        idx2 = jnp.searchsorted(starts, sa.reshape(-1)).reshape(B, n_real)
        s = starts.shape[0]
        hit = (idx2 < s) & (starts[jnp.clip(idx2, 0, s - 1)] == sa)
        (pos_idx,) = jnp.nonzero(hit.reshape(-1), size=B * len(seqs), fill_value=0)
        perm = idx2.reshape(-1)[pos_idx].reshape(B, len(seqs))
        return bwt, perm

    t = bench(derive, order, codes_d, starts_d)
    print(f"derive bwt+perm      : {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
