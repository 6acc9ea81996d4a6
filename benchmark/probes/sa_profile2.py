"""Index-build breakdown with real args (no constant folding): host prep,
upload, device compute, download."""
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


def main():
    from siga_tpu.index import sa as sa_mod

    seqs = simulate_reads(10000, 100)
    _ = jnp.zeros((8,)).sum().block_until_ready()

    # measure tunnel bandwidth
    for mb in (1, 4):
        x = np.random.randint(0, 127, mb * 1024 * 1024, dtype=np.int8)
        xd = jax.device_put(x)
        xd.block_until_ready()
        t0 = time.time()
        xd = jax.device_put(x)
        xd.block_until_ready()
        up = time.time() - t0
        t0 = time.time()
        _ = np.asarray(xd)
        down = time.time() - t0
        print(f"link {mb}MB: up {mb/up:6.1f} MB/s   down {mb/down:6.1f} MB/s")

    # host prep
    t0 = time.time()
    codes, starts, _l = sa_mod.concat_reads(seqs)
    rcodes, _s, _l2 = sa_mod.concat_reads([s[::-1] for s in seqs])
    n_real = int(codes.size)
    rounds = max(sa_mod._sa_rounds(sa_mod._max_span(c)) for c in (codes, rcodes))
    n = sa_mod._pad_size(n_real)
    packed = np.stack([sa_mod._pad_codes(c, n) for c in (codes, rcodes)])
    t_prep = time.time() - t0

    # upload
    codes_d = jnp.asarray(packed)
    starts_d = jnp.asarray(starts.astype(np.int32))
    jax.block_until_ready((codes_d, starts_d))
    t0 = time.time()
    codes_d = jnp.asarray(packed) + 0  # force a fresh transfer (defeat cache)
    jax.block_until_ready(codes_d)
    t_up = time.time() - t0
    codes_d = jnp.asarray(packed)
    jax.block_until_ready(codes_d)

    # device compute (warm)
    out = sa_mod._sa_bwt_perm_v2(rounds, n, n_real, len(seqs), codes_d, starts_d)
    jax.block_until_ready(out)
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        out = sa_mod._sa_bwt_perm_v2(rounds, n, n_real, len(seqs), codes_d, starts_d)
        jax.block_until_ready(out)
    t_dev = (time.time() - t0) / reps

    # download
    t0 = time.time()
    bwt = np.asarray(out[0])
    perm = np.asarray(out[1])
    t_down = time.time() - t0

    print(f"host prep : {t_prep*1e3:8.1f} ms")
    print(f"upload    : {t_up*1e3:8.1f} ms ({packed.nbytes/1e6:.2f} MB)")
    print(f"device    : {t_dev*1e3:8.1f} ms")
    print(f"download  : {t_down*1e3:8.1f} ms ({bwt.nbytes/1e6:.2f}+{perm.nbytes/1e6:.2f} MB)")
    tot = t_prep + t_up + t_dev + t_down
    print(f"total     : {tot*1e3:8.1f} ms -> {2*n_real/tot/1e6:.1f} Mchar/s")


if __name__ == "__main__":
    main()
