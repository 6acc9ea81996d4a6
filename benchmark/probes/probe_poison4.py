"""Bisect the poisoning op inside _sa_bwt_perm_v2 at B=2.

Candidates: the SA build (cleared), searchsorted over [2, n], nonzero with
size=B*num_strings, the final take/reshape.  Also test B=1 at double n.
"""
import sys, os, time
from functools import partial
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
import numpy as np
import jax
import jax.numpy as jnp

MODE = sys.argv[1] if len(sys.argv) > 1 else "searchsorted"


def timeit(fn, reps=2):
    r = fn(); jax.block_until_ready(r)
    best = 1e9
    for _ in range(reps):
        t0 = time.time(); r = fn(); jax.block_until_ready(r)
        best = min(best, time.time() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    x_small = jnp.arange(1024, dtype=jnp.int32)
    trivial = jax.jit(lambda x: x + 1)
    print(f"trivial before: {timeit(lambda: trivial(x_small))*1e3:.2f} ms", flush=True)

    B, n_real, S = 2, 1010000, 10000
    sa = jnp.asarray(rng.integers(0, n_real, (B, n_real), dtype=np.int32))
    starts = jnp.asarray((np.arange(S) * 101).astype(np.int32))

    if MODE == "searchsorted":
        @jax.jit
        def f(sa, starts):
            return jnp.searchsorted(starts, sa.reshape(-1)).reshape(B, n_real)
        out = jax.block_until_ready(f(sa, starts))
    elif MODE == "nonzero":
        @jax.jit
        def f(sa, starts):
            hit = (sa % 101) == 0
            (pos_idx,) = jnp.nonzero(hit.reshape(-1), size=B * S, fill_value=0)
            return pos_idx
        out = jax.block_until_ready(f(sa, starts))
    elif MODE == "nonzero_take":
        @jax.jit
        def f(sa, starts):
            idx = jnp.searchsorted(starts, sa.reshape(-1)).reshape(B, n_real)
            hit = (idx < S) & (starts[jnp.clip(idx, 0, S - 1)] == sa)
            (pos_idx,) = jnp.nonzero(hit.reshape(-1), size=B * S, fill_value=0)
            return idx.reshape(-1)[pos_idx].reshape(B, S)
        out = jax.block_until_ready(f(sa, starts))
    elif MODE == "take_prev":
        @jax.jit
        def f(sa, starts):
            codes = (sa % 5).astype(jnp.uint8)
            prev = jnp.take_along_axis(codes, jnp.clip(sa - 1, 0, n_real - 1), axis=-1)
            return jnp.where(sa == 0, jnp.uint8(0), prev)
        out = jax.block_until_ready(f(sa, starts))
    print(f"poison candidate {MODE} done", flush=True)
    del out

    print(f"trivial after : {timeit(lambda: trivial(x_small))*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
