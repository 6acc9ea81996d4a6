"""Map the XLA gather-speed cliff vs occ-plane width [17, W].

probe_real_vs_synth: W=15782 -> 1269ms/chunk; probe6: W=31634 -> 0.31ms.
Same program modulo the plane shape.  Find which widths are fast.
"""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, reps=2):
    r = fn(); jax.block_until_ready(r)
    best = 1e9
    for _ in range(reps):
        t0 = time.time(); r = fn(); jax.block_until_ready(r)
        best = min(best, time.time() - t0)
    return best


def main():
    from siga_tpu.ops.fm_device import _scan_packed_v2

    rng = np.random.default_rng(0)
    pred = jnp.asarray(np.array([0, 2000, 250000, 500000, 750000], np.int32))
    la = jnp.asarray(rng.integers(0, 2**31 - 1, (8192, 7), dtype=np.int32))
    lens = jnp.full((8192,), 100, jnp.int32)

    for W in (15782, 15872, 16384, 16000, 20000, 24576, 31634, 31232, 32768, 8192, 12288):
        NB = W // 2
        plane = jnp.asarray(rng.integers(0, 2**31 - 1, (17, W), dtype=np.int32))
        def run(plane=plane, NB=NB):
            return _scan_packed_v2(
                111, 104, 45, 65536, 32768, (0, 1), (2, 3), None,
                plane, pred, jnp.int32(NB * 128), jnp.int32(NB), la, lens,
            )
        dt = timeit(run)
        print(f"W={W:6d} (NB={NB}): {dt*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
