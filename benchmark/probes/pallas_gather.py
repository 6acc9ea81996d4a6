"""Can Mosaic lower a vectorized gather from a VMEM-resident table?

Tries several formulations of rows = plane[idx] inside a Pallas TPU kernel
and times the ones that lower, vs the XLA gather baseline.
"""
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C = 15872, 16  # plane rows (multiple of 8), cols
Q = 32768


def bench(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    reps = 20
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.time() - t0) / reps, out


def main():
    plane = jnp.asarray(np.random.randint(0, 1000, (R, C), dtype=np.int32))
    idx = jnp.asarray(np.random.randint(0, R, Q, dtype=np.int32))

    # baseline: XLA gather
    @jax.jit
    def xla_gather(plane, idx):
        return plane[idx]

    t, ref = bench(xla_gather, plane, idx)
    ref = np.asarray(ref)
    print(f"XLA gather      : {t*1e6:9.1f} us  {Q*64/t/1e9:6.1f} GB/s")

    # 1: jnp.take inside pallas, plane in VMEM
    def k1(plane_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(plane_ref[:], idx_ref[:], axis=0)

    try:
        f1 = jax.jit(
            lambda p, i: pl.pallas_call(
                k1,
                out_shape=jax.ShapeDtypeStruct((Q, C), jnp.int32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(p, i)
        )
        t, out = bench(f1, plane, idx)
        ok = np.array_equal(np.asarray(out), ref)
        print(f"pallas jnp.take : {t*1e6:9.1f} us  {Q*64/t/1e9:6.1f} GB/s  ok={ok}")
    except Exception as e:  # noqa: BLE001
        print(f"pallas jnp.take : FAILED {type(e).__name__}: {str(e)[:200]}")

    # 2: plane transposed [C, R], gather along lanes (axis=1)
    planeT = plane.T.copy()

    def k2(planeT_ref, idx_ref, out_ref):
        # gather along the lane dimension
        out_ref[:] = jnp.take(planeT_ref[:], idx_ref[:], axis=1)

    try:
        f2 = jax.jit(
            lambda p, i: pl.pallas_call(
                k2,
                out_shape=jax.ShapeDtypeStruct((C, Q), jnp.int32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(p, i)
        )
        t, out = bench(f2, planeT, idx)
        ok = np.array_equal(np.asarray(out), ref.T)
        print(f"pallas take ax1 : {t*1e6:9.1f} us  {Q*64/t/1e9:6.1f} GB/s  ok={ok}")
    except Exception as e:  # noqa: BLE001
        print(f"pallas take ax1 : FAILED {type(e).__name__}: {str(e)[:200]}")

    # 3: take_along_axis with broadcast idx
    def k3(plane_ref, idx_ref, out_ref):
        ids = idx_ref[:].reshape(Q, 1)
        out_ref[:] = jnp.take_along_axis(
            plane_ref[:], jnp.broadcast_to(ids, (Q, C)), axis=0
        )

    try:
        f3 = jax.jit(
            lambda p, i: pl.pallas_call(
                k3,
                out_shape=jax.ShapeDtypeStruct((Q, C), jnp.int32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(p, i)
        )
        t, out = bench(f3, plane, idx)
        ok = np.array_equal(np.asarray(out), ref)
        print(f"pallas taa ax0  : {t*1e6:9.1f} us  {Q*64/t/1e9:6.1f} GB/s  ok={ok}")
    except Exception as e:  # noqa: BLE001
        print(f"pallas taa ax0  : FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()


def extra():
    """Round-5 additions: the two formulations Mosaic can actually lower.

    4: same-shape dynamic gather — tile the plane to [Q, C] and gather along
       axis 0 with broadcast indices (satisfies Mosaic's in/idx/out
       same-shape constraint; measures the register-permute path).
    5: per-row DMA loop — one async copy per row from an HBM-resident plane
       (the only in-kernel path for a true memory gather).
    """
    rng = np.random.default_rng(0)
    plane = jnp.asarray(rng.integers(0, 1000, (R, C), dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, R, Q, dtype=np.int32))

    @jax.jit
    def xla_gather(plane, idx):
        return plane[idx]

    t, ref = bench(xla_gather, plane, idx)
    ref = np.asarray(ref)
    print(f"XLA gather      : {t*1e6:9.1f} us  {Q*64/t/1e9:6.1f} GB/s")

    reps = (Q + R - 1) // R
    tiled = jnp.tile(plane, (reps, 1))[:Q]

    def k4(tiled_ref, idx_ref, out_ref):
        ids = jnp.broadcast_to(idx_ref[:].reshape(Q, 1), (Q, C))
        out_ref[:] = jnp.take_along_axis(tiled_ref[:], ids, axis=0)

    try:
        f4 = jax.jit(
            lambda p, i: pl.pallas_call(
                k4,
                out_shape=jax.ShapeDtypeStruct((Q, C), jnp.int32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(p, i)
        )
        t, out = bench(f4, tiled, idx)
        ok = np.array_equal(np.asarray(out), ref)
        print(f"pallas sameshape: {t*1e6:9.1f} us  {Q*64/t/1e9:6.1f} GB/s  ok={ok}")
    except Exception as e:  # noqa: BLE001
        print(f"pallas sameshape: FAILED {type(e).__name__}: {str(e)[:160]}")

    QD = 2048  # per-row DMA: time a smaller Q and report per-row cost

    def k5(idx_ref, plane_hbm, out_ref):
        def body(scratch, sem):
            def loop(q, _):
                dma = pltpu.make_async_copy(
                    plane_hbm.at[pl.ds(idx_ref[q], 1), :],
                    scratch.at[pl.ds(0, 1), :],
                    sem,
                )
                dma.start()
                dma.wait()
                out_ref[pl.ds(q, 1), :] = scratch[pl.ds(0, 1), :]
                return 0

            jax.lax.fori_loop(0, QD, loop, 0)

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((1, C), jnp.int32),
            sem=pltpu.SemaphoreType.DMA,
        )

    try:
        f5 = jax.jit(
            lambda i, p: pl.pallas_call(
                k5,
                out_shape=jax.ShapeDtypeStruct((QD, C), jnp.int32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(i, p)
        )
        t, out = bench(f5, idx[:QD], plane)
        ok = np.array_equal(np.asarray(out), ref[:QD])
        print(f"pallas DMA/row  : {t*1e6:9.1f} us for {QD} rows = "
              f"{t/QD*1e9:.0f} ns/row  ok={ok}")
    except Exception as e:  # noqa: BLE001
        print(f"pallas DMA/row  : FAILED {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__" and "--extra" in sys.argv:
    extra()
