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
