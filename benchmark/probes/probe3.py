#!/usr/bin/env python3
"""Third probe: true gather rates inside one program, Pallas gather forms,
persistent compile cache, async device->host copies."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial


def main():
    print("devices:", jax.devices(), flush=True)

    # ---- compile cache ----
    try:
        cache_dir = "/root/repo/.jax_cache"
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        f = jax.jit(lambda x: (x * 3 + 1).sum())
        jax.block_until_ready(f(jnp.ones((731,), jnp.int32)))
        time.sleep(1)
        n = sum(len(fs) for _, _, fs in os.walk(cache_dir))
        print(f"compile cache: {n} files in {cache_dir}", flush=True)
    except Exception as e:
        print("compile cache FAILED:", repr(e)[:200], flush=True)

    # ---- true row-gather rate inside a fori_loop ----
    Q = 65536
    STEPS = 100
    for NB, W in [(8192, 17), (8192, 8), (8192, 4), (8192, 32), (131072, 17),
                  (1024, 17)]:
        table = jnp.asarray(np.random.randint(1, 100, (NB, W), dtype=np.int32))
        idx0 = jnp.asarray(np.random.randint(0, NB, Q, dtype=np.int32))

        @jax.jit
        def loop_gather(table, idx0):
            def body(t, idx):
                rows = table[idx]  # [Q, W]
                return (idx + rows[:, 0] + t) % NB

            return jax.lax.fori_loop(0, STEPS, body, idx0)

        r = loop_gather(table, idx0)
        jax.block_until_ready(r)
        t0 = time.time()
        r = loop_gather(table, idx0)
        jax.block_until_ready(r)
        dt = time.time() - t0
        rate = Q * STEPS / dt / 1e6
        print(f"loop_row_gather NB={NB} W={W}: {dt*1e3:.1f} ms total, "
              f"{rate:.1f} Mrow/s, {rate*W*4/1e3:.2f} GB/s", flush=True)

    # element gather (W=1)
    table1 = jnp.asarray(np.random.randint(1, 100, (8192 * 17,), dtype=np.int32))
    idx0 = jnp.asarray(np.random.randint(0, 8192 * 17, Q, dtype=np.int32))

    @jax.jit
    def loop_elem_gather(table, idx0):
        def body(t, idx):
            v = table[idx]
            return (idx + v + t) % (8192 * 17)

        return jax.lax.fori_loop(0, STEPS, body, idx0)

    r = loop_elem_gather(table1, idx0)
    jax.block_until_ready(r)
    t0 = time.time()
    jax.block_until_ready(loop_elem_gather(table1, idx0))
    dt = time.time() - t0
    print(f"loop_elem_gather: {dt*1e3:.1f} ms, {Q*STEPS/dt/1e6:.1f} Melem/s",
          flush=True)

    # take_along_axis lane-gather in loop (the XLA dynamic-gather path)
    for N in [8192, 65536]:
        W = 8
        table = jnp.asarray(np.random.randint(1, 100, (W, N), dtype=np.int32))
        idxv = jnp.asarray(np.random.randint(0, N, N, dtype=np.int32))

        @jax.jit
        def loop_lane_gather(table, idxv):
            def body(t, idx):
                idx2 = jnp.broadcast_to(idx[None, :], (W, N))
                g = jnp.take_along_axis(table, idx2, axis=1)
                return (idx + g[0] + t) % N

            return jax.lax.fori_loop(0, STEPS, body, idxv)

        r = loop_lane_gather(table, idxv)
        jax.block_until_ready(r)
        t0 = time.time()
        jax.block_until_ready(loop_lane_gather(table, idxv))
        dt = time.time() - t0
        print(f"loop_lane_gather(taa ax1) N={N} W={W}: {dt*1e3:.1f} ms, "
              f"{N*STEPS/dt/1e6:.1f} Mrow/s", flush=True)

    # ---- Pallas gather forms ----
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def try_pallas(name, fn, *args):
        try:
            r = fn(*args)
            jax.block_until_ready(r)
            t0 = time.time()
            jax.block_until_ready(fn(*args))
            dt = time.time() - t0
            print(f"pallas {name}: OK {dt*1e3:.2f} ms", flush=True)
            return True
        except Exception as e:
            msg = repr(e).replace("\n", " ")[:160]
            print(f"pallas {name} FAILED: {msg}", flush=True)
            return False

    # (a) tiny lane gather, single tile
    def k_a(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)

    @jax.jit
    def pa(t, i):
        return pl.pallas_call(
            k_a,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, i)

    t8 = jnp.asarray(np.random.randint(0, 100, (8, 128), dtype=np.int32))
    i8 = jnp.asarray(np.random.randint(0, 128, (8, 128), dtype=np.int32))
    try_pallas("lane_gather 8x128", pa, t8, i8)

    # (b) sublane gather single tile
    def k_b(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)

    @jax.jit
    def pb(t, i):
        return pl.pallas_call(
            k_b,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, i)

    i8b = jnp.asarray(np.random.randint(0, 8, (8, 128), dtype=np.int32))
    try_pallas("sublane_gather 8x128", pb, t8, i8b)

    # (c) big lane gather multi-tile row
    N = 8192
    def k_c(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)

    @jax.jit
    def pc(t, i):
        return pl.pallas_call(
            k_c,
            out_shape=jax.ShapeDtypeStruct((8, N), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, i)

    tc = jnp.asarray(np.random.randint(0, 100, (8, N), dtype=np.int32))
    ic = jnp.asarray(np.random.randint(0, N, (8, N), dtype=np.int32))
    ok_c = try_pallas(f"lane_gather 8x{N}", pc, tc, ic)

    # (d) loop of big lane gathers (scan-shaped)
    if ok_c:
        def k_d(t_ref, i_ref, o_ref):
            def body(s, idx):
                g = jnp.take_along_axis(t_ref[:], idx, axis=1)
                return (idx + g + s) % N

            o_ref[:] = jax.lax.fori_loop(0, STEPS, body, i_ref[:])

        @jax.jit
        def pd(t, i):
            return pl.pallas_call(
                k_d,
                out_shape=jax.ShapeDtypeStruct((8, N), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(t, i)

        if try_pallas(f"loop lane_gather 8x{N} x{STEPS}", pd, tc, ic):
            t0 = time.time()
            jax.block_until_ready(pd(tc, ic))
            dt = time.time() - t0
            print(f"  -> {8*N*STEPS/dt/1e6:.1f} Mgather/s", flush=True)

    # ---- async device->host copy overlap ----
    big = jnp.asarray(np.random.randint(0, 100, (512 * 1024,), dtype=np.int32))

    @jax.jit
    def work(x):
        def body(t, acc):
            return acc + jnp.sin(acc.astype(jnp.float32)).astype(jnp.int32) + t

        return jax.lax.fori_loop(0, 2000, body, x)

    w = work(big)
    jax.block_until_ready(w)
    t0 = time.time()
    w = work(big)
    jax.block_until_ready(w)
    t_work = time.time() - t0

    t0 = time.time()
    b = np.asarray(big)
    t_copy = time.time() - t0

    # overlapped: start async copy, run work, then fetch
    t0 = time.time()
    try:
        big.copy_to_host_async()
        w = work(big)
        jax.block_until_ready(w)
        b = np.asarray(big)
        t_both = time.time() - t0
        print(f"work {t_work*1e3:.1f} ms, copy {t_copy*1e3:.1f} ms, "
              f"overlapped {t_both*1e3:.1f} ms", flush=True)
    except Exception as e:
        print("copy_to_host_async FAILED:", repr(e)[:150], flush=True)


if __name__ == "__main__":
    main()
