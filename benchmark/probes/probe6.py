#!/usr/bin/env python3
"""Bisect why the production transposed scan is ~12 ms/step while the
synthetic probe5 core is ~1 us/step.  Adds production features one at a
time to the fast core."""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

Q = 32768
T = 104


def timeit(fn, *args, reps=5):
    r = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(r)[0])
    t0 = time.time()
    for _ in range(reps):
        r = fn(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(r)[0])
    return (time.time() - t0) / reps


def make_scan(NB, use_tab, two_phase, with_emit=True):
    from siga_tpu.ops.fm_device import _occ_from_cols, _update_left_T

    def occ(planeT, i, tab):
        ncols = planeT.shape[0]
        pos = i + 1
        block0 = pos // 128
        block = block0 + tab if use_tab else block0
        idx = jnp.broadcast_to(block[None, :], (ncols, i.shape[0]))
        rowsT = jnp.take_along_axis(planeT, idx, axis=1)
        return _occ_from_cols(rowsT, pos - block0 * 128, 128)

    @jax.jit
    def run(planeT, pred, charsT, lens_all, tab):
        tab2 = jnp.concatenate([tab, tab])
        c0 = charsT[T - 1]
        lo0 = pred[c0]
        full = occ(planeT, jnp.full((Q,), NB * 100, jnp.int32), tab)
        hi0 = lo0 + jnp.take_along_axis(full, c0[None, :], axis=0)[0] - 1
        state0 = (lo0, hi0, lo0, hi0)
        ts = jnp.arange(T, dtype=jnp.int32)

        def step(state, xs, emit):
            c, t = xs
            lo, hi, rlo, rhi = state
            both = occ(planeT, jnp.concatenate([lo - 1, hi]), tab2)
            l_counts = both[:, :Q]
            u_counts = both[:, Q:]
            active = t <= lens_all - 2
            nlo, nhi, nrlo, nrhi = _update_left_T(
                lo, hi, rlo, rhi, c, l_counts, u_counts, pred
            )
            ns = (jnp.where(active, nlo, lo), jnp.where(active, nhi, hi),
                  jnp.where(active, nrlo, rlo), jnp.where(active, nrhi, rhi))
            if not emit:
                return ns, ()
            psize = u_counts[0] - l_counts[0]
            ev = (psize > 0) & (rlo + psize - 1 >= 0) & active
            return ns, (jnp.stack([lo, rlo, hi - lo], 0), ev)

        if two_phase:
            p1 = 44
            s1, _ = jax.lax.scan(lambda s, xs: step(s, xs, False), state0,
                                 (charsT[:p1], ts[:p1]))
            s2, (emitted, valid) = jax.lax.scan(
                lambda s, xs: step(s, xs, with_emit), s1,
                (charsT[p1:], ts[p1:]))
        else:
            s2, (emitted, valid) = jax.lax.scan(
                lambda s, xs: step(s, xs, with_emit), state0, (charsT, ts))
        out = [s2[0].sum() + s2[1].sum()]
        if with_emit:
            out.append(valid.sum())
            out.append(emitted.sum())
        return out

    return run


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    pred = jnp.asarray(np.array([0, 2000, 250000, 500000, 750000], np.int32))
    charsT = jnp.asarray(rng.integers(1, 5, (T, Q), dtype=np.int32))
    lens_all = jnp.full((Q,), 100, jnp.int32)

    for NB in (16384, 15817):
        planeT = jnp.asarray(
            rng.integers(0, 2**31 - 1, (17, 2 * NB), dtype=np.int32))
        tab = jnp.concatenate([
            jnp.zeros(Q // 2, jnp.int32), jnp.full((Q // 2,), NB, jnp.int32)])
        for use_tab in (False, True):
            for two_phase in (False, True):
                fn = make_scan(NB, use_tab, two_phase)
                dt = timeit(fn, planeT, pred, charsT, lens_all, tab)
                print(f"NB={NB} tab={use_tab} two_phase={two_phase}: "
                      f"{dt*1e3:.2f} ms ({dt/T*1e6:.1f} us/step)", flush=True)

    # production scan itself on synthetic packed reads
    from siga_tpu.ops.fm_device import _scan_packed_v2

    NB = 15817
    planeT = jnp.asarray(rng.integers(0, 2**31 - 1, (17, 2 * NB), dtype=np.int32))
    # NOTE: planeT rows are fully random (checkpoints NOT monotone), so the
    # production timing below can include unrepresentative emission/compaction
    # behavior — this probe bounds layout cost only, not emission fidelity.
    la_words = jnp.asarray(
        rng.integers(0, 2**31 - 1, (8192, 7), dtype=np.int32))
    lens = jnp.full((8192,), 100, jnp.int32)

    def run_prod():
        return _scan_packed_v2(
            111, 104, 45, 65536, 32768, (0, 1), (2, 3), None,
            planeT, pred, jnp.int32(NB * 128), jnp.int32(NB),
            la_words, lens,
        )

    dt = timeit(run_prod)
    print(f"production _scan_packed_v2: {dt*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
