"""Mesh-sharded index construction (parallel/dist_build.py): the >HBM
build axis.  The suffix sort runs as a bitonic sort over the device
dimension — no device holds the whole text or sort state — and must
reproduce the host builder's artifacts exactly; the result feeds the
SA-range-sharded scan (capacity mode)."""
import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from siga_tpu.index import sa as sa_mod
from siga_tpu.index.fm import FMIndex
from siga_tpu.ops.fm_device import DeviceFM, DualScanner
from siga_tpu.parallel.dist_build import (
    distributed_bwt_perm,
    distributed_index_arrays,
    distributed_sa,
)


def _reads(n, readlen, gsize, seed):
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, gsize)
    A = np.frombuffer(b"ACGT", dtype=np.uint8)
    starts = rng.integers(0, gsize - readlen, n)
    return [A[genome[s : s + readlen]].tobytes().decode() for s in starts]


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    return Mesh(np.array(devs), ("data",))


@pytest.mark.parametrize(
    "case",
    [
        (400, 100, 8000, 1),
        (200, 150, 6000, 2),   # two doubling rounds
        (150, 73, 4000, 3),
    ],
)
def test_distributed_sa_matches_host(mesh, case):
    seqs = _reads(*case)
    if case[3] == 3:
        seqs = seqs + ["ACGT" * 30, "A" * 80, seqs[0]]
    codes, _starts, _ = sa_mod.concat_reads(seqs)
    np.testing.assert_array_equal(
        distributed_sa(codes, mesh), sa_mod.suffix_array_numpy(codes)
    )


@pytest.mark.parametrize("case", [(400, 100, 8000, 4), (200, 150, 6000, 5)])
def test_distributed_bwt_perm_no_sa_gather(mesh, case):
    """The payload-carried BWT/perm derivation (no host SA gather) must
    match the host builder's artifacts, including a zero-doubling-rounds
    text (short reads resolve inside the 64-symbol seed)."""
    seqs = _reads(*case)
    seqs = seqs + [seqs[0], seqs[1][5:45]]
    codes, starts, _ = sa_mod.concat_reads(seqs)
    sa = sa_mod.suffix_array_numpy(codes)
    bwt, perm = distributed_bwt_perm(codes, mesh)
    np.testing.assert_array_equal(bwt, sa_mod.bwt_from_sa(codes, sa))
    np.testing.assert_array_equal(perm, sa_mod.sai_perm_from_sa(sa, starts))


def test_distributed_bwt_perm_seed_only(mesh):
    """rounds == 0 path: payloads carried through the seed sort itself."""
    seqs = _reads(300, 40, 3000, 6)
    codes, starts, _ = sa_mod.concat_reads(seqs)
    sa = sa_mod.suffix_array_numpy(codes)
    bwt, perm = distributed_bwt_perm(codes, mesh)
    np.testing.assert_array_equal(bwt, sa_mod.bwt_from_sa(codes, sa))
    np.testing.assert_array_equal(perm, sa_mod.sai_perm_from_sa(sa, starts))


def test_distributed_build_feeds_sharded_scan(mesh):
    """End-to-end capacity mode: mesh-built index -> SA-range-sharded scan,
    bit-identical emitted blocks vs the replicated single-step scan."""
    seqs = _reads(300, 100, 6000, 7)
    bwt, perm, ns = distributed_index_arrays(seqs, mesh)
    bwt_ref, perm_ref, _ = sa_mod.build_index_arrays(seqs, use_device=False)
    np.testing.assert_array_equal(bwt, bwt_ref)
    np.testing.assert_array_equal(perm, perm_ref)

    rbwt, _rperm, _ = distributed_index_arrays(
        [s[::-1] for s in seqs], mesh
    )
    fmi, rfmi = FMIndex(bwt, ns), FMIndex(rbwt, ns)
    d1, d2 = DeviceFM(fmi), DeviceFM(rfmi)
    repl = DualScanner(d1, d2, pair_step=False)
    shard = DualScanner(d1, d2, mesh=mesh, shard_index=True)
    a = repl.collect(repl.dispatch(list(seqs), 512, 112, 45))
    b = shard.collect(shard.dispatch(list(seqs), 512, 112, 45))
    for va, vb in zip(a, b):
        for x, y in zip(va, vb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
