"""Pair-step scan (2 backward steps per occ gather) vs the single-step scan.

The pair engine (ops/fm_device.py::_scan_pair_core) must reproduce the
single-step scan's collect() views bit-for-bit: emitted blocks (lane, t,
intervals), containment candidates, and substring flags.  Covers odd/even
min_overlap boundaries, odd lim_t, duplicate/contained reads, and the rmdup
lane groups.
"""
import numpy as np
import pytest

from siga_tpu.index import sa as sa_mod
from siga_tpu.index.fm import FMIndex
from siga_tpu.ops.fm_device import (
    GROUP_COMP,
    GROUP_ID,
    DeviceFM,
    DualScanner,
)


def _reads(n=160, readlen=71, seed=11):
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, 4000)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    starts = rng.integers(0, 4000 - readlen, n)
    reads = [
        alpha[genome[s : s + readlen]].tobytes().decode() for s in starts
    ]
    # edge cases: exact duplicate, contained read, low-complexity repeat
    reads += [reads[0], reads[1][5:60], "ACGT" * 16, reads[2][:40]]
    return reads


@pytest.fixture(scope="module")
def scanners():
    reads = _reads()
    fwd, _p, rev, _rp, ns = sa_mod.build_index_arrays_pair(
        reads, use_device=False
    )
    fmi, rfmi = FMIndex(fwd, ns), FMIndex(rev, ns)
    return reads, DeviceFM(fmi), DeviceFM(rfmi)


def _collect(scanner, reads, maxlen, mo):
    return scanner.collect(scanner.dispatch(list(reads), 256, maxlen, mo))


@pytest.mark.parametrize("mo", [20, 31, 70, 81])
def test_pair_matches_single_step(scanners, mo):
    reads, d1, d2 = scanners
    s_old = DualScanner(d1, d2, pair_step=False)
    s_new = DualScanner(d1, d2, pair_step=True)
    for maxlen in (80,):
        a = _collect(s_old, reads, maxlen, mo)
        b = _collect(s_new, reads, maxlen, mo)
        for view_a, view_b in zip(a, b):
            for x, y in zip(view_a, view_b):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_device_plane_parity(scanners):
    """The on-device pair-plane builder (4-bit text upload) must reproduce
    the host-packed plane and K matrix bit-for-bit."""
    _reads_, d1, d2 = scanners
    for d in (d1, d2):
        plane_h, K_h = d.pair_plane_host()
        plane_d, K_d = d.pair_plane_device()
        np.testing.assert_array_equal(np.asarray(plane_d), plane_h)
        np.testing.assert_array_equal(np.asarray(K_d), K_h.astype(np.int64))


@pytest.mark.parametrize("mo", [20, 70])
def test_pair_odd_lim_t_phantom_half_step(mo):
    """Full-length reads (len == maxlen == 80) force lim_t = 79 (odd), so
    the masked phantom half-step branch of _scan_pair_core actually runs —
    71bp reads in the shared fixture round lim_t up to 72 (even)."""
    rng = np.random.default_rng(23)
    genome = rng.integers(0, 4, 3000)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    starts = rng.integers(0, 3000 - 80, 96)
    reads = [alpha[genome[s : s + 80]].tobytes().decode() for s in starts]
    reads += [reads[0], reads[1][3:77]]
    fwd, _p, rev, _rp, ns = sa_mod.build_index_arrays_pair(
        reads, use_device=False
    )
    d1, d2 = DeviceFM(FMIndex(fwd, ns)), DeviceFM(FMIndex(rev, ns))
    s_old = DualScanner(d1, d2, pair_step=False)
    s_new = DualScanner(d1, d2, pair_step=True)
    a = _collect(s_old, reads, 80, mo)
    b = _collect(s_new, reads, 80, mo)
    for view_a, view_b in zip(a, b):
        for x, y in zip(view_a, view_b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_pair_matches_rmdup_groups(scanners):
    reads, d1, d2 = scanners
    groups = dict(fwd_groups=(GROUP_ID,), rev_groups=(GROUP_COMP,))
    s_old = DualScanner(d1, d2, pair_step=False, **groups)
    s_new = DualScanner(d1, d2, pair_step=True, **groups)
    a = _collect(s_old, reads, 80, 81)  # min_overlap > maxlen: finals only
    b = _collect(s_new, reads, 80, 81)
    for view_a, view_b in zip(a, b):
        for x, y in zip(view_a, view_b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
