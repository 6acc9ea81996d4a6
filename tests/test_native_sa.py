"""Native host SA builder (C++ seed-sort + tied-group doubling) parity
against the numpy prefix-doubling oracle, plus the seeded numpy variant.
These are the build paths for texts beyond the single-device program limit
(index/sa.py::_device_max_chars)."""
import numpy as np
import pytest

from siga_tpu import native
from siga_tpu.index import sa as sa_mod


def _reads(n, readlen, gsize, seed):
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, gsize)
    A = np.frombuffer(b"ACGT", dtype=np.uint8)
    starts = rng.integers(0, gsize - readlen, n)
    return [A[genome[s : s + readlen]].tobytes().decode() for s in starts]


CASES = [
    _reads(400, 100, 8000, 1),
    _reads(200, 150, 6000, 2),  # needs two doubling rounds
    _reads(150, 73, 4000, 3) + ["ACGT" * 30, "A" * 80, "A" * 200],
]
CASES.append(CASES[0][:50] + CASES[0][:50])  # exact duplicate reads


@pytest.mark.parametrize("i", range(len(CASES)))
def test_host_builders_match_oracle(i):
    codes, starts, _ = sa_mod.concat_reads(CASES[i])
    oracle = sa_mod.suffix_array_numpy(codes)
    np.testing.assert_array_equal(
        sa_mod.suffix_array_numpy_seeded(codes), oracle
    )
    if native.available():
        np.testing.assert_array_equal(native.build_sa(codes), oracle)


def test_build_index_arrays_pair_host_fallback(monkeypatch):
    """Above the device-size threshold the pair build must fall back to the
    host builder and produce the same artifacts."""
    seqs = CASES[0][:100]
    ref = sa_mod.build_index_arrays_pair(seqs, use_device=False)
    monkeypatch.setenv("SIGA_SA_DEVICE_MAX", "1")
    out = sa_mod.build_index_arrays_pair(seqs, use_device=True)
    for a, b in zip(ref[:4], out[:4]):
        np.testing.assert_array_equal(a, b)
