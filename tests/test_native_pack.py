"""Native 2-bit read packer (siga_pack_reads_2bit) vs the numpy path."""
import numpy as np
import pytest

from siga_tpu import native
from siga_tpu.ops import fm_device


@pytest.mark.skipif(not native.available(), reason="no native lib")
def test_native_pack_parity_mixed_lengths():
    rng = np.random.default_rng(3)
    A = "ACGT"
    seqs = [
        "".join(A[c] for c in rng.integers(0, 4, int(rng.integers(1, 113))))
        for _ in range(700)
    ]
    seqs.append("")  # empty read -> length clamps to 1
    w_nat, l_nat = fm_device.pack_reads_2bit(seqs, 1024, 112)
    orig = native.available
    native.available = lambda: False
    try:
        w_np, l_np = fm_device.pack_reads_2bit(seqs, 1024, 112)
    finally:
        native.available = orig
    np.testing.assert_array_equal(w_nat, w_np)
    np.testing.assert_array_equal(l_nat, l_np)


@pytest.mark.skipif(not native.available(), reason="no native lib")
def test_native_pack_rejects_non_acgt():
    with pytest.raises(ValueError, match="non-ACGT"):
        fm_device.pack_reads_2bit(["ACGN"], 8, 16)
