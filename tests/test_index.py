import numpy as np
import pytest

from siga_tpu.core import dna
from siga_tpu.index import fm, sa

from naive import naive_bwt, naive_occ, naive_occurrences, naive_suffix_array


def random_reads(rng, n, lo=5, hi=30):
    return [
        "".join(rng.choice(list("ACGT")) for _ in range(rng.integers(lo, hi)))
        for _ in range(n)
    ]


def np_rng(seed):
    return np.random.default_rng(seed)


class RInt:
    """Tiny adapter giving .choice/.integers over python lists."""

    def __init__(self, seed):
        self.r = np.random.default_rng(seed)

    def choice(self, xs):
        return xs[int(self.r.integers(0, len(xs)))]

    def integers(self, lo, hi):
        return int(self.r.integers(lo, hi))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_suffix_array_matches_naive(seed):
    rng = RInt(seed)
    reads = random_reads(rng, 8)
    # include duplicates to exercise sentinel tie-breaking
    reads.append(reads[0])
    reads.append(reads[0])
    codes, starts, _ = sa.concat_reads(reads)
    got = sa.suffix_array_numpy(codes)
    want, _text = naive_suffix_array(reads)
    assert list(got) == want


@pytest.mark.parametrize("seed", [0, 5])
def test_suffix_array_jax_matches_numpy(seed):
    rng = RInt(seed)
    reads = random_reads(rng, 12)
    reads += [reads[1]] * 2
    codes, starts, _ = sa.concat_reads(reads)
    assert list(sa.suffix_array_jax(codes)) == list(sa.suffix_array_numpy(codes))


def test_bwt_matches_naive():
    rng = RInt(7)
    reads = random_reads(rng, 10)
    reads.append(reads[2])
    codes, starts, _ = sa.concat_reads(reads)
    order = sa.suffix_array_numpy(codes)
    got = dna.decode(sa.bwt_from_sa(codes, order))
    assert got == naive_bwt(reads)


def test_sai_perm_is_rank_permutation():
    reads = ["ACGT", "ACGA", "TTTT", "ACGT"]
    codes, starts, _ = sa.concat_reads(reads)
    order = sa.suffix_array_numpy(codes)
    perm = sa.sai_perm_from_sa(order, starts)
    assert sorted(perm) == [0, 1, 2, 3]
    # ACGA < ACGT(read 0) < ACGT(read 3, tie by read index) < TTTT
    assert list(perm) == [1, 0, 3, 2]


def test_occ_matches_naive():
    rng = RInt(11)
    reads = random_reads(rng, 6)
    bwt_codes, _perm, ns = sa.build_index_arrays(reads)
    bwt_str = dna.decode(bwt_codes)
    index = fm.FMIndex(bwt_codes, ns)
    n = len(bwt_str)
    for i in [-1, 0, 1, n // 2, n - 2, n - 1]:
        counts = index.occ_all(i)
        for c_rank, c in enumerate("$ACGT"):
            assert counts[c_rank] == naive_occ(bwt_str, c, i), (c, i)
    # batched form agrees with scalar form
    idxs = np.array([-1, 0, 3, n - 1])
    batch = index.occ_all(idxs)
    for row, i in zip(batch, idxs):
        assert np.array_equal(row, index.occ_all(int(i)))


def test_occurrences_vs_bruteforce():
    rng = RInt(13)
    reads = random_reads(rng, 8, lo=10, hi=20)
    bwt_codes, _perm, ns = sa.build_index_arrays(reads)
    index = fm.FMIndex(bwt_codes, ns)
    for w in ["A", "AC", "ACG", reads[0][:5], reads[3][2:9], "ACGTACGTACGT"]:
        assert index.occurrences(w) == naive_occurrences(reads, w), w


def test_get_string_reconstructs_reads():
    reads = ["ACGTT", "GGCA", "ACGTT"]
    bwt_codes, perm, ns = sa.build_index_arrays(reads)
    index = fm.FMIndex(bwt_codes, ns)
    # The first num_strings BWT rows are the sentinel suffixes in text order,
    # i.e. read input order: row i reconstructs read i.
    for i in range(ns):
        assert index.get_string(i) == reads[i]


def test_interval_pair_bidirectional():
    reads = ["ACGTT", "CGTTA", "TACGT"]
    fwd_codes, _p, ns = sa.build_index_arrays(reads)
    rev_codes, _rp, _ns = sa.build_index_arrays([r[::-1] for r in reads])
    fwd = fm.FMIndex(fwd_codes, ns)
    rev = fm.FMIndex(rev_codes, ns)
    # search "CGT" right-to-left via update_left; pair must stay synchronized
    pair = fm.IntervalPair()
    pair.init(dna.torank("T"), fwd, rev)
    pair.update_left(dna.torank("G"), fwd)
    pair.update_left(dna.torank("C"), fwd)
    assert pair.valid()
    width = pair.hi - pair.lo
    assert width == pair.rhi - pair.rlo
    assert width + 1 == naive_occurrences(reads, "CGT")
    # extending right by 'T' must match occurrences of CGTT
    pair2 = pair.copy()
    pair2.update_right(dna.torank("T"), rev)
    assert pair2.hi - pair2.lo + 1 == naive_occurrences(reads, "CGTT")


def test_device_index_arrays_match_host():
    rng = RInt(29)
    reads = random_reads(rng, 20)
    reads += [reads[0], reads[5]]
    host = sa.build_index_arrays(reads, use_device=False)
    dev = sa.build_index_arrays(reads, use_device=True)
    assert np.array_equal(host[0], dev[0])
    assert np.array_equal(host[1], dev[1])
    assert host[2] == dev[2]


def test_fused_plane_occ_matches_host():
    """The row-gather fused-plane occ (the scan's occ primitive, including
    the derived '$' checkpoint column) must agree with the host FM-index at
    every position class: -1, block boundaries, mid-block, end."""
    import jax.numpy as jnp

    from siga_tpu.ops.fm_device import DeviceFM, occ_all_fused_T

    rng = RInt(5)
    reads = random_reads(rng, 24, lo=20, hi=70)
    bwt_codes, _perm, ns = sa.build_index_arrays(reads)
    index = fm.FMIndex(bwt_codes, ns)
    dfm = DeviceFM(index)
    n = index.length
    rng2 = np.random.default_rng(5)
    qs = np.concatenate(
        [[-1, 0, 1, 31, 32, 127, 128, 129, n - 2, n - 1],
         rng2.integers(0, n, 54)]
    ).astype(np.int32)
    got = np.asarray(
        occ_all_fused_T(dfm.occ_plane, n, jnp.asarray(qs), None)
    ).T
    want = index.occ_all(qs.astype(np.int64))
    assert np.array_equal(got, want)
