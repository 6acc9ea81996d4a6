"""Differential test: vectorized batch corrector == exact KmerCorrector."""
import numpy as np

from siga_tpu.correct.batch import WindowCountTable, correct_reads_batch
from siga_tpu.correct.kmer import correct_reads
from siga_tpu.index import sa as sa_mod
from siga_tpu.index.fm import FMIndex
from siga_tpu.io.fastx import DNASeq


def _mutated_reads(rng, genome, n_reads, readlen, err_rate, with_quality):
    A = "ACGT"
    reads = []
    for i in range(n_reads):
        s = int(rng.integers(0, len(genome) - readlen))
        b = list(genome[s : s + readlen])
        for j in range(readlen):
            if rng.random() < err_rate:
                b[j] = A[int(rng.integers(0, 4))]
        q = None
        if with_quality:
            q = "".join(
                chr(33 + int(rng.integers(5, 40))) for _ in range(readlen)
            )
        reads.append(DNASeq(name=f"r{i}", seq="".join(b), quality=q))
    return reads


def _run_both(reads, k, threshold=3):
    codes, _starts, _ = sa_mod.concat_reads([r.seq for r in reads])
    sa = sa_mod.suffix_array_numpy(codes)
    fmi = FMIndex(sa_mod.bwt_from_sa(codes, sa), len(reads))
    exact = [
        (r.name, r.seq)
        for r in correct_reads(fmi, reads, kmer_size=k, threshold=threshold)
    ]
    batch = [
        (r.name, r.seq)
        for r in correct_reads_batch(reads, kmer_size=k, threshold=threshold)
    ]
    return exact, batch


def test_window_counts_equal_fm_occurrences():
    rng = np.random.default_rng(5)
    A = "ACGT"
    genome = "".join(A[c] for c in rng.integers(0, 4, 3000))
    reads = _mutated_reads(rng, genome, 80, 60, 0.01, with_quality=False)
    k = 21
    codes, _starts, _ = sa_mod.concat_reads([r.seq for r in reads])
    sa = sa_mod.suffix_array_numpy(codes)
    fmi = FMIndex(sa_mod.bwt_from_sa(codes, sa), len(reads))

    from siga_tpu.core import dna

    lens = np.array([len(r.seq) for r in reads])
    L = int(lens.max())
    mat = np.zeros((len(reads), L), dtype=np.uint8)
    for i, r in enumerate(reads):
        mat[i, : lens[i]] = dna.encode(r.seq)
    table = WindowCountTable(mat, lens, k)
    for i in [0, 3, 17]:
        s = reads[i].seq
        for j in range(0, len(s) - k + 1, 7):
            w = s[j : j + k]
            assert table.window_counts[i, j] == fmi.occurrences(w)


def test_batch_corrector_matches_exact_short_k():
    rng = np.random.default_rng(11)
    A = "ACGT"
    genome = "".join(A[c] for c in rng.integers(0, 4, 4000))
    reads = _mutated_reads(rng, genome, 500, 70, 0.01, with_quality=False)
    exact, batch = _run_both(reads, k=21)
    assert exact == batch
    assert len(exact) > 300  # most reads survive at ~9x coverage


def test_batch_corrector_matches_exact_with_quality_and_large_k():
    rng = np.random.default_rng(12)
    A = "ACGT"
    genome = "".join(A[c] for c in rng.integers(0, 4, 4000))
    reads = _mutated_reads(rng, genome, 150, 80, 0.02, with_quality=True)
    exact, batch = _run_both(reads, k=41)  # k > 32: (hi, lo) key path
    assert exact == batch


def test_batch_corrector_short_reads_dropped():
    reads = [DNASeq(name="a", seq="ACGT"), DNASeq(name="b", seq="ACGTACGTAC")]
    out = list(correct_reads_batch(reads, kmer_size=21))
    assert out == []
