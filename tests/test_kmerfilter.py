"""K-mer rolling-hash filter tests vs a sequential C-semantics oracle."""

import numpy as np

from fastquick_tpu.index.kmerfilter import (
    KMER_SIZE,
    KmerFilter,
    KmerFilterBuilder,
    _register_stream,
    kmer_shrinkage,
    register_stream_vec,
)
from fastquick_tpu.index.seq import NT4_TABLE, encode


def test_register_stream_vec_matches_sequential():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 5, 200).astype(np.uint8)  # includes N=4
    np.testing.assert_array_equal(register_stream_vec(codes), _register_stream(codes))


def test_shrinkage_projections():
    k = np.array([0x0123456789ABCDEF], dtype=np.uint64)
    assert kmer_shrinkage(k, 0)[0] == 0x01234567
    assert kmer_shrinkage(k, 1)[0] == 0x89ABCDEF
    assert kmer_shrinkage(k, 2)[0] == 0x0123CDEF
    assert kmer_shrinkage(k, 3)[0] == 0x456789AB
    assert kmer_shrinkage(k, 4)[0] == 0x012389AB
    assert kmer_shrinkage(k, 5)[0] == 0x4567CDEF


def _oracle_insert(seq: str, alleles, sets):
    """Direct transliteration-free reimplementation of AddSeq2HashCore
    semantics (reference src/BwtIndexer.cpp:611-713) in plain Python."""
    codes = [int(NT4_TABLE[ord(c)]) for c in seq]
    n = len(codes)
    half = n // 2
    datum = 0
    for i in range(KMER_SIZE):
        datum = ((datum << 2) | codes[i]) & 0xFFFFFFFFFFFFFFFF
    kmers = [datum]
    i = KMER_SIZE
    while i != half:
        datum = ((datum << 2) | codes[i]) & 0xFFFFFFFFFFFFFFFF
        kmers.append(datum)
        i += 1
    tmp = datum
    for al in alleles:
        tmp = datum
        for j in range(half, half + KMER_SIZE):
            v = int(NT4_TABLE[ord(al)]) if j == half else codes[j]
            tmp = ((tmp << 2) | v) & 0xFFFFFFFFFFFFFFFF
            kmers.append(tmp)
    d = tmp
    for i in range(half + KMER_SIZE, n):
        d = ((d << 2) | codes[i]) & 0xFFFFFFFFFFFFFFFF
        kmers.append(d)
    arr = np.array(kmers, dtype=np.uint64)
    for t in range(6):
        sets[t].update(kmer_shrinkage(arr, t).tolist())


def test_builder_matches_oracle():
    rng = np.random.default_rng(1)
    flank = 40
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 2 * flank + 1))
    alleles = ("A", "G")
    b = KmerFilterBuilder()
    b.add_seq(seq, alleles)
    filt = b.finalize()

    from fastquick_tpu.index.seq import reverse_complement_str

    sets = [set() for _ in range(6)]
    _oracle_insert(seq, alleles, sets)
    _oracle_insert(reverse_complement_str(seq), alleles, sets)
    for t in range(6):
        assert set(filt.keys[t].tolist()) == sets[t], f"table {t} mismatch"


def test_read_kept_semantics():
    rng = np.random.default_rng(2)
    flank = 260
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 2 * flank + 1))
    b = KmerFilterBuilder()
    b.add_seq(seq, ("A", "C"))
    filt = b.finalize()
    # a read taken straight from the left flank must pass
    read = encode(seq[10:10 + 100])
    assert filt.is_read_kept(read)
    # random read almost surely fails
    junk = rng.integers(0, 4, 100).astype(np.uint8)
    assert not filt.is_read_kept(junk)


def test_filter_npz_roundtrip(tmp_path):
    b = KmerFilterBuilder()
    rng = np.random.default_rng(3)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 101))
    b.add_seq(seq, ("A", "T"))
    f = b.finalize()
    p = tmp_path / "f.npz"
    f.save_npz(str(p))
    f2 = KmerFilter.load_npz(str(p))
    assert f2.thresh == f.thresh
    for t in range(6):
        np.testing.assert_array_equal(f.keys[t], f2.keys[t])
