"""Device k-mer filter vs host filter."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from fastquick_tpu.index.kmerfilter import KmerFilterBuilder
from fastquick_tpu.ops.kmer import filter_reads, kmer_halves, projections


def test_kmer_halves_match_uint64():
    rng = np.random.default_rng(0)
    chunks = rng.integers(0, 5, (64, 32)).astype(np.int32)  # incl N=4
    hi, lo = kmer_halves(jnp.asarray(chunks))
    hi, lo = np.asarray(hi), np.asarray(lo)
    for b in range(64):
        k = 0
        for v in chunks[b]:
            k = ((k << 2) | int(v)) & 0xFFFFFFFFFFFFFFFF
        assert hi[b] == (k >> 32), f"b={b}"
        assert lo[b] == (k & 0xFFFFFFFF), f"b={b}"


def test_projections_match_shrinkage():
    from fastquick_tpu.index.kmerfilter import kmer_shrinkage

    rng = np.random.default_rng(1)
    kmers = rng.integers(0, 2**63, 100).astype(np.uint64)
    hi = jnp.asarray((kmers >> np.uint64(32)).astype(np.uint32))
    lo = jnp.asarray((kmers & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    projs = np.asarray(projections(hi, lo))
    for t in range(6):
        want = kmer_shrinkage(kmers, t)
        np.testing.assert_array_equal(projs[:, t], want, err_msg=f"table {t}")


def test_filter_reads_matches_host():
    rng = np.random.default_rng(2)
    flank = 260
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 2 * flank + 1))
    b = KmerFilterBuilder()
    b.add_seq(seq, ("A", "C"))
    filt = b.finalize()
    bitmaps = jnp.asarray(filt.bitmaps_uint32())

    from fastquick_tpu.index.seq import encode

    B, L = 64, 120
    seqs = np.zeros((B, L), dtype=np.int32)
    lens = np.full(B, L, dtype=np.int32)
    want = np.zeros(B, dtype=bool)
    for i in range(B):
        if i % 3 == 0:  # from the flank
            s = int(rng.integers(0, len(seq) - L))
            codes = encode(seq[s:s + L])
        elif i % 3 == 1:  # revcomp of flank
            s = int(rng.integers(0, len(seq) - L))
            from fastquick_tpu.index.seq import reverse_complement_str

            codes = encode(reverse_complement_str(seq[s:s + L]))
        else:  # junk
            codes = rng.integers(0, 4, L).astype(np.uint8)
        seqs[i, :] = codes
        want[i] = filt.is_read_kept(codes)
    got = np.asarray(filter_reads(bitmaps, jnp.asarray(seqs),
                                  jnp.asarray(lens), filt.thresh))
    np.testing.assert_array_equal(got, want)
    assert want.sum() > 20  # flank reads kept
    assert (~want).sum() > 15  # junk rejected
