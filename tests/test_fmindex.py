"""FM-index construction tests vs naive oracles."""

import numpy as np
import pytest

from fastquick_tpu.index.fmindex import FMIndex, OCC_BLOCK, pack_2bit_words, suffix_array
from fastquick_tpu.index.seq import Lrand48, encode, revcomp_codes


def naive_suffix_array(t):
    n = len(t)
    suffixes = sorted(range(n + 1), key=lambda i: tuple(t[i:]))
    return np.array(suffixes)


@pytest.mark.parametrize("seed,n", [(0, 1), (1, 2), (2, 17), (3, 100), (4, 1000)])
def test_suffix_array_matches_naive(seed, n):
    rng = np.random.default_rng(seed)
    t = rng.integers(0, 4, n).astype(np.uint8)
    sa = suffix_array(t)
    want = naive_suffix_array(list(map(int, t)))
    np.testing.assert_array_equal(sa, want)


def test_suffix_array_repetitive():
    t = np.array([0] * 50 + [1, 0] * 25, dtype=np.uint8)
    np.testing.assert_array_equal(suffix_array(t), naive_suffix_array(list(map(int, t))))


def test_pack_2bit_words():
    codes = np.array([0, 1, 2, 3] * 5, dtype=np.uint8)  # 20 bases -> 2 words
    w = pack_2bit_words(codes)
    assert w.dtype == np.uint32
    assert len(w) == 2
    # first word: 0123012301230123 big-endian 2-bit
    want0 = 0
    for c in codes[:16]:
        want0 = (want0 << 2) | int(c)
    assert int(w[0]) == want0


def naive_occ(bwt, c, k):
    return int(np.count_nonzero(bwt[:k] == c))


@pytest.mark.parametrize("seed,n", [(0, 37), (1, 300), (2, 1000)])
def test_fmindex_occ_and_search(seed, n):
    rng = np.random.default_rng(seed)
    t = rng.integers(0, 4, n).astype(np.uint8)
    fm = FMIndex.build(t)
    # occ oracle over the sentinel-removed bwt
    for _ in range(50):
        c = rng.integers(0, 4)
        k = int(rng.integers(0, n + 2))
        kp = k - (1 if k > fm.primary else 0)
        assert fm.occ_at(c, k) == naive_occ(fm.bwt, c, kp)
    # exact search finds all occurrences of random substrings
    text = "".join("ACGT"[c] for c in t)
    for _ in range(20):
        qlen = int(rng.integers(1, min(20, n)))
        start = int(rng.integers(0, n - qlen))
        q = t[start:start + qlen]
        lo, hi = fm.match_exact(q)
        qs = text[start:start + qlen]
        want_positions = sorted(
            i for i in range(n - qlen + 1) if text[i:i + qlen] == qs)
        got_positions = sorted(int(fm.sa[r]) for r in range(lo, hi))
        assert got_positions == want_positions
    # absent query
    lo, hi = fm.match_exact(np.array([0] * (n + 1), dtype=np.uint8))
    assert hi <= lo or all(
        text[fm.sa[r]:fm.sa[r] + n + 1] == "A" * (n + 1) for r in range(lo, hi))


def test_fmindex_sa_row0():
    t = np.array([2, 1, 3, 0, 0, 1], dtype=np.uint8)
    fm = FMIndex.build(t)
    assert fm.sa[0] == fm.n  # $ row


def test_lrand48_matches_glibc():
    # glibc lrand48 with srand48(11): first values (verified against C)
    r = Lrand48(11)
    vals = [r.next() for _ in range(4)]
    # deterministic LCG: X0 = (11<<16)|0x330E
    x = (11 << 16) | 0x330E
    want = []
    for _ in range(4):
        x = (0x5DEECE66D * x + 0xB) & ((1 << 48) - 1)
        want.append((x >> 17) & 0x7FFFFFFF)
    assert vals == want


def test_encode_revcomp():
    codes = encode("ACGTNacgtn")
    np.testing.assert_array_equal(codes, [0, 1, 2, 3, 4, 0, 1, 2, 3, 4])
    rc = revcomp_codes(np.array([0, 1, 2, 3, 4], dtype=np.uint8))
    np.testing.assert_array_equal(rc, [4, 0, 1, 2, 3])


# ---- bit-parity vs genuine bwa artifacts shipped with the reference ----

BWA_FA = "/root/reference/example/ref.test.fa"


def _example_codes():
    fa = open(BWA_FA).read()
    seq = "".join(line.strip() for line in fa.splitlines()
                  if not line.startswith(">")).upper()
    lut = np.full(256, 4, np.uint8)
    for i, ch in enumerate(b"ACGT"):
        lut[ch] = i
    t = lut[np.frombuffer(seq.encode(), np.uint8)]
    assert t.max() <= 3  # the example genome has no Ns
    return t


def test_fmindex_matches_real_bwa_bwt_and_sa():
    """The reference ships the actual `bwa index` output for
    ref.test.fa (bwa 0.7 layout: one index over forward + reverse-
    complement, 64-bit header, u64 Occ checkpoints interleaved every
    128 symbols, SA sampled at interval 32).  Our builder must
    reproduce it bit-for-bit: primary row, every BWT symbol, and every
    sampled SA entry."""
    import struct

    t = _example_codes()
    d = open(BWA_FA + ".bwt", "rb").read()
    (primary,) = struct.unpack_from("<Q", d, 0)
    L2 = struct.unpack_from("<4Q", d, 8)
    seq_len = L2[3]
    assert seq_len == 2 * len(t)
    body = np.frombuffer(d, np.uint32, offset=40)
    # de-interleave blocks: 8 words Occ (4 u64) + 8 words packed BWT
    bwt_words = np.concatenate(
        [body[i + 8:i + 16] for i in range(0, len(body), 16)])
    k = np.arange(seq_len)
    bwa_bwt = (bwt_words[k >> 4]
               >> (((~k & 0xF) << 1).astype(np.uint32))) & 3

    fm = FMIndex.build(np.concatenate([t, (3 - t)[::-1]]))
    assert fm.primary == primary
    assert np.array_equal(fm.bwt.astype(np.int64), bwa_bwt.astype(np.int64))
    assert np.array_equal((fm.C[1:5] - 1).astype(np.int64),
                          np.asarray(L2, np.int64))

    ds = open(BWA_FA + ".sa", "rb").read()
    (sa_primary,) = struct.unpack_from("<Q", ds, 0)
    intv, sa_len = struct.unpack_from("<2Q", ds, 40)
    assert sa_primary == primary and intv == 32 and sa_len == seq_len
    bwa_sa = np.frombuffer(ds, np.uint64, offset=56)  # sa[0] omitted
    ours = fm.sa[np.arange(1, len(bwa_sa) + 1) * int(intv)]
    assert np.array_equal(ours.astype(np.uint64), bwa_sa)


def test_pac_matches_real_bwa_pac(tmp_path):
    """_dump_pac writes byte-identical `bwa index` .pac output."""
    from fastquick_tpu.index.builder import _dump_pac

    t = _example_codes()
    out = tmp_path / "x.pac"
    _dump_pac(str(out), t)
    assert out.read_bytes() == open(BWA_FA + ".pac", "rb").read()
