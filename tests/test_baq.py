"""BAQ realignment + overlap quality tweak (pop/baq.py; behavior of
VerifyBamID/samtools/bam_md.c:212 flag=3 and htslib's
tweak_overlap_quality, as configured at SimplePileupViewer.cpp:688)."""

import numpy as np
import pytest

from fastquick_tpu.pop.baq import baq_realign, kpa_glocal, tweak_overlap_quality


def codes(s):
    return np.frombuffer(s.encode().translate(
        bytes.maketrans(b"ACGTN", bytes([0, 1, 2, 3, 4]))), dtype=np.uint8)


@pytest.fixture
def ref():
    rng = np.random.default_rng(5)
    return "".join("ACGT"[c] for c in rng.integers(0, 4, 600))


def fetcher(ref):
    def fetch(s0, e0):
        return codes(ref[max(0, s0):max(0, e0)])
    return fetch


def test_perfect_match_keeps_quals(ref):
    read = ref[100:200]
    qual = np.full(100, 35, dtype=np.int64)
    out = baq_realign(100, [("M", 100)], codes(read), qual, fetcher(ref))
    # a confident unique alignment: BAQ never raises quals, and for a
    # perfect interior match it should keep them (edges may dip)
    assert out is not None
    assert (out <= qual).all()
    assert (out[5:-5] == 35).all()


def test_mismatch_near_indel_gets_capped(ref):
    # read simulates a deletion the aligner called as a block of
    # mismatches: bases near the unstable region must lose confidence
    read = ref[100:150] + ref[153:203]
    qual = np.full(100, 35, dtype=np.int64)
    out = baq_realign(100, [("M", 100)], codes(read), qual, fetcher(ref))
    assert out is not None
    assert out.min() < 35  # somewhere the HMM flags misplacement
    assert (out <= qual).all()


def test_state_positions_match_alignment(ref):
    read = ref[300:360]
    qual = np.full(60, 30, dtype=np.int64)
    state, q = kpa_glocal(codes(ref[290:370]), codes(read), qual, 7)
    # every base should MAP to the diagonal (match state, correct offset)
    assert ((state & 3) == 0).all()
    assert (np.asarray(state >> 2) == np.arange(10, 70)).all()
    assert (q >= 20).all()  # confident


def test_baq_skips_unusable_reads(ref):
    qual = np.full(10, 30, dtype=np.int64)
    assert baq_realign(5, [("N", 10)], codes("A" * 10), qual,
                       fetcher(ref)) is None
    q255 = np.full(10, 255, dtype=np.int64)
    assert baq_realign(5, [("M", 10)], codes("A" * 10), q255,
                       fetcher(ref)) is None


def test_overlap_tweak_same_base_merges():
    a = {"pos": 100, "cigar": [("M", 10)], "seq": "ACGTACGTAC",
         "qarr": np.full(10, 30, dtype=np.int64)}
    b = {"pos": 105, "cigar": [("M", 10)], "seq": "CGTACGTACG",
         "qarr": np.full(10, 25, dtype=np.int64)}
    tweak_overlap_quality(a, b)
    # positions 105-109 overlap; a's bases CGTAC match b's first 5
    assert list(a["qarr"][5:]) == [55] * 5
    assert list(b["qarr"][:5]) == [0] * 5
    assert list(b["qarr"][5:]) == [25] * 5  # untouched tail


def test_overlap_tweak_mismatch_keeps_higher():
    a = {"pos": 100, "cigar": [("M", 5)], "seq": "AAAAA",
         "qarr": np.array([30, 30, 30, 10, 30], dtype=np.int64)}
    b = {"pos": 100, "cigar": [("M", 5)], "seq": "AATAA",
         "qarr": np.array([20, 20, 20, 20, 20], dtype=np.int64)}
    tweak_overlap_quality(a, b)
    assert list(a["qarr"]) == [50, 50, 24, 30, 50]
    assert list(b["qarr"]) == [0, 0, 0, 0, 0]


def test_overlap_tweak_cap_200():
    a = {"pos": 0, "cigar": [("M", 2)], "seq": "AA",
         "qarr": np.array([150, 90], dtype=np.int64)}
    b = {"pos": 0, "cigar": [("M", 2)], "seq": "AA",
         "qarr": np.array([90, 90], dtype=np.int64)}
    tweak_overlap_quality(a, b)
    assert list(a["qarr"]) == [200, 180]
