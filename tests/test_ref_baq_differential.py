"""BAQ vs the COMPILED reference kprobaln.c (fourth external oracle).

testing/refbaq compiles the reference's actual kpa_glocal (the BAQ HMM
samtools mpileup applies to every BAM read; the reference pileup path
inherits it via SimplePileupViewer.cpp:255 -> bam_md.c:212 flag=3) and
this module diffs pop/baq.py against it BIT-FOR-BIT:

1. kpa_glocal: identical `state` and `q` arrays over randomized
   (ref, query, qual, bw) cases incl. indels, N bases, short seqs and
   band-clamp edge cases;
2. the bam_md.c extended-BAQ glue: the test transliterates the glue
   from bam_md.c:273-321 on the ORACLE's outputs and asserts
   baq_realign produces identical final capped quals.
"""

import numpy as np
import pytest

from fastquick_tpu.pop import baq
from fastquick_tpu.testing import refbaq

pytestmark = pytest.mark.skipif(not refbaq.available(),
                                reason="reference kprobaln.c absent")


def _rand_case(rng, l_ref=None, l_query=None, n_frac=0.0):
    l_ref = l_ref or int(rng.integers(1, 400))
    l_query = l_query or int(rng.integers(1, 200))
    ref = rng.integers(0, 4, l_ref).astype(np.uint8)
    # query derived from a ref slice with errors so the HMM has real
    # structure (pure-random pairs exercise only the flat posterior)
    if l_ref >= l_query:
        s = int(rng.integers(0, l_ref - l_query + 1))
        query = ref[s:s + l_query].copy()
    else:
        query = np.resize(ref, l_query).copy()
    nerr = int(rng.binomial(l_query, 0.05))
    for _ in range(nerr):
        p = int(rng.integers(0, l_query))
        query[p] = (query[p] + int(rng.integers(1, 4))) % 4
    if n_frac:
        mask = rng.random(l_query) < n_frac
        query[mask] = 4
        rmask = rng.random(l_ref) < n_frac
        ref = ref.copy()
        ref[rmask] = 4
    iqual = rng.integers(2, 42, l_query).astype(np.uint8)
    bw = int(rng.integers(3, 30))
    return ref, query, iqual, bw


def test_kpa_glocal_bitwise_randomized():
    try:
        refbaq.get_lib()
    except RuntimeError as e:
        pytest.skip(str(e))
    rng = np.random.default_rng(7)
    for case in range(60):
        ref, query, iqual, bw = _rand_case(rng, n_frac=0.02 * (case % 3))
        st_c, q_c, _pr = refbaq.kpa_glocal(ref, query, iqual, bw)
        st_py, q_py = baq.kpa_glocal(ref, query, iqual, bw)
        assert np.array_equal(st_c, st_py), (
            case, np.nonzero(st_c != st_py)[0][:5])
        assert np.array_equal(q_c, q_py), (
            case, np.nonzero(q_c != q_py)[0][:5])


def test_kpa_glocal_edge_cases():
    try:
        refbaq.get_lib()
    except RuntimeError as e:
        pytest.skip(str(e))
    rng = np.random.default_rng(11)
    shapes = [(1, 1), (1, 5), (5, 1), (2, 2), (300, 40), (40, 300),
              (151, 151), (170, 151)]
    for l_ref, l_query in shapes:
        for bw in (1, 7, 1000):
            ref, query, iqual, _ = _rand_case(rng, l_ref, l_query)
            st_c, q_c, _ = refbaq.kpa_glocal(ref, query, iqual, bw)
            st_py, q_py = baq.kpa_glocal(ref, query, iqual, bw)
            assert np.array_equal(st_c, st_py), (l_ref, l_query, bw)
            assert np.array_equal(q_c, q_py), (l_ref, l_query, bw)


def _c_glue_extended(pos0, cigar, l_qseq, qual, xb, state, q):
    """Transliteration of bam_md.c:273-321 (extend_baq, apply) driven by
    the oracle's state/q -- the expected final quals."""
    bq = qual.astype(np.int64).copy()
    left = np.zeros(l_qseq, dtype=np.int64)
    rght = np.zeros(l_qseq, dtype=np.int64)
    x, y = pos0, 0
    for op, ln in cigar:
        if op in ("M", "=", "X"):
            for i in range(y, y + ln):
                if (state[i] & 3) != 0 or (state[i] >> 2) != x - xb + (i - y):
                    bq[i] = 0
                else:
                    bq[i] = q[i]
            left[y] = bq[y]
            for i in range(y + 1, y + ln):
                left[i] = max(bq[i], left[i - 1])
            rght[y + ln - 1] = bq[y + ln - 1]
            for i in range(y + ln - 2, y - 1, -1):
                rght[i] = max(bq[i], rght[i + 1])
            for i in range(y, y + ln):
                bq[i] = min(left[i], rght[i])
            x += ln
            y += ln
        elif op in ("S", "I"):
            y += ln
        elif op == "D":
            x += ln
    adj = np.where(qual.astype(np.int64) <= bq, 0,
                   qual.astype(np.int64) - bq)
    return qual.astype(np.int64) - adj


def test_baq_realign_matches_c_glue():
    """Band/window computation + extended-BAQ glue end to end: the
    driver must pick the same ref window and bandwidth as bam_md.c and
    produce identical capped quals."""
    try:
        refbaq.get_lib()
    except RuntimeError as e:
        pytest.skip(str(e))
    rng = np.random.default_rng(23)
    genome = rng.integers(0, 4, 5000).astype(np.uint8)

    def fetch(a, b):
        a = max(0, a)
        return genome[a:min(b, len(genome))]

    for case in range(40):
        pos0 = int(rng.integers(50, 4000))
        # CIGAR with soft clips / insertions / deletions
        shape = case % 4
        if shape == 0:
            cigar = [("M", int(rng.integers(30, 120)))]
        elif shape == 1:
            cigar = [("S", int(rng.integers(1, 8))),
                     ("M", int(rng.integers(20, 60))),
                     ("I", int(rng.integers(1, 4))),
                     ("M", int(rng.integers(20, 60)))]
        elif shape == 2:
            cigar = [("M", int(rng.integers(20, 60))),
                     ("D", int(rng.integers(1, 6))),
                     ("M", int(rng.integers(20, 60))),
                     ("S", int(rng.integers(1, 8)))]
        else:
            cigar = [("M", int(rng.integers(10, 30))),
                     ("I", int(rng.integers(8, 12))),  # widens the band
                     ("M", int(rng.integers(10, 30)))]
        l_qseq = sum(ln for op, ln in cigar if op in "MIS=X")
        # read bases from the reference walk with 3% errors
        codes = np.empty(l_qseq, dtype=np.uint8)
        x, y = pos0, 0
        for op, ln in cigar:
            if op in ("M", "=", "X"):
                codes[y:y + ln] = genome[x:x + ln]
                x += ln
                y += ln
            elif op in ("S", "I"):
                codes[y:y + ln] = rng.integers(0, 4, ln)
                y += ln
            elif op == "D":
                x += ln
        nerr = int(rng.binomial(l_qseq, 0.03))
        for _ in range(nerr):
            p = int(rng.integers(0, l_qseq))
            codes[p] = (codes[p] + 1) % 4
        qual = rng.integers(2, 42, l_qseq).astype(np.uint8)

        got = baq.baq_realign(pos0, cigar, codes, qual, fetch)
        assert got is not None, case

        # expected: replicate bam_md.c's window/band computation, run
        # the ORACLE HMM, apply the transliterated glue
        x, y = pos0, 0
        yb = ye = xb = xe = -1
        for op, ln in cigar:
            if op in ("M", "=", "X"):
                if yb < 0:
                    yb = y
                if xb < 0:
                    xb = x
                ye, xe = y + ln, x + ln
                x += ln
                y += ln
            elif op in ("S", "I"):
                y += ln
            elif op == "D":
                x += ln
        bw = 7
        if abs((xe - xb) - (ye - yb)) > bw:
            bw = abs((xe - xb) - (ye - yb)) + 3
        xb -= yb + bw // 2
        if xb < 0:
            xb = 0
        xe += l_qseq - ye + bw // 2
        if xe - xb - l_qseq > bw:
            sh = (xe - xb - l_qseq - bw) // 2
            xb += sh
            xe -= sh
        r = fetch(xb, xe)
        xe = xb + len(r)
        st_c, q_c, _ = refbaq.kpa_glocal(np.asarray(r, np.uint8), codes,
                                         qual, bw)
        want = _c_glue_extended(pos0, cigar, l_qseq, qual, xb, st_c, q_c)
        assert np.array_equal(got.astype(np.int64), want), (
            case, np.nonzero(got.astype(np.int64) != want)[0][:5])
