"""Alignment core tests: widths, inexact search, mapQ, positions."""

import numpy as np
import pytest

from fastquick_tpu.align.core import (
    GapStack,
    bwa_aln2seq_core,
    bwa_approx_mapQ,
    bwt_cal_width,
    bwt_match_gap,
)
from fastquick_tpu.align.opts import GapOpt, bwa_cal_maxdiff
from fastquick_tpu.align.rand import Rand48
from fastquick_tpu.align.seqs import Read, seq_reverse
from fastquick_tpu.index.fmindex import FMIndex


def make_index(n=3000, seed=0):
    rng = np.random.default_rng(seed)
    text = rng.integers(0, 4, n).astype(np.uint8)
    return text, FMIndex.build(text), FMIndex.build(text[::-1].copy())


def align_read(fms, read_codes, opt=None):
    opt = opt or GapOpt()
    import copy

    local = copy.copy(opt)
    L = len(read_codes)
    local.max_diff = bwa_cal_maxdiff(L, thres=opt.fnr)
    if local.max_diff < local.max_gapo:
        local.max_gapo = local.max_diff
    local.seed_len = opt.seed_len if opt.seed_len < L else 0x7FFFFFFF
    seq0 = read_codes[::-1].copy()
    seq1 = seq_reverse(read_codes, True)
    w = (np.zeros((L + 1, 2), dtype=np.int64), np.zeros((L + 1, 2), dtype=np.int64))
    bwt_cal_width(fms[0], L, seq0, w[0])
    bwt_cal_width(fms[1], L, seq1, w[1])
    seed_w = None
    if L > opt.seed_len:
        seed_w = (np.zeros((opt.seed_len + 1, 2), dtype=np.int64),
                  np.zeros((opt.seed_len + 1, 2), dtype=np.int64))
        bwt_cal_width(fms[0], opt.seed_len, seq0[L - opt.seed_len:], seed_w[0])
        bwt_cal_width(fms[1], opt.seed_len, seq1[L - opt.seed_len:], seed_w[1])
    stack = GapStack(local.max_diff, local.max_gapo, local.max_gape, local)
    return bwt_match_gap(fms, L, (seq0, seq1), w, seed_w, local, stack)


def hit_positions(fms, aln, read_len):
    """All (pos, strand, n_mm) from an aln list."""
    out = []
    for a in aln:
        for row in range(a.k, a.l + 1):
            if a.a:
                pos = int(fms[0].sa[row])
            else:
                pos = fms[1].n - (int(fms[1].sa[row]) + read_len)
            out.append((pos, a.a, a.n_mm))
    return out


def test_exact_read_found_forward():
    text, fm_f, fm_r = make_index()
    fms = (fm_f, fm_r)
    read = text[500:580].copy()
    aln = align_read(fms, read)
    hits = hit_positions(fms, aln, len(read))
    assert (500, 0, 0) in hits


def test_exact_read_found_reverse():
    text, fm_f, fm_r = make_index()
    fms = (fm_f, fm_r)
    # reverse-complement read: aligns on "reverse strand" (a=1)
    seg = text[700:780]
    rc = (3 - seg)[::-1].copy()
    aln = align_read(fms, rc)
    hits = hit_positions(fms, aln, len(rc))
    assert (700, 1, 0) in hits


def test_mismatched_read_found():
    text, fm_f, fm_r = make_index(seed=1)
    fms = (fm_f, fm_r)
    read = text[1000:1090].copy()
    read[30] = (read[30] + 1) % 4  # 1 mismatch
    read[60] = (read[60] + 2) % 4  # 2nd mismatch
    aln = align_read(fms, read)
    hits = hit_positions(fms, aln, len(read))
    assert any(pos == 1000 and strand == 0 and mm == 2
               for pos, strand, mm in hits)


def test_junk_read_not_found():
    text, fm_f, fm_r = make_index(seed=2)
    fms = (fm_f, fm_r)
    rng = np.random.default_rng(99)
    junk = rng.integers(0, 4, 90).astype(np.uint8)
    aln = align_read(fms, junk)
    # random 90-mer in 3kb text: overwhelmingly no hit within maxdiff
    hits = hit_positions(fms, aln, 90)
    for pos, strand, mm in hits:
        # verify any reported hit is genuine
        if strand == 0:
            seg = text[pos:pos + 90]
            assert np.count_nonzero(seg != junk) == mm
        else:
            seg = text[pos:pos + 90]
            assert np.count_nonzero(seg != (3 - junk)[::-1]) == mm


def test_deletion_read_found():
    text, fm_f, fm_r = make_index(seed=3)
    fms = (fm_f, fm_r)
    # read skips one reference base in the middle => one deletion (D)
    read = np.concatenate([text[1200:1250], text[1251:1291]]).copy()
    aln = align_read(fms, read)
    assert any(a.n_gapo == 1 for a in aln) or any(a.n_mm <= 2 for a in aln)
    gap_hits = [a for a in aln if a.n_gapo == 1]
    assert gap_hits, "deletion not found via gap open"


def test_aln2seq_and_mapq():
    text, fm_f, fm_r = make_index(seed=4)
    fms = (fm_f, fm_r)
    read = text[2000:2090].copy()
    aln = align_read(fms, read)
    r = Read()
    r.len = r.full_len = len(read)
    rng = Rand48(11)
    bwa_aln2seq_core(aln, r, True, 0, rng)
    assert r.type in (1, 2)
    assert r.c1 >= 1
    mq = bwa_approx_mapQ(r, bwa_cal_maxdiff(90))
    if r.c1 == 1 and r.c2 == 0:
        assert mq == 37


def test_width_lower_bounds():
    text, fm_f, fm_r = make_index(seed=5)
    fms = (fm_f, fm_r)
    read = text[100:180].copy()
    read[40] = (read[40] + 1) % 4
    seq0 = read[::-1].copy()
    w = np.zeros((81, 2), dtype=np.int64)
    bid = bwt_cal_width(fms[0], 80, seq0, w)
    # one mismatch: bid over the full read should be >= 1 only after restart
    assert w[80, 1] >= 1
