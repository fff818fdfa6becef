"""Differential tests vs the COMPILED reference libbwa.

Round-1 goldens were generated from this repo's own oracle; these tests
close that hole by compiling the reference's actual C
(libbwa/bwtgap.c, bwase.c, bwape.c, stdaln.c -- unmodified, from
/root/reference) into a shared library at test time and diffing the
rebuilt engines read-by-read against it:

- FM construction: primary/SA/occ vs bwt_cal_sa/bwt_occ
- bwt_cal_width widths/bids
- bwt_match_gap hit lists (n_mm, n_gapo, n_gape, strand, k, l, score)
  for the host oracle, the native C++ engine and the batched device
  engine, over mutated/indel/junk/N read mixes
- bwa_aln2seq_core + bwa_approx_mapQ (drand48 sampling stream parity)
- stdaln aln_global_core score + CIGAR vs align/dp.py
- infer_isize vs align/pe.py
"""

import numpy as np
import pytest

from fastquick_tpu.align.opts import GapOpt, bwa_cal_maxdiff
from fastquick_tpu.align.seqs import Read, seq_reverse
from fastquick_tpu.index.builder import ContigInfo, ReducedIndex
from fastquick_tpu.index.fmindex import FMIndex
from fastquick_tpu.index.kmerfilter import KmerFilter
from fastquick_tpu.testing import refbwa

pytestmark = pytest.mark.skipif(not refbwa.available(),
                                reason="reference libbwa not present")


def _lib_or_skip():
    try:
        return refbwa.get_lib()
    except RuntimeError as e:
        pytest.skip(str(e))


@pytest.fixture(scope="module")
def world():
    _lib_or_skip()
    rng = np.random.default_rng(42)
    text = rng.integers(0, 4, 30000).astype(np.uint8)
    rb = refbwa.RefBwa(text)
    fm_f = FMIndex.build(text)
    fm_r = FMIndex.build(text[::-1].copy())
    contigs = [ContigInfo("1:1000@A/C", 0, len(text), "1", 1000, "A", "C",
                          False)]
    idx = ReducedIndex(fm_fwd=fm_f, fm_rev=fm_r, text=text, contigs=contigs,
                       contig_offsets=np.array([0]),
                       kmer=KmerFilter([np.zeros(0, np.uint32)] * 6,
                                       thresh=0),
                       ambs=[])
    return text, rb, idx


def synth_reads(text, n_reads, seed, read_len=100):
    """Read mix: clean / 1-3 mismatches / revcomp / 1-3bp del / ins /
    junk / N-containing."""
    rng = np.random.default_rng(seed)
    out = []
    for r in range(n_reads):
        start = int(rng.integers(0, len(text) - read_len - 4))
        codes = text[start:start + read_len].copy()
        kind = r % 8
        if kind in (1, 6):
            for _ in range(int(rng.integers(1, 4))):
                pos = int(rng.integers(0, read_len))
                codes[pos] = (codes[pos] + int(rng.integers(1, 4))) % 4
        if kind == 2:
            codes = (3 - codes)[::-1].copy()
        elif kind == 3:
            mid = int(rng.integers(20, read_len - 20))
            d = int(rng.integers(1, 4))
            codes = np.concatenate([
                text[start:start + mid],
                text[start + mid + d:start + read_len + d]]).copy()
        elif kind == 4:
            mid = int(rng.integers(20, read_len - 20))
            ins = rng.integers(0, 4, int(rng.integers(1, 3))).astype(np.uint8)
            codes = np.concatenate([
                text[start:start + mid], ins,
                text[start + mid:start + read_len - len(ins)]]).copy()
        elif kind == 5:
            codes = rng.integers(0, 4, read_len).astype(np.uint8)
        elif kind == 7:
            codes[int(rng.integers(0, read_len))] = 4  # N
        out.append(codes)
    return out


def make_read(codes):
    p = Read()
    p.len = p.full_len = p.clip_len = len(codes)
    p.seq = seq_reverse(codes, False)
    p.rseq = seq_reverse(codes, True)
    p.qual = np.full(len(codes), 70, np.uint8)
    return p


def ref_hits(rb, codes, opt):
    md = bwa_cal_maxdiff(len(codes), thres=opt.fnr)
    p = make_read(codes)
    rows = rb.match_gap(p.seq[: p.len], p.rseq[: p.len], opt, md)
    return [tuple(int(x) for x in row) for row in rows]


def my_hits(read):
    return [(a.n_mm, a.n_gapo, a.n_gape, a.a, a.k, a.l, a.score)
            for a in read.aln]


def test_fm_construction_matches(world):
    text, rb, idx = world
    fm = idx.fm_fwd
    assert rb.primary(0) == fm.primary
    assert rb.primary(1) == idx.fm_rev.primary
    rng = np.random.default_rng(1)
    for row in rng.integers(1, len(text), 50):
        assert rb.sa(0, int(row)) == int(fm.sa[row])
        assert rb.sa(1, int(row)) == int(idx.fm_rev.sa[row])
    # bwt_occ(k) counts rows [0..k] closed; occ_at(c, k) counts [0, k)
    for k in rng.integers(0, len(text), 50):
        for c in range(4):
            assert rb.occ(0, int(k), c) == fm.occ_at(c, int(k) + 1), (k, c)


def test_cal_width_matches(world):
    text, rb, idx = world
    from fastquick_tpu.align.core import bwt_cal_width

    for codes in synth_reads(text, 16, seed=2):
        p = make_read(codes)
        for which, fm in ((0, idx.fm_fwd), (1, idx.fm_rev)):
            seq = (p.seq if which == 0 else p.rseq)[: p.len]
            w_ref, bid_ref = rb.cal_width(which, seq)
            w = np.zeros((p.len + 1, 2), dtype=np.int64)
            bwt_cal_width(fm, p.len, seq, w)
            assert np.array_equal(w[:, 0], w_ref), which
            assert np.array_equal(w[:, 1], bid_ref), which


@pytest.mark.parametrize("seed", [10, 11])
def test_match_gap_host_oracle_vs_reference(world, seed):
    text, rb, idx = world
    from fastquick_tpu.align.engine import HostEngine

    opt = GapOpt()
    all_codes = synth_reads(text, 48, seed=seed)
    reads = [make_read(c) for c in all_codes]
    HostEngine(idx).align_batch(reads, opt)
    for i, (codes, p) in enumerate(zip(all_codes, reads)):
        expect = ref_hits(rb, codes, opt)
        got = my_hits(p)
        assert got == expect, f"read {i} (kind {i % 8})"


def test_match_gap_native_engine_vs_reference(world):
    text, rb, idx = world
    pytest.importorskip("ctypes")
    from fastquick_tpu.align.engine import NativeEngine

    try:
        eng = NativeEngine(idx)
    except RuntimeError:
        pytest.skip("native engine unavailable")
    opt = GapOpt()
    all_codes = synth_reads(text, 64, seed=20)
    reads = [make_read(c) for c in all_codes]
    eng.align_batch(reads, opt)
    for i, (codes, p) in enumerate(zip(all_codes, reads)):
        assert my_hits(p) == ref_hits(rb, codes, opt), f"read {i}"


def test_match_gap_device_engine_vs_reference(world):
    text, rb, idx = world
    pytest.importorskip("jax")
    from fastquick_tpu.ops.batch_search import BatchEngine

    opt = GapOpt()
    all_codes = synth_reads(text, 32, seed=30)
    reads = [make_read(c) for c in all_codes]
    BatchEngine(idx, max_batch=32).align_batch(reads, opt)
    for i, (codes, p) in enumerate(zip(all_codes, reads)):
        assert my_hits(p) == ref_hits(rb, codes, opt), f"read {i}"


def test_short_reads_and_seeded_long_reads(world):
    text, rb, idx = world
    from fastquick_tpu.align.engine import HostEngine

    opt = GapOpt()
    rng = np.random.default_rng(7)
    all_codes = []
    for ln in (36, 40, 64, 151, 151, 200):
        start = int(rng.integers(0, len(text) - ln))
        codes = text[start:start + ln].copy()
        for _ in range(int(rng.integers(0, 4))):
            pos = int(rng.integers(0, ln))
            codes[pos] = (codes[pos] + 1) % 4
        all_codes.append(codes)
    reads = [make_read(c) for c in all_codes]
    HostEngine(idx).align_batch(reads, opt)
    for i, (codes, p) in enumerate(zip(all_codes, reads)):
        assert my_hits(p) == ref_hits(rb, codes, opt), f"len {len(codes)}"


def test_aln2seq_mapq_drand48_parity(world):
    """bwa_aln2seq_core + bwa_approx_mapQ vs align/core.py's
    aln2seq (same drand48 stream)."""
    text, rb, idx = world
    from fastquick_tpu.align import core as acore
    from fastquick_tpu.align.engine import HostEngine
    from fastquick_tpu.align.rand import Rand48

    opt = GapOpt()
    all_codes = synth_reads(text, 40, seed=40)
    reads = [make_read(c) for c in all_codes]
    HostEngine(idx).align_batch(reads, opt)
    for i, p in enumerate(reads):
        if not p.aln:
            continue
        rows = np.array([[a.n_mm, a.n_gapo, a.n_gape, a.a, a.k, a.l,
                          a.score] for a in p.aln], dtype=np.int32)
        seed = 1000 + i
        md = bwa_cal_maxdiff(p.len, thres=opt.fnr)
        main, multi = rb.aln2seq(rows, seed, 1, 5, p.len, md)
        rnd = Rand48()
        rnd.srand48(seed)
        acore.bwa_aln2seq_core(p.aln, p, True, 5, rnd)
        mq = acore.bwa_approx_mapQ(p, md)
        got = (p.type, p.c1, p.c2, p.n_mm, p.n_gapo, p.n_gape, p.sa,
               p.strand, mq)
        assert got == tuple(int(x) for x in main), f"read {i}"
        got_multi = [(m.pos, m.strand, m.gap, m.mm) for m in p.multi]
        exp_multi = [tuple(int(x) for x in row[:4]) for row in multi]
        assert got_multi == exp_multi, f"read {i} multi"


def test_aln_global_vs_reference(world):
    """stdaln aln_global_core vs align/dp.py banded global DP."""
    text, rb, idx = world
    from fastquick_tpu.align.dp import aln_global_core, aln_path2cigar

    rng = np.random.default_rng(8)
    for trial in range(12):
        ln = int(rng.integers(30, 120))
        start = int(rng.integers(0, len(text) - ln - 10))
        ref = text[start:start + ln + int(rng.integers(0, 6))].copy()
        read = text[start:start + ln].copy()
        nmut = int(rng.integers(0, 4))
        for _ in range(nmut):
            pos = int(rng.integers(0, ln))
            read[pos] = (read[pos] + int(rng.integers(1, 4))) % 4
        band = 10
        score_ref, cigar_ref = refbwa.aln_global(ref, read, band)
        score, path = aln_global_core(ref, read, band)
        cigar = aln_path2cigar(path)
        assert score == score_ref, f"trial {trial}"
        assert cigar == cigar_ref, f"trial {trial}"


def test_infer_isize_vs_reference(world):
    text, rb, idx = world
    from fastquick_tpu.align.pe import IsizeInfo, infer_isize as my_infer
    from fastquick_tpu.align.seqs import Read

    rng = np.random.default_rng(9)
    n = 600
    L = len(text)
    pos0 = rng.integers(0, L - 600, n).astype(np.int64)
    gaps = rng.normal(300, 30, n).astype(np.int64)
    pairs = dict(
        pos0=pos0, pos1=pos0 + gaps - 100,
        strand0=np.zeros(n, np.int32), strand1=np.ones(n, np.int32),
        len0=np.full(n, 100, np.int32), len1=np.full(n, 100, np.int32),
        mapq0=np.full(n, 40, np.int32), mapq1=np.full(n, 40, np.int32),
        type0=np.ones(n, np.int32), type1=np.ones(n, np.int32))
    ret, avg, std, low, high, high_b, ap = refbwa.infer_isize(
        pairs, 1e-5, L)

    my_pairs = []
    for i in range(n):
        ends = []
        for j in range(2):
            p = Read()
            p.pos = int(pairs[f"pos{j}"][i])
            p.strand = int(pairs[f"strand{j}"][i])
            p.len = p.full_len = p.clip_len = 100
            p.mapQ = 40
            p.type = 1
            ends.append(p)
        my_pairs.append(tuple(ends))
    ii = IsizeInfo()
    my_ret = my_infer(my_pairs, ii, 1e-5, L)
    assert my_ret == ret
    assert abs(ii.avg - avg) < 1e-9
    assert abs(ii.std - std) < 1e-9
    assert (ii.low, ii.high) == (int(low), int(high))
    assert ii.high_bayesian == int(high_b)
    assert abs(ii.ap_prior - ap) < 1e-12


def test_pairing_vs_reference(world):
    """pairing() (bwape.c:119-215) vs align/pe.py over randomized
    multi-hit pair scenarios (pair mapQ rules, end-moved cases,
    sub-optimal counting)."""
    text, rb, idx = world
    from fastquick_tpu.align.core import Aln
    from fastquick_tpu.align.opts import PeOpt
    from fastquick_tpu.align.pe import IsizeInfo, pairing as my_pairing
    from fastquick_tpu.align.seqs import Read

    rng = np.random.default_rng(55)
    for trial in range(60):
        n0 = int(rng.integers(1, 5))
        n1 = int(rng.integers(1, 5))
        alns = []
        for n in (n0, n1):
            rows = []
            for _ in range(n):
                mm = int(rng.integers(0, 3))
                rows.append([mm, 0, 0, int(rng.integers(0, 2)), 0, 0,
                             mm * 3])
            alns.append(rows)
        arr = []
        for e, n in ((0, n0), (1, n1)):
            for i in range(n):
                pos = int(rng.integers(0, 25000))
                arr.append((pos << 32) | (i << 1) | e)
        arr = np.array(sorted(arr), dtype=np.uint64)

        have_ii = trial % 2 == 0
        ii6 = np.array([300.0, 30.0, 150, 450, 460, 1e-5]
                       if have_ii else [-1.0, -1.0, 0, 0, 0, 1e-5])
        pf = np.zeros((2, 10), dtype=np.int64)
        for e in range(2):
            pf[e, 0] = int(rng.integers(0, 25000))    # pos
            pf[e, 1] = int(rng.integers(0, 2))        # strand
            pf[e, 2] = int(rng.integers(0, 50))       # mapQ
            pf[e, 3] = pf[e, 2]                       # seQ
            pf[e, 9] = 100                            # full_len

        cnt_ref, pf_ref = refbwa.pairing(
            np.array(alns[0], np.int32), np.array(alns[1], np.int32),
            arr, pf, 3, 500, ii6)

        p = []
        for e in range(2):
            q = Read()
            q.pos = int(pf[e, 0])
            q.strand = int(pf[e, 1])
            q.mapQ = int(pf[e, 2])
            q.seQ = int(pf[e, 3])
            q.extra_flag = 0
            q.n_mm = q.n_gapo = q.n_gape = q.score = 0
            q.len = q.full_len = q.clip_len = 100
            p.append(q)
        my_alns = [[Aln(*r) for r in rows] for rows in alns]
        ii = IsizeInfo(avg=ii6[0], std=ii6[1], low=int(ii6[2]),
                       high=int(ii6[3]), high_bayesian=int(ii6[4]),
                       ap_prior=ii6[5])
        cnt = my_pairing(p, my_alns, [int(x) for x in arr], PeOpt(), 3, ii)
        assert cnt == cnt_ref, f"trial {trial}"
        for e in range(2):
            got = (p[e].pos, p[e].strand, p[e].mapQ, p[e].seQ,
                   p[e].extra_flag, p[e].n_mm, p[e].n_gapo, p[e].n_gape,
                   p[e].score)
            exp = tuple(int(x) for x in pf_ref[e, :9])
            assert got == exp, f"trial {trial} end {e}: {got} vs {exp}"


@pytest.mark.slow
def test_match_gap_fuzz_10k(world):
    """VERDICT item 3: 10k+ random reads through the native engine and
    the compiled reference, hit-list-identical."""
    import os

    text, rb, idx = world
    from fastquick_tpu.align.engine import HostEngine, NativeEngine

    n = int(os.environ.get("FQ_FUZZ_READS", 10000))
    opt = GapOpt()
    all_codes = synth_reads(text, n, seed=99, read_len=76)
    reads = [make_read(c) for c in all_codes]
    try:
        eng = NativeEngine(idx)
    except RuntimeError:
        eng = HostEngine(idx)
    eng.align_batch(reads, opt)
    md = bwa_cal_maxdiff(76, thres=opt.fnr)
    n_hits = 0
    for i, (codes, p) in enumerate(zip(all_codes, reads)):
        rows = rb.match_gap(p.seq[: p.len], p.rseq[: p.len], opt, md)
        expect = [tuple(int(x) for x in row) for row in rows]
        got = my_hits(p)
        assert got == expect, f"read {i} (kind {i % 8})"
        n_hits += len(got)
    assert n_hits > n // 2  # sanity: the mix actually aligns


def test_aln_local_matches_reference(world):
    """aln_local_core (the mate-rescue local SW incl. the freeze-F
    quirk, stdaln.c:529-745) bit-matches the compiled reference: score
    and path endpoints on embedded/noisy/junk windows.  This is the
    oracle the Pallas SW kernel (ops/sw_pallas) is pinned to."""
    from fastquick_tpu.align.dp import aln_local_core

    rng = np.random.default_rng(12)
    for t in range(120):
        RL = int(rng.integers(40, 700))
        QL = int(rng.integers(20, 152))
        ref = rng.integers(0, 4, RL).astype(np.uint8)
        q = ref[int(rng.integers(0, max(1, RL - QL))):][:QL].copy()
        for _ in range(rng.binomial(QL, 0.08)):
            p = int(rng.integers(0, len(q)))
            q[p] = (q[p] + rng.integers(1, 4)) % 4
        if rng.random() < 0.2:
            q = rng.integers(0, 5, QL).astype(np.uint8)
        score_c, (b1, e1, b2, e2) = refbwa.aln_local(ref, q, 50)
        score_p, path, _ = aln_local_core(ref, q, thres=1)
        pc = ((path[-1][1], path[0][1], path[-1][2], path[0][2])
              if path else (0, 0, 0, 0))
        assert score_c == score_p, f"trial {t}: {score_c} vs {score_p}"
        assert (b1, e1, b2, e2) == pc, f"trial {t}: {(b1, e1, b2, e2)} vs {pc}"


def test_se_sam_fields_vs_reference(world):
    """VERDICT r03 #8: per-read SAM fields (flag/pos/mapQ/CIGAR/NM/MD/
    X0/X1/XM/XO/XG/XT/XA) vs the ACTUAL compiled reference driving its
    own bwa_aln2seq_core -> bwa_cal_pac_pos -> bwa_refine_gapped ->
    bwa_print_sam1 chain (libbwa/bwase.c:19-581) over a randomized
    batch, sharing one srand48(11) stream across the batch exactly as
    BwtMapper seeds per mapper."""
    text, rb, idx = world
    from fastquick_tpu.align.core import (
        BWA_TYPE_NO_MATCH,
        BWA_TYPE_REPEAT,
        BWA_TYPE_UNIQUE,
        bwa_aln2seq_core,
        bwa_approx_mapQ,
    )
    from fastquick_tpu.align.engine import HostEngine
    from fastquick_tpu.align.pe import sa_pos
    from fastquick_tpu.align.rand import Rand48
    from fastquick_tpu.align.refine import (
        bwa_cal_md1_batch,
        bwa_correct_trimmed,
        cigar_string,
        refine_gapped_core,
    )

    opt = GapOpt()
    n = 96
    seed = 11
    all_codes = synth_reads(text, n, seed=31)
    reads = [make_read(c) for c in all_codes]
    HostEngine(idx).align_batch(reads, opt)

    # ---- reference side: pack the batch for the shim ----
    stride = max(p.len for p in reads)
    s0 = np.zeros((n, stride), np.uint8)
    s1 = np.zeros((n, stride), np.uint8)
    qs = np.full((n, stride), 70, np.uint8)  # 'F'
    lens = np.array([p.len for p in reads], np.int32)
    mds = np.array([bwa_cal_maxdiff(p.len, thres=opt.fnr) for p in reads],
                   np.int32)
    aln_list = []
    for i, p in enumerate(reads):
        s0[i, :p.len] = p.seq[:p.len]
        s1[i, :p.len] = p.rseq[:p.len]
        aln_list.append(np.array(
            [(a.n_mm, a.n_gapo, a.n_gape, a.a, a.k, a.l, a.score)
             for a in p.aln], np.int32).reshape(-1, 7))
    c_lines = rb.se_sam(seed, s0, s1, qs, lens, mds, aln_list,
                        n_multi=3, mode=opt.mode, max_top2=opt.max_top2)
    assert len(c_lines) == n

    # ---- our side: the SE driver chain on the same batch ----
    rng = Rand48(seed)
    fms = (idx.fm_fwd, idx.fm_rev)
    for p in reads:
        bwa_aln2seq_core(p.aln, p, True, 3, rng)
    for p in reads:
        if p.type in (BWA_TYPE_UNIQUE, BWA_TYPE_REPEAT):
            md = bwa_cal_maxdiff(p.len, thres=opt.fnr)
            p.pos = sa_pos(fms, p.strand, p.sa, p.len)
            p.seQ = p.mapQ = bwa_approx_mapQ(p, md)
            for q in p.multi:
                q.pos = sa_pos(fms, q.strand, q.pos, p.len)
    # bwa_refine_gapped (driver._refine_gapped flow)
    for s in reads:
        s.seq = np.concatenate([s.seq[: s.len][::-1], s.seq[s.len:]])
        for q in s.multi:
            if q.gap == 0:
                continue
            seq = s.rseq if q.strand else s.seq
            ext = (1 if q.strand else -1) * q.gap
            q.cigar, q.pos = refine_gapped_core(text, s.len, seq, q.pos,
                                                ext)
        if s.type != BWA_TYPE_NO_MATCH and s.n_gapo > 0:
            seq = s.rseq if s.strand else s.seq
            ext = (1 if s.strand else -1) * (s.n_gapo + s.n_gape)
            s.cigar, s.pos = refine_gapped_core(text, s.len, seq, s.pos,
                                                ext)
    bwa_cal_md1_batch(
        [(s, s.rseq if s.strand else s.seq) for s in reads
         if s.type != BWA_TYPE_NO_MATCH], text)
    for s in reads:
        bwa_correct_trimmed(s)

    # ---- field-by-field diff ----
    for i, (line, p) in enumerate(zip(c_lines, reads)):
        cols = line.split("\t")
        tags = dict(t.split(":", 2)[::2] for t in cols[11:])
        assert cols[0] == f"r{i}"
        if p.type == BWA_TYPE_NO_MATCH:
            assert int(cols[1]) == 4, f"read {i}: {line}"
            assert cols[3] == "0" and cols[5] == "*"
            continue
        flag = 16 if p.strand else 0
        assert int(cols[1]) == flag, f"read {i} flag: {line}"
        assert int(cols[3]) == p.pos + 1, f"read {i} pos: {line}"
        assert int(cols[4]) == p.mapQ, f"read {i} mapQ: {line}"
        assert cols[5] == cigar_string(p.cigar, p.len), \
            f"read {i} cigar: {line}"
        assert int(tags["NM"]) == p.nm, f"read {i} NM: {line}"
        assert tags["MD"] == p.md, f"read {i} MD: {line}"
        assert tags["XT"] == "NURM"[p.type], f"read {i} XT: {line}"
        assert int(tags["X0"]) == p.c1, f"read {i} X0: {line}"
        if p.c1 <= opt.max_top2:
            assert int(tags["X1"]) == p.c2, f"read {i} X1: {line}"
        assert int(tags["XM"]) == p.n_mm and int(tags["XO"]) == p.n_gapo
        assert int(tags["XG"]) == p.n_gapo + p.n_gape
        if p.multi:
            xa = "".join(
                f"1:1000@A/C,{'-' if q.strand else '+'}{q.pos + 1},"
                f"{cigar_string(q.cigar, p.len)},{q.gap + q.mm};"
                for q in p.multi)
            xa = xa.replace("1:1000@A/C", "ref")
            assert tags.get("XA") == xa, f"read {i} XA: {line}"
        else:
            assert "XA" not in tags, f"read {i}: {line}"
