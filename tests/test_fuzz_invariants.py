"""Fuzz invariants across the aligner chain.

1. MD/CIGAR self-consistency: for every aligned read, the reference
   sequence reconstructed from our MD+CIGAR (the stats engine's
   RecoverRefseq path) must equal the actual reduced-reference text at
   the reported position.
2. Native engine vs oracle on repetitive / N-rich / tandem texts.
"""

import numpy as np
import pytest

from fastquick_tpu.align.engine import HostEngine
from fastquick_tpu.align.opts import GapOpt
from fastquick_tpu.index.builder import ContigInfo, ReducedIndex
from fastquick_tpu.index.fmindex import FMIndex
from fastquick_tpu.index.kmerfilter import KmerFilter
from tests.test_batch_engine import aln_key, make_read


def make_repetitive_idx(seed=0, n=12000):
    """Text with tandem repeats and homopolymer runs (stress case)."""
    rng = np.random.default_rng(seed)
    parts = []
    while sum(len(p) for p in parts) < n:
        kind = rng.integers(0, 4)
        if kind == 0:
            parts.append(rng.integers(0, 4, int(rng.integers(200, 800))))
        elif kind == 1:  # homopolymer
            parts.append(np.full(int(rng.integers(10, 40)),
                                 rng.integers(0, 4)))
        elif kind == 2:  # tandem repeat
            unit = rng.integers(0, 4, int(rng.integers(2, 8)))
            parts.append(np.tile(unit, int(rng.integers(5, 30))))
        else:  # duplicated segment
            if parts:
                parts.append(parts[-1][:200].copy())
    text = np.concatenate(parts)[:n].astype(np.uint8)
    fm_f = FMIndex.build(text)
    fm_r = FMIndex.build(text[::-1].copy())
    contigs = [ContigInfo("1:5000@A/C", 0, n, "1", 5000, "A", "C", False)]
    kmer = KmerFilter([np.zeros(0, np.uint32)] * 6, thresh=0)
    return ReducedIndex(fm_fwd=fm_f, fm_rev=fm_r, text=text, contigs=contigs,
                        contig_offsets=np.array([0]), kmer=kmer, ambs=[])


@pytest.mark.parametrize("seed", [0, 1])
def test_native_vs_oracle_on_repetitive_text(seed):
    from fastquick_tpu.align.engine import NativeEngine
    from fastquick_tpu.native import get_aligner_lib

    if get_aligner_lib() is None:
        pytest.skip("no native toolchain")
    idx = make_repetitive_idx(seed)
    rng = np.random.default_rng(seed + 7)
    opt = GapOpt()
    reads_h, reads_n = [], []
    for r in range(80):
        L = int(rng.integers(36, 151))
        start = int(rng.integers(0, idx.l_pac - L))
        codes = idx.text[start:start + L].copy()
        kind = r % 5
        if kind == 1:
            for _ in range(int(rng.integers(1, 4))):
                p = int(rng.integers(0, L))
                codes[p] = (codes[p] + 1) % 4
        elif kind == 2:
            codes = (3 - codes)[::-1].copy()
        elif kind == 3:
            codes[int(rng.integers(0, L))] = 4  # N
        elif kind == 4:
            mid = L // 2
            codes = np.concatenate([codes[:mid], codes[mid + 1:],
                                    idx.text[start + L:start + L + 1]]).copy()
        reads_h.append(make_read(codes.copy()))
        reads_n.append(make_read(codes.copy()))
    HostEngine(idx).align_batch(reads_h, opt)
    NativeEngine(idx).align_batch(reads_n, opt)
    for i, (h, n) in enumerate(zip(reads_h, reads_n)):
        assert ([aln_key(a) for a in h.aln] == [aln_key(a) for a in n.aln]), \
            f"read {i}"


def test_md_cigar_roundtrip_against_text():
    """Run the full per-batch pipeline on synthetic reads and check that
    RecoverRefseq(MD, CIGAR) == actual text at the position."""
    from fastquick_tpu.align.core import bwa_aln2seq_core, bwa_approx_mapQ
    from fastquick_tpu.align.engine import NativeEngine
    from fastquick_tpu.align.pe import sa_pos
    from fastquick_tpu.align.rand import Rand48
    from fastquick_tpu.align.refine import bwa_cal_md1
    from fastquick_tpu.native import get_aligner_lib
    from fastquick_tpu.stats.collector import recover_refseq_by_md_and_cigar
    from fastquick_tpu.align.opts import BWA_TYPE_UNIQUE, BWA_TYPE_REPEAT
    from tests.test_batch_engine import make_idx

    idx = make_idx(n=30000, seed=3)
    rng = np.random.default_rng(9)
    opt = GapOpt()
    engine = (NativeEngine(idx) if get_aligner_lib() is not None
              else HostEngine(idx))
    reads = []
    for r in range(200):
        L = 120
        start = int(rng.integers(0, idx.l_pac - L - 2))
        codes = idx.text[start:start + L].copy()
        k = r % 4
        if k == 1:
            for _ in range(2):
                p = int(rng.integers(0, L))
                codes[p] = (codes[p] + 1) % 4
        elif k == 2:
            codes = (3 - codes)[::-1].copy()
        elif k == 3:
            mid = L // 2  # deletion read
            codes = np.concatenate([codes[:mid],
                                    idx.text[start + mid + 1:start + L + 1]])
            codes = codes.copy()
        reads.append(make_read(codes))
    engine.align_batch(reads, opt)
    rand = Rand48(11)
    fms = (idx.fm_fwd, idx.fm_rev)
    checked = 0
    from fastquick_tpu.align.refine import refine_gapped_core
    for p in reads:
        bwa_aln2seq_core(p.aln, p, True, 0, rand)
        if p.type not in (BWA_TYPE_UNIQUE, BWA_TYPE_REPEAT):
            continue
        p.pos = sa_pos(fms, p.strand, p.sa, p.len)
        # refine if gapped (mirrors bwa_refine_gapped for the main hit)
        seq = p.rseq if p.strand else p.seq[: p.len][::-1]
        if p.n_gapo:
            p.cigar, p.pos = refine_gapped_core(
                idx.text, p.len, seq, p.pos,
                (1 if p.strand else -1) * (p.n_gapo + p.n_gape))
        md, nm = bwa_cal_md1(p.cigar, p.len, p.pos, seq, idx.text)
        seq_str = "".join("ACGTN"[c] for c in seq)
        ref_rec = recover_refseq_by_md_and_cigar(seq_str, md, p.cigar)
        # compare against the actual text
        ref_len = sum(ln for op, ln in (p.cigar or [(0, p.len)])
                      if op in (0, 2))
        want = "".join("ACGTN"[c]
                       for c in idx.text[p.pos: p.pos + ref_len])
        assert ref_rec == want, (p.pos, p.cigar, md, ref_rec, want)
        checked += 1
    assert checked > 120


def test_recover_refseq_explicit_cases():
    """Explicit MD/CIGAR reconstruction cases in the categories the
    reference's gtest covers (StatCollector RecoverRefseqByMDandCigar,
    test/alltests.cpp:116-148): matches, substitutions, deletions,
    insertions, soft clips, and combinations."""
    from fastquick_tpu.stats.collector import recover_refseq_by_md_and_cigar

    M, I, D, S = 0, 1, 2, 3
    cases = [
        ("ACGTACGT", "8", [(M, 8)], "ACGTACGT"),                # all match
        ("ACGTACGT", "3C4", [(M, 8)], "ACGCACGT"),              # SNP
        ("ACGTACGT", "0G3T3", [(M, 8)], "GCGTTCGT"),            # edge SNPs
        ("ACGTAACGT", "4^TT5", [(M, 4), (D, 2), (M, 5)],
         "ACGTTTAACGT"),                                        # deletion
        ("ACGTTACGT", "8", [(M, 4), (I, 1), (M, 4)],
         "ACGTACGT"),                                           # insertion
        ("AAACGTACGT", "8", [(S, 2), (M, 8)], "ACGTACGT"),      # soft clip
        ("ACGTACGTAA", "8", [(M, 8), (S, 2)], "ACGTACGT"),      # 3' clip
        ("ACGTAACCGT", "4^TTT1C2", [(M, 4), (D, 3), (M, 2),
                                    (I, 2), (M, 2)],
         "ACGTTTTACGT"),                        # del + SNP + ins combo
    ]
    for seq, md, cig, want in cases:
        got = recover_refseq_by_md_and_cigar(seq, md, cig)
        assert got == want, (seq, md, cig, got, want)
