"""Differential test: batched device search vs the exact host engine."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from fastquick_tpu.align.engine import HostEngine
from fastquick_tpu.align.opts import GapOpt
from fastquick_tpu.align.seqs import Read, seq_reverse
from fastquick_tpu.index.builder import ContigInfo, ReducedIndex
from fastquick_tpu.index.fmindex import FMIndex
from fastquick_tpu.index.kmerfilter import KmerFilter
from fastquick_tpu.ops.batch_search import BatchEngine


def make_idx(n=20000, seed=0):
    rng = np.random.default_rng(seed)
    text = rng.integers(0, 4, n).astype(np.uint8)
    fm_f = FMIndex.build(text)
    fm_r = FMIndex.build(text[::-1].copy())
    contigs = [ContigInfo("1:1000@A/C", 0, n, "1", 1000, "A", "C", False)]
    kmer = KmerFilter([np.zeros(0, np.uint32)] * 6, thresh=0)
    return ReducedIndex(fm_fwd=fm_f, fm_rev=fm_r, text=text, contigs=contigs,
                        contig_offsets=np.array([0]), kmer=kmer, ambs=[])


def make_read(codes):
    p = Read()
    p.len = p.full_len = p.clip_len = len(codes)
    p.seq = seq_reverse(codes, False)
    p.rseq = seq_reverse(codes, True)
    p.qual = np.full(len(codes), 70, np.uint8)
    return p


def synth_reads(idx, n_reads, seed, read_len=100):
    rng = np.random.default_rng(seed)
    text = idx.text
    reads = []
    for r in range(n_reads):
        start = int(rng.integers(0, len(text) - read_len))
        codes = text[start:start + read_len].copy()
        kind = r % 6
        if kind == 1:  # 1-2 mismatches
            for _ in range(int(rng.integers(1, 3))):
                pos = int(rng.integers(0, read_len))
                codes[pos] = (codes[pos] + int(rng.integers(1, 4))) % 4
        elif kind == 2:  # reverse complement
            codes = (3 - codes)[::-1].copy()
        elif kind == 3:  # deletion of 1 ref base
            mid = read_len // 2
            codes = np.concatenate([
                text[start:start + mid],
                text[start + mid + 1:start + read_len + 1]]).copy()
        elif kind == 4:  # insertion of 1 base
            mid = read_len // 2
            ins = np.array([int(rng.integers(0, 4))], dtype=np.uint8)
            codes = np.concatenate([
                text[start:start + mid], ins,
                text[start + mid:start + read_len - 1]]).copy()
        elif kind == 5:  # random junk
            codes = rng.integers(0, 4, read_len).astype(np.uint8)
        reads.append(make_read(codes))
    return reads


def aln_key(a):
    return (a.n_mm, a.n_gapo, a.n_gape, a.a, a.k, a.l, a.score)


@pytest.mark.parametrize("seed", [0, 1])
def test_device_matches_host(seed):
    idx = make_idx(seed=seed)
    opt = GapOpt()
    reads_h = synth_reads(idx, 60, seed + 10)
    reads_d = synth_reads(idx, 60, seed + 10)
    HostEngine(idx).align_batch(reads_h, opt)
    eng = BatchEngine(idx, max_batch=64)
    eng.align_batch(reads_d, opt)
    # the device kernel must do the work itself, not the exact fallback
    assert eng.last_fallback <= 3, f"fallback rate {eng.last_fallback}/60"
    for i, (h, d) in enumerate(zip(reads_h, reads_d)):
        hk = [aln_key(a) for a in h.aln]
        dk = [aln_key(a) for a in d.aln]
        assert hk == dk, f"read {i}: host {hk} vs device {dk}"


def test_device_with_n_bases():
    idx = make_idx(seed=5)
    opt = GapOpt()
    codes = idx.text[500:600].copy()
    codes[50] = 4  # an N
    rh, rd = make_read(codes.copy()), make_read(codes.copy())
    HostEngine(idx).align_batch([rh], opt)
    BatchEngine(idx).align_batch([rd], opt)
    assert [aln_key(a) for a in rh.aln] == [aln_key(a) for a in rd.aln]


def test_device_short_and_long_mix():
    idx = make_idx(seed=6)
    opt = GapOpt()
    reads_h = []
    for ln in (36, 70, 151):
        start = 1000 + ln * 7
        reads_h.append(make_read(idx.text[start:start + ln].copy()))
    import copy

    reads_d = [make_read(p.forward_codes().copy()) for p in reads_h]
    HostEngine(idx).align_batch(reads_h, opt)
    BatchEngine(idx).align_batch(reads_d, opt)
    for h, d in zip(reads_h, reads_d):
        assert [aln_key(a) for a in h.aln] == [aln_key(a) for a in d.aln]
