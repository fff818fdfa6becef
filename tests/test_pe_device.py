"""Differentials: device PE machinery (ops/pe_device) vs the host oracle
(align/pe.py, itself diffed against the compiled reference bwape.c by
tests/test_ref_differential.py).

- hash_64 uint32-pair emulation vs the python u64 mirror
- histogram isize inference vs infer_isize (ints exact; avg/std <=1e-4)
- the pairing sweep vs pairing() on aligned read pairs over a world
  with repeats (multi-occurrence ends exercise the sorted sweep, the
  u64 key quirks and the mapQ rules)
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from fastquick_tpu.align import pe as hpe  # noqa: E402
from fastquick_tpu.align.core import Aln  # noqa: E402
from fastquick_tpu.align.opts import G_LOG_N, GapOpt, PeOpt  # noqa: E402
from fastquick_tpu.ops import pe_device as dpe  # noqa: E402


def test_hash64_matches_host():
    rng = np.random.default_rng(0)
    for _ in range(200):
        key = int(rng.integers(0, 2 ** 63)) * 2 + int(rng.integers(0, 2))
        hi, lo = dpe.hash_64_u32(jnp.uint32(key >> 32),
                                 jnp.uint32(key & 0xFFFFFFFF))
        got = (int(hi) << 32) | int(lo)
        assert got == hpe.hash_64(key), hex(key)


class _R:
    def __init__(self, pos, ln, mapq):
        self.pos, self.len, self.mapQ = pos, ln, mapq


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_isize_inference_matches_host(seed):
    rng = np.random.default_rng(seed)
    n = 400
    pairs = []
    pos0 = rng.integers(0, 10_000, n)
    isz = np.clip(rng.normal(300, 40, n).astype(int), 120, 3000)
    mq = rng.choice([0, 25, 37], size=(n, 2), p=[0.2, 0.2, 0.6])
    for i in range(n):
        pairs.append((_R(int(pos0[i]), 100, int(mq[i, 0])),
                      _R(int(pos0[i] + isz[i] - 100), 100,
                         int(mq[i, 1]))))
    ii = hpe.IsizeInfo()
    ap_prior = 1e-5
    l_pac = 2_000_000
    ret = hpe.infer_isize(pairs, ii, ap_prior, l_pac)

    hist, max_len = dpe.isize_hist_local(
        jnp.asarray([p[0].pos for p in pairs], jnp.int32),
        jnp.asarray([p[1].pos for p in pairs], jnp.int32),
        jnp.asarray([p[0].len for p in pairs], jnp.int32),
        jnp.asarray([p[1].len for p in pairs], jnp.int32),
        jnp.asarray([p[0].mapQ for p in pairs], jnp.int32),
        jnp.asarray([p[1].mapQ for p in pairs], jnp.int32),
        jnp.ones(n, bool))
    div = np.asarray(dpe.infer_isize_from_hist(hist, max_len, ap_prior,
                                               l_pac))
    assert (div[0] > 0) == (ret == 0)
    if ret == 0:
        assert int(div[3]) == ii.low
        assert int(div[4]) == ii.high
        assert abs(div[1] - ii.avg) < 1e-3 * max(ii.avg, 1)
        assert abs(div[2] - ii.std) < 1e-3 * max(ii.std, 1)
        assert abs(int(div[5]) - ii.high_bayesian) <= 1
        assert abs(div[6] - ii.ap_prior) < 1e-6


def _world(seed=0, n_bp=200_000):
    from fastquick_tpu.index.fmindex import FMIndex
    from fastquick_tpu.index.builder import ContigInfo, ReducedIndex
    from fastquick_tpu.index.kmerfilter import KmerFilter

    rng = np.random.default_rng(seed)
    text = rng.integers(0, 4, n_bp).astype(np.uint8)
    # plant a repeat so some reads have multiple occurrences
    text[50_000:52_000] = text[10_000:12_000]
    fm_f = FMIndex.build(text)
    fm_r = FMIndex.build(text[::-1].copy())
    contigs = [ContigInfo("1:1000@A/C", 0, n_bp, "1", 1000, "A", "C",
                          False)]
    kmer = KmerFilter([np.zeros(0, np.uint32)] * 6, thresh=0)
    return ReducedIndex(fm_fwd=fm_f, fm_rev=fm_r, text=text,
                        contigs=contigs,
                        contig_offsets=np.array([0]), kmer=kmer, ambs=[])


def _pack_rows(aln_list):
    rows = np.zeros((48, 3), np.int32)
    for i, a in enumerate(aln_list[:48]):
        rows[i, 0] = (a.n_mm | (a.n_gapo << 6) | (a.n_gape << 12)
                      | (a.a << 18) | (a.score << 19))
        rows[i, 1] = a.k
        rows[i, 2] = a.l
    return rows


@pytest.mark.parametrize("seed", [11, 12])
def test_pairing_sweep_matches_host(seed):
    from fastquick_tpu.align.engine import HostEngine
    from fastquick_tpu.align.core import bwa_aln2seq_core, bwa_approx_mapQ
    from fastquick_tpu.align.opts import bwa_cal_maxdiff
    from fastquick_tpu.align.rand import Rand48
    from fastquick_tpu.align.seqs import Read, seq_reverse
    from fastquick_tpu.ops.fm import DeviceFM

    idx = _world(seed)
    eng = HostEngine(idx)
    opt = GapOpt()
    popt = PeOpt()
    rng = np.random.default_rng(seed)
    n_pairs = 48
    reads = []
    for r in range(n_pairs):
        if r % 6 == 5:  # pairs inside the planted repeat
            s = int(rng.integers(10_100, 11_300))
        else:
            s = int(rng.integers(0, len(idx.text) - 600))
        isz = int(rng.integers(240, 420))
        for endj in (0, 1):
            codes = (idx.text[s:s + 100].copy() if endj == 0 else
                     (3 - idx.text[s + isz - 100:s + isz])[::-1].copy())
            nerr = rng.binomial(100, 0.01)
            for _ in range(nerr):
                pp = int(rng.integers(0, 100))
                codes[pp] = (codes[pp] + 1) % 4
            p = Read()
            p.len = p.full_len = p.clip_len = 100
            p.seq = seq_reverse(codes, False)
            p.rseq = seq_reverse(codes, True)
            p.qual = np.full(100, 70, np.uint8)
            reads.append(p)
    eng.align_batch(reads, opt)
    rngd = Rand48(11)
    fms = (idx.fm_fwd, idx.fm_rev)
    for p in reads:
        bwa_aln2seq_core(p.aln, p, True, 0, rngd)
        if p.type in (1, 2):  # UNIQUE/REPEAT
            p.pos = hpe.sa_pos(fms, p.strand, p.sa, p.len)
            p.seQ = p.mapQ = bwa_approx_mapQ(
                p, bwa_cal_maxdiff(p.len, thres=opt.fnr))

    b0, b1 = reads[0::2], reads[1::2]
    ii = hpe.IsizeInfo()
    hpe.infer_isize(list(zip(b0, b1)), ii, popt.ap_prior, idx.l_pac)
    assert ii.avg > 0  # the world must produce a valid estimate

    # ---- host oracle ----
    import copy

    host0 = [copy.copy(p) for p in b0]
    host1 = [copy.copy(p) for p in b1]
    for hp0, hp1 in zip(host0, host1):
        d_aln = [list(hp0.aln), list(hp1.aln)]
        if hp0.type in (1, 2) and hp1.type in (1, 2):
            arr = []
            for j, hp in ((0, hp0), (1, hp1)):
                for k, rrow in enumerate(d_aln[j]):
                    for row in range(rrow.k, rrow.l + 1):
                        x = hpe.sa_pos(fms, rrow.a, row, hp.len)
                        arr.append((x << 32) | (k << 1) | j)
            hpe.pairing([hp0, hp1], d_aln, arr, popt, opt.s_mm, ii)

    # ---- device sweep ----
    dev = DeviceFM.build(idx.fm_fwd, idx.fm_rev)
    P = n_pairs
    K = 32

    def se_state(batch):
        return dict(
            pos=jnp.asarray([p.pos for p in batch], jnp.int32),
            strand=jnp.asarray([p.strand for p in batch], jnp.int32),
            mapq=jnp.asarray([p.mapQ for p in batch], jnp.int32),
            seq_q=jnp.asarray([p.seQ for p in batch], jnp.int32),
            n_mm=jnp.asarray([p.n_mm for p in batch], jnp.int32),
            n_gapo=jnp.asarray([p.n_gapo for p in batch], jnp.int32),
            n_gape=jnp.asarray([p.n_gape for p in batch], jnp.int32),
            len=jnp.asarray([p.len for p in batch], jnp.int32))

    def packed(batch):
        return (jnp.asarray(np.stack([_pack_rows(p.aln) for p in batch])),
                jnp.asarray([len(p.aln) for p in batch], jnp.int32))

    alns0, na0 = packed(b0)
    alns1, na1 = packed(b1)
    occ0 = dpe.expand_occurrences(dev.sa, dev.n, na0, alns0,
                                  se_state(b0)["len"], K)
    occ1 = dpe.expand_occurrences(dev.sa, dev.n, na1, alns1,
                                  se_state(b1)["len"], K)
    pair_ok = jnp.asarray(
        [p0.type in (1, 2) and p1.type in (1, 2)
         and sum(a.l - a.k + 1 for a in p0.aln) <= K
         and sum(a.l - a.k + 1 for a in p1.aln) <= K
         for p0, p1 in zip(b0, b1)])
    ii_vec = jnp.asarray([1.0, ii.avg, ii.std, ii.low, ii.high,
                          ii.high_bayesian, ii.ap_prior], jnp.float32)
    out0, out1, cnt = dpe.pairing_sweep(
        occ0, occ1, alns0, alns1, se_state(b0), se_state(b1), pair_ok,
        ii_vec, opt.s_mm, popt.max_isize,
        jnp.asarray(np.array(G_LOG_N, np.int32)))

    mismatches = []
    for i in range(P):
        if not bool(pair_ok[i]):
            continue
        for j, (host, out) in enumerate(((host0, out0), (host1, out1))):
            hp = host[i]
            for fld, dv in (("pos", out["pos"]), ("strand", out["strand"]),
                            ("mapQ", out["mapq"]), ("seQ", out["seq_q"]),
                            ("n_mm", out["n_mm"]),
                            ("n_gapo", out["n_gapo"]),
                            ("n_gape", out["n_gape"])):
                if getattr(hp, fld) != int(dv[i]):
                    mismatches.append(
                        (i, j, fld, getattr(hp, fld), int(dv[i])))
    assert not mismatches, mismatches[:10]
