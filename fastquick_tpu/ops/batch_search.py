"""Batched inexact FM search: bwt_match_gap as a lockstep TPU state machine.

The reference's best-first search (libbwa/bwtgap.c:104-264) is a per-read
priority loop: pop the lowest-score entry (LIFO within equal score),
expand up to 9 children (gap open/extend, deletions, mismatches / exact),
record SA-interval hits with top2 cutoffs.  This module runs the SAME
discipline for a whole batch of reads in lockstep under jit:

- Entry pools are organized exactly like the C stacks: per-read
  per-score-bucket slot arrays (B, NB, NS) so pop order and the
  slot-persistence of last_diff_pos match the reference semantics.
- The bwt_match_exact_alt inner walk (libbwa/bwt.c) is unrolled into
  same-bucket "chain" entries: a chain entry performs one exact step per
  pop, and because its score equals the stack minimum and the discipline
  is LIFO, it is popped immediately next -- the pop sequence is
  order-identical to the C inner loop.
- Forward/reverse indexes are stacked so the per-entry strand bit selects
  the index by gather (see ops/fm.py).

Reads that overflow the fixed pools (NS slots/bucket, A_MAX hits) or the
iteration cap fall back to the exact host engine, so results are always
exact; the pools only bound the fast path.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..align.core import Aln
from ..align.engine import HostEngine
from ..align.opts import BWA_MODE_GAPE, GapOpt, bwa_cal_maxdiff
from ..index.builder import ReducedIndex
from .fm import DeviceFM, cal_width, occ4

STATE_M, STATE_I, STATE_D, STATE_CHAIN = 0, 1, 2, 3

# pool geometry
NS = 24  # slots per score bucket
A_MAX = 48  # max recorded hits per read
F_K, F_L, F_INFO, F_MM, F_GO, F_GE, F_ST, F_LDP = range(8)


@dataclass
class SearchResult:
    n_aln: np.ndarray  # (B,)
    alns: np.ndarray  # (B, A_MAX, 7): n_mm,n_gapo,n_gape,a,k,l,score
    fallback: np.ndarray  # (B,) bool -- rerun these on the host engine


@functools.partial(
    jax.jit,
    static_argnames=("nb", "max_iters", "s_mm", "s_gapo", "s_gape",
                     "max_gapo", "max_gape", "indel_end_skip", "max_del_occ",
                     "max_entries", "max_top2", "seed_len", "max_seed_diff",
                     "n_text"))
def _search_kernel(words, occ_ckpt, sa, L2, primary,
                   seqs, lens, max_diff0, w0, seed_w0, use_seed,
                   nb, max_iters, s_mm, s_gapo, s_gape, max_gapo, max_gape,
                   indel_end_skip, max_del_occ, max_entries, max_top2,
                   seed_len, max_seed_diff, n_text):
    """seqs: (B, 2, L) int32; lens: (B,); max_diff0: (B,);
    w0: (B, 2, L+1, 2); seed_w0: (B, 2, seed_len+1, 2); use_seed: (B,)."""
    fm = DeviceFM(words=words, occ=occ_ckpt, sa=sa, L2=L2, primary=primary,
                  n=n_text)
    B, _, L = seqs.shape
    binds = jnp.arange(B)

    pool0 = jnp.zeros((B, nb * NS, 8), dtype=jnp.int32)
    counts0 = jnp.zeros((B, nb), dtype=jnp.int32)
    # initial pushes: a=0 then a=1, both bucket 0 (score 0)
    e0 = jnp.stack([jnp.zeros(B, jnp.int32), jnp.full(B, n_text, jnp.int32),
                    lens, jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32),
                    jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32),
                    jnp.zeros(B, jnp.int32)], axis=1)
    e1 = e0.at[:, F_INFO].set((1 << 20) | lens)
    pool0 = pool0.at[:, 0, :].set(e0).at[:, 1, :].set(e1)
    counts0 = counts0.at[:, 0].set(2)

    n_n = ((seqs[:, 0, :] > 3)
           & (jnp.arange(L)[None, :] < lens[:, None])).sum(axis=1)
    too_many_n = n_n > max_diff0

    init = dict(
        pool=pool0, counts=counts0, n_entries=jnp.full(B, 2, jnp.int32),
        w=w0, seed_w=seed_w0,
        best_score=(max_diff0 + 1) * s_mm + (max_gapo + 1) * s_gapo
        + (max_gape + 1) * s_gape,
        max_diff=max_diff0, best_cnt=jnp.zeros(B, jnp.int32),
        n_aln=jnp.zeros(B, jnp.int32),
        alns=jnp.zeros((B, A_MAX, 7), jnp.int32),
        done=too_many_n, overflow=jnp.zeros(B, bool),
        it=jnp.int32(0))

    def cond(st):
        return (st["it"] < max_iters) & jnp.any(~st["done"])

    def body(st):
        pool, counts = st["pool"], st["counts"]
        w, seed_w = st["w"], st["seed_w"]
        n_entries = st["n_entries"]
        done = st["done"]

        active = ~done & (n_entries > 0)
        done = done | (~done & (n_entries == 0))
        # max_entries break (checked before pop, bwtgap.c:139)
        hit_cap = active & (n_entries > max_entries)
        done = done | hit_cap
        active = active & ~hit_cap

        bucket = jnp.min(
            jnp.where(counts > 0, jnp.arange(nb)[None, :], nb + 1), axis=1)
        bucket = jnp.clip(bucket, 0, nb - 1)
        slot = jnp.clip(counts[binds, bucket] - 1, 0, NS - 1)
        flat = bucket * NS + slot
        e = pool[binds, flat]  # (B, 8)
        counts = counts.at[binds, bucket].add(
            jnp.where(active, -1, 0))
        n_entries = n_entries - active.astype(jnp.int32)

        e_score = bucket
        k, l = e[:, F_K], e[:, F_L]
        info = e[:, F_INFO]
        a = (info >> 20) & 1
        i = info & 0xFFFF
        n_mm, n_gapo, n_gape = e[:, F_MM], e[:, F_GO], e[:, F_GE]
        state, ldp = e[:, F_ST], e[:, F_LDP]
        is_chain = state == STATE_CHAIN

        # stop: e_score > best_score + s_mm (bwtgap.c:143)
        stop = active & (e_score > st["best_score"] + s_mm)
        done = done | stop
        active = active & ~stop

        max_diff = st["max_diff"]
        m = max_diff - (n_mm + n_gapo) - n_gape  # GAPE mode
        alive = active & (m >= 0)

        # width prune (skip for chain entries: the C exact walk has none)
        w_im1 = w[binds, a, jnp.clip(i - 1, 0, L)]  # (B, 2)
        alive = alive & ~(~is_chain & (i > 0) & (m < w_im1[:, 1]))

        sel = 1 - a  # search index

        # ---- chain stepping (bwt_match_exact_alt unroll) ----
        cond_state = (state == STATE_M) | True  # GAPE mode always allows
        start_chain = alive & ~is_chain & (i > 0) & (m == 0) & cond_state
        chain_step = start_chain | (alive & is_chain)
        ci = jnp.clip(i - 1, 0, L - 1)
        cc = jnp.take_along_axis(
            seqs[binds, a], ci[:, None], axis=1)[:, 0]
        chain_bad = chain_step & (cc > 3)
        cc4 = occ4(fm, sel, k - 1)
        cl4 = occ4(fm, sel, l)
        ccl = jnp.clip(cc, 0, 3)
        L2c = L2[sel, ccl]
        ck = L2c + jnp.take_along_axis(cc4, ccl[:, None], 1)[:, 0] + 1
        cl = L2c + jnp.take_along_axis(cl4, ccl[:, None], 1)[:, 0]
        chain_dead = chain_step & (chain_bad | (ck > cl))
        chain_cont = chain_step & ~chain_dead & (i - 1 > 0)
        chain_hit = chain_step & ~chain_dead & (i - 1 == 0)

        # ---- hits ----
        hit_i0 = alive & ~is_chain & (i == 0)
        hit = hit_i0 | chain_hit
        hk = jnp.where(chain_hit, ck, k)
        hl = jnp.where(chain_hit, cl, l)
        score = e_score
        first_hit = hit & (st["n_aln"] == 0)
        best_score = jnp.where(first_hit, score, st["best_score"])
        best_diff = n_mm + n_gapo + n_gape
        new_md = jnp.minimum(best_diff + 1, max_diff0)
        max_diff = jnp.where(first_hit, new_md, max_diff)
        eq_best = hit & (score == best_score)
        best_cnt = st["best_cnt"] + jnp.where(eq_best, hl - hk + 1, 0)
        # top2b: hit at worse score while best_cnt > max_top2 -> break
        top2b = hit & ~eq_best & (st["best_cnt"] > max_top2)
        done = done | top2b
        hit = hit & ~top2b
        # duplicate check for gapped hits
        slots_used = jnp.arange(A_MAX)[None, :] < st["n_aln"][:, None]
        dup = ((st["alns"][:, :, 4] == hk[:, None])
               & (st["alns"][:, :, 5] == hl[:, None]) & slots_used).any(axis=1)
        do_add = hit & ~((n_gapo > 0) & dup)
        # gap_shadow on width array of strand a
        x = hl - hk + 1
        pos = jnp.arange(L + 1)[None, :]
        wa = w[binds, a]  # (B, L+1, 2)
        in_rng = (pos < ldp[:, None]) & do_add[:, None]
        eqx = (wa[:, :, 0] == x[:, None]) & in_rng
        jcum = jnp.cumsum(eqx.astype(jnp.int32), axis=1)
        shadowed_w = jnp.where(
            in_rng & (wa[:, :, 0] > x[:, None]), wa[:, :, 0] - x[:, None],
            jnp.where(eqx, n_text - jcum, wa[:, :, 0]))
        shadowed_bid = jnp.where(eqx, 1, wa[:, :, 1])
        w = w.at[binds, a].set(jnp.stack([shadowed_w, shadowed_bid], axis=2))
        # append hit
        arow = jnp.stack([n_mm, n_gapo, n_gape, a, hk, hl, score], axis=1)
        aslot = jnp.clip(st["n_aln"], 0, A_MAX - 1)
        overflow = st["overflow"] | (do_add & (st["n_aln"] >= A_MAX))
        alns = st["alns"].at[binds, aslot].set(
            jnp.where(do_add[:, None] & (st["n_aln"] < A_MAX)[:, None],
                      arow, st["alns"][binds, aslot]))
        n_aln = st["n_aln"] + (do_add & (st["n_aln"] < A_MAX)).astype(jnp.int32)

        # ---- expansion (normal entries only) ----
        expand = alive & ~is_chain & ~hit_i0 & ~start_chain
        i2 = i - 1  # --i
        si = jnp.take_along_axis(
            seqs[binds, a], jnp.clip(i2, 0, L - 1)[:, None], axis=1)[:, 0]
        occ_w = l - k + 1
        # allow_diff / allow_M
        w_i2m1 = w[binds, a, jnp.clip(i2 - 1, 0, L)]
        w_i2 = w[binds, a, jnp.clip(i2, 0, L)]
        allow_diff = jnp.where(
            (i2 > 0) & (w_i2m1[:, 1] > m - 1), False, True)
        allow_m = ~((i2 > 0) & (w_i2m1[:, 1] == m - 1) & (w_i2[:, 1] == m - 1)
                    & (w_i2m1[:, 0] == w_i2[:, 0]))
        # seed widths (m_seed = max_seed_diff - mm - gapo - gape, GAPE mode)
        msd = jnp.int32(max_seed_diff) - (n_mm + n_gapo) - n_gape
        ii = i2 - (lens - seed_len)
        sw_iim1 = seed_w[binds, a, jnp.clip(ii - 1, 0, seed_len)]
        sw_ii = seed_w[binds, a, jnp.clip(ii, 0, seed_len)]
        seed_on = use_seed & (i2 > 0) & (ii > 0)
        allow_diff = allow_diff & ~(seed_on & (sw_iim1[:, 1] > msd - 1))
        allow_m = allow_m & ~(seed_on & (sw_iim1[:, 1] == msd - 1)
                              & (sw_ii[:, 1] == msd - 1)
                              & (sw_iim1[:, 0] == sw_ii[:, 0]))

        tmp = n_gapo + n_gape
        indel_ok = (expand & allow_diff & (i2 >= indel_end_skip + tmp)
                    & (lens - i2 >= indel_end_skip + tmp))

        st2 = dict(pool=pool, counts=counts, n_entries=n_entries,
                   overflow=overflow)

        def push(st2, mask, pa, pi, pk, pl, pmm, pgo, pge, pst, is_diff,
                 inherit_ldp):
            score_p = pmm * s_mm + pgo * s_gapo + pge * s_gape
            bidx = jnp.clip(score_p, 0, nb - 1)
            slot_p = st2["counts"][binds, bidx]
            ovf = mask & (slot_p >= NS)
            mw = mask & ~ovf
            flatp = bidx * NS + jnp.clip(slot_p, 0, NS - 1)
            stale = st2["pool"][binds, flatp, F_LDP]
            new_ldp = jnp.where(is_diff, pi,
                                jnp.where(inherit_ldp >= 0, inherit_ldp, stale))
            infop = (score_p << 21) | (pa << 20) | pi
            row = jnp.stack([pk, pl, infop, pmm, pgo, pge, pst, new_ldp],
                            axis=1)
            old = st2["pool"][binds, flatp]
            st2["pool"] = st2["pool"].at[binds, flatp].set(
                jnp.where(mw[:, None], row, old))
            st2["counts"] = st2["counts"].at[binds, bidx].add(
                mw.astype(jnp.int32))
            st2["n_entries"] = st2["n_entries"] + mw.astype(jnp.int32)
            st2["overflow"] = st2["overflow"] | ovf
            return st2

        neg1 = jnp.full(B, -1, jnp.int32)
        # chain continuation push (inherits ldp explicitly)
        st2 = push(st2, chain_cont, a, i - 1, ck, cl, n_mm, n_gapo, n_gape,
                   jnp.full(B, STATE_CHAIN, jnp.int32),
                   jnp.zeros(B, bool), ldp)

        # 1. insertion open / extend
        ins_open = indel_ok & (state == STATE_M) & (n_gapo < max_gapo)
        ins_ext = indel_ok & (state == STATE_I) & (n_gape < max_gape)
        st2 = push(st2, ins_open | ins_ext, a, i2, k, l, n_mm,
                   n_gapo + ins_open.astype(jnp.int32),
                   n_gape + ins_ext.astype(jnp.int32),
                   jnp.full(B, STATE_I, jnp.int32), jnp.ones(B, bool), neg1)
        # 2-5. deletions
        del_open = indel_ok & (state == STATE_M) & (n_gapo < max_gapo)
        del_ext = (indel_ok & (state == STATE_D) & (n_gape < max_gape)
                   & ((n_gapo + n_gape < max_diff) | (occ_w < max_del_occ)))
        for j in range(4):
            cj = jnp.full(B, j, jnp.int32)
            kj = L2[sel, j] + cc4[:, j] + 1
            lj = L2[sel, j] + cl4[:, j]
            okj = kj <= lj
            st2 = push(st2, (del_open | del_ext) & okj, a, i2 + 1, kj, lj,
                       n_mm, n_gapo + del_open.astype(jnp.int32),
                       n_gape + del_ext.astype(jnp.int32),
                       jnp.full(B, STATE_D, jnp.int32), jnp.ones(B, bool),
                       neg1)
        # 6-9. mismatches / exact-only fallback (the j==4 child with si<4 is
        # the exact-match continuation; when diffs are disallowed it is the
        # only push, matching the else-branch at bwtgap.c:253-258)
        allow_mm = expand & allow_diff & allow_m
        for j in range(1, 5):
            c = (si + j) & 3
            if j == 4:
                mask_j = allow_mm | (expand & ~(allow_diff & allow_m)
                                     & (si < 4))
                is_mm_v = allow_mm & (si > 3)
            else:
                mask_j = allow_mm
                is_mm_v = jnp.ones(B, bool)
            kj = L2[sel, c] + jnp.take_along_axis(cc4, c[:, None], 1)[:, 0] + 1
            lj = L2[sel, c] + jnp.take_along_axis(cl4, c[:, None], 1)[:, 0]
            okj = kj <= lj
            st2 = push(st2, mask_j & okj, a, i2, kj, lj,
                       n_mm + (mask_j & is_mm_v).astype(jnp.int32), n_gapo,
                       n_gape, jnp.full(B, STATE_M, jnp.int32),
                       is_mm_v, neg1)

        return dict(pool=st2["pool"], counts=st2["counts"],
                    n_entries=st2["n_entries"], w=w, seed_w=seed_w,
                    best_score=best_score, max_diff=max_diff,
                    best_cnt=best_cnt, n_aln=n_aln, alns=alns, done=done,
                    overflow=st2["overflow"], it=st["it"] + 1)

    out = jax.lax.while_loop(cond, body, init)
    fallback = out["overflow"] | ~out["done"]
    return out["n_aln"], out["alns"], fallback, out["it"]


class BatchEngine:
    """Batched device engine with exact host fallback."""

    def __init__(self, idx: ReducedIndex, max_batch: int = 2048):
        self.idx = idx
        self.dev = DeviceFM.build(idx.fm_fwd, idx.fm_rev)
        try:
            from ..align.engine import NativeEngine

            self.host = NativeEngine(idx)
        except Exception:
            self.host = HostEngine(idx)
        self.max_batch = max_batch

    def align_batch(self, reads, opt: GapOpt) -> None:
        todo = [p for p in reads if not p.filtered]
        for p in reads:
            p.sa = 0
            p.type = 0
            p.c1 = p.c2 = 0
            p.n_aln = 0
            p.aln = []
        for s in range(0, len(todo), self.max_batch):
            self._run_chunk(todo[s:s + self.max_batch], opt)

    def _run_chunk(self, todo, opt: GapOpt) -> None:
        if not todo:
            return
        import copy

        B = len(todo)
        Lmax = max(p.len for p in todo)
        seqs = np.full((B, 2, Lmax), 4, dtype=np.int32)
        lens = np.zeros(B, dtype=np.int32)
        md = np.zeros(B, dtype=np.int32)
        use_seed = np.zeros(B, dtype=bool)
        for b, p in enumerate(todo):
            seqs[b, 0, : p.len] = p.seq[: p.len]
            seqs[b, 1, : p.len] = p.rseq[: p.len]
            lens[b] = p.len
            md[b] = (bwa_cal_maxdiff(p.len, thres=opt.fnr)
                     if opt.fnr > 0.0 else opt.max_diff)
            use_seed[b] = p.len > opt.seed_len
        batch_md = (bwa_cal_maxdiff(int(Lmax), thres=opt.fnr)
                    if opt.fnr > 0.0 else opt.max_diff)
        max_gapo = min(opt.max_gapo, batch_md)
        nb = ((int(md.max()) + 1) * opt.s_mm + (max_gapo + 1) * opt.s_gapo
              + (opt.max_gape + 1) * opt.s_gape) + 1

        seqs_j = jnp.asarray(seqs)
        lens_j = jnp.asarray(lens)
        w0 = jnp.stack([cal_width(self.dev, 0, seqs[:, 0, :], lens_j),
                        cal_width(self.dev, 1, seqs[:, 1, :], lens_j)], axis=1)
        sl = opt.seed_len
        seed_seqs0 = np.full((B, sl), 4, dtype=np.int32)
        seed_seqs1 = np.full((B, sl), 4, dtype=np.int32)
        for b, p in enumerate(todo):
            if use_seed[b]:
                seed_seqs0[b] = seqs[b, 0, p.len - sl: p.len]
                seed_seqs1[b] = seqs[b, 1, p.len - sl: p.len]
        sl_lens = jnp.full(B, sl, jnp.int32)
        seed_w0 = jnp.stack([cal_width(self.dev, 0, seed_seqs0, sl_lens),
                             cal_width(self.dev, 1, seed_seqs1, sl_lens)],
                            axis=1)

        max_iters = 24 * Lmax
        n_aln, alns, fallback, n_iters = _search_kernel(
            self.dev.words, self.dev.occ, self.dev.sa, self.dev.L2,
            self.dev.primary, seqs_j, lens_j, jnp.asarray(md), w0, seed_w0,
            jnp.asarray(use_seed),
            nb=int(nb), max_iters=int(max_iters), s_mm=opt.s_mm,
            s_gapo=opt.s_gapo, s_gape=opt.s_gape, max_gapo=int(max_gapo),
            max_gape=opt.max_gape, indel_end_skip=opt.indel_end_skip,
            max_del_occ=opt.max_del_occ, max_entries=opt.max_entries,
            max_top2=opt.max_top2, seed_len=opt.seed_len,
            max_seed_diff=opt.max_seed_diff, n_text=self.dev.n)
        n_aln = np.asarray(n_aln)
        alns = np.asarray(alns)
        fallback = np.asarray(fallback)
        self.last_iters = int(n_iters)
        self.last_fallback = int(fallback.sum())

        fb_reads = []
        for b, p in enumerate(todo):
            if fallback[b]:
                fb_reads.append(p)
                continue
            p.aln = [Aln(int(r[0]), int(r[1]), int(r[2]), int(r[3]),
                         int(r[4]), int(r[5]), int(r[6]))
                     for r in alns[b, : n_aln[b]]]
            p.n_aln = len(p.aln)
        if fb_reads:
            self.host.align_batch(fb_reads, opt)
