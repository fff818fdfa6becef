"""Batched inexact FM search: bwt_match_gap as a lockstep TPU state machine.

The reference's best-first search (libbwa/bwtgap.c:104-264) is a per-read
priority loop: pop the lowest-score entry (LIFO within equal score),
expand up to 9 children (gap open/extend, deletions, mismatches / exact),
record SA-interval hits with top2 cutoffs.  This module runs the SAME
discipline for a whole batch of reads in lockstep under jit:

- Flat per-read entry pools with a free-list allocator; pop order is kept
  exactly C-equivalent via priority keys ``score << 20 | (SEQ_MAX - seq)``
  (min score first, LIFO within a score because the global push counter is
  monotonic).
- C's slot-persistence of ``last_diff_pos`` (gap_push only writes it on
  diff pushes, bwtgap.c:58-60) reduces exactly to inheritance: a no-diff
  child is the only same-bucket push of its parent's expansion, so it
  always reuses the slot its parent vacated and therefore sees the
  parent's value.  We inherit explicitly.
- The bwt_match_exact_alt inner walk (libbwa/bwt.c) is unrolled into
  same-priority "chain" entries: a chain entry performs one exact step per
  pop and, having the minimal score and the newest sequence number, is
  popped immediately next -- order-identical to the C inner loop.
- Forward/reverse indexes are stacked so the per-entry strand bit selects
  the index by gather (see ops/fm.py).

Reads that exceed the pool (NP live entries), the hit cap (A_MAX) or the
iteration cap fall back to the exact native/host engine, so results are
always exact; the pools only bound the fast path.
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
import numpy as np

from ..align.core import Aln
from ..align.engine import HostEngine
from ..align.opts import GapOpt, bwa_cal_maxdiff
from ..index.builder import ReducedIndex
from .fm import DeviceFM, cal_width, occ4

STATE_M, STATE_I, STATE_D, STATE_CHAIN = 0, 1, 2, 3

NP = 4096  # pool entries per read
A_MAX = 48  # max recorded hits per read
SEQ_MAX = 1 << 20
PRIO_INF = np.int32(2**31 - 1)
F_K, F_L, F_INFO, F_MM, F_GO, F_GE, F_ST, F_LDP = range(8)


@functools.partial(
    jax.jit,
    static_argnames=("max_iters", "s_mm", "s_gapo", "s_gape",
                     "max_gapo", "max_gape", "indel_end_skip", "max_del_occ",
                     "max_entries", "max_top2", "seed_len", "max_seed_diff",
                     "n_text"))
def _search_kernel(words, occ_ckpt, sa, L2, primary,
                   seqs, lens, max_diff0, w0, seed_w0, use_seed,
                   max_iters, s_mm, s_gapo, s_gape, max_gapo, max_gape,
                   indel_end_skip, max_del_occ, max_entries, max_top2,
                   seed_len, max_seed_diff, n_text):
    """seqs: (B, 2, L) int32; lens: (B,); max_diff0: (B,);
    w0: (B, 2, L+1, 2); seed_w0: (B, 2, seed_len+1, 2); use_seed: (B,)."""
    fm = DeviceFM(words=words, occ=occ_ckpt, sa=sa, L2=L2, primary=primary,
                  n=n_text)
    B, _, L = seqs.shape
    binds = jnp.arange(B)

    pool0 = jnp.zeros((B, NP, 8), dtype=jnp.int32)
    prio0 = jnp.full((B, NP), PRIO_INF, dtype=jnp.int32)
    # free list: slot ids NP-1..0 (top at index NP-1 popped first -> slot 0)
    freelist0 = jnp.broadcast_to(jnp.arange(NP - 1, -1, -1, dtype=jnp.int32),
                                 (B, NP))
    # initial pushes: a=0 (seq 0) then a=1 (seq 1), both score 0
    e0 = jnp.stack([jnp.zeros(B, jnp.int32), jnp.full(B, n_text, jnp.int32),
                    lens, jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32),
                    jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32),
                    jnp.zeros(B, jnp.int32)], axis=1)
    e1 = e0.at[:, F_INFO].set((1 << 20) | lens)
    pool0 = pool0.at[:, 0, :].set(e0).at[:, 1, :].set(e1)
    prio0 = prio0.at[:, 0].set(SEQ_MAX - 1).at[:, 1].set(SEQ_MAX - 2)
    free_top0 = jnp.full(B, NP - 2, jnp.int32)  # slots 0,1 taken

    n_n = ((seqs[:, 0, :] > 3)
           & (jnp.arange(L)[None, :] < lens[:, None])).sum(axis=1)
    too_many_n = n_n > max_diff0

    init = dict(
        pool=pool0, prio=prio0, freelist=freelist0, free_top=free_top0,
        gseq=jnp.full(B, 2, jnp.int32),
        n_entries=jnp.full(B, 2, jnp.int32),
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
        pool, prio = st["pool"], st["prio"]
        freelist, free_top = st["freelist"], st["free_top"]
        w, seed_w = st["w"], st["seed_w"]
        n_entries = st["n_entries"]
        done = st["done"]

        active = ~done & (n_entries > 0)
        done = done | (~done & (n_entries == 0))
        hit_cap = active & (n_entries > max_entries)
        done = done | hit_cap
        active = active & ~hit_cap

        # ---- pop: argmin priority ----
        slot = jnp.argmin(prio, axis=1)  # (B,)
        e = pool[binds, slot]
        prio = prio.at[binds, slot].set(
            jnp.where(active, PRIO_INF, prio[binds, slot]))
        # return slot to free list
        freelist = freelist.at[binds, jnp.clip(free_top, 0, NP - 1)].set(
            jnp.where(active, slot, freelist[binds,
                                             jnp.clip(free_top, 0, NP - 1)]))
        free_top = free_top + active.astype(jnp.int32)
        n_entries = n_entries - active.astype(jnp.int32)

        k, l = e[:, F_K], e[:, F_L]
        info = e[:, F_INFO]
        a = (info >> 20) & 1
        i = info & 0xFFFF
        e_score = info >> 21
        n_mm, n_gapo, n_gape = e[:, F_MM], e[:, F_GO], e[:, F_GE]
        state, ldp = e[:, F_ST], e[:, F_LDP]
        is_chain = state == STATE_CHAIN

        stop = active & (e_score > st["best_score"] + s_mm)
        done = done | stop
        active = active & ~stop

        max_diff = st["max_diff"]
        m = max_diff - (n_mm + n_gapo) - n_gape  # GAPE mode
        alive = active & (m >= 0)

        # width prune (skip for chain entries: the C exact walk has none)
        w_im1 = w[binds, a, jnp.clip(i - 1, 0, L)]
        alive = alive & ~(~is_chain & (i > 0) & (m < w_im1[:, 1]))

        sel = 1 - a

        # ---- chain stepping (bwt_match_exact_alt unroll) ----
        start_chain = alive & ~is_chain & (i > 0) & (m == 0)  # GAPE mode
        chain_step = start_chain | (alive & is_chain)
        ci = jnp.clip(i - 1, 0, L - 1)
        cc = jnp.take_along_axis(seqs[binds, a], ci[:, None], axis=1)[:, 0]
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
        top2b = hit & ~eq_best & (st["best_cnt"] > max_top2)
        done = done | top2b
        hit = hit & ~top2b
        slots_used = jnp.arange(A_MAX)[None, :] < st["n_aln"][:, None]
        dup = ((st["alns"][:, :, 4] == hk[:, None])
               & (st["alns"][:, :, 5] == hl[:, None]) & slots_used).any(axis=1)
        do_add = hit & ~((n_gapo > 0) & dup)
        # gap_shadow on width array of strand a
        x = hl - hk + 1
        pos = jnp.arange(L + 1)[None, :]
        wa = w[binds, a]
        in_rng = (pos < ldp[:, None]) & do_add[:, None]
        eqx = (wa[:, :, 0] == x[:, None]) & in_rng
        jcum = jnp.cumsum(eqx.astype(jnp.int32), axis=1)
        shadowed_w = jnp.where(
            in_rng & (wa[:, :, 0] > x[:, None]), wa[:, :, 0] - x[:, None],
            jnp.where(eqx, n_text - jcum, wa[:, :, 0]))
        shadowed_bid = jnp.where(eqx, 1, wa[:, :, 1])
        w = w.at[binds, a].set(jnp.stack([shadowed_w, shadowed_bid], axis=2))
        arow = jnp.stack([n_mm, n_gapo, n_gape, a, hk, hl, score], axis=1)
        aslot = jnp.clip(st["n_aln"], 0, A_MAX - 1)
        overflow = st["overflow"] | (do_add & (st["n_aln"] >= A_MAX))
        alns = st["alns"].at[binds, aslot].set(
            jnp.where(do_add[:, None] & (st["n_aln"] < A_MAX)[:, None],
                      arow, st["alns"][binds, aslot]))
        n_aln = st["n_aln"] + (do_add & (st["n_aln"] < A_MAX)).astype(jnp.int32)

        # ---- expansion (normal entries only) ----
        expand = alive & ~is_chain & ~hit_i0 & ~start_chain
        i2 = i - 1
        si = jnp.take_along_axis(
            seqs[binds, a], jnp.clip(i2, 0, L - 1)[:, None], axis=1)[:, 0]
        occ_w = l - k + 1
        w_i2m1 = w[binds, a, jnp.clip(i2 - 1, 0, L)]
        w_i2 = w[binds, a, jnp.clip(i2, 0, L)]
        allow_diff = ~((i2 > 0) & (w_i2m1[:, 1] > m - 1))
        allow_m = ~((i2 > 0) & (w_i2m1[:, 1] == m - 1) & (w_i2[:, 1] == m - 1)
                    & (w_i2m1[:, 0] == w_i2[:, 0]))
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

        st2 = dict(pool=pool, prio=prio, freelist=freelist,
                   free_top=free_top, gseq=st["gseq"], n_entries=n_entries,
                   overflow=overflow)

        def push(st2, mask, pa, pi, pk, pl, pmm, pgo, pge, pst, new_ldp):
            score_p = pmm * s_mm + pgo * s_gapo + pge * s_gape
            ft = st2["free_top"]
            ovf = mask & ((ft <= 0) | (st2["gseq"] >= SEQ_MAX - 4))
            mw = mask & ~ovf
            fidx = jnp.clip(ft - 1, 0, NP - 1)
            slot_p = st2["freelist"][binds, fidx]
            slot_w = jnp.where(mw, slot_p, NP)  # out-of-range -> dropped
            infop = (score_p << 21) | (pa << 20) | pi
            row = jnp.stack([pk, pl, infop, pmm, pgo, pge, pst, new_ldp],
                            axis=1)
            st2["pool"] = st2["pool"].at[binds, slot_w, :].set(
                row, mode="drop")
            st2["prio"] = st2["prio"].at[binds, slot_w].set(
                (score_p << 20) | (SEQ_MAX - 1 - st2["gseq"]), mode="drop")
            st2["free_top"] = ft - mw.astype(jnp.int32)
            st2["gseq"] = st2["gseq"] + mw.astype(jnp.int32)
            st2["n_entries"] = st2["n_entries"] + mw.astype(jnp.int32)
            st2["overflow"] = st2["overflow"] | ovf
            return st2

        # chain continuation (inherits parent ldp)
        st2 = push(st2, chain_cont, a, i - 1, ck, cl, n_mm, n_gapo, n_gape,
                   jnp.full(B, STATE_CHAIN, jnp.int32), ldp)
        # 1. insertion open / extend (is_diff -> ldp = i2)
        ins_open = indel_ok & (state == STATE_M) & (n_gapo < max_gapo)
        ins_ext = indel_ok & (state == STATE_I) & (n_gape < max_gape)
        st2 = push(st2, ins_open | ins_ext, a, i2, k, l, n_mm,
                   n_gapo + ins_open.astype(jnp.int32),
                   n_gape + ins_ext.astype(jnp.int32),
                   jnp.full(B, STATE_I, jnp.int32), i2)
        # 2-5. deletions (is_diff -> ldp = i2+1)
        del_open = indel_ok & (state == STATE_M) & (n_gapo < max_gapo)
        del_ext = (indel_ok & (state == STATE_D) & (n_gape < max_gape)
                   & ((n_gapo + n_gape < max_diff) | (occ_w < max_del_occ)))
        for j in range(4):
            kj = L2[sel, j] + cc4[:, j] + 1
            lj = L2[sel, j] + cl4[:, j]
            okj = kj <= lj
            st2 = push(st2, (del_open | del_ext) & okj, a, i2 + 1, kj, lj,
                       n_mm, n_gapo + del_open.astype(jnp.int32),
                       n_gape + del_ext.astype(jnp.int32),
                       jnp.full(B, STATE_D, jnp.int32), i2 + 1)
        # 6-9. mismatches / exact-only continuation (bwtgap.c:245-258)
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
            # no-diff pushes inherit the parent's ldp (slot-persistence)
            new_ldp = jnp.where(is_mm_v, i2, ldp)
            st2 = push(st2, mask_j & okj, a, i2, kj, lj,
                       n_mm + (mask_j & is_mm_v).astype(jnp.int32), n_gapo,
                       n_gape, jnp.full(B, STATE_M, jnp.int32), new_ldp)

        return dict(pool=st2["pool"], prio=st2["prio"],
                    freelist=st2["freelist"], free_top=st2["free_top"],
                    gseq=st2["gseq"], n_entries=st2["n_entries"], w=w,
                    seed_w=seed_w, best_score=best_score, max_diff=max_diff,
                    best_cnt=best_cnt, n_aln=n_aln, alns=alns, done=done,
                    overflow=st2["overflow"], it=st["it"] + 1)

    out = jax.lax.while_loop(cond, body, init)
    fallback = out["overflow"] | ~out["done"]
    return out["n_aln"], out["alns"], fallback, out["it"]


class BatchEngine:
    """Batched device engine with exact native/host fallback."""

    def __init__(self, idx: ReducedIndex, max_batch: int = 2048):
        self.idx = idx
        self.dev = DeviceFM.build(idx.fm_fwd, idx.fm_rev)
        try:
            from ..align.engine import NativeEngine

            self.host = NativeEngine(idx)
        except Exception:
            self.host = HostEngine(idx)
        self.max_batch = max_batch
        self.last_iters = 0
        self.last_fallback = 0

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

        max_iters = 48 * Lmax
        n_aln, alns, fallback, n_iters = _search_kernel(
            self.dev.words, self.dev.occ, self.dev.sa, self.dev.L2,
            self.dev.primary, seqs_j, lens_j, jnp.asarray(md), w0, seed_w0,
            jnp.asarray(use_seed),
            max_iters=int(max_iters), s_mm=opt.s_mm,
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
