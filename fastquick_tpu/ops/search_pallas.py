"""Pallas/Mosaic TPU kernel for the lockstep inexact-search inner loop.

The XLA formulation of the search step (ops/batch_search.py:inner_step,
mirroring libbwa/bwtgap.c:104-264) runs ~40 separate (B, pool)-shaped
select/reduce passes per iteration; each pass is its own fusion with an
HBM round trip, and the measured per-iteration cost (~80us + 0.37us x
lanes, BASELINE.md round 3) is dominated by that per-pass overhead, not
by arithmetic.  This module runs the SAME step discipline as ONE Mosaic
kernel that keeps the entire lane state resident in VMEM across all
K_INNER iterations of an outer round:

- layout is transposed vs the XLA path: per-lane scalars are (1, B)
  rows (full 128-lane vregs), pool/width/head planes are (W, B) with
  lanes on the minor axis, so every one-hot pop/push pass is a dense
  cross-sublane reduce at VPU speed with zero HBM traffic;
- the FM occ queries (the only data-dependent global-memory access)
  gather packed 64-byte rows [occ checkpoint | 8 bwt words] from a
  VMEM-resident table with a scalar fori_loop (measured ~4.7ns/row on
  the v5e, tools/probe_mosaic_perf.py); indices cross to SMEM via an
  in-kernel DMA;
- the in-block rank counts (libbwa bwt_occ4's __occ_aux popcount trick)
  are recomputed on the VPU from the gathered words with
  lax.population_count;
- the gap_shadow prefix count (bwtgap.c:81-91) is a log-step
  pltpu.roll cumsum over the width planes.

Semantics are bit-identical to inner_step: the differential suite
(tests/test_search_pallas.py) drives both paths over the same worlds
and asserts equal results; the host-oracle differentials in
tests/test_batch_engine.py run against this path under FQ_BS_PALLAS=1.
Only CH_STEPS == 1 (the measured-best config) is supported here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fm import DeviceFM

STATE_M, STATE_I, STATE_D = 0, 1, 2
A_MAX = 48
NBUCK = 128
NCH = 9  # ins + 4 del + 4 mm children per expansion (C push order)

# __occ_aux 2-bit match patterns as int32 bit patterns
_PAT_I32 = [int(np.uint32(p).view(np.int32)) for p in
            (0x00000000, 0x55555555, 0xAAAAAAAA, 0xFFFFFFFF)]
_EVEN_I32 = 0x55555555
_FULL_I32 = -1  # 0xFFFFFFFF


def _pad_rows(x: np.ndarray, rows: int) -> np.ndarray:
    out = np.zeros((rows,) + x.shape[1:], dtype=x.dtype)
    out[: x.shape[0]] = x
    return out


def pack_fm_table(dev: DeviceFM, fat: bool = True
                  ) -> tuple[np.ndarray, int]:
    """Pack occ checkpoints + bwt words into one (2*nbp, W) int32 table.

    fat=True (W=24): [occ c0..c3 | words w0..w7 | cum c8 | 4 pad] where
    cum int32 j packs the 4 per-char base counts of words [0, j) of the
    block as bytes (<= 112 each) -- the kernel then popcounts only the
    single boundary word instead of all 8 with per-word masks.
    fat=False (W=16): [occ4 | words8 | pad4].  VMEM cost is identical:
    Mosaic lane-pads minor dims to 128 either way.  Row index =
    sel * nbp + block.  Returns (table, nbp).
    """
    occ = np.asarray(dev.occ)      # (2, nbo, 4) int32
    words = np.asarray(dev.words)  # (2, nbw, 8) uint32
    nbo, nbw = occ.shape[1], words.shape[1]
    nbp = -(-max(nbo, nbw) // 8) * 8
    width = 24 if fat else 16
    rows = []
    for s in range(2):
        r = np.zeros((nbp, width), dtype=np.int32)
        r[:nbo, 0:4] = occ[s]
        r[:nbw, 4:12] = words[s].view(np.int32)
        if fat:
            shifts = (2 * (15 - np.arange(16))).astype(np.uint32)
            codes = (words[s][:, :, None] >> shifts[None, None, :]) & 3
            cnt = np.stack([(codes == c).sum(-1) for c in range(4)],
                           axis=-1)  # (nbw, 8, 4)
            cume = np.zeros_like(cnt)
            cume[:, 1:] = np.cumsum(cnt, axis=1)[:, :-1]
            packed = (cume[..., 0] | (cume[..., 1] << 8)
                      | (cume[..., 2] << 16) | (cume[..., 3] << 24))
            r[:nbw, 12:20] = packed.astype(np.int32)
        rows.append(r)
    return np.concatenate(rows, axis=0), nbp


def _aln_score(mm, go, ge, s_mm, s_gapo, s_gape):
    return mm * s_mm + go * s_gapo + ge * s_gape


# mutable state planes, kernel argument order (transposed layouts)
MUTABLE = ("pk", "pl", "pai", "pdiff", "heads", "freelist",
           "free_top", "n_entries", "best_score", "best_cnt", "n_aln",
           "al0", "al1", "al2", "ww0", "wb0", "ww1", "wb1",
           "max_diff", "ch_on", "ch", "done", "overflow", "steps")
READONLY = ("seqs2l", "lens", "md0", "use_seed",
            "sww0", "swb0", "sww1", "swb1")
BOOLS = {"ch_on", "done", "overflow", "use_seed"}


def _kernel(params, tab,
            seqs2l, lens_r, md0_r, use_seed_r,
            sww0_r, swb0_r, sww1_r, swb1_r,
            *refs,
            B, NP, K_INNER, L, LW, SLW, NBP, n,
            s_mm, s_gapo, s_gape, max_gapo, max_gape, indel_end_skip,
            max_del_occ, max_entries, max_top2, seed_len, max_seed_diff,
            step_cap, ablate=()):
    ins = refs[:len(MUTABLE)]
    outs = refs[len(MUTABLE):2 * len(MUTABLE)]
    gth, idxv, idxs, sem = refs[2 * len(MUTABLE):]
    st = dict(zip(MUTABLE, outs))
    # aliased in/out may get distinct VMEM windows: seed outs from ins
    for i_ref, o_ref in zip(ins, outs):
        o_ref[:] = i_ref[:]

    def iota0(w, lanes=B):
        return jax.lax.broadcasted_iota(jnp.int32, (w, lanes), 0)

    def oh_get(plane, col):
        w = plane.shape[0]
        return jnp.sum(jnp.where(iota0(w) == col, plane, 0), axis=0,
                       keepdims=True)

    def oh_set(plane, col, val, mask):
        w = plane.shape[0]
        m = (iota0(w) == col) & mask
        return jnp.where(m, val, plane)

    def lsr(x, s):
        return jax.lax.shift_right_logical(x, jnp.full_like(x, s))

    def i32(b):
        return b.astype(jnp.int32)

    # SMEM params: [primary0, primary1, L2f 0..3, L2r 0..3]
    P0, P1 = params[0], params[1]
    L2F = [params[2 + c] for c in range(4)]
    L2R = [params[6 + c] for c in range(4)]

    # read-only planes (load once; VMEM-resident values)
    seqs = seqs2l[:]      # (2L, B) int32 codes
    lens = lens_r[:]      # (1, B)
    md0 = md0_r[:]
    use_seed = use_seed_r[:] != 0
    sww0, swb0 = sww0_r[:], swb0_r[:]  # (SLW, B)
    sww1, swb1 = sww1_r[:], swb1_r[:]

    def body(_t, _c):
        done = st["done"][:] != 0
        heads = st["heads"][:]
        pk, pl_, pai, pdiff = (st["pk"][:], st["pl"][:], st["pai"][:],
                               st["pdiff"][:])
        freelist, free_top = st["freelist"][:], st["free_top"][:]
        n_entries = st["n_entries"][:]
        ch_on, ch = st["ch_on"][:] != 0, st["ch"][:]
        ww0, wb0 = st["ww0"][:], st["wb0"][:]
        ww1, wb1 = st["ww1"][:], st["wb1"][:]
        max_diff = st["max_diff"][:]

        avail = ~done
        work_chain = avail & ch_on
        can_pop = avail & ~ch_on & (n_entries > 0)
        done = done | (avail & ~ch_on & (n_entries == 0))
        hitcap = can_pop & (n_entries > max_entries)
        done = done | hitcap
        can_pop = can_pop & ~hitcap

        # ---- pop: head of lowest nonempty bucket (bwtgap.c stack) ----
        hvalid = heads >= 0
        bucket = jnp.min(jnp.where(hvalid, iota0(NBUCK), NBUCK), axis=0,
                         keepdims=True)
        bucket_c = jnp.clip(bucket, 0, NBUCK - 1)
        slot = oh_get(heads, bucket_c)
        slot_c = jnp.clip(slot, 0, NP - 1)
        sel_slot = iota0(NP) == slot_c
        k = jnp.sum(jnp.where(sel_slot, pk, 0), axis=0, keepdims=True)
        l = jnp.sum(jnp.where(sel_slot, pl_, 0), axis=0, keepdims=True)
        ai_w = jnp.sum(jnp.where(sel_slot, pai, 0), axis=0, keepdims=True)
        d = jnp.sum(jnp.where(sel_slot, pdiff, 0), axis=0, keepdims=True)
        nxt_f = (ai_w >> 16) & 0x7FFF
        nxt = jnp.where(nxt_f == NP, -1, nxt_f)
        heads = oh_set(heads, bucket_c, nxt, can_pop)
        freelist = oh_set(freelist, jnp.clip(free_top, 0, NP - 1), slot_c,
                          can_pop)
        free_top = free_top + i32(can_pop)
        n_entries = n_entries - i32(can_pop)

        a = (ai_w >> 13) & 1
        i = ai_w & 0x1FFF
        state = (ai_w >> 14) & 3
        n_mm, n_gapo, n_gape = d & 63, (d >> 6) & 63, (d >> 12) & 63
        ldp = d >> 18
        e_score = bucket

        stop = can_pop & (e_score > st["best_score"][:] + s_mm)
        done = done | stop
        alive = can_pop & ~stop
        m = max_diff - (n_mm + n_gapo) - n_gape  # GAPE mode
        alive = alive & (m >= 0)
        i2 = i - 1
        m_i2 = iota0(LW) == jnp.clip(i2, 0, L)
        m_i2m1 = iota0(LW) == jnp.clip(i2 - 1, 0, L)
        a0 = a == 0
        ww_sel = jnp.where(a0, ww0, ww1)
        wb_sel = jnp.where(a0, wb0, wb1)
        ww_i2 = jnp.sum(jnp.where(m_i2, ww_sel, 0), axis=0, keepdims=True)
        ww_i2m1 = jnp.sum(jnp.where(m_i2m1, ww_sel, 0), axis=0,
                          keepdims=True)
        wb_i2 = jnp.sum(jnp.where(m_i2, wb_sel, 0), axis=0, keepdims=True)
        wb_i2m1 = jnp.sum(jnp.where(m_i2m1, wb_sel, 0), axis=0,
                          keepdims=True)
        alive = alive & ~((i > 0) & (m < wb_i2))

        hit_i0 = alive & (i == 0)
        start_chain = alive & (i > 0) & (m == 0)
        expand = alive & ~hit_i0 & ~start_chain

        # ---- shared rank queries (bwt_2occ4) via the packed table ----
        ck_k = jnp.where(work_chain, ch[0:1], k)
        ck_l = jnp.where(work_chain, ch[1:2], l)
        cur_a = jnp.where(work_chain, ch[3:4], a)
        sel = 1 - cur_a
        qq = jnp.concatenate([ck_k - 1, ck_l], axis=1)  # (1, 2B)
        ss = jnp.concatenate([sel, sel], axis=1)
        kk = qq + 1
        prim = jnp.where(ss == 0, P0, P1)
        kp = kk - i32(kk > prim)
        kp = jnp.clip(kp, 0, n)
        blk = kp >> 7
        rem = kp - (blk << 7)
        # clip guards the DMA against state-invariant violations (a
        # corrupt strand bit would otherwise fault the chip)
        idxv[:] = jnp.clip(ss * NBP + blk, 0, 2 * NBP - 1)
        if "nogather" not in ablate:  # profiling only: results wrong
            cp = pltpu.make_async_copy(idxv, idxs, sem)
            cp.start()
            cp.wait()

            def gbody(b, _):
                r = idxs[0, b]
                gth[pl.ds(b, 1), :] = tab[pl.ds(r, 1), :]
                return 0

            jax.lax.fori_loop(0, 2 * B, gbody, 0)
        gt = gth[:].T  # (TABW, 2B)
        ck_rows = gt[0:4]
        # in-block prefix counts (__occ_aux popcount, libbwa/bwt.h:89-96)
        cnts = [jnp.zeros((1, 2 * B), jnp.int32) for _ in range(4)]
        if tab.shape[1] >= 24 and "norank" not in ablate:
            # fat rows carry per-word cumulative counts: select the
            # boundary word + its cum bytes, popcount ONE masked word
            widx = rem >> 4
            rem16 = rem & 15
            w_sel = jnp.zeros((1, 2 * B), jnp.int32)
            cum_sel = jnp.zeros((1, 2 * B), jnp.int32)
            for w in range(8):
                is_w = widx == w
                w_sel = jnp.where(is_w, gt[4 + w:5 + w], w_sel)
                cum_sel = jnp.where(is_w, gt[12 + w:13 + w], cum_sel)
            sh = 32 - 2 * rem16  # rem16 in [0,15] -> sh in [2,32]
            mask_w = jnp.where(
                rem16 <= 0, 0,
                jax.lax.shift_left(jnp.full_like(sh, _FULL_I32),
                                   jnp.clip(sh, 0, 31)))
            for c in range(4):
                xc = w_sel ^ _PAT_I32[c]
                y = xc | lsr(xc, 1)
                match = (~y) & _EVEN_I32 & mask_w
                cnts[c] = ((lsr(cum_sel, 8 * c) & 255)
                           + jax.lax.population_count(match))
        else:
            words_rng = () if "norank" in ablate else range(8)
            for w in words_rng:
                pw = jnp.clip(rem - 16 * w, 0, 16)
                sh = jnp.clip(32 - 2 * pw, 0, 31)
                mask_w = jnp.where(pw >= 16, _FULL_I32,
                                   jax.lax.shift_left(
                                       jnp.full_like(sh, _FULL_I32), sh))
                mask_w = jnp.where(pw <= 0, 0, mask_w)
                x_w = gt[4 + w:5 + w]
                for c in range(4):
                    xc = x_w ^ _PAT_I32[c]
                    y = xc | lsr(xc, 1)
                    match = (~y) & _EVEN_I32 & mask_w
                    cnts[c] = cnts[c] + jax.lax.population_count(match)
        occr = jnp.concatenate(
            [ck_rows[c:c + 1] + cnts[c] for c in range(4)], axis=0)
        cnt_k4 = occr[:, :B]   # (4, B)
        cnt_l4 = occr[:, B:]
        L2row = [jnp.where(sel == 0, L2F[c], L2R[c]) for c in range(4)]

        # ---- chain step (bwt_match_exact_alt, one base/iter) ----
        chainish = work_chain | start_chain
        ch_i = jnp.where(work_chain, ch[2:3], i)
        ci = jnp.clip(ch_i - 1, 0, L - 1)
        cc = oh_get(seqs, cur_a * L + ci)
        si = oh_get(seqs, a * L + jnp.clip(i2, 0, L - 1))
        ccl = jnp.clip(cc, 0, 3)
        L2c = jnp.zeros_like(ccl)
        occk_c = jnp.zeros_like(ccl)
        occl_c = jnp.zeros_like(ccl)
        for c in range(4):
            is_c = ccl == c
            L2c = jnp.where(is_c, L2row[c], L2c)
            occk_c = jnp.where(is_c, cnt_k4[c:c + 1], occk_c)
            occl_c = jnp.where(is_c, cnt_l4[c:c + 1], occl_c)
        nk = L2c + occk_c + 1
        nl = L2c + occl_c
        ch_dead = chainish & ((cc > 3) | (nk > nl))
        ch_hit = chainish & ~ch_dead & (ch_i - 1 == 0)
        ch_cont = chainish & ~ch_dead & ~ch_hit
        new_ch = jnp.concatenate(
            [nk, nl, ch_i - 1, cur_a,
             jnp.where(start_chain, n_mm, ch[4:5]),
             jnp.where(start_chain, n_gapo, ch[5:6]),
             jnp.where(start_chain, n_gape, ch[6:7]),
             jnp.where(start_chain, ldp, ch[7:8])], axis=0)
        ch = jnp.where(chainish, new_ch, ch)
        ch_on = ch_cont

        # ---- hits (bwtgap.c:62-101) ----
        hit = hit_i0 | ch_hit
        hk = jnp.where(ch_hit, ch[0:1], k)
        hl = jnp.where(ch_hit, ch[1:2], l)
        hmm = jnp.where(ch_hit, ch[4:5], n_mm)
        hgo = jnp.where(ch_hit, ch[5:6], n_gapo)
        hge = jnp.where(ch_hit, ch[6:7], n_gape)
        ha = jnp.where(ch_hit, ch[3:4], a)
        hldp = jnp.where(ch_hit, ch[7:8], ldp)
        score = _aln_score(hmm, hgo, hge, s_mm, s_gapo, s_gape)
        first_hit = hit & (st["n_aln"][:] == 0)
        best_score = jnp.where(first_hit, score, st["best_score"][:])
        max_diff = jnp.where(first_hit,
                             jnp.minimum(hmm + hgo + hge + 1, md0),
                             max_diff)
        eq_best = hit & (score == best_score)
        best_cnt = st["best_cnt"][:] + jnp.where(eq_best, hl - hk + 1, 0)
        top2b = hit & ~eq_best & (st["best_cnt"][:] > max_top2)
        done = done | top2b
        hit = hit & ~top2b
        al0, al1, al2 = st["al0"][:], st["al1"][:], st["al2"][:]
        n_aln = st["n_aln"][:]
        slots_used = iota0(A_MAX) < n_aln
        dup = jnp.sum(i32((al1 == hk) & (al2 == hl) & slots_used),
                      axis=0, keepdims=True) > 0
        do_add = hit & ~((hgo > 0) & dup)
        # gap_shadow on the hit strand's width planes (bwtgap.c:81-91)
        x = hl - hk + 1
        ha0 = ha == 0
        ww_a = jnp.where(ha0, ww0, ww1)
        wb_a = jnp.where(ha0, wb0, wb1)
        in_rng = (iota0(LW) < hldp) & do_add
        eqx = (ww_a == x) & in_rng
        # inclusive cumsum along positions: log-step sublane roll
        jcum = i32(eqx)
        srow = iota0(LW)
        sshift = 1
        while sshift < LW and "noshadow" not in ablate:
            jcum = jcum + jnp.where(srow < sshift, 0,
                                    pltpu.roll(jcum, sshift, 0))
            sshift <<= 1
        ww_new = jnp.where(in_rng & (ww_a > x), ww_a - x,
                           jnp.where(eqx, n - jcum, ww_a))
        wb_new = jnp.where(eqx, 1, wb_a)
        upd0 = do_add & ha0
        upd1 = do_add & ~ha0
        ww0 = jnp.where(upd0, ww_new, ww0)
        wb0 = jnp.where(upd0, wb_new, wb0)
        ww1 = jnp.where(upd1, ww_new, ww1)
        wb1 = jnp.where(upd1, wb_new, wb1)
        aslot = jnp.clip(n_aln, 0, A_MAX - 1)
        add_m = do_add & (n_aln < A_MAX)
        overflow = (st["overflow"][:] != 0) | (do_add & (n_aln >= A_MAX))
        al0 = oh_set(al0, aslot,
                     hmm | (hgo << 6) | (hge << 12) | (ha << 18)
                     | (score << 19), add_m)
        al1 = oh_set(al1, aslot, hk, add_m)
        al2 = oh_set(al2, aslot, hl, add_m)
        n_aln = n_aln + i32(add_m)

        # ---- expansion gates (bwtgap.c:150-214) ----
        occ_w = l - k + 1
        allow_diff = ~((i2 > 0) & (wb_i2m1 > m - 1))
        allow_m = ~((i2 > 0) & (wb_i2m1 == m - 1) & (wb_i2 == m - 1)
                    & (ww_i2m1 == ww_i2))
        msd = max_seed_diff - (n_mm + n_gapo) - n_gape
        ii = i2 - (lens - seed_len)
        sww_sel = jnp.where(a0, sww0, sww1)
        swb_sel = jnp.where(a0, swb0, swb1)
        m_iim1 = iota0(SLW) == jnp.clip(ii - 1, 0, seed_len)
        m_ii = iota0(SLW) == jnp.clip(ii, 0, seed_len)
        sw_iim1_w = jnp.sum(jnp.where(m_iim1, sww_sel, 0), axis=0,
                            keepdims=True)
        sw_iim1_b = jnp.sum(jnp.where(m_iim1, swb_sel, 0), axis=0,
                            keepdims=True)
        sw_ii_w = jnp.sum(jnp.where(m_ii, sww_sel, 0), axis=0,
                          keepdims=True)
        sw_ii_b = jnp.sum(jnp.where(m_ii, swb_sel, 0), axis=0,
                          keepdims=True)
        seed_on = use_seed & (i2 > 0) & (ii > 0)
        allow_diff = allow_diff & ~(seed_on & (sw_iim1_b > msd - 1))
        allow_m = allow_m & ~(seed_on & (sw_iim1_b == msd - 1)
                              & (sw_ii_b == msd - 1)
                              & (sw_iim1_w == sw_ii_w))

        tmp = n_gapo + n_gape
        indel_ok = (expand & allow_diff & (i2 >= indel_end_skip + tmp)
                    & (lens - i2 >= indel_end_skip + tmp))
        ins_open = indel_ok & (state == STATE_M) & (n_gapo < max_gapo)
        ins_ext = indel_ok & (state == STATE_I) & (n_gape < max_gape)
        del_open = ins_open
        del_ext = (indel_ok & (state == STATE_D) & (n_gape < max_gape)
                   & ((n_gapo + n_gape < max_diff) | (occ_w < max_del_occ)))
        allow_mm = expand & allow_diff & allow_m

        # children in C push order: ins, del j=0..3, mm j=1..4
        KJ4 = [L2row[c] + cnt_k4[c:c + 1] + 1 for c in range(4)]
        LJ4 = [L2row[c] + cnt_l4[c:c + 1] for c in range(4)]
        cvalid, cscore, c_k, c_l, c_ai, c_diff = [], [], [], [], [], []

        def child(mask, pa, pi, pk_, pl2, pmm, pgo, pge, pst, pldp):
            sc = _aln_score(pmm, pgo, pge, s_mm, s_gapo, s_gape)
            cvalid.append(mask)
            cscore.append(sc)
            c_k.append(pk_)
            c_l.append(pl2)
            c_ai.append((pst << 14) | (pa << 13) | pi)
            c_diff.append(pmm | (pgo << 6) | (pge << 12) | (pldp << 18))

        zero = jnp.zeros((1, B), jnp.int32)
        child(ins_open | ins_ext, a, i2, k, l, n_mm,
              n_gapo + i32(ins_open), n_gape + i32(ins_ext),
              zero + STATE_I, i2)
        for j in range(4):
            child((del_open | del_ext) & (KJ4[j] <= LJ4[j]), a, i2 + 1,
                  KJ4[j], LJ4[j], n_mm, n_gapo + i32(del_open),
                  n_gape + i32(del_ext), zero + STATE_D, i2 + 1)
        for j in range(1, 5):
            if j == 4:
                mask_j = allow_mm | (expand & ~(allow_diff & allow_m)
                                     & (si < 4))
                is_mm_v = allow_mm & (si > 3)
            else:
                mask_j = allow_mm
                is_mm_v = jnp.ones((1, B), bool)
            cj = (si + j) & 3
            kj = jnp.zeros_like(k)
            lj = jnp.zeros_like(k)
            for c in range(4):
                is_c = cj == c
                kj = jnp.where(is_c, KJ4[c], kj)
                lj = jnp.where(is_c, LJ4[c], lj)
            child(mask_j & (kj <= lj), a, i2, kj, lj,
                  n_mm + i32(mask_j & is_mm_v), n_gapo, n_gape,
                  zero + STATE_M, jnp.where(is_mm_v, i2, ldp))

        # bucket-range / pool-capacity guards -> exact fallback
        total = jnp.zeros((1, B), jnp.int32)
        bad_score = jnp.zeros((1, B), bool)
        for c in range(NCH):
            total = total + i32(cvalid[c])
            bad_score = bad_score | (cvalid[c] & (cscore[c] >= NBUCK))
        no_room = total > free_top
        ovf = (bad_score | no_room) & expand
        overflow = overflow | ovf
        done = done | ovf
        cvalid = [v & ~ovf for v in cvalid]
        total = jnp.where(ovf, 0, total)

        # allocate slots: rank among valid children (1-based)
        slots = []
        rank = jnp.zeros((1, B), jnp.int32)
        for c in range(NCH):
            rank = rank + i32(cvalid[c])
            fidx = jnp.clip(free_top - rank, 0, NP - 1)
            slots.append(fidx if "nopush" in ablate
                         else oh_get(freelist, fidx))
        free_top = free_top - total
        n_entries = n_entries + total

        # next pointers: most recent earlier same-bucket child, else the
        # (post-pop) bucket head; heads -> last same-bucket child (LIFO)
        sc_clip = [jnp.clip(s, 0, NBUCK - 1) for s in cscore]
        nexts = []
        for ci_ in range(NCH):
            nx = oh_get(heads, sc_clip[ci_])
            for j in range(ci_):
                same = cvalid[j] & (cscore[j] == cscore[ci_])
                nx = jnp.where(same, slots[j], nx)
            nexts.append(nx)
        is_last = []
        for ci_ in range(NCH):
            later = jnp.zeros((1, B), bool)
            for j in range(ci_ + 1, NCH):
                later = later | (cvalid[j] & (cscore[j] == cscore[ci_]))
            is_last.append(cvalid[ci_] & ~later)

        iota_np_ = iota0(NP)
        iota_nb = iota0(NBUCK)
        for c in range(NCH) if "nopush" not in ablate else ():
            next_f = jnp.where(nexts[c] < 0, NP, nexts[c])
            cai_w = c_ai[c] | (next_f << 16)
            m_c = (iota_np_ == slots[c]) & cvalid[c]
            pk = jnp.where(m_c, c_k[c], pk)
            pl_ = jnp.where(m_c, c_l[c], pl_)
            pai = jnp.where(m_c, cai_w, pai)
            pdiff = jnp.where(m_c, c_diff[c], pdiff)
            hb = (iota_nb == sc_clip[c]) & is_last[c]
            heads = jnp.where(hb, slots[c], heads)

        # per-lane step cap -> exact fallback
        steps = st["steps"][:] + i32(~done)
        capped = ~done & (steps > step_cap)
        overflow = overflow | capped
        done = done | capped

        st["pk"][:] = pk
        st["pl"][:] = pl_
        st["pai"][:] = pai
        st["pdiff"][:] = pdiff
        st["heads"][:] = heads
        st["freelist"][:] = freelist
        st["free_top"][:] = free_top
        st["n_entries"][:] = n_entries
        st["best_score"][:] = best_score
        st["best_cnt"][:] = best_cnt
        st["n_aln"][:] = n_aln
        st["al0"][:] = al0
        st["al1"][:] = al1
        st["al2"][:] = al2
        st["ww0"][:] = ww0
        st["wb0"][:] = wb0
        st["ww1"][:] = ww1
        st["wb1"][:] = wb1
        st["max_diff"][:] = max_diff
        st["ch_on"][:] = i32(ch_on)
        st["ch"][:] = ch
        st["done"][:] = i32(done)
        st["overflow"][:] = i32(overflow)
        st["steps"][:] = steps
        return 0

    jax.lax.fori_loop(0, K_INNER, body, 0)


def _pad_to(x, rows):
    pad = rows - x.shape[0]
    if pad <= 0:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("B", "NP", "K_INNER", "L", "LW", "SLW", "NBP", "n",
                     "s_mm", "s_gapo", "s_gape", "max_gapo", "max_gape",
                     "indel_end_skip", "max_del_occ", "max_entries",
                     "max_top2", "seed_len", "max_seed_diff", "step_cap",
                     "ablate", "interpret"))
def _scan_call(tab, params, ro, mut, *, B, NP, K_INNER, L, LW, SLW, NBP,
               n, s_mm, s_gapo, s_gape, max_gapo, max_gape,
               indel_end_skip, max_del_occ, max_entries, max_top2,
               seed_len, max_seed_diff, step_cap, ablate, interpret):
    ro_args = [ro[k] for k in READONLY]
    mut_args = [mut[k] for k in MUTABLE]
    out_shapes = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in mut_args]
    n_in_ro = 2 + len(READONLY)
    aliases = {n_in_ro + i: i for i in range(len(MUTABLE))}
    kern = functools.partial(
        _kernel, B=B, NP=NP, K_INNER=K_INNER, L=L, LW=LW, SLW=SLW,
        NBP=NBP, n=n, s_mm=s_mm, s_gapo=s_gapo, s_gape=s_gape,
        max_gapo=max_gapo, max_gape=max_gape,
        indel_end_skip=indel_end_skip, max_del_occ=max_del_occ,
        max_entries=max_entries, max_top2=max_top2, seed_len=seed_len,
        max_seed_diff=max_seed_diff, step_cap=step_cap,
        ablate=ablate)
    outs = pl.pallas_call(
        kern,
        out_shape=tuple(out_shapes),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(READONLY)
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(MUTABLE),
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in MUTABLE),
        scratch_shapes=[pltpu.VMEM((2 * B, tab.shape[1]), jnp.int32),
                        pltpu.VMEM((1, 2 * B), jnp.int32),
                        pltpu.SMEM((1, 2 * B), jnp.int32),
                        pltpu.SemaphoreType.DMA(())],
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(params, tab, *ro_args, *mut_args)
    return dict(zip(MUTABLE, outs))


def inner_scan_pallas(lane, tab, L2, primary, *, NP, K_INNER, L, NBP, n,
                      s_mm, s_gapo, s_gape, max_gapo, max_gape,
                      indel_end_skip, max_del_occ, max_entries, max_top2,
                      seed_len, max_seed_diff, step_cap, ablate=()):
    """Drop-in replacement for lax.scan(inner_step, lane, None, K_INNER).

    lane: the B-major state dict of batch_search._search_kernel.  Returns
    the updated dict (read-only fields passed through unchanged).
    """
    B = lane["lens"].shape[0]
    assert B % 128 == 0, "pallas search path needs lanes % 128 == 0"
    LW = -(-(L + 1) // 8) * 8
    SLW = -(-(seed_len + 1) // 8) * 8

    def t2(x):  # (B,) scalar -> (1, B)
        return x.astype(jnp.int32).reshape(1, B)

    ro = {
        "seqs2l": jnp.transpose(lane["seqs"], (1, 2, 0)).reshape(2 * L, B),
        "lens": t2(lane["lens"]), "md0": t2(lane["md0"]),
        "use_seed": t2(lane["use_seed"]),
        "sww0": _pad_to(lane["sw0"][:, :, 0].T, SLW),
        "swb0": _pad_to(lane["sw0"][:, :, 1].T, SLW),
        "sww1": _pad_to(lane["sw1"][:, :, 0].T, SLW),
        "swb1": _pad_to(lane["sw1"][:, :, 1].T, SLW),
    }
    mut = {}
    for key in MUTABLE:
        v = lane[key]
        if key in ("ww0", "wb0", "ww1", "wb1"):
            mut[key] = _pad_to(v.T, LW)
        elif v.ndim == 1:
            mut[key] = t2(v)
        else:  # (B, W) planes incl. ch/al
            mut[key] = v.T.astype(jnp.int32)
    params = jnp.concatenate(
        [primary.astype(jnp.int32).reshape(-1),
         L2.astype(jnp.int32).reshape(-1)])
    interpret = jax.default_backend() == "cpu"
    out = _scan_call(
        tab, params, ro, mut, B=B, NP=NP, K_INNER=K_INNER, L=L, LW=LW,
        SLW=SLW, NBP=NBP,
        n=n, s_mm=s_mm, s_gapo=s_gapo, s_gape=s_gape, max_gapo=max_gapo,
        max_gape=max_gape, indel_end_skip=indel_end_skip,
        max_del_occ=max_del_occ, max_entries=max_entries,
        max_top2=max_top2, seed_len=seed_len,
        max_seed_diff=max_seed_diff, step_cap=step_cap,
        ablate=ablate, interpret=interpret)
    new = dict(lane)
    for key in MUTABLE:
        v = out[key]
        if key in ("ww0", "wb0", "ww1", "wb1"):
            new[key] = v[:L + 1].T
        elif lane[key].ndim == 1:
            r = v.reshape(B)
            new[key] = (r != 0) if key in BOOLS else r
        else:
            new[key] = v.T
    return new
