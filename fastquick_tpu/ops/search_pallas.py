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
The v1 scan kernel below supports CH_STEPS == 1 only; the v2 RESIDENT
kernel (the product default) supports chain>1 as well.
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

# fallback-cause bits (must match batch_search.FB_*)
FB_POOL, FB_SCORE, FB_AMAX, FB_STEPCAP, FB_NOFLUSH = 1, 2, 4, 8, 16

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
    """Pack occ checkpoints + bwt words into one int32 table of TWO
    logical rows per 128-lane physical row.

    A logical row is 64 lanes: [occ c0..c3 | words w0..w7 | cum c8 |
    pad] where cum int32 j packs the 4 per-char base counts of words
    [0, j) of the block as bytes (<= 112 each) -- the kernel popcounts
    only the single boundary word.  Mosaic lane-pads the minor dim to
    128, so a 24-wide row would waste 5.3x VMEM; pairing consecutive
    logical rows (phys = idx >> 1, lane offset (idx & 1) * 64) halves
    the resident footprint -- at the production 6.5 Mbp panel the
    unpaired layout pushed the resident kernel 553 KB past the scoped
    VMEM limit.  Logical row index = sel * nbp + block (nbp is a
    multiple of 8, so pairs never straddle the strand boundary).
    Returns (table (nbp, 128), nbp).
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
    flat = np.concatenate(rows, axis=0)  # (2*nbp, width) logical rows
    wide = np.zeros((nbp, 128), dtype=np.int32)
    wide[:, :width] = flat[0::2]
    wide[:, 64:64 + width] = flat[1::2]
    return wide, nbp


def _aln_score(mm, go, ge, s_mm, s_gapo, s_gape):
    return mm * s_mm + go * s_gapo + ge * s_gape


def _lanepad(w: int) -> int:
    return -(-w // 128) * 128


def resident_vmem_bytes(B: int, NP: int, L: int, SL: int, tabw: int,
                        nbp: int) -> int:
    """Estimated VMEM footprint of the resident kernel (scratch + the
    lane-padded FM table).  Mosaic pads every minor dim to 128 lanes;
    the (W, B) planes have B % 128 == 0 already.  Used to gate
    use_pallas so an oversized chunk/index falls back to the XLA path
    instead of failing the Mosaic compile at runtime."""
    LW = -(-(L + 1) // 8) * 8
    SLW = -(-(SL + 1) // 8) * 8
    CSUB = consts_layout(L, SL)["CSUB"]
    # 4 pool planes + bitmap + one-NP compiler slack
    rows = (5 * NP + NP // 32 + NBUCK + SCALROWS + 2 * 8 + 3 * A_MAX
            + 4 * LW + 2 * L + 4 * SLW)
    scratch = rows * B * 4
    scratch += B * 8 * CSUB * 4          # consts_v
    scratch += B * 8 * OSUB * 4          # outp
    scratch += 2 * B * _lanepad(tabw) * 4  # gth
    scratch += _lanepad(2 * B) * 4 + B * _lanepad(4) * 4  # idxv + stage_v
    # paired table: two logical rows per 128-lane physical row
    tab = nbp * 128 * 4
    return scratch + tab


# mutable state planes, kernel argument order (transposed layouts)
MUTABLE = ("pk", "pl", "pai", "pdiff", "heads", "freelist",
           "free_top", "n_entries", "best_score", "best_cnt", "n_aln",
           "al0", "al1", "al2", "ww0", "wb0", "ww1", "wb1",
           "max_diff", "ch_on", "ch", "done", "overflow", "steps")
READONLY = ("seqs2l", "lens", "md0", "use_seed",
            "sww0", "swb0", "sww1", "swb1")
BOOLS = {"ch_on", "done", "use_seed"}  # overflow stays int (cause bits)


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
        # corrupt strand bit would otherwise fault the chip).  The
        # table pairs two logical rows per physical 128-lane row
        # (pack_fm_table): phys = idx >> 1, lane offset (idx & 1) * 64
        lrow = jnp.clip(ss * NBP + blk, 0, 2 * NBP - 1)
        l_odd = (lrow & 1) == 1
        idxv[:] = lrow >> 1
        if "nogather" not in ablate:  # profiling only: results wrong
            cp = pltpu.make_async_copy(idxv, idxs, sem)
            cp.start()
            cp.wait()

            def gbody(b, _):
                r = idxs[0, b]
                gth[pl.ds(b, 1), :] = tab[pl.ds(r, 1), :]
                return 0

            jax.lax.fori_loop(0, 2 * B, gbody, 0)
        gt = gth[:].T  # (128, 2B)

        def gl(i):  # logical-row element i per lane (paired layout)
            return jnp.where(l_odd, gt[64 + i:65 + i], gt[i:i + 1])
        # in-block prefix counts (__occ_aux popcount, libbwa/bwt.h:89-96)
        cnts = [jnp.zeros((1, 2 * B), jnp.int32) for _ in range(4)]
        if "norank" not in ablate:
            # fat rows carry per-word cumulative counts: select the
            # boundary word + its cum bytes, popcount ONE masked word
            widx = rem >> 4
            rem16 = rem & 15
            w_sel = jnp.zeros((1, 2 * B), jnp.int32)
            cum_sel = jnp.zeros((1, 2 * B), jnp.int32)
            for w in range(8):
                is_w = widx == w
                w_sel = jnp.where(is_w, gl(4 + w), w_sel)
                cum_sel = jnp.where(is_w, gl(12 + w), cum_sel)
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
        occr = jnp.concatenate(
            [gl(c) + cnts[c] for c in range(4)], axis=0)
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
        # gap_shadow on the hit strand's width planes (bwtgap.c:81-91).
        # 'noshadow' zeroes the whole update (matching the XLA path's
        # ablation semantics, not just the cumsum).
        do_add_sh = (jnp.zeros_like(do_add) if "noshadow" in ablate
                     else do_add)
        x = hl - hk + 1
        ha0 = ha == 0
        ww_a = jnp.where(ha0, ww0, ww1)
        wb_a = jnp.where(ha0, wb0, wb1)
        in_rng = (iota0(LW) < hldp) & do_add_sh
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
        upd0 = do_add_sh & ha0
        upd1 = do_add_sh & ~ha0
        ww0 = jnp.where(upd0, ww_new, ww0)
        wb0 = jnp.where(upd0, wb_new, wb0)
        ww1 = jnp.where(upd1, ww_new, ww1)
        wb1 = jnp.where(upd1, wb_new, wb1)
        aslot = jnp.clip(n_aln, 0, A_MAX - 1)
        add_m = do_add & (n_aln < A_MAX)
        overflow = st["overflow"][:] | jnp.where(
            do_add & (n_aln >= A_MAX), FB_AMAX, 0)
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
        overflow = (overflow | jnp.where(bad_score & expand, FB_SCORE, 0)
                    | jnp.where(no_room & expand, FB_POOL, 0))
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
        overflow = overflow | jnp.where(capped, FB_STEPCAP, 0)
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




# ======================================================================
# v2: RESIDENT kernel -- the whole chunk in ONE pallas_call.
#
# The v1 scan kernel still returns to XLA every K_INNER iterations for
# lane flush/refill; the measured residual wall is exactly that boundary
# (per-call transposes + state copies + the XLA outer round's ~40-op
# fusion ramp), while the kernel itself costs ~43us/iter
# (tools/bench_pallas_kernel.py).  The resident kernel keeps the state
# in VMEM for the ENTIRE chunk and does flush/refill in-kernel:
#
# - per-read constants (seq codes, bwt_cal_width planes, seed widths,
#   len/maxdiff meta) are packed XLA-side into ONE HBM row of 8
#   sub-rows per read; a lane refill is a single dynamic-row DMA
#   (Mosaic DMA slices may only cut the untiled major dim, hence the
#   3-D (N, 8, CSUB) shape), then vectorized masked transposes bridge
#   into the row-major compute layout;
# - per-read outputs (hit rows + n_aln/overflow meta) transpose into a
#   lane-major (B, 8, OSUB) plane at flush; a flush is a single
#   dynamic-row DMA to HBM (rows are pre-seeded overflow=1, so a
#   pathological never-flushed read falls back to the exact host engine
#   instead of dropping hits);
# - the per-iteration body is the SAME row-major discipline as the v1
#   scan kernel (the lane-major variant measured ~5x slower: cross-lane
#   reduces and lane-dim rolls lower poorly); per-lane scalars live as
#   rows of one (SCALROWS, B) plane;
# - a lax.while_loop with scalar carry runs RF iterations per flush
#   round until every read is consumed (CAP bounds a runaway).
#
# Differential: tests/test_search_pallas.py drives this path against
# the XLA scan and the host oracle (read-to-lane assignment order is
# identical, so results are bit-identical, not just equivalent).
# ======================================================================

# scal plane rows (per-lane scalars, row-major (SCALROWS, B))
(R_READIDX, R_LENS, R_MD0, R_USESEED, R_FREETOP, R_NENT, R_BEST,
 R_BCNT, R_NALN, R_MAXD, R_CHON, R_DONE, R_OVF, R_STEPS) = range(14)
SCALROWS = 16


def consts_layout(L: int, SL: int):
    """Per-read constants as 8 sub-rows of CSUB lanes (one (1, 8, CSUB)
    DMA block per lane refill).

    sub 0/1: seq codes strand0/strand1 [0, L)
    sub 2..5: ww0 | wb0 | ww1 | wb1  [0, L+1)
    sub 6: s0w | s0b | s1w | s1b (SL+1 each) then meta 8
           meta = [len, md, use_seed, dead, 0...]
    """
    LWL = -(-(L + 1) // 128) * 128
    CSUB = max(LWL, -(-(4 * (SL + 1) + 8) // 128) * 128)
    return {"CSUB": CSUB,
            "s0w": 0, "s0b": SL + 1, "s1w": 2 * (SL + 1),
            "s1b": 3 * (SL + 1), "meta": 4 * (SL + 1)}


# outp: (B, 8, OSUB): sub0..2 = al0..al2, sub3 = meta.  OSUB is one full
# 128-lane tile: Mosaic DMA slices must cover whole tiles in the lane dim
OSUB = 128


def _resident_kernel(params, tab, consts, out_seed,
                     out_hbm, stats,
                     pk_r, pl_r, pai_r, pdiff_r, heads_r, fbm_r,
                     scal_r, ch_r, al0_r, al1_r, al2_r,
                     ww0_r, wb0_r, ww1_r, wb1_r,
                     seqs2l, sww0_r, swb0_r, sww1_r, swb1_r,
                     consts_v, outp,
                     gth, idxv, idxs, stage_v, stage_s,
                     sem_g, sem_f, sem_r, sem_s,
                     *, B, NP, RF, CAP, CH, L, LW, SLW, SL, NBP, N, n,
                     s_mm, s_gapo, s_gape, max_gapo, max_gape,
                     indel_end_skip, max_del_occ, max_entries, max_top2,
                     seed_len, max_seed_diff, step_cap, ablate=()):
    CL = consts_layout(L, SL)
    NW = NP // 32  # free-slot bitmap words per lane

    def iota0(w, lanes=B):
        return jax.lax.broadcasted_iota(jnp.int32, (w, lanes), 0)

    def oh_get(plane, col):
        w = plane.shape[0]
        return jnp.sum(jnp.where(iota0(w) == col, plane, 0), axis=0,
                       keepdims=True)

    def oh_set(plane, col, val, mask):
        w = plane.shape[0]
        return jnp.where((iota0(w) == col) & mask, val, plane)

    def lsr(x, s):
        return jax.lax.shift_right_logical(x, jnp.full_like(x, s))

    def i32(b):
        return b.astype(jnp.int32)

    def cumsum_lanes(x):
        """Inclusive prefix sum along lanes of (1, B)."""
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
        acc = x
        s = 1
        while s < B:
            acc = acc + jnp.where(lane < s, 0, pltpu.roll(acc, s, 1))
            s <<= 1
        return acc

    def srow(r):
        return scal_r[r:r + 1, :]

    P0, P1 = params[0], params[1]
    L2F = [params[2 + c] for c in range(4)]
    L2R = [params[6 + c] for c in range(4)]

    # ---- init: all lanes idle-done; refill initializes the rest ----
    scal_r[:] = jnp.zeros((SCALROWS, B), jnp.int32)
    scal_r[R_DONE:R_DONE + 1, :] = jnp.ones((1, B), jnp.int32)
    scal_r[R_READIDX:R_READIDX + 1, :] = jnp.full((1, B), -1, jnp.int32)
    heads_r[:] = jnp.full((NBUCK, B), -1, jnp.int32)
    ch_r[:] = jnp.zeros((8, B), jnp.int32)

    def iter_body(_t, _c):
        done = srow(R_DONE) != 0
        heads = heads_r[:]
        pk, pl_, pai, pdiff = pk_r[:], pl_r[:], pai_r[:], pdiff_r[:]
        fbm = fbm_r[:]  # free-slot bitmap, (NW, B): bit set = slot free
        n_entries = srow(R_NENT)
        ch_on, ch = srow(R_CHON) != 0, ch_r[:]
        ww0, wb0 = ww0_r[:], wb0_r[:]
        ww1, wb1 = ww1_r[:], wb1_r[:]
        lens, md0, max_diff = srow(R_LENS), srow(R_MD0), srow(R_MAXD)
        use_seed = srow(R_USESEED) != 0
        seqs = seqs2l[:]
        sww0, swb0 = sww0_r[:], swb0_r[:]
        sww1, swb1 = sww1_r[:], swb1_r[:]

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
        # free the popped slot's bitmap bit.  Slot IDENTITY is internal
        # (ids only thread the bucket linked lists), so any distinct-
        # free-slot allocator preserves results; the bitmap replaces the
        # old (NP, B) freelist plane and its ~11 full-pool one-hot
        # passes per iteration with (NP/32, B)-sized work.
        fbit = jax.lax.shift_left(jnp.ones((1, B), jnp.int32),
                                  slot_c & 31)
        fbm = jnp.where((iota0(NW) == (slot_c >> 5)) & can_pop,
                        fbm | fbit, fbm)
        n_entries = n_entries - i32(can_pop)

        a = (ai_w >> 13) & 1
        i = ai_w & 0x1FFF
        state = (ai_w >> 14) & 3
        n_mm, n_gapo, n_gape = d & 63, (d >> 6) & 63, (d >> 12) & 63
        ldp = d >> 18
        e_score = bucket

        stop = can_pop & (e_score > srow(R_BEST) + s_mm)
        done = done | stop
        alive = can_pop & ~stop
        m = max_diff - (n_mm + n_gapo) - n_gape
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

        def rank4(qk, ql, sel):
            """bwt_2occ4 via the packed VMEM table: per-lane occ counts
            of all 4 chars at qk-1 and ql on strand-select sel.  Returns
            (cnt_k4, cnt_l4, L2row): (4, B) counts + per-char L2 rows."""
            qq = jnp.concatenate([qk - 1, ql], axis=1)  # (1, 2B)
            ss = jnp.concatenate([sel, sel], axis=1)
            kk = qq + 1
            prim = jnp.where(ss == 0, P0, P1)
            kp = kk - i32(kk > prim)
            kp = jnp.clip(kp, 0, n)
            blk = kp >> 7
            rem = kp - (blk << 7)
            # paired table (pack_fm_table): phys = idx >> 1, lane
            # offset (idx & 1) * 64
            lrow = jnp.clip(ss * NBP + blk, 0, 2 * NBP - 1)
            l_odd = (lrow & 1) == 1
            idxv[:] = lrow >> 1
            if "nogather" not in ablate:  # profiling only: results wrong
                cp = pltpu.make_async_copy(idxv, idxs, sem_g)
                cp.start()
                cp.wait()

                def gbody(b0, _):
                    # 32-way unrolled: the loop overhead inside the
                    # resident kernel measured ~18us/iter at 2048 rows
                    # (0.98 -> 0.75s dispatch at unroll 8)
                    for u in range(32):
                        b = b0 * 32 + u
                        r = idxs[0, b]
                        gth[pl.ds(b, 1), :] = tab[pl.ds(r, 1), :]
                    return 0

                jax.lax.fori_loop(0, (2 * B) // 32, gbody, 0)
            gt = gth[:].T

            def gl(i):  # logical-row element i per lane
                return jnp.where(l_odd, gt[64 + i:65 + i], gt[i:i + 1])

            widx = rem >> 4
            rem16 = rem & 15
            w_sel = jnp.zeros((1, 2 * B), jnp.int32)
            cum_sel = jnp.zeros((1, 2 * B), jnp.int32)
            for w in range(8):
                is_w = widx == w
                w_sel = jnp.where(is_w, gl(4 + w), w_sel)
                cum_sel = jnp.where(is_w, gl(12 + w), cum_sel)
            sh = 32 - 2 * rem16
            mask_w = jnp.where(
                rem16 <= 0, 0,
                jax.lax.shift_left(jnp.full_like(sh, _FULL_I32),
                                   jnp.clip(sh, 0, 31)))
            cnts = []
            for c in range(4):
                xc = w_sel ^ _PAT_I32[c]
                y = xc | lsr(xc, 1)
                match = (~y) & _EVEN_I32 & mask_w
                cnts.append((lsr(cum_sel, 8 * c) & 255)
                            + jax.lax.population_count(match))
            occr = jnp.concatenate(
                [gl(c) + cnts[c] for c in range(4)], axis=0)
            L2r_ = [jnp.where(sel == 0, L2F[c], L2R[c]) for c in range(4)]
            return occr[:, :B], occr[:, B:], L2r_

        def exact_step(cnt_k4_, cnt_l4_, L2row_, cc):
            """One bwt_match_exact_alt interval update for char cc."""
            ccl = jnp.clip(cc, 0, 3)
            L2c = jnp.zeros_like(ccl)
            occk_c = jnp.zeros_like(ccl)
            occl_c = jnp.zeros_like(ccl)
            for c in range(4):
                is_c = ccl == c
                L2c = jnp.where(is_c, L2row_[c], L2c)
                occk_c = jnp.where(is_c, cnt_k4_[c:c + 1], occk_c)
                occl_c = jnp.where(is_c, cnt_l4_[c:c + 1], occl_c)
            return L2c + occk_c + 1, L2c + occl_c

        # ---- shared rank queries (bwt_2occ4 via packed table) ----
        ck_k = jnp.where(work_chain, ch[0:1], k)
        ck_l = jnp.where(work_chain, ch[1:2], l)
        cur_a = jnp.where(work_chain, ch[3:4], a)
        sel = 1 - cur_a
        cnt_k4, cnt_l4, L2row = rank4(ck_k, ck_l, sel)

        # ---- chain step (bwt_match_exact_alt) ----
        chainish = work_chain | start_chain
        ch_i = jnp.where(work_chain, ch[2:3], i)
        ci = jnp.clip(ch_i - 1, 0, L - 1)
        cc = oh_get(seqs, cur_a * L + ci)
        si = oh_get(seqs, a * L + jnp.clip(i2, 0, L - 1))
        nk, nl = exact_step(cnt_k4, cnt_l4, L2row, cc)
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
        # extra chain sub-steps: lanes still in the exact walk advance
        # CH-1 more bases this iteration, each costing ONE rank-gather
        # round -- the cheap part of this kernel (the pop/push one-hot
        # passes over the (NP, B) pool planes are the expensive part,
        # and chain lanes skip them entirely).  C runs the whole walk
        # inline within a single pop (bwt.c match_exact_alt), so
        # multi-stepping preserves C's per-lane order exactly.
        for _ in range(CH - 1):
            act = ch_cont
            # canonicalize the ch row slices through a masked select:
            # Mosaic keeps row-slice sublane offsets, and its
            # concatenate/relayout cannot mix offsets (observed compile
            # failure: "result/input offset mismatch on non-concat
            # dimension"); the where against an offset-0 operand
            # produces offset-0 values like the main pop path's
            s_k = jnp.where(act, ch[0:1], 1)
            s_l = jnp.where(act, ch[1:2], 0)
            s_i = jnp.where(act, ch[2:3], 1)
            s_a = jnp.where(act, ch[3:4], 0)
            s_sel = 1 - s_a
            s_k4, s_l4, s_L2 = rank4(s_k, s_l, s_sel)
            s_cc = oh_get(seqs, s_a * L + jnp.clip(s_i - 1, 0, L - 1))
            s_nk, s_nl = exact_step(s_k4, s_l4, s_L2, s_cc)
            s_dead = act & ((s_cc > 3) | (s_nk > s_nl))
            s_hit = act & ~s_dead & (s_i - 1 == 0)
            adv = act & ~s_dead
            # update rows 0..2 in place via broadcast select (axis-0
            # concatenate would again mix sublane offsets)
            row_i = iota0(8)
            newp = jnp.where(row_i == 0, s_nk,
                             jnp.where(row_i == 1, s_nl,
                                       jnp.where(row_i == 2, s_i - 1,
                                                 ch)))
            ch = jnp.where(adv & (row_i < 3), newp, ch)
            ch_hit = ch_hit | s_hit
            ch_cont = act & ~s_dead & ~s_hit
        ch_on = ch_cont

        # ---- hits ----
        hit = hit_i0 | ch_hit
        hk = jnp.where(ch_hit, ch[0:1], k)
        hl = jnp.where(ch_hit, ch[1:2], l)
        hmm = jnp.where(ch_hit, ch[4:5], n_mm)
        hgo = jnp.where(ch_hit, ch[5:6], n_gapo)
        hge = jnp.where(ch_hit, ch[6:7], n_gape)
        ha = jnp.where(ch_hit, ch[3:4], a)
        hldp = jnp.where(ch_hit, ch[7:8], ldp)
        score = _aln_score(hmm, hgo, hge, s_mm, s_gapo, s_gape)
        n_aln = srow(R_NALN)
        first_hit = hit & (n_aln == 0)
        best_score = jnp.where(first_hit, score, srow(R_BEST))
        max_diff = jnp.where(first_hit,
                             jnp.minimum(hmm + hgo + hge + 1, md0),
                             max_diff)
        eq_best = hit & (score == best_score)
        best_cnt = srow(R_BCNT) + jnp.where(eq_best, hl - hk + 1, 0)
        top2b = hit & ~eq_best & (srow(R_BCNT) > max_top2)
        done = done | top2b
        hit = hit & ~top2b
        al0, al1, al2 = al0_r[:], al1_r[:], al2_r[:]
        slots_used = iota0(A_MAX) < n_aln
        dup = jnp.sum(i32((al1 == hk) & (al2 == hl) & slots_used),
                      axis=0, keepdims=True) > 0
        do_add = hit & ~((hgo > 0) & dup)
        # gap_shadow on the hit strand's width planes (bwtgap.c:81-91)
        do_add_sh = (jnp.zeros_like(do_add) if "noshadow" in ablate
                     else do_add)  # ablation: profiling only
        x = hl - hk + 1
        ha0 = ha == 0
        ww_a = jnp.where(ha0, ww0, ww1)
        wb_a = jnp.where(ha0, wb0, wb1)
        in_rng = (iota0(LW) < hldp) & do_add_sh
        eqx = (ww_a == x) & in_rng
        jcum = i32(eqx)
        srow_i = iota0(LW)
        sshift = 1
        while sshift < LW and "noshadow" not in ablate:
            jcum = jcum + jnp.where(srow_i < sshift, 0,
                                    pltpu.roll(jcum, sshift, 0))
            sshift <<= 1
        ww_new = jnp.where(in_rng & (ww_a > x), ww_a - x,
                           jnp.where(eqx, n - jcum, ww_a))
        wb_new = jnp.where(eqx, 1, wb_a)
        upd0 = do_add_sh & ha0
        upd1 = do_add_sh & ~ha0
        ww0 = jnp.where(upd0, ww_new, ww0)
        wb0 = jnp.where(upd0, wb_new, wb0)
        ww1 = jnp.where(upd1, ww_new, ww1)
        wb1 = jnp.where(upd1, wb_new, wb1)
        aslot = jnp.clip(n_aln, 0, A_MAX - 1)
        add_m = do_add & (n_aln < A_MAX)
        overflow = srow(R_OVF) | jnp.where(
            do_add & (n_aln >= A_MAX), FB_AMAX, 0)
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

        total = jnp.zeros((1, B), jnp.int32)
        bad_score = jnp.zeros((1, B), bool)
        for c in range(NCH):
            total = total + i32(cvalid[c])
            bad_score = bad_score | (cvalid[c] & (cscore[c] >= NBUCK))
        # free-slot accounting from the bitmap: per-word popcounts +
        # an inclusive prefix over the NW sublane rows
        wcnt = jax.lax.population_count(fbm)  # (NW, B)
        winc = wcnt
        s = 1
        while s < NW:
            rolled = pltpu.roll(winc, s, 0)
            winc = winc + jnp.where(iota0(NW) < s, 0, rolled)
            s <<= 1
        wpre = winc - wcnt  # exclusive prefix
        free_total = jnp.max(winc, axis=0, keepdims=True)
        no_room = total > free_total
        ovf = (bad_score | no_room) & expand
        overflow = (overflow | jnp.where(bad_score & expand, FB_SCORE, 0)
                    | jnp.where(no_room & expand, FB_POOL, 0))
        done = done | ovf
        cvalid = [v & ~ovf for v in cvalid]
        total = jnp.where(ovf, 0, total)

        # allocate: child c takes the rank-th lowest free bit of the
        # (pre-allocation) bitmap -- ranks are distinct, so slots are
        # distinct; find the word by prefix bracket, then the k-th set
        # bit inside it by halving popcounts
        slots = []
        rank = jnp.zeros((1, B), jnp.int32)
        fbm0 = fbm  # ranks index the PRE-allocation bitmap: select from
        # it (clears accumulate into fbm) or later children double-skip
        for c in range(NCH):
            rank = rank + i32(cvalid[c])
            t = jnp.maximum(rank - 1, 0)
            hit = (wpre <= t) & (t < winc)  # (NW, B) one-hot row
            w_c = jnp.sum(jnp.where(hit, fbm0, 0), axis=0, keepdims=True)
            base_c = jnp.sum(jnp.where(hit, iota0(NW) * 32, 0), axis=0,
                             keepdims=True)
            k = t - jnp.sum(jnp.where(hit, wpre, 0), axis=0,
                            keepdims=True)
            pos = jnp.zeros((1, B), jnp.int32)
            cur = w_c
            for width in (16, 8, 4, 2, 1):
                low = cur & ((1 << width) - 1)
                clow = jax.lax.population_count(low)
                go_hi = k >= clow
                k = k - jnp.where(go_hi, clow, 0)
                pos = pos + jnp.where(go_hi, width, 0)
                cur = jnp.where(go_hi,
                                jax.lax.shift_right_logical(
                                    cur, jnp.full_like(cur, width)), low)
            slot = base_c + pos
            slots.append(slot)
            cb = jax.lax.shift_left(jnp.ones((1, B), jnp.int32), pos)
            fbm = jnp.where(hit & cvalid[c], fbm & ~cb, fbm)
        n_entries = n_entries + total

        sc_clip = [jnp.clip(s_, 0, NBUCK - 1) for s_ in cscore]
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

        steps = srow(R_STEPS) + i32(~done)
        capped = ~done & (steps > step_cap)
        overflow = overflow | jnp.where(capped, FB_STEPCAP, 0)
        done = done | capped

        pk_r[:] = pk
        pl_r[:] = pl_
        pai_r[:] = pai
        pdiff_r[:] = pdiff
        heads_r[:] = heads
        fbm_r[:] = fbm
        ch_r[:] = ch
        al0_r[:] = al0
        al1_r[:] = al1
        al2_r[:] = al2
        ww0_r[:] = ww0
        wb0_r[:] = wb0
        ww1_r[:] = ww1
        wb1_r[:] = wb1
        scal_r[R_NENT:R_NENT + 1, :] = n_entries
        scal_r[R_BEST:R_BEST + 1, :] = best_score
        scal_r[R_BCNT:R_BCNT + 1, :] = best_cnt
        scal_r[R_NALN:R_NALN + 1, :] = n_aln
        scal_r[R_MAXD:R_MAXD + 1, :] = max_diff
        scal_r[R_CHON:R_CHON + 1, :] = i32(ch_on)
        scal_r[R_DONE:R_DONE + 1, :] = i32(done)
        scal_r[R_OVF:R_OVF + 1, :] = i32(overflow)
        scal_r[R_STEPS:R_STEPS + 1, :] = steps
        return 0

    def flush_round(next_read, busy):
        done = srow(R_DONE) != 0
        ridx = srow(R_READIDX)
        flush = done & (ridx >= 0)
        steps_row = srow(R_STEPS)
        busy = busy + jnp.sum(jnp.where(flush, steps_row, 0))
        # lane-major output rows for the flush DMAs: al planes + meta
        outp[:, 0, 0:A_MAX] = al0_r[:].T
        outp[:, 1, 0:A_MAX] = al1_r[:].T
        outp[:, 2, 0:A_MAX] = al2_r[:].T
        meta_rows = jnp.concatenate(
            [srow(R_NALN), srow(R_OVF), steps_row,
             jnp.zeros((1, B), jnp.int32)], axis=0)
        outp[:, 3, 0:4] = meta_rows.T
        # every done lane is refillable: lanes that just flushed AND
        # idle lanes (read_idx < 0, incl. the all-idle initial state)
        rank = cumsum_lanes(i32(done))
        new_idx = next_read + rank - 1
        refilled = done & (new_idx < N)
        n_ref = jnp.sum(i32(refilled))
        ridx_new = jnp.where(refilled, new_idx, jnp.where(done, -1, ridx))
        stage_rows = jnp.concatenate(
            [i32(flush), jnp.clip(ridx, 0, N - 1), i32(refilled),
             jnp.clip(new_idx, 0, N - 1)], axis=0)
        stage_v[:] = stage_rows.T
        cps = pltpu.make_async_copy(stage_v, stage_s, sem_s)
        cps.start()
        cps.wait()

        def loop_start(b, _):
            @pl.when(stage_s[b, 0] == 1)
            def _():
                pltpu.make_async_copy(
                    outp.at[pl.ds(b, 1)],
                    out_hbm.at[pl.ds(stage_s[b, 1], 1)], sem_f).start()

            @pl.when(stage_s[b, 2] == 1)
            def _():
                pltpu.make_async_copy(
                    consts.at[pl.ds(stage_s[b, 3], 1)],
                    consts_v.at[pl.ds(b, 1)], sem_r).start()
            return 0

        jax.lax.fori_loop(0, B, loop_start, 0)

        # drain the outstanding copies (reconstructed descriptors; DMA
        # semaphores only accept paired waits, not counted ones)
        def loop_wait(b, _):
            @pl.when(stage_s[b, 0] == 1)
            def _():
                pltpu.make_async_copy(
                    outp.at[pl.ds(b, 1)],
                    out_hbm.at[pl.ds(stage_s[b, 1], 1)], sem_f).wait()

            @pl.when(stage_s[b, 2] == 1)
            def _():
                pltpu.make_async_copy(
                    consts.at[pl.ds(stage_s[b, 3], 1)],
                    consts_v.at[pl.ds(b, 1)], sem_r).wait()
            return 0

        jax.lax.fori_loop(0, B, loop_wait, 0)

        # bridge DMA'd lane-major consts into the row-major compute
        # layout: vectorized masked transposes (no per-lane loops)
        rf = refilled
        seqs2l[0:L, :] = jnp.where(rf, consts_v[:, 0, 0:L].T,
                                   seqs2l[0:L, :])
        seqs2l[L:2 * L, :] = jnp.where(rf, consts_v[:, 1, 0:L].T,
                                       seqs2l[L:2 * L, :])
        ww0_r[0:L + 1, :] = jnp.where(rf, consts_v[:, 2, 0:L + 1].T,
                                      ww0_r[0:L + 1, :])
        wb0_r[0:L + 1, :] = jnp.where(rf, consts_v[:, 3, 0:L + 1].T,
                                      wb0_r[0:L + 1, :])
        ww1_r[0:L + 1, :] = jnp.where(rf, consts_v[:, 4, 0:L + 1].T,
                                      ww1_r[0:L + 1, :])
        wb1_r[0:L + 1, :] = jnp.where(rf, consts_v[:, 5, 0:L + 1].T,
                                      wb1_r[0:L + 1, :])
        SL1 = SL + 1
        sww0_r[0:SL1, :] = jnp.where(
            rf, consts_v[:, 6, CL["s0w"]:CL["s0w"] + SL1].T,
            sww0_r[0:SL1, :])
        swb0_r[0:SL1, :] = jnp.where(
            rf, consts_v[:, 6, CL["s0b"]:CL["s0b"] + SL1].T,
            swb0_r[0:SL1, :])
        sww1_r[0:SL1, :] = jnp.where(
            rf, consts_v[:, 6, CL["s1w"]:CL["s1w"] + SL1].T,
            sww1_r[0:SL1, :])
        swb1_r[0:SL1, :] = jnp.where(
            rf, consts_v[:, 6, CL["s1b"]:CL["s1b"] + SL1].T,
            swb1_r[0:SL1, :])
        metaT = consts_v[:, 6, CL["meta"]:CL["meta"] + 8].T  # (8, B)
        lens_n = metaT[0:1]
        md_n = metaT[1:2]
        us_n = metaT[2:3]
        dead_n = metaT[3:4] != 0

        def upd(row, new):
            scal_r[row:row + 1, :] = jnp.where(rf, new,
                                               scal_r[row:row + 1, :])

        scal_r[R_READIDX:R_READIDX + 1, :] = ridx_new
        upd(R_LENS, lens_n)
        upd(R_MD0, md_n)
        upd(R_USESEED, us_n)
        upd(R_NENT, jnp.where(dead_n, 0, 2))
        upd(R_BEST, (md_n + 1) * s_mm + (max_gapo + 1) * s_gapo
            + (max_gape + 1) * s_gape)
        upd(R_BCNT, jnp.zeros((1, B), jnp.int32))
        upd(R_NALN, jnp.zeros((1, B), jnp.int32))
        upd(R_MAXD, md_n)
        upd(R_CHON, jnp.zeros((1, B), jnp.int32))
        upd(R_OVF, jnp.zeros((1, B), jnp.int32))
        upd(R_STEPS, jnp.zeros((1, B), jnp.int32))
        done_new = jnp.where(rf, i32(dead_n),
                             jnp.where(flush, 1, srow(R_DONE)))
        scal_r[R_DONE:R_DONE + 1, :] = done_new
        # pool/heads/freelist init (slot0/slot1 prefilled, bwtgap init)
        iota_np_ = iota0(NP)
        z0 = iota_np_ == 0
        z1 = iota_np_ == 1
        pk_r[:] = jnp.where(rf, 0, pk_r[:])
        pl_r[:] = jnp.where(rf & (z0 | z1), n, jnp.where(rf, 0, pl_r[:]))
        pai_r[:] = jnp.where(
            rf & z0, lens_n | (NP << 16),
            jnp.where(rf & z1, lens_n | (1 << 13),
                      jnp.where(rf, 0, pai_r[:])))
        pdiff_r[:] = jnp.where(rf, 0, pdiff_r[:])
        # bitmap reset: all slots free except the two seeded entries
        fbm_r[:] = jnp.where(
            rf, jnp.where(iota0(NW) == 0, jnp.int32(-4), jnp.int32(-1)),
            fbm_r[:])
        iota_nb = iota0(NBUCK)
        heads_r[:] = jnp.where(
            rf & (iota_nb == 0), jnp.where(dead_n, -1, 1),
            jnp.where(rf, -1, heads_r[:]))
        next2 = next_read + n_ref
        active = (jnp.sum(1 - done_new) > 0) | (next2 < N)
        return next2, busy, active

    def cond(carry):
        t, next_read, busy, active = carry
        return active & (t < CAP)

    def wbody(carry):
        t, next_read, busy, active = carry
        # flush FIRST: round 1 then assigns reads to the idle lanes with
        # no wasted iterations, and the exit path (active=False) is only
        # taken right after a flush that drained every done lane
        next_read, busy, active = flush_round(next_read, busy)
        jax.lax.fori_loop(0, RF, iter_body, 0)
        return t + 1, next_read, busy, active

    t0 = (jnp.int32(0), jnp.int32(0), jnp.int32(0),
          jnp.asarray(True))
    t, next_read, busy, active = jax.lax.while_loop(cond, wbody, t0)

    def sc(x):
        return jnp.full((1, 1), x, jnp.int32)

    stats[:] = jnp.concatenate(
        [sc(t), sc(t * RF), sc(busy), sc(next_read), sc(i32(active)),
         jnp.zeros((1, 3), jnp.int32)], axis=1)
    # out_hbm rows were written by flush DMAs; out_seed provides the
    # overflow=1 fallback seeding for any never-flushed row via aliasing
    del out_seed


def resident_search(fmtab, L2, primary, seqs_all, w0_all, seed_w_all,
                    n_n_all, lens_all, md_all, use_seed_all, *,
                    B, NP, RF, NBP, n, s_mm, s_gapo, s_gape, max_gapo,
                    max_gape, indel_end_skip, max_del_occ, max_entries,
                    max_top2, seed_len, max_seed_diff, step_cap, CH=1,
                    ablate=()):
    """One-pallas-call search over the whole chunk; returns the same
    (n_aln, alns, fallback, rounds, busy) tuple as the XLA while-loop in
    batch_search._search_kernel."""
    assert NP % 32 == 0, "resident pool size must pack the free bitmap"
    N, _, L = seqs_all.shape
    SL = seed_len
    CL = consts_layout(L, SL)
    CSUB = CL["CSUB"]
    LW = -(-(L + 1) // 8) * 8
    SLW = -(-(SL + 1) // 8) * 8
    valid = md_all >= 0
    lens = jnp.where(valid, lens_all, 0)
    md = jnp.where(valid, md_all, 0)
    dead = ~valid | (n_n_all > md) | (lens <= 0)
    meta = jnp.stack(
        [lens, md, use_seed_all.astype(jnp.int32), dead.astype(jnp.int32)]
        + [jnp.zeros(N, jnp.int32)] * 4, axis=1)  # (N, 8)
    sub6 = jnp.concatenate([
        seed_w_all[:, 0, :, 0], seed_w_all[:, 0, :, 1],
        seed_w_all[:, 1, :, 0], seed_w_all[:, 1, :, 1], meta], axis=1)
    consts = jnp.zeros((N, 8, CSUB), jnp.int32)
    consts = consts.at[:, 0, :L].set(seqs_all[:, 0].astype(jnp.int32))
    consts = consts.at[:, 1, :L].set(seqs_all[:, 1].astype(jnp.int32))
    consts = consts.at[:, 2, :L + 1].set(w0_all[:, 0, :, 0])
    consts = consts.at[:, 3, :L + 1].set(w0_all[:, 0, :, 1])
    consts = consts.at[:, 4, :L + 1].set(w0_all[:, 1, :, 0])
    consts = consts.at[:, 5, :L + 1].set(w0_all[:, 1, :, 1])
    consts = consts.at[:, 6, :sub6.shape[1]].set(sub6)
    out_seed = jnp.zeros((N, 8, OSUB), jnp.int32).at[:, 3, 1].set(
        FB_NOFLUSH)
    if "stopconsts" in ablate:
        # profiling only: everything up to (and incl.) the consts-plane
        # assembly, skipping the kernel (real deps prevent DCE)
        return (jnp.max(consts, axis=(1, 2)),
                jnp.zeros((N, A_MAX, 3), jnp.int32),
                jnp.zeros(N, jnp.int32), jnp.int32(0), jnp.int32(0))
    params = jnp.concatenate(
        [primary.astype(jnp.int32).reshape(-1),
         L2.astype(jnp.int32).reshape(-1)])
    TABW = fmtab.shape[1]
    CAP = 1 << 14
    kern = functools.partial(
        _resident_kernel, B=B, NP=NP, RF=RF, CAP=CAP, CH=CH, L=L, LW=LW,
        SLW=SLW, SL=SL, NBP=NBP, N=N, n=n, s_mm=s_mm, s_gapo=s_gapo,
        s_gape=s_gape, max_gapo=max_gapo, max_gape=max_gape,
        indel_end_skip=indel_end_skip, max_del_occ=max_del_occ,
        max_entries=max_entries, max_top2=max_top2, seed_len=seed_len,
        max_seed_diff=max_seed_diff, step_cap=step_cap, ablate=ablate)
    interpret = jax.default_backend() == "cpu"
    out, stats = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((N, 8, OSUB), jnp.int32),
                   jax.ShapeDtypeStruct((1, 8), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((NP, B), jnp.int32),       # pk
            pltpu.VMEM((NP, B), jnp.int32),       # pl
            pltpu.VMEM((NP, B), jnp.int32),       # pai
            pltpu.VMEM((NP, B), jnp.int32),       # pdiff
            pltpu.VMEM((NBUCK, B), jnp.int32),    # heads
            pltpu.VMEM((NP // 32, B), jnp.int32),  # free-slot bitmap
            pltpu.VMEM((SCALROWS, B), jnp.int32),  # scal
            pltpu.VMEM((8, B), jnp.int32),        # ch
            pltpu.VMEM((A_MAX, B), jnp.int32),    # al0
            pltpu.VMEM((A_MAX, B), jnp.int32),    # al1
            pltpu.VMEM((A_MAX, B), jnp.int32),    # al2
            pltpu.VMEM((LW, B), jnp.int32),       # ww0
            pltpu.VMEM((LW, B), jnp.int32),       # wb0
            pltpu.VMEM((LW, B), jnp.int32),       # ww1
            pltpu.VMEM((LW, B), jnp.int32),       # wb1
            pltpu.VMEM((2 * L, B), jnp.int32),    # seqs2l
            pltpu.VMEM((SLW, B), jnp.int32),      # sww0
            pltpu.VMEM((SLW, B), jnp.int32),      # swb0
            pltpu.VMEM((SLW, B), jnp.int32),      # sww1
            pltpu.VMEM((SLW, B), jnp.int32),      # swb1
            pltpu.VMEM((B, 8, CSUB), jnp.int32),  # consts_v
            pltpu.VMEM((B, 8, OSUB), jnp.int32),  # outp
            pltpu.VMEM((2 * B, TABW), jnp.int32),  # gth
            pltpu.VMEM((1, 2 * B), jnp.int32),    # idxv
            pltpu.SMEM((1, 2 * B), jnp.int32),    # idxs
            pltpu.VMEM((B, 4), jnp.int32),        # stage_v
            pltpu.SMEM((B, 4), jnp.int32),        # stage_s
            pltpu.SemaphoreType.DMA(()),           # sem_g
            pltpu.SemaphoreType.DMA(()),           # sem_f
            pltpu.SemaphoreType.DMA(()),           # sem_r
            pltpu.SemaphoreType.DMA(()),           # sem_s
        ],
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
            has_side_effects=True),
        interpret=interpret,
    )(params, fmtab, consts, out_seed)
    n_aln = out[:, 3, 0]
    fb = out[:, 3, 1]  # fallback-cause bits (0 = device result is final)
    alns = jnp.stack([out[:, 0, :A_MAX], out[:, 1, :A_MAX],
                      out[:, 2, :A_MAX]], axis=2)
    n_aln = jnp.where(fb != 0, 0, n_aln)
    rounds = stats[0, 0]  # flush rounds; caller's RF == its K_INNER
    busy = stats[0, 2]
    return n_aln, alns, fb, rounds, busy


# ======================================================================
# Width kernel: bwt_cal_width (libbwa/bwtaln.c:73-97) for the whole
# batch as ONE pallas_call.
#
# The XLA formulation (ops/fm.cal_width: a lax.scan of L backward_ext
# steps over all 2N read-strand units) measured 0.6s of the 2.4s
# 32k-read bench wall (r5 stage decomposition) -- each scan step pays
# two 131072-row XLA gathers.  Here the same walk runs over the packed
# VMEM-resident FM table with the scalar-loop row gather measured at
# ~5.6ns/row: units are processed in WB-lane batches; each iteration
# advances every lane one base (one 2*WB-row gather, the fat-table
# popcount rank, the backward_ext interval update and the
# restart/bucket-id bookkeeping of bwt_cal_width).
#
# Differential: tests/test_search_pallas.py pins the kernel's (w, bid)
# planes bit-identical to cal_width (interpret mode on CPU, compiled on
# the chip).
# ======================================================================


def _width_kernel(params, tab, blocks, w_hbm, bid_hbm,
                  seqs_v, w_v, bid_v, gth, idxv, idxs,
                  sem_in, sem_w, sem_b, sem_g,
                  *, WB, NBATCH, LIT, LK, LKP, NBP, n):
    def lsr(x, s):
        return jax.lax.shift_right_logical(x, jnp.full_like(x, s))

    def i32(b):
        return b.astype(jnp.int32)

    P0, P1 = params[0], params[1]
    L2F = [params[2 + c] for c in range(4)]
    L2R = [params[6 + c] for c in range(4)]

    def batch_body(nb, _):
        cp = pltpu.make_async_copy(blocks.at[nb], seqs_v, sem_in)
        cp.start()
        cp.wait()
        sel = seqs_v[LKP - 8:LKP - 7, :]  # (1, WB) strand select
        ss2 = jnp.concatenate([sel, sel], axis=1)
        prim = jnp.where(ss2 == 0, P0, P1)

        def step(i, carry):
            k, l, bid = carry
            c = seqs_v[pl.ds(i, 1), :]
            qq = jnp.concatenate([k - 1, l], axis=1)  # (1, 2WB)
            kk = qq + 1
            kp = kk - i32(kk > prim)
            kp = jnp.clip(kp, 0, n)
            blk = kp >> 7
            rem = kp - (blk << 7)
            # paired table: phys = idx >> 1, lane offset (idx & 1) * 64
            lrow = jnp.clip(ss2 * NBP + blk, 0, 2 * NBP - 1)
            l_odd = (lrow & 1) == 1
            idxv[:] = lrow >> 1
            cpg = pltpu.make_async_copy(idxv, idxs, sem_g)
            cpg.start()
            cpg.wait()

            def gbody(b0, _):
                for u in range(32):
                    b = b0 * 32 + u
                    r = idxs[0, b]
                    gth[pl.ds(b, 1), :] = tab[pl.ds(r, 1), :]
                return 0

            jax.lax.fori_loop(0, (2 * WB) // 32, gbody, 0)
            gt = gth[:].T

            def gl(i):  # logical-row element i per lane
                return jnp.where(l_odd, gt[64 + i:65 + i], gt[i:i + 1])

            widx = rem >> 4
            rem16 = rem & 15
            w_sel = jnp.zeros((1, 2 * WB), jnp.int32)
            cum_sel = jnp.zeros((1, 2 * WB), jnp.int32)
            for w in range(8):
                is_w = widx == w
                w_sel = jnp.where(is_w, gl(4 + w), w_sel)
                cum_sel = jnp.where(is_w, gl(12 + w), cum_sel)
            sh = 32 - 2 * rem16
            mask_w = jnp.where(
                rem16 <= 0, 0,
                jax.lax.shift_left(jnp.full_like(sh, _FULL_I32),
                                   jnp.clip(sh, 0, 31)))
            ccl = jnp.clip(c, 0, 3)
            occk_c = jnp.zeros((1, WB), jnp.int32)
            occl_c = jnp.zeros((1, WB), jnp.int32)
            L2c = jnp.zeros((1, WB), jnp.int32)
            for ch in range(4):
                xc = w_sel ^ _PAT_I32[ch]
                y = xc | lsr(xc, 1)
                match = (~y) & _EVEN_I32 & mask_w
                cnt = ((lsr(cum_sel, 8 * ch) & 255)
                       + jax.lax.population_count(match))
                occ2 = gl(ch) + cnt  # (1, 2WB)
                is_c = ccl == ch
                occk_c = jnp.where(is_c, occ2[:, :WB], occk_c)
                occl_c = jnp.where(is_c, occ2[:, WB:], occl_c)
                L2ch = jnp.where(sel == 0, L2F[ch], L2R[ch])
                L2c = jnp.where(is_c, L2ch, L2c)
            nk = L2c + occk_c + 1
            nl = L2c + occl_c
            valid = c < 4
            nk = jnp.where(valid, nk, k)
            nl = jnp.where(valid, nl, l)
            restart = (nk > nl) | ~valid
            bid = bid + i32(restart)
            nk = jnp.where(restart, 0, nk)
            nl = jnp.where(restart, jnp.full_like(nl, n), nl)
            w_v[pl.ds(i, 1), :] = nl - nk + 1
            bid_v[pl.ds(i, 1), :] = bid
            return nk, nl, bid

        z = jnp.zeros((1, WB), jnp.int32)
        jax.lax.fori_loop(0, LIT, step,
                          (z, jnp.full((1, WB), n, jnp.int32), z))
        cpw = pltpu.make_async_copy(w_v, w_hbm.at[nb], sem_w)
        cpw.start()
        cpb = pltpu.make_async_copy(bid_v, bid_hbm.at[nb], sem_b)
        cpb.start()
        cpw.wait()
        cpb.wait()
        return 0

    jax.lax.fori_loop(0, NBATCH, batch_body, 0)


def width_pallas(fmtab, L2, primary, seqs_units, sel_units, *, NBP, n,
                 WB=2048):
    """bwt_cal_width raw (w, bid) planes for (M, L) read-strand units.

    seqs_units: (M, L) int32 codes (0..4); sel_units: (M,) strand
    select.  Returns (w, bid): (M, L) int32 -- the per-position values
    BEFORE the terminal entry fix (ops/fm.width_finalize applies it)."""
    M, L = seqs_units.shape
    LIT = L
    LK = -(-LIT // 8) * 8
    LKP = LK + 8  # one spare sublane row bank: row LKP-8 carries sel
    Mpad = -(-M // WB) * WB
    NBATCH = Mpad // WB
    arr = jnp.zeros((Mpad, LIT), jnp.int32).at[:M].set(
        seqs_units.astype(jnp.int32))
    selp = jnp.zeros(Mpad, jnp.int32).at[:M].set(
        sel_units.astype(jnp.int32))
    blocks = jnp.zeros((NBATCH, LKP, WB), jnp.int32)
    blocks = blocks.at[:, :LIT, :].set(
        arr.reshape(NBATCH, WB, LIT).transpose(0, 2, 1))
    blocks = blocks.at[:, LKP - 8, :].set(selp.reshape(NBATCH, WB))
    params = jnp.concatenate(
        [primary.astype(jnp.int32).reshape(-1),
         L2.astype(jnp.int32).reshape(-1)])
    TABW = fmtab.shape[1]
    interpret = jax.default_backend() == "cpu"
    kern = functools.partial(
        _width_kernel, WB=WB, NBATCH=NBATCH, LIT=LIT, LK=LK, LKP=LKP,
        NBP=NBP, n=n)
    w_hbm, bid_hbm = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((NBATCH, LK, WB), jnp.int32),
                   jax.ShapeDtypeStruct((NBATCH, LK, WB), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[
            pltpu.VMEM((LKP, WB), jnp.int32),   # seqs_v
            pltpu.VMEM((LK, WB), jnp.int32),    # w_v
            pltpu.VMEM((LK, WB), jnp.int32),    # bid_v
            pltpu.VMEM((2 * WB, TABW), jnp.int32),  # gth
            pltpu.VMEM((1, 2 * WB), jnp.int32),  # idxv
            pltpu.SMEM((1, 2 * WB), jnp.int32),  # idxs
            pltpu.SemaphoreType.DMA(()),         # sem_in
            pltpu.SemaphoreType.DMA(()),         # sem_w
            pltpu.SemaphoreType.DMA(()),         # sem_b
            pltpu.SemaphoreType.DMA(()),         # sem_g
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
            has_side_effects=True),
        interpret=interpret,
    )(params, fmtab, blocks)
    w = w_hbm.transpose(0, 2, 1).reshape(Mpad, LK)[:M, :LIT]
    bid = bid_hbm.transpose(0, 2, 1).reshape(Mpad, LK)[:M, :LIT]
    return w, bid
