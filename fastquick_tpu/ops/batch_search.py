"""Batched inexact FM search: bwt_match_gap as a lockstep TPU state machine.

The reference's best-first search (libbwa/bwtgap.c:104-264) is a per-read
priority loop: pop the lowest-score entry (LIFO within equal score),
expand up to 9 children (gap open/extend, deletions, mismatches / exact),
record SA-interval hits with top2 cutoffs.  This module runs the SAME
discipline for a whole batch of reads in lockstep under one jitted
program, designed for throughput rather than as a correctness demo:

- Score-bucketed LIFO stacks exactly like C's gap_stack_t: per-lane
  bucket heads + intra-pool ``next`` pointers make pop/push O(1) per
  lane (the previous kernel ran an O(pool) argmin every step).
- The bwt_match_exact_alt inner walk (libbwa/bwt.c) runs in a per-lane
  *chain register* instead of queue entries: a lane in chain mode steps
  the exact walk one base per iteration with zero pool traffic.  C runs
  that walk inline within a single pop, so register order == C order.
- C's slot-persistence of ``last_diff_pos`` (gap_push only writes it on
  diff pushes, bwtgap.c:58-60) reduces exactly to inheritance: a no-diff
  child is the only same-bucket push of its parent's expansion, so it
  always reuses the slot its parent vacated and therefore sees the
  parent's value.  We inherit explicitly.
- Two-level loop with lane refill: an inner fixed-trip loop runs the
  cheap per-pop body; an outer while loop flushes finished lanes' hits
  to per-read output buffers and refills the lanes with fresh reads, so
  a batch stays dense even though per-read work varies by 100x.
- Forward/reverse indexes are stacked so the per-entry strand bit
  selects the index by gather (see ops/fm.py).

Reads that exceed the pool (NP live entries), the hit cap (A_MAX), the
bucket range or the per-lane step cap fall back to the exact native/host
engine, so results are always exact; the pools only bound the fast path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..align.core import Aln
from ..align.engine import HostEngine
from ..align.opts import GapOpt, bwa_cal_maxdiff
from ..index.builder import ReducedIndex
from .fm import DeviceFM, cal_width, occ4, occ4_pair

STATE_M, STATE_I, STATE_D = 0, 1, 2

# fallback-cause bits carried in the per-read overflow word (0 = no
# fallback; any nonzero routes the read to the exact native/host engine)
FB_POOL = 1       # pool capacity exceeded (free slots < children)
FB_SCORE = 2      # child score outside the NBUCK bucket range
FB_AMAX = 4       # more than A_MAX recorded hits
FB_STEPCAP = 8    # per-lane step cap hit
FB_NOFLUSH = 16   # resident kernel: lane never flushed (CAP rounds)
FB_LONG = 32      # read longer than MAX_READ_LEN (host-side gate)
FB_D2H = 64       # compacted hit buffer overflowed (K_CAP rows)
FB_NAMES = {FB_POOL: "pool", FB_SCORE: "score", FB_AMAX: "amax",
            FB_STEPCAP: "stepcap", FB_NOFLUSH: "noflush", FB_LONG: "long",
            FB_D2H: "d2h"}

A_MAX = 48  # max recorded hits per read
NBUCK = 128  # score buckets (init best_score + s_mm + s_gapo < 128 always)
# pool entry = 4 int32 PLANES of shape (B, NP): k, l, ai, diff.
# TPU vregs are (8 sublanes, 128 lanes); an interleaved (B, NP, NWORD)
# layout puts the 4-5-word axis minor and tiles every pool op at <4%
# lane utilization -- separate (B, NP) planes keep the pool axis minor
# and fully populated.  Field packing:
#   ai   = i | a<<13 | state<<14 | next<<16   (i <= MAX_READ_LEN fits
#          13 bits; next stores NP as the null link)
#   diff = mm | go<<6 | ge<<12 | ldp<<18      (mm/go/ge <= 63; ldp is a
#          read position <= MAX_READ_LEN -- the unpack `d >> 18` is an
#          arithmetic shift on int32, so ldp >= 8192 would sign-extend;
#          longer reads are routed to the exact host engine)
MAX_READ_LEN = 8191

# tunables (static; env-overridable for on-chip experiments)
DEF_LANES = int(os.environ.get("FQ_BS_LANES", 1024))
# Pool size.  Measured r4 on-chip (resident kernel, 16k reads): the
# per-iteration cost is nearly pool-size-INSENSITIVE (the big passes
# are gather/width/flush, not the pool planes), while the fallback
# fraction has a cliff: 25% of reads need ~1000 slots (512 -> 25%
# fallback, 1024 -> 3.6%).  The resident default is therefore 1024
# (93%+ of reads finish on-device); the XLA op-stream path keeps 512
# (its pool passes DO dominate, cc42fca A/B: 5,668 vs 4,117 reads/s).
DEF_POOL = int(os.environ.get("FQ_BS_POOL", 0))  # 0 = per-kernel auto
DEF_INNER = int(os.environ.get("FQ_BS_INNER", 32))
# per-lane step cap: tail reads grind lanes alone (31% lane utilization
# measured at a 64*L cap vs 69% at 768); capped reads fall back to the
# exact native/host engine, so a tighter cap trades a little host work
# (3.6% of the bench world) for a lot of chip time (2474 -> 4008
# reads/s measured).  0 = auto (max(768, 3 * padded read len)).
DEF_STEPCAP = int(os.environ.get("FQ_BS_STEPCAP", 0))
# chain sub-steps per iteration (extra masked rank queries).  Measured
# r03 on-chip A/B at 16384 reads: chain=1 6625 reads/s vs chain=4 6212
# (iters only dropped 11% -- chain-mode lanes are a minority on real
# read mixes, so extra occ gathers outweigh the iteration savings).
DEF_CHAIN = int(os.environ.get("FQ_BS_CHAIN", 1))
# pool access style: 0 = one-hot masked passes (full-pool streaming),
# 1 = XLA scatter/gather point updates.  A/B'd on chip; the one-hot
# style streams ~16 (B, NP) passes per iteration, the scatter style
# touches only the 9 child rows + 1 popped row per lane.
DEF_SCATTER = int(os.environ.get("FQ_BS_SCATTER", 0))
# Mosaic kernel selection for the search loop.  Default 1 = "resident":
# the whole chunk in ONE pallas_call with VMEM-resident state and
# in-kernel flush/refill (ops/search_pallas.py) -- this IS the device
# engine (15.1k reads/s on-chip vs 6.7k for the XLA op-stream, r03);
# the XLA path remains as the 0 setting for A/Bs and as the automatic
# fallback when the index/chunk exceeds the VMEM budget.  2 = "scan"
# (Mosaic inner scan, XLA outer round; kept for ablations).
DEF_PALLAS = int(os.environ.get("FQ_BS_PALLAS", 1))
# VMEM budget the resident kernel must fit in (scratch + packed FM
# table).  Calibration (r5, production 6.5 Mbp panel): the estimator
# under-counts Mosaic's scoped extras (DMA staging, compiler
# temporaries) by ~27 MB -- an est of 93 MB compiled to an actual
# 120.5 MB and overflowed the 120 MB scoped limit -- so the gate must
# leave ~30 MB of headroom below vmem_limit_bytes
PALLAS_VMEM_BUDGET = 90 * 1024 * 1024


def _aln_score(mm, go, ge, s_mm, s_gapo, s_gape):
    return mm * s_mm + go * s_gapo + ge * s_gape


def _compact_hits(n_aln, alns, fb, K_CAP):
    """Device-side compaction of the (N, A_MAX, 3) hit tensor into a
    dense (K_CAP, 3) row buffer + per-read offsets.  The full tensor is
    18 MB at 32k reads and the relay moves ~30 MB/s D2H (0.6s of the
    r4 bench wall); real hit counts are ~1/read, so the compact form is
    ~20x smaller.  Reads whose hits would spill past K_CAP are flagged
    FB_D2H and redone exactly on the host (results never change)."""
    N = n_aln.shape[0]
    n_eff = jnp.where(fb != 0, 0, jnp.minimum(n_aln, A_MAX))
    ends = jnp.cumsum(n_eff)
    offs = jnp.concatenate([jnp.zeros(1, jnp.int32),
                            ends[:-1].astype(jnp.int32)])
    total = jnp.minimum(ends[-1], K_CAP)
    j = jnp.arange(K_CAP, dtype=jnp.int32)
    read = jnp.searchsorted(ends, j, side="right").astype(jnp.int32)
    read_c = jnp.clip(read, 0, N - 1)
    hit = j - offs[read_c]
    rows = alns[read_c, jnp.clip(hit, 0, A_MAX - 1)]  # (K_CAP, 3)
    rows = jnp.where((j < total)[:, None], rows, 0)
    spill = (ends > K_CAP) & (n_eff > 0)
    fb = fb | jnp.where(spill, FB_D2H, 0)
    n_out = jnp.where(spill, 0, n_eff)
    return n_out, rows, offs, fb


@functools.partial(
    jax.jit,
    static_argnames=("B", "NP", "K_INNER", "CH_STEPS", "step_cap", "s_mm",
                     "s_gapo", "s_gape", "max_gapo", "max_gape",
                     "indel_end_skip", "max_del_occ", "max_entries",
                     "max_top2", "seed_len", "max_seed_diff", "n_text",
                     "ablate", "scatter", "pallas", "nbp", "compact",
                     "packed_seqs"))
def _search_kernel(words, occ_ckpt, sa, L2, primary,
                   seqs_rev, lens_all, md_all, use_seed_all,
                   B, NP, K_INNER, CH_STEPS, step_cap, s_mm, s_gapo,
                   s_gape, max_gapo, max_gape, indel_end_skip, max_del_occ,
                   max_entries, max_top2, seed_len, max_seed_diff, n_text,
                   ablate=(), scatter=False, pallas=False, fmtab=None,
                   nbp=0, compact=False, packed_seqs=False):
    """seqs_rev: (N, L) reversed read codes, any int dtype (4 = N / pad;
    int8 keeps the host->device transfer small -- the revcomp plane is a
    pure elementwise complement, derived here); with packed_seqs=True,
    (N, L//2) uint8 nibble pairs (lo=even, hi=odd position) halving the
    H2D bytes again (the relay moves ~30 MB/s).  lens_all, md_all: (N,);
    md_all < 0 marks padding rows.  Returns per-read (n_aln, packed
    alns (N, A_MAX, 3) [mm|go<<6|ge<<12|a<<18|score<<19, k, l],
    fallback, n_outer_rounds, busy)."""
    if pallas == "scan":
        assert CH_STEPS == 1, "pallas scan path supports chain=1 only"
    fm = DeviceFM(words=words, occ=occ_ckpt, sa=sa, L2=L2, primary=primary,
                  n=n_text)
    if packed_seqs:
        pk8 = seqs_rev.astype(jnp.int32)
        s0 = jnp.stack([pk8 & 15, (pk8 >> 4) & 15], axis=2).reshape(
            pk8.shape[0], -1)
        # aux metadata rides ONE H2D array (relay round trips are
        # latency-bound): lens_all is (N, 3) [len, md, use_seed]
        aux = lens_all
        lens_all = aux[:, 0]
        md_all = aux[:, 1]
        use_seed_all = aux[:, 2] != 0
    else:
        s0 = seqs_rev.astype(jnp.int32)
    seqs_all = jnp.stack([s0, jnp.where(s0 < 4, 3 - s0, s0)], axis=1)
    N, _, L = seqs_all.shape
    n = jnp.int32(n_text)

    # One-hot masked writes instead of XLA scatter: on TPU a 9-row/lane
    # scatter measured 394us/iter while the equivalent fused iota-compare
    # select runs at VPU/bandwidth speed (90us; see PARITY.md profile).
    iota_pool = jnp.arange(NP)[None, :]
    iota_buck = jnp.arange(NBUCK)[None, :]

    def oh_get(arr, col):
        """Per-lane arr[b, col[b]] as a fused one-hot reduction (avoids
        XLA point-gather, which serializes on TPU)."""
        iota = jnp.arange(arr.shape[1])[None, :]
        return jnp.where(iota == col[:, None], arr, 0).sum(axis=1)

    def oh_set(arr, col, val, mask):
        """arr (B, W[, E]) <- val (B[, E]) at per-lane column where mask."""
        iota = jnp.arange(arr.shape[1])[None, :]
        m = (iota == col[:, None]) & mask[:, None]
        if arr.ndim == 3:
            return jnp.where(m[:, :, None], val[:, None, :], arr)
        return jnp.where(m, val[:, None], arr)

    # ---- whole-batch precompute ----
    # both strands ride ONE pass (per-row index selector)
    sel2 = jnp.concatenate([jnp.zeros(N, jnp.int32), jnp.ones(N, jnp.int32)])
    units = jnp.concatenate([seqs_all[:, 0, :], seqs_all[:, 1, :]])
    lens2 = jnp.concatenate([lens_all, lens_all])
    # seed widths over the last seed_len bases (only meaningful where
    # use_seed; gather the seed slice per read)
    spos = (jnp.clip(lens_all - seed_len, 0, L)[:, None]
            + jnp.arange(seed_len)[None, :])
    sidx = jnp.clip(spos, 0, L - 1)
    seed_seqs = jnp.where(
        use_seed_all[:, None, None],
        jnp.take_along_axis(seqs_all, sidx[:, None, :].repeat(2, 1), axis=2),
        4)
    seed_units = jnp.concatenate([seed_seqs[:, 0], seed_seqs[:, 1]])
    sl_lens = jnp.full(2 * N, seed_len, jnp.int32)
    if pallas == "resident":
        # Pallas width kernel over the packed VMEM table: the XLA scan
        # below pays two 2N-row HBM gathers per base (0.6s of the 2.4s
        # 32k-read wall, r5 stage decomposition)
        from .fm import width_finalize
        from .search_pallas import width_pallas

        wv, bv = width_pallas(fmtab, L2, primary, units, sel2,
                              NBP=nbp, n=n_text)
        w0_flat = width_finalize(wv, bv, lens2)
        swv, sbv = width_pallas(fmtab, L2, primary, seed_units, sel2,
                                NBP=nbp, n=n_text)
        sw_flat = width_finalize(swv, sbv, sl_lens)
    else:
        w0_flat = cal_width(fm, sel2, units, lens2)
        sw_flat = cal_width(fm, sel2, seed_units, sl_lens)
    w0_all = jnp.stack([w0_flat[:N], w0_flat[N:]], axis=1)
    seed_w_all = jnp.stack([sw_flat[:N], sw_flat[N:]], axis=1)
    n_n_all = ((seqs_all[:, 0, :] > 3)
               & (jnp.arange(L)[None, :] < lens_all[:, None])).sum(axis=1)

    if "stopwidth" in ablate:
        # profiling only: stop after the width precompute (results
        # wrong; real data deps keep XLA from DCE-ing the scans)
        return (w0_all[:, 0, 0, 0] + seed_w_all[:, 0, 0, 0] + n_n_all,
                jnp.zeros((N, A_MAX, 3), jnp.int32),
                jnp.zeros(N, jnp.int32), jnp.int32(0), jnp.int32(0))

    if pallas == "resident":
        from .search_pallas import resident_search

        n_aln_r, alns_r, fb_r, rounds_r, busy_r = resident_search(
            fmtab, L2, primary, seqs_all, w0_all, seed_w_all, n_n_all,
            lens_all, md_all, use_seed_all, B=B, NP=NP, RF=K_INNER,
            NBP=nbp, n=n_text, s_mm=s_mm, s_gapo=s_gapo, s_gape=s_gape,
            max_gapo=max_gapo, max_gape=max_gape,
            indel_end_skip=indel_end_skip, max_del_occ=max_del_occ,
            max_entries=max_entries, max_top2=max_top2,
            seed_len=seed_len, max_seed_diff=max_seed_diff,
            step_cap=step_cap, CH=CH_STEPS, ablate=ablate)
        if compact:
            n_aln_r, rows, offs, fb_r = _compact_hits(
                n_aln_r, alns_r, fb_r, 3 * N)
            # ONE flat D2H payload: each device->host array pays a
            # fixed relay round trip (~25 ms), so meta rides one array
            meta = jnp.concatenate([n_aln_r, offs, fb_r])
            return meta, rows, rounds_r, busy_r
        return n_aln_r, alns_r, fb_r, rounds_r, busy_r

    # per-read outputs; hit rows are packed 3 int32 words (the device->
    # host result copy rides the same narrow link as the inputs)
    out_n = jnp.zeros(N + 1, jnp.int32)
    out_alns = jnp.zeros((N + 1, A_MAX, 3), jnp.int32)
    out_fb = jnp.zeros(N + 1, jnp.int32)  # fallback-cause bits (FB_*)

    iota_np = jnp.arange(NP - 1, -1, -1, dtype=jnp.int32)

    def fresh_lane_state(read_ids):
        """State for lanes starting reads read_ids (may be >= N: idle)."""
        r = jnp.clip(read_ids, 0, N - 1)
        B_ = read_ids.shape[0]
        valid = (read_ids < N) & (md_all[r] >= 0)
        lens = jnp.where(valid, lens_all[r], 0)
        md = jnp.where(valid, md_all[r], 0)
        # lens == 0 guards padding rows: an empty read would otherwise
        # "hit" the full SA range at i == 0
        dead = ~valid | (n_n_all[r] > md) | (lens <= 0)
        # slot 0 = (a=0, i=len, next=null), slot 1 = (a=1, i=len,
        # next=slot 0); head -> slot 1
        z = jnp.zeros((B_, NP), jnp.int32)
        pk = z
        pl = z.at[:, 0].set(n).at[:, 1].set(n)
        pai = z.at[:, 0].set(lens | (NP << 16)).at[:, 1].set(
            lens | (1 << 13))
        pdiff = z
        heads = jnp.full((B_, NBUCK), -1, jnp.int32)
        heads = heads.at[:, 0].set(jnp.where(dead, -1, 1))
        return dict(
            read_idx=jnp.where(valid, read_ids, -1),
            seqs=seqs_all[r],  # (B, 2, L) lane-local copy
            lens=lens, md0=md, max_diff=md,
            use_seed=jnp.where(valid, use_seed_all[r], False),
            pk=pk, pl=pl, pai=pai, pdiff=pdiff, heads=heads,
            freelist=jnp.broadcast_to(iota_np, (B_, NP)),
            free_top=jnp.full_like(lens, NP - 2),
            n_entries=jnp.where(dead, 0, 2),
            best_score=(md + 1) * s_mm + (max_gapo + 1) * s_gapo
            + (max_gape + 1) * s_gape,
            best_cnt=jnp.zeros_like(lens),
            n_aln=jnp.zeros_like(lens),
            al0=jnp.zeros((B_, A_MAX), jnp.int32),
            al1=jnp.zeros((B_, A_MAX), jnp.int32),
            al2=jnp.zeros((B_, A_MAX), jnp.int32),
            # width state as four (B, L+1) planes (minor axis = position)
            # -- the packed (B,2,L+1,2) form lowered to 2-lane tiles and
            # cost ~77us/iter across reads+the gap_shadow update
            ww0=w0_all[r, 0, :, 0], wb0=w0_all[r, 0, :, 1],
            ww1=w0_all[r, 1, :, 0], wb1=w0_all[r, 1, :, 1],
            sw0=seed_w_all[r, 0], sw1=seed_w_all[r, 1],  # (B, SL+1, 2)
            ch_on=jnp.zeros_like(valid),
            ch=jnp.zeros((read_ids.shape[0], 8), jnp.int32),
            done=dead, overflow=jnp.zeros_like(lens),
            steps=jnp.zeros_like(lens))

    LANE_KEYS = ("read_idx", "seqs", "lens", "md0", "max_diff", "use_seed",
                 "pk", "pl", "pai", "pdiff", "heads", "freelist",
                 "free_top", "n_entries",
                 "best_score", "best_cnt", "n_aln", "al0", "al1", "al2",
                 "ww0", "wb0", "ww1", "wb1", "sw0", "sw1", "ch_on", "ch",
                 "done", "overflow", "steps")

    def inner_step(st, _):
        read_idx = st["read_idx"]
        rclip = jnp.clip(read_idx, 0, N - 1)
        done = st["done"]
        heads = st["heads"]
        pk, pl = st["pk"], st["pl"]
        pai, pdiff = st["pai"], st["pdiff"]
        freelist, free_top = st["freelist"], st["free_top"]
        n_entries = st["n_entries"]
        ch_on, ch = st["ch_on"], st["ch"]
        ww0, wb0 = st["ww0"], st["wb0"]
        ww1, wb1 = st["ww1"], st["wb1"]
        lens, md0, max_diff = st["lens"], st["md0"], st["max_diff"]

        avail = ~done
        work_chain = avail & ch_on
        can_pop = avail & ~ch_on & (n_entries > 0)
        done = done | (avail & ~ch_on & (n_entries == 0))
        # C: break when n_entries > max_entries (keeps hits found so far)
        hitcap = can_pop & (n_entries > max_entries)
        done = done | hitcap
        can_pop = can_pop & ~hitcap

        # ---- pop: head of lowest nonempty bucket ----
        hvalid = heads >= 0  # (B, NBUCK)
        bucket = jnp.argmax(hvalid, axis=1).astype(jnp.int32)
        slot = oh_get(heads, jnp.clip(bucket, 0, NBUCK - 1))
        slot_c = jnp.clip(slot, 0, NP - 1)
        if "nopop" in ablate:  # profiling only: results wrong
            k = jnp.zeros(B, jnp.int32)
            l = jnp.full(B, n)
            ai_w = lens | (NP << 16)
            d = jnp.zeros(B, jnp.int32)
        elif scatter:

            def row_get(plane):
                return jnp.take_along_axis(plane, slot_c[:, None],
                                           axis=1)[:, 0]

            k, l = row_get(pk), row_get(pl)
            ai_w, d = row_get(pai), row_get(pdiff)
        else:
            sel_slot = iota_pool == slot_c[:, None]  # (B, NP)
            k = jnp.where(sel_slot, pk, 0).sum(axis=1)
            l = jnp.where(sel_slot, pl, 0).sum(axis=1)
            ai_w = jnp.where(sel_slot, pai, 0).sum(axis=1)
            d = jnp.where(sel_slot, pdiff, 0).sum(axis=1)
        nxt_f = (ai_w >> 16) & 0x7FFF
        nxt = jnp.where(nxt_f == NP, -1, nxt_f)
        if scatter:
            rows_b = jnp.arange(B)
            heads = heads.at[
                rows_b, jnp.where(can_pop, bucket, NBUCK)].set(
                    nxt, mode="drop")
            freelist = freelist.at[
                rows_b, jnp.where(can_pop,
                                  jnp.clip(free_top, 0, NP - 1), NP)].set(
                    slot_c, mode="drop")
        else:
            heads = oh_set(heads, jnp.clip(bucket, 0, NBUCK - 1), nxt,
                           can_pop)
            freelist = oh_set(freelist, jnp.clip(free_top, 0, NP - 1),
                              slot_c, can_pop)
        free_top = free_top + can_pop.astype(jnp.int32)
        n_entries = n_entries - can_pop.astype(jnp.int32)

        a = (ai_w >> 13) & 1
        i = ai_w & 0x1FFF
        state = (ai_w >> 14) & 3
        n_mm, n_gapo, n_gape = d & 63, (d >> 6) & 63, (d >> 12) & 63
        ldp = d >> 18
        e_score = bucket

        stop = can_pop & (e_score > st["best_score"] + s_mm)
        done = done | stop
        alive = can_pop & ~stop
        m = max_diff - (n_mm + n_gapo) - n_gape  # GAPE mode
        alive = alive & (m >= 0)
        # width values at i-1 and i-2 (serve the pop prune AND the
        # expansion gates): per-lane strand select over the planes fused
        # with a one-hot column reduction -- one streaming pass each
        i2 = i - 1
        pos_iota = jnp.arange(L + 1)[None, :]
        m_i2 = pos_iota == jnp.clip(i2, 0, L)[:, None]       # (B, L+1)
        m_i2m1 = pos_iota == jnp.clip(i2 - 1, 0, L)[:, None]
        a0 = (a == 0)[:, None]
        ww_sel = jnp.where(a0, ww0, ww1)
        wb_sel = jnp.where(a0, wb0, wb1)
        # both positions x both planes in ONE reduction (each reduce is
        # a separate fusion launch; the per-op ramp dominates this kernel)
        w_planes = jnp.stack([ww_sel, wb_sel], axis=1)   # (B, 2, L+1)
        w_masks = jnp.stack([m_i2, m_i2m1], axis=1)      # (B, 2, L+1)
        w_red = jnp.where(w_masks[:, None, :, :], w_planes[:, :, None, :],
                          0).sum(axis=3)                 # (B, 2pl, 2pos)
        ww_i2, ww_i2m1 = w_red[:, 0, 0], w_red[:, 0, 1]
        wb_i2, wb_i2m1 = w_red[:, 1, 0], w_red[:, 1, 1]
        alive = alive & ~((i > 0) & (m < wb_i2))

        hit_i0 = alive & (i == 0)
        start_chain = alive & (i > 0) & (m == 0)
        expand = alive & ~hit_i0 & ~start_chain

        # ---- shared rank queries ----
        # chain lanes use the register interval, popped lanes their own
        ck_k = jnp.where(work_chain, ch[:, 0], k)
        ck_l = jnp.where(work_chain, ch[:, 1], l)
        cur_a = jnp.where(work_chain, ch[:, 3], a)
        sel = 1 - cur_a
        if "noocc" in ablate:  # profiling only: results wrong
            cnt_k = (ck_k[:, None] + jnp.arange(4)[None, :]) & 0xFF
            cnt_l = (ck_l[:, None] + jnp.arange(4)[None, :]) & 0xFF
        else:
            # one 2B-row gather pair instead of two B-row pairs: the
            # gather op cost is latency-dominated on TPU (~12us fixed)
            cnt_k, cnt_l = occ4_pair(fm, sel, ck_k - 1, ck_l)  # (B, 4) x2
        # L2 is a (2, 4) scalar table: row by select, never by gather
        L2row = jnp.where((sel == 0)[:, None], L2[0][None, :],
                          L2[1][None, :])  # (B, 4)

        # ---- chain step (bwt_match_exact_alt, CH_STEPS bases/iter) ----
        chainish = work_chain | start_chain
        ch_i = jnp.where(work_chain, ch[:, 2], i)
        ci = jnp.clip(ch_i - 1, 0, L - 1)
        lseq_cur = jnp.where((cur_a == 0)[:, None], st["seqs"][:, 0],
                             st["seqs"][:, 1])  # (B, L)
        lseq_a = jnp.where((a == 0)[:, None], st["seqs"][:, 0],
                           st["seqs"][:, 1])
        # chain char + expansion char in ONE fused gather-reduction
        seq_pair = jnp.stack([lseq_cur, lseq_a], axis=1)    # (B, 2, L)
        idx_pair = jnp.stack([ci, jnp.clip(i2, 0, L - 1)], axis=1)
        g_mask = jnp.arange(L)[None, None, :] == idx_pair[:, :, None]
        g_red = jnp.where(g_mask, seq_pair, 0).sum(axis=2)  # (B, 2)
        cc, si = g_red[:, 0], g_red[:, 1]
        ccl = jnp.clip(cc, 0, 3)
        sel_c = jnp.arange(4)[None, :] == ccl[:, None]  # (B, 4)
        # L2c / occ_k / occ_l through one stacked reduction
        tri = jnp.stack([L2row, cnt_k, cnt_l], axis=1)  # (B, 3, 4)
        t_red = jnp.where(sel_c[:, None, :], tri, 0).sum(axis=2)
        L2c = t_red[:, 0]
        nk = L2c + t_red[:, 1] + 1
        nl = L2c + t_red[:, 2]
        ch_dead = chainish & ((cc > 3) | (nk > nl))
        ch_hit = chainish & ~ch_dead & (ch_i - 1 == 0)
        ch_cont = chainish & ~ch_dead & ~ch_hit
        new_ch = jnp.stack(
            [nk, nl, ch_i - 1, cur_a,
             jnp.where(start_chain, n_mm, ch[:, 4]),
             jnp.where(start_chain, n_gapo, ch[:, 5]),
             jnp.where(start_chain, n_gape, ch[:, 6]),
             jnp.where(start_chain, ldp, ch[:, 7])], axis=1)
        ch = jnp.where(chainish[:, None], new_ch, ch)
        # extra chain sub-steps: lanes still walking advance more bases
        # this iteration (one masked rank query each).  C runs the whole
        # walk inline within a single pop (bwt.c match_exact_alt), so
        # multi-stepping preserves C's per-lane order exactly; it only
        # divides the iteration count of the ~80%-of-work chain phase.
        for _ in range(CH_STEPS - 1):
            act = ch_cont
            s_a = ch[:, 3]
            s_sel = 1 - s_a
            if "noocc" in ablate:  # profiling only: results wrong
                s_cnt_k = (ch[:, 0][:, None] + jnp.arange(4)[None, :]) & 0xFF
                s_cnt_l = (ch[:, 1][:, None] + jnp.arange(4)[None, :]) & 0xFF
            else:
                s_cnt_k, s_cnt_l = occ4_pair(fm, s_sel, ch[:, 0] - 1,
                                             ch[:, 1])
            s_L2row = jnp.where((s_sel == 0)[:, None], L2[0][None, :],
                                L2[1][None, :])
            s_lseq = jnp.where((s_a == 0)[:, None], st["seqs"][:, 0],
                               st["seqs"][:, 1])
            s_cc = oh_get(s_lseq, jnp.clip(ch[:, 2] - 1, 0, L - 1))
            s_sel_c = (jnp.arange(4)[None, :]
                       == jnp.clip(s_cc, 0, 3)[:, None])
            s_tri = jnp.stack([s_L2row, s_cnt_k, s_cnt_l], axis=1)
            s_red = jnp.where(s_sel_c[:, None, :], s_tri, 0).sum(axis=2)
            s_nk = s_red[:, 0] + s_red[:, 1] + 1
            s_nl = s_red[:, 0] + s_red[:, 2]
            s_dead = act & ((s_cc > 3) | (s_nk > s_nl))
            s_hit = act & ~s_dead & (ch[:, 2] - 1 == 0)
            adv = (act & ~s_dead)[:, None]
            ch = jnp.where(
                adv, jnp.concatenate(
                    [s_nk[:, None], s_nl[:, None],
                     (ch[:, 2] - 1)[:, None], ch[:, 3:]], axis=1), ch)
            ch_hit = ch_hit | s_hit
            ch_cont = act & ~s_dead & ~s_hit
        ch_on = ch_cont

        # ---- hits ----
        hit = hit_i0 | ch_hit
        hk = jnp.where(ch_hit, ch[:, 0], k)
        hl = jnp.where(ch_hit, ch[:, 1], l)
        hmm = jnp.where(ch_hit, ch[:, 4], n_mm)
        hgo = jnp.where(ch_hit, ch[:, 5], n_gapo)
        hge = jnp.where(ch_hit, ch[:, 6], n_gape)
        ha = jnp.where(ch_hit, ch[:, 3], a)
        hldp = jnp.where(ch_hit, ch[:, 7], ldp)
        score = _aln_score(hmm, hgo, hge, s_mm, s_gapo, s_gape)
        first_hit = hit & (st["n_aln"] == 0)
        best_score = jnp.where(first_hit, score, st["best_score"])
        max_diff = jnp.where(
            first_hit, jnp.minimum(hmm + hgo + hge + 1, md0), max_diff)
        eq_best = hit & (score == best_score)
        best_cnt = st["best_cnt"] + jnp.where(eq_best, hl - hk + 1, 0)
        top2b = hit & ~eq_best & (st["best_cnt"] > max_top2)
        done = done | top2b
        hit = hit & ~top2b
        slots_used = jnp.arange(A_MAX)[None, :] < st["n_aln"][:, None]
        dup = ((st["al1"] == hk[:, None])
               & (st["al2"] == hl[:, None]) & slots_used).any(axis=1)
        do_add = hit & ~((hgo > 0) & dup)
        # gap_shadow on the hit strand's width arrays (bwtgap.c:81-91)
        x = hl - hk + 1
        if "noshadow" in ablate:  # profiling only
            do_add_sh = jnp.zeros_like(do_add)
        else:
            do_add_sh = do_add
        ha0 = (ha == 0)[:, None]
        ww_a = jnp.where(ha0, ww0, ww1)  # (B, L+1) hit strand's planes
        wb_a = jnp.where(ha0, wb0, wb1)
        in_rng = (pos_iota < hldp[:, None]) & do_add_sh[:, None]
        eqx = (ww_a == x[:, None]) & in_rng
        jcum = jnp.cumsum(eqx.astype(jnp.int32), axis=1)
        ww_new = jnp.where(in_rng & (ww_a > x[:, None]), ww_a - x[:, None],
                           jnp.where(eqx, n - jcum, ww_a))
        wb_new = jnp.where(eqx, 1, wb_a)
        upd0 = (do_add_sh & (ha == 0))[:, None]
        upd1 = (do_add_sh & (ha == 1))[:, None]
        ww0 = jnp.where(upd0, ww_new, ww0)
        wb0 = jnp.where(upd0, wb_new, wb0)
        ww1 = jnp.where(upd1, ww_new, ww1)
        wb1 = jnp.where(upd1, wb_new, wb1)
        aslot = jnp.clip(st["n_aln"], 0, A_MAX - 1)
        add_m = do_add & (st["n_aln"] < A_MAX)
        overflow = st["overflow"] | jnp.where(
            do_add & (st["n_aln"] >= A_MAX), FB_AMAX, 0)
        al0 = oh_set(st["al0"],
                     aslot, hmm | (hgo << 6) | (hge << 12) | (ha << 18)
                     | (score << 19), add_m)
        al1 = oh_set(st["al1"], aslot, hk, add_m)
        al2 = oh_set(st["al2"], aslot, hl, add_m)
        n_aln = st["n_aln"] + add_m.astype(jnp.int32)

        # ---- expansion ----  (si gathered with the chain char above)
        if "nowidthg" in ablate:  # profiling only
            zz = jnp.zeros(B, jnp.int32)
            wb_i2m1 = wb_i2 = ww_i2m1 = ww_i2 = zz
        occ_w = l - k + 1
        allow_diff = ~((i2 > 0) & (wb_i2m1 > m - 1))
        allow_m = ~((i2 > 0) & (wb_i2m1 == m - 1) & (wb_i2 == m - 1)
                    & (ww_i2m1 == ww_i2))
        msd = jnp.int32(max_seed_diff) - (n_mm + n_gapo) - n_gape
        ii = i2 - (lens - seed_len)
        if "nowidthg" in ablate:
            sw_iim1 = sw_ii = jnp.stack([zz, zz], axis=1)
        else:
            # lane-local seed planes (same one-hot reduction as the main
            # width planes; avoids a global (N,...) gather per iteration)
            sw_sel = jnp.where((a == 0)[:, None, None], st["sw0"],
                               st["sw1"])  # (B, SL+1, 2)
            sp_iota = jnp.arange(sw_sel.shape[1])[None, None, :]
            sw_idx = jnp.stack([ii - 1, ii], axis=1)  # (B, 2)
            sw_m = sp_iota == jnp.clip(sw_idx, 0, seed_len)[:, :, None]
            sw_red = jnp.where(sw_m[:, :, :, None], sw_sel[:, None, :, :],
                               0).sum(axis=2)  # (B, 2, 2)
            sw_iim1, sw_ii = sw_red[:, 0], sw_red[:, 1]
        seed_on = st["use_seed"] & (i2 > 0) & (ii > 0)
        allow_diff = allow_diff & ~(seed_on & (sw_iim1[:, 1] > msd - 1))
        allow_m = allow_m & ~(seed_on & (sw_iim1[:, 1] == msd - 1)
                              & (sw_ii[:, 1] == msd - 1)
                              & (sw_iim1[:, 0] == sw_ii[:, 0]))

        tmp = n_gapo + n_gape
        indel_ok = (expand & allow_diff & (i2 >= indel_end_skip + tmp)
                    & (lens - i2 >= indel_end_skip + tmp))
        ins_open = indel_ok & (state == STATE_M) & (n_gapo < max_gapo)
        ins_ext = indel_ok & (state == STATE_I) & (n_gape < max_gape)
        del_open = ins_open  # same gate as insertion in C (state M branch)
        del_ext = (indel_ok & (state == STATE_D) & (n_gape < max_gape)
                   & ((n_gapo + n_gape < max_diff) | (occ_w < max_del_occ)))
        allow_mm = expand & allow_diff & allow_m

        # children in C push order: ins, del j=0..3, mm j=1..4
        # (per-WORD lists -> (B, NCH) stacks: keeps every push plane's
        # minor axis at NP, never at the word count)
        cvalid, cscore, c_k, c_l, c_ai, c_diff = [], [], [], [], [], []

        def child(mask, pa, pi, pk_, pl_, pmm, pgo, pge, pst, pldp):
            sc = _aln_score(pmm, pgo, pge, s_mm, s_gapo, s_gape)
            cvalid.append(mask)
            cscore.append(sc)
            c_k.append(pk_)
            c_l.append(pl_)
            c_ai.append((pst << 14) | (pa << 13) | pi)
            c_diff.append(pmm | (pgo << 6) | (pge << 12) | (pldp << 18))

        child(ins_open | ins_ext, a, i2, k, l, n_mm,
              n_gapo + ins_open.astype(jnp.int32),
              n_gape + ins_ext.astype(jnp.int32),
              jnp.full(B, STATE_I, jnp.int32), i2)
        for j in range(4):
            kj = L2row[:, j] + cnt_k[:, j] + 1
            lj = L2row[:, j] + cnt_l[:, j]
            child((del_open | del_ext) & (kj <= lj), a, i2 + 1, kj, lj,
                  n_mm, n_gapo + del_open.astype(jnp.int32),
                  n_gape + del_ext.astype(jnp.int32),
                  jnp.full(B, STATE_D, jnp.int32), i2 + 1)
        # all four mismatch-children intervals in ONE stacked reduction
        c_all = (si[:, None] + jnp.arange(1, 5)[None, :]) & 3  # (B, 4)
        selj = c_all[:, :, None] == jnp.arange(4)[None, None, :]
        mm_kl = jnp.stack([L2row + cnt_k + 1, L2row + cnt_l], axis=1)
        mm_red = jnp.where(selj[:, None, :, :], mm_kl[:, :, None, :],
                           0).sum(axis=3)  # (B, 2, 4 children)
        for j in range(1, 5):
            if j == 4:
                mask_j = allow_mm | (expand & ~(allow_diff & allow_m)
                                     & (si < 4))
                is_mm_v = allow_mm & (si > 3)
            else:
                mask_j = allow_mm
                is_mm_v = jnp.ones(B, bool)
            kj = mm_red[:, 0, j - 1]
            lj = mm_red[:, 1, j - 1]
            # no-diff pushes inherit the parent's ldp (slot persistence)
            child(mask_j & (kj <= lj), a, i2, kj, lj,
                  n_mm + (mask_j & is_mm_v).astype(jnp.int32), n_gapo,
                  n_gape, jnp.full(B, STATE_M, jnp.int32),
                  jnp.where(is_mm_v, i2, ldp))

        NCH = len(cvalid)
        valid = jnp.stack(cvalid, axis=1)  # (B, NCH)
        scores = jnp.stack(cscore, axis=1)
        # bucket-range / pool-capacity guards -> exact fallback
        total = valid.sum(axis=1)
        bad_score = (valid & (scores >= NBUCK)).any(axis=1)
        no_room = total > free_top
        ovf = (bad_score | no_room) & expand
        overflow = overflow | jnp.where(bad_score & expand, FB_SCORE, 0) \
            | jnp.where(no_room & expand, FB_POOL, 0)
        done = done | ovf
        valid = valid & ~ovf[:, None]
        total = jnp.where(ovf, 0, total)

        # allocate slots: rank among valid children (1-based); all NCH
        # freelist reads ride ONE batched one-hot reduction
        rank = jnp.cumsum(valid.astype(jnp.int32), axis=1)
        fidx = jnp.clip(free_top[:, None] - rank, 0, NP - 1)
        if scatter:
            slots = jnp.take_along_axis(freelist, fidx, axis=1)
        else:
            f_hit = jnp.arange(NP)[None, None, :] == fidx[:, :, None]
            slots = jnp.where(f_hit, freelist[:, None, :], 0).sum(axis=2)
        free_top = free_top - total
        n_entries = n_entries + total

        # next pointers: most recent earlier same-bucket child, else the
        # (post-pop) bucket head; heads then point at the last same-bucket
        # child (LIFO within bucket == C stack order).  The all-pairs
        # same-score adjacency is one (B, NCH, NCH) pass instead of the
        # previous ~NCH^2 scalar-op chain.
        sc_clip = jnp.clip(scores, 0, NBUCK - 1)
        if scatter:
            heads_gather = jnp.take_along_axis(heads, sc_clip, axis=1)
        else:
            h_hit = iota_buck[:, None, :] == sc_clip[:, :, None]
            heads_gather = jnp.where(h_hit, heads[:, None, :],
                                     0).sum(axis=2)
        eq = scores[:, :, None] == scores[:, None, :]  # (B, ci, cj)
        tri_lo = jnp.tril(jnp.ones((NCH, NCH), bool), -1)[None]
        prev_cand = valid[:, None, :] & eq & tri_lo  # cj < ci, same score
        has_prev = prev_cand.any(axis=2)
        prev_idx = (NCH - 1) - jnp.argmax(prev_cand[:, :, ::-1], axis=2)
        prev_slot = jnp.take_along_axis(slots, prev_idx, axis=1)
        nexts = jnp.where(has_prev, prev_slot, heads_gather)
        tri_hi = jnp.triu(jnp.ones((NCH, NCH), bool), 1)[None]
        has_later = (valid[:, None, :] & eq & tri_hi).any(axis=2)
        is_last = valid & ~has_later

        # ai word carries the next link (null = NP)
        next_f = jnp.where(nexts < 0, NP, nexts)
        cai_w = jnp.stack(c_ai, axis=1) | (next_f << 16)  # (B, NCH)
        ck_w = jnp.stack(c_k, axis=1)
        cl_w = jnp.stack(c_l, axis=1)
        cdiff_w = jnp.stack(c_diff, axis=1)
        if "nopush" not in ablate and scatter:
            rows2 = jnp.arange(B)[:, None]
            slots_m = jnp.where(valid, slots, NP)
            pk = pk.at[rows2, slots_m].set(ck_w, mode="drop")
            pl = pl.at[rows2, slots_m].set(cl_w, mode="drop")
            pai = pai.at[rows2, slots_m].set(cai_w, mode="drop")
            pdiff = pdiff.at[rows2, slots_m].set(cdiff_w, mode="drop")
            heads = heads.at[
                rows2, jnp.where(is_last, sc_clip, NBUCK)].set(
                    slots, mode="drop")
        elif "nopush" not in ablate:  # ablation is profiling-only
            # fused push: valid children hold distinct slots, so ONE
            # masked one-hot sum per plane replaces the NCH-deep
            # dependent read-modify-write chain; (B, NCH, NP) keeps the
            # pool axis minor (full vreg lanes)
            p_hit = ((iota_pool[:, None, :] == slots[:, :, None])
                     & valid[:, :, None])  # (B, NCH, NP)
            p_any = p_hit.any(axis=1)  # (B, NP)

            def plane_push(plane, cw):
                val = jnp.where(p_hit, cw[:, :, None], 0).sum(axis=1)
                return jnp.where(p_any, val, plane)

            pk = plane_push(pk, ck_w)
            pl = plane_push(pl, cl_w)
            pai = plane_push(pai, cai_w)
            pdiff = plane_push(pdiff, cdiff_w)
            # same for bucket heads: is_last is unique per score bucket
            hb_hit = ((iota_buck[:, None, :] == sc_clip[:, :, None])
                      & is_last[:, :, None])  # (B, NCH, NBUCK)
            hb_val = jnp.where(hb_hit, slots[:, :, None], 0).sum(axis=1)
            heads = jnp.where(hb_hit.any(axis=1), hb_val, heads)

        # per-lane step cap -> exact fallback (guards pathological reads)
        steps = st["steps"] + (~done).astype(jnp.int32)
        capped = ~done & (steps > step_cap)
        overflow = overflow | jnp.where(capped, FB_STEPCAP, 0)
        done = done | capped

        return dict(read_idx=read_idx, seqs=st["seqs"], lens=lens,
                    md0=md0, max_diff=max_diff,
                    use_seed=st["use_seed"], pk=pk, pl=pl, pai=pai,
                    pdiff=pdiff, heads=heads,
                    freelist=freelist, free_top=free_top,
                    n_entries=n_entries, best_score=best_score,
                    best_cnt=best_cnt, n_aln=n_aln,
                    al0=al0, al1=al1, al2=al2,
                    ww0=ww0, wb0=wb0, ww1=ww1, wb1=wb1,
                    sw0=st["sw0"], sw1=st["sw1"], ch_on=ch_on, ch=ch,
                    done=done, overflow=overflow, steps=steps), None

    def outer_cond(c):
        return jnp.any(~c["lane"]["done"]) | (c["next_read"] < N)

    def outer_body(c):
        if pallas:
            from .search_pallas import inner_scan_pallas

            lane = inner_scan_pallas(
                c["lane"], fmtab, L2, primary, NP=NP, K_INNER=K_INNER,
                L=L, NBP=nbp, n=n_text, s_mm=s_mm, s_gapo=s_gapo,
                s_gape=s_gape, max_gapo=max_gapo, max_gape=max_gape,
                indel_end_skip=indel_end_skip, max_del_occ=max_del_occ,
                max_entries=max_entries, max_top2=max_top2,
                seed_len=seed_len, max_seed_diff=max_seed_diff,
                step_cap=step_cap, ablate=ablate)
        else:
            lane, _ = jax.lax.scan(inner_step, c["lane"], None,
                                   length=K_INNER)
        # flush finished lanes
        flush = lane["done"] & (lane["read_idx"] >= 0)
        tgt = jnp.where(flush, lane["read_idx"], N)
        out_n = c["out_n"].at[tgt].set(lane["n_aln"], mode="drop")
        out_alns = c["out_alns"].at[tgt].set(
            jnp.stack([lane["al0"], lane["al1"], lane["al2"]], axis=2),
            mode="drop")
        out_fb = c["out_fb"].at[tgt].set(lane["overflow"], mode="drop")
        busy = c["busy"] + jnp.where(flush, lane["steps"], 0).sum()
        # refill with the next unstarted reads
        rank = jnp.cumsum(flush.astype(jnp.int32))
        new_ids = jnp.where(flush, c["next_read"] + rank - 1, N)
        fresh = fresh_lane_state(new_ids)
        merged = {}
        for key in LANE_KEYS:
            fv, lv = fresh[key], lane[key]
            mask = flush
            mshape = (B,) + (1,) * (lv.ndim - 1)
            merged[key] = jnp.where(mask.reshape(mshape), fv, lv)
        return dict(lane=merged, next_read=c["next_read"] + rank[-1],
                    out_n=out_n, out_alns=out_alns, out_fb=out_fb,
                    rounds=c["rounds"] + 1, busy=busy)

    lane0 = fresh_lane_state(jnp.arange(B, dtype=jnp.int32))
    carry0 = dict(lane=lane0, next_read=jnp.int32(min(B, N)),
                  out_n=out_n, out_alns=out_alns, out_fb=out_fb,
                  rounds=jnp.int32(0), busy=jnp.int32(0))
    # lanes beyond N started idle; account them as consumed
    out = jax.lax.while_loop(outer_cond, outer_body, carry0)
    if compact:
        n_c, rows, offs, fb_c = _compact_hits(
            out["out_n"][:N], out["out_alns"][:N], out["out_fb"][:N],
            3 * N)
        meta = jnp.concatenate([n_c, offs, fb_c])
        return meta, rows, out["rounds"], out["busy"]
    return (out["out_n"][:N], out["out_alns"][:N], out["out_fb"][:N],
            out["rounds"], out["busy"])


class BatchEngine:
    """Batched device engine with exact native/host fallback."""

    def __init__(self, idx: ReducedIndex, max_batch: int = 32768,
                 lanes: int | None = None, pool: int | None = None,
                 inner: int | None = None, step_cap: int | None = None,
                 chain: int | None = None, pallas: bool | None = None):
        self.idx = idx
        self.dev = DeviceFM.build(idx.fm_fwd, idx.fm_rev)
        try:
            from ..align.engine import NativeEngine

            self.host = NativeEngine(idx)
        except Exception:
            self.host = HostEngine(idx)
        self.max_batch = max_batch
        # XLA CPU compile time explodes superlinearly in the read-array
        # size (Npad=4096 ~40s, Npad=8192 >15min on this image); the TPU
        # path compiles 16384 in ~80s.  Cap CPU chunks so tests and CPU
        # fallback runs stay tractable.
        import jax

        if jax.default_backend() == "cpu":
            self.max_batch = min(self.max_batch, 4096)
        self.lanes = lanes or DEF_LANES
        self.pool = pool or DEF_POOL
        self.inner = inner or DEF_INNER
        self.step_cap = step_cap if step_cap is not None else DEF_STEPCAP
        self.chain = chain or DEF_CHAIN
        self.scatter = bool(DEF_SCATTER)
        # Mosaic inner-loop kernel: needs lanes % 128 (vreg lane dim) and
        # the single-base chain walk (the measured-best config).
        # FQ_BS_PALLAS: 0 = off, 1 = "resident" (whole chunk in ONE
        # pallas_call, in-kernel flush/refill), 2 = "scan" (Mosaic inner
        # scan, XLA outer round)
        if pallas is None:
            pallas = {1: "resident", 2: "scan"}.get(DEF_PALLAS, False)
            # CPU backend runs Mosaic kernels in interpret mode -- a
            # correctness tool, orders of magnitude slower than the XLA
            # scan.  Product CPU runs use the native engine anyway, so
            # the default engages the kernel only on real devices;
            # explicit pallas= (the differential tests) still forces it.
            if jax.default_backend() == "cpu":
                pallas = False
        elif pallas is True:
            pallas = "scan"
        # the scan kernel supports chain=1 only; resident supports any
        if pallas == "scan" and self.chain != 1:
            pallas = False
        self.pallas = pallas
        if not self.pool:  # per-kernel auto (see DEF_POOL note)
            self.pool = 1024 if self.pallas == "resident" else 512
        self.fmtab = None
        self.nbp = 0
        if self.pallas:
            from .search_pallas import pack_fm_table, resident_vmem_bytes

            tab, nbp = pack_fm_table(self.dev)
            # the whole packed table must be VMEM-resident (plus kernel
            # scratch at a nominal 151bp read shape); an oversized index
            # would fail the Mosaic compile at runtime, so disable the
            # pallas path up front instead
            est = resident_vmem_bytes(self.lanes, self.pool, 256, 32,
                                      tab.shape[1], nbp)
            if est > PALLAS_VMEM_BUDGET:
                from ..utils.logging import warning

                warning("FM table too large for the VMEM-resident search "
                        "kernel (%d MB est); using the XLA device path",
                        est >> 20)
                self.pallas = False
            else:
                self.nbp = nbp
                self.fmtab = jnp.asarray(tab)
        self.last_iters = 0
        self.last_fallback = 0
        self.last_busy = 0
        self.last_fb_causes: dict[str, int] = {}

    def align_batch(self, reads, opt: GapOpt) -> None:
        todo = [p for p in reads if not p.filtered]
        for p in reads:
            p.sa = 0
            p.type = 0
            p.c1 = p.c2 = 0
            p.n_aln = 0
            p.aln = []
        self.last_fallback = 0
        self.last_iters = 0
        self.last_busy = 0
        self.last_fb_causes = {}
        for s in range(0, len(todo), self.max_batch):
            self._run_chunk(todo[s:s + self.max_batch], opt)

    def _count_causes(self, cause_words) -> None:
        for bit, name in FB_NAMES.items():
            c = int(((np.asarray(cause_words) & bit) != 0).sum())
            if c:
                self.last_fb_causes[name] = (
                    self.last_fb_causes.get(name, 0) + c)

    def _run_chunk(self, todo, opt: GapOpt) -> None:
        if not todo:
            return
        # diff-word field bounds: mm/go/ge are 6-bit; the NBUCK bad_score
        # guard keeps counts <= (NBUCK-1)//penalty, which must fit in 63
        # or a lowered penalty would silently carry into adjacent fields
        for pen in (opt.s_mm, opt.s_gapo, opt.s_gape):
            assert (NBUCK - 1) // max(pen, 1) <= 63, (
                f"penalty {pen} admits >63 events within {NBUCK} score "
                "buckets; diff-word packing would overflow")
        # ldp packs into 13 bits (arithmetic >>18 sign-extends beyond
        # 8191): long reads take the exact host engine
        long_reads = [p for p in todo if p.len > MAX_READ_LEN]
        if long_reads:
            self.host.align_batch(long_reads, opt)
            self.last_fallback += len(long_reads)
            self.last_fb_causes["long"] = (
                self.last_fb_causes.get("long", 0) + len(long_reads))
            todo = [p for p in todo if p.len <= MAX_READ_LEN]
        if not todo:
            return
        import time as _time

        prof = os.environ.get("FQ_BS_PROF", "0") == "1"
        t0 = _time.perf_counter()
        B = len(todo)
        Lmax = max(p.len for p in todo)
        # pad shapes to limit recompiles.  Lpad rounds to a multiple of
        # 32 (not a power of 2): 151-bp reads at Lpad=256 paid ~60%
        # extra on every L-proportional pass -- the 256+32-step width
        # scan and the kernel's (LW, B) width/seq planes (r5 stage
        # decomposition: width precompute was 0.6s of the 2.4s wall)
        Npad = 256
        while Npad < B:
            Npad *= 2
        Lpad = max(32, -(-Lmax // 32) * 32)
        # int8 reversed codes only: the revcomp plane is derived on
        # device (elementwise complement), so the H2D copy is 1 byte per
        # padded base instead of 8
        seqs = np.full((Npad, Lpad), 4, dtype=np.int8)
        lens = np.zeros(Npad, dtype=np.int32)
        md = np.full(Npad, -1, dtype=np.int32)  # -1 marks padding
        use_seed = np.zeros(Npad, dtype=bool)
        for b, p in enumerate(todo):
            seqs[b, : p.len] = p.seq[: p.len]
            lens[b] = p.len
            md[b] = (bwa_cal_maxdiff(p.len, thres=opt.fnr)
                     if opt.fnr > 0.0 else opt.max_diff)
            use_seed[b] = p.len > opt.seed_len
        batch_md = int(md[:B].max())
        max_gapo = min(opt.max_gapo, batch_md)

        lanes = min(self.lanes, Npad)
        use_pallas = self.pallas if lanes % 128 == 0 else False
        if use_pallas:
            # scratch scales with the padded read length: re-check the
            # VMEM budget at the chunk's actual Lpad (long-read chunks
            # take the XLA path instead of failing the Mosaic compile)
            from .search_pallas import resident_vmem_bytes

            est = resident_vmem_bytes(lanes, self.pool, Lpad,
                                      opt.seed_len, self.fmtab.shape[1],
                                      self.nbp)
            if est > PALLAS_VMEM_BUDGET:
                use_pallas = False
        t_pack = _time.perf_counter() - t0
        t0 = _time.perf_counter()
        packed = (seqs[:, 0::2].astype(np.uint8)
                  | (seqs[:, 1::2].astype(np.uint8) << 4))
        aux_d = jnp.asarray(np.stack(
            [lens, md, use_seed.astype(np.int32)], axis=1))
        try:
            meta_d, rows_d, rounds, busy = _search_kernel(
                self.dev.words, self.dev.occ, self.dev.sa, self.dev.L2,
                self.dev.primary, jnp.asarray(packed), aux_d,
                aux_d, aux_d,
                B=int(lanes), NP=int(self.pool), K_INNER=int(self.inner),
                CH_STEPS=int(self.chain),
                # auto step cap: the resident kernel refills lanes
                # in-kernel, so a grinding read only wastes its own
                # lane -- a 4096 cap converts most stepcap fallbacks to
                # device results at ~3% extra busy steps (r4
                # measurement); the XLA path keeps the tight cap
                # (whole-batch rounds stall on it)
                step_cap=int(self.step_cap
                             or (max(1536, 6 * Lpad)
                                 if use_pallas == "resident"
                                 else max(768, 3 * Lpad))), s_mm=opt.s_mm,
                s_gapo=opt.s_gapo, s_gape=opt.s_gape,
                max_gapo=int(max_gapo),
                max_gape=opt.max_gape, indel_end_skip=opt.indel_end_skip,
                max_del_occ=opt.max_del_occ, max_entries=opt.max_entries,
                max_top2=opt.max_top2, seed_len=opt.seed_len,
                max_seed_diff=opt.max_seed_diff, n_text=self.dev.n,
                scatter=self.scatter, pallas=use_pallas, fmtab=self.fmtab,
                nbp=self.nbp, compact=True, packed_seqs=True,
                ablate=tuple(sorted(
                    x for x in os.environ.get("FQ_BS_ABLATE",
                                              "").split(",")
                    if x)))
            if prof:
                jax.block_until_ready((meta_d, rows_d))
                t_disp = _time.perf_counter() - t0
                t0 = _time.perf_counter()
            # the first asarray forces dispatch: compile/relay failures
            # surface here
            meta = np.asarray(meta_d)  # [n_aln | offs | fallback] flat
        except Exception as e:
            # Mosaic compile / relay failure must DEGRADE, never crash
            # the align run (a VMEM OOM at production index scale
            # surfaced exactly here: the 6.5 Mbp panel's packed table
            # pushed the resident kernel 553 KB over the scoped limit)
            from ..utils.logging import warning

            warning("device search failed (%s: %.160s); %s",
                    type(e).__name__, str(e),
                    "retrying with the XLA device path" if use_pallas
                    else "falling back to the exact host engine")
            if self.pallas:
                self.pallas = False  # stop re-attempting Mosaic
                return self._run_chunk(todo, opt)
            self.host.align_batch(todo, opt)
            self.last_fallback += len(todo)
            self.last_fb_causes["devfail"] = (
                self.last_fb_causes.get("devfail", 0) + len(todo))
            return
        n_aln = meta[:Npad]
        offs = meta[Npad:2 * Npad]
        fallback = meta[2 * Npad:]
        self.last_iters += int(rounds) * int(self.inner)
        self.last_fallback += int((fallback[:B] != 0).sum())
        self._count_causes(fallback[:B])
        self.last_busy += int(busy)
        fb_list = fallback.tolist()
        fb_reads = [p for b, p in enumerate(todo) if fb_list[b]]
        # overlap the exact host redo with the hit-row D2H + decode
        # (the native engine releases the GIL)
        fb_thread = None
        if fb_reads:
            import threading

            fb_thread = threading.Thread(
                target=self.host.align_batch, args=(fb_reads, opt))
            fb_thread.start()
        rows = np.asarray(rows_d)  # compact (K_CAP, 3) hit rows
        t_d2h = _time.perf_counter() - t0
        t0 = _time.perf_counter()

        # vectorized field decode + plain-int lists: the old per-element
        # numpy bit-op loop was ~0.15s/chunk at 32k reads
        f0 = rows[:, 0]
        mm_l = (f0 & 63).tolist()
        go_l = ((f0 >> 6) & 63).tolist()
        ge_l = ((f0 >> 12) & 63).tolist()
        a_l = ((f0 >> 18) & 1).tolist()
        sc_l = ((f0 >> 19) & 127).tolist()
        k_l = rows[:, 1].tolist()
        l_l = rows[:, 2].tolist()
        n_list = n_aln.tolist()
        o_list = offs.tolist()

        for b, p in enumerate(todo):
            if fb_list[b]:
                continue
            s = o_list[b]
            p.aln = [Aln(mm_l[i], go_l[i], ge_l[i], a_l[i],
                         k_l[i], l_l[i], sc_l[i])
                     for i in range(s, s + n_list[b])]
            p.n_aln = len(p.aln)
        t_unpack = _time.perf_counter() - t0
        t0 = _time.perf_counter()
        if fb_thread is not None:
            fb_thread.join()
        if prof:
            print(f"# BS_PROF chunk B={B}: pack {t_pack:.3f}s "
                  f"dispatch {t_disp:.3f}s d2h {t_d2h:.3f}s "
                  f"unpack {t_unpack:.3f}s "
                  f"fallback({len(fb_reads)}) "
                  f"{_time.perf_counter() - t0:.3f}s", flush=True)
