"""Device paired-end semantics: isize inference + pairing + pair status.

TPU-native formulation of the reference's PE machinery so the full PE
hot path runs inside one jitted program (VERDICT r02 missing #1):

- infer_isize (libbwa/bwape.c:49-118) reformulated over an EXACT integer
  histogram of candidate insert sizes: quantiles, the censor window and
  the subset moments are all derived from the histogram, so a psum of
  shard histograms makes multi-chip inference bitwise-identical to a
  single device (the reference infers per 262144-read batch; a sharded
  batch psums first).  Includes the C quirk of the variance accumulator
  starting at -1.0 (bwape.c:85-88, mirrored from align/pe.py).
- pairing (bwape.c:119-215) as a lockstep lax.scan over each pair's
  position-sorted occurrence list, with the u64 pair-score key
  (score<<32 | hash_64) emulated in uint32 pairs -- including the
  reference's OR-collision of the hash's high word into the score word
  and the `s>>32 < (o_score<<32 & U64MAX)` comparison, which reduces to
  `o_lo != 0` (see align/pe.py:168-177 for the host mirror of the same
  quirks).
- ProcessPairStatus (src/StatCollector.cpp:623-948) as accumulators:
  status counts, the actual-insert histogram, PCR-duplicate keys and
  pair-read counters, including the host's pos - leading-clip insert
  arithmetic and no-clip dup gate for rescue-injected ends
  (qc_full's pe_fill; kernel-mapped ends carry zero clips).

Everything is f32/int32 (no x64 requirement); the only documented float
deviations from the C doubles are the isize mean/std (<=1e-5 rel) and
the erfc-threshold grid, pinned by tests/test_pe_device.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

ISIZE_HIST = 100_000  # candidate inserts < 100000 (bwape.c:75)
U32 = jnp.uint32


# ---------------- uint32-pair u64 emulation ----------------

def _u64_add(ahi, alo, bhi, blo):
    lo = alo + blo
    carry = (lo < alo).astype(U32)
    return ahi + bhi + carry, lo


def _u64_not(hi, lo):
    return ~hi, ~lo


def _u64_shl(hi, lo, k: int):
    if k == 0:
        return hi, lo
    if k >= 32:
        return lo << (k - 32) if k > 32 else lo, jnp.zeros_like(lo)
    return (hi << k) | (lo >> (32 - k)), lo << k


def _u64_shr(hi, lo, k: int):
    if k == 0:
        return hi, lo
    if k >= 32:
        return jnp.zeros_like(hi), hi >> (k - 32) if k > 32 else hi
    return hi >> k, (lo >> k) | (hi << (32 - k))


def _u64_xor(ahi, alo, bhi, blo):
    return ahi ^ bhi, alo ^ blo


def _u64_lt(ahi, alo, bhi, blo):
    return (ahi < bhi) | ((ahi == bhi) & (alo < blo))


def hash_64_u32(hi, lo):
    """hash_64 (align/pe.py:56-70 / bwtaln's khash mix) on uint32 pairs."""
    # key += ~(key << 32)
    nhi, nlo = _u64_not(lo, jnp.zeros_like(lo))
    hi, lo = _u64_add(hi, lo, nhi, nlo)
    # key ^= key >> 22
    hi, lo = _u64_xor(hi, lo, *_u64_shr(hi, lo, 22))
    # key += ~(key << 13)
    nhi, nlo = _u64_not(*_u64_shl(hi, lo, 13))
    hi, lo = _u64_add(hi, lo, nhi, nlo)
    # key ^= key >> 8
    hi, lo = _u64_xor(hi, lo, *_u64_shr(hi, lo, 8))
    # key += key << 3
    hi, lo = _u64_add(hi, lo, *_u64_shl(hi, lo, 3))
    # key ^= key >> 15
    hi, lo = _u64_xor(hi, lo, *_u64_shr(hi, lo, 15))
    # key += ~(key << 27)
    nhi, nlo = _u64_not(*_u64_shl(hi, lo, 27))
    hi, lo = _u64_add(hi, lo, nhi, nlo)
    # key ^= key >> 31
    hi, lo = _u64_xor(hi, lo, *_u64_shr(hi, lo, 31))
    return hi, lo


# ---------------- insert-size inference ----------------

def isize_hist_local(pos0, pos1, len0, len1, mapq0, mapq1, both_mapped):
    """This shard's candidate-isize histogram + max read length
    (bwape.c:55-66: pairs with both SE mapQ >= 20, x < 100000)."""
    take = both_mapped & (mapq0 >= 20) & (mapq1 >= 20)
    x = jnp.where(pos0 < pos1, pos1 + len1 - pos0, pos0 + len0 - pos1)
    take = take & (x < ISIZE_HIST) & (x >= 0)
    hist = jnp.zeros(ISIZE_HIST, jnp.int32).at[
        jnp.where(take, x, 0)].add(take.astype(jnp.int32))
    max_len = jnp.maximum(jnp.max(len0), jnp.max(len1))
    return hist, max_len


def infer_isize_from_hist(hist, max_len, ap_prior: float, l_pac: int,
                          last_ii=None):
    """infer_isize (bwape.c:49-118) from the exact integer histogram.
    Returns ii = (ok, avg, std, low, high, high_bayesian, ap_prior) as a
    (7,) f32 vector (ok > 0 means the estimate is valid).  If this batch
    fails (tot < 20 / degenerate std) and last_ii is given, last_ii is
    returned (the driver's carry-forward, align/driver.py:306-307)."""
    v = jnp.arange(ISIZE_HIST, dtype=jnp.int32)
    h = hist
    tot = h.sum()
    cum = jnp.cumsum(h)  # inclusive counts <= v

    def q_at(idx):
        # sorted[idx] (0-based) = smallest v with cum(v) >= idx + 1
        return jnp.argmax(cum >= idx + 1).astype(jnp.int32)

    # C: isizes[(int)(tot*0.25+0.5)] -- the +0.5 biases one past for
    # exact quarters; float math on an int count is exact in f32 for
    # tot < 2^23
    p25 = q_at((tot.astype(jnp.float32) * 0.25 + 0.5).astype(jnp.int32))
    p75 = q_at((tot.astype(jnp.float32) * 0.75 + 0.5).astype(jnp.int32))
    iqr = (p75 - p25).astype(jnp.float32)
    tmp = (p25.astype(jnp.float32) - 2.0 * iqr + 0.499).astype(jnp.int32)
    low = jnp.maximum(tmp, max_len)
    high = (p75.astype(jnp.float32) + 2.0 * iqr + 0.499).astype(jnp.int32)
    in_win = (v >= low) & (v <= high)
    hw = jnp.where(in_win, h, 0)
    n = hw.sum()
    # exact integer first moment via a hi/lo split (hw * v would
    # overflow int32 when one bin holds > 2^31/1e5 entries)
    s1_hi = (hw * (v >> 8)).sum()
    s1_lo = (hw * (v & 255)).sum()
    avg = (256.0 * s1_hi.astype(jnp.float32)
           + s1_lo.astype(jnp.float32)) / n.astype(jnp.float32)
    dv = v.astype(jnp.float32) - avg
    # C quirk: the variance accumulator starts at -1.0 (bwape.c:85-88)
    var = -1.0 + (hw.astype(jnp.float32) * dv * dv).sum()
    std = jnp.sqrt(var / n.astype(jnp.float32))

    # y-grid bayesian high bound: first y in 1.00,1.01,... <10 with
    # 0.5*erfc(y/sqrt(2)) < ap_prior/l_pac*(y*std+avg)
    y = 1.0 + 0.01 * jnp.arange(900, dtype=jnp.float32)
    lhs = 0.5 * jax.scipy.special.erfc(y / np.sqrt(2.0))
    rhs = (ap_prior / l_pac) * (y * std + avg)
    hit = lhs < rhs
    yk = jnp.where(hit.any(), y[jnp.argmax(hit)], 10.0)
    high_b = (yk * std + avg + 0.499).astype(jnp.int32)
    n_ap = tot - cum[jnp.clip(high_b, 0, ISIZE_HIST - 1)]
    ap2 = 0.01 * (n_ap.astype(jnp.float32) + 0.01) / tot.astype(jnp.float32)
    ap2 = jnp.maximum(ap2, jnp.float32(ap_prior))

    ok = (tot >= 20) & ~jnp.isnan(std)
    ii = jnp.stack([
        jnp.where(ok, 1.0, 0.0),
        jnp.where(ok, avg, -1.0),
        jnp.where(ok, std, -1.0),
        jnp.where(ok, low.astype(jnp.float32), 0.0),
        jnp.where(ok, high.astype(jnp.float32), 0.0),
        jnp.where(ok, high_b.astype(jnp.float32), 0.0),
        jnp.where(ok, ap2, jnp.float32(ap_prior)),
    ])
    if last_ii is not None:
        ii = jnp.where(ok | (last_ii[0] <= 0.0), ii, last_ii)
    return ii


# ---------------- occurrence expansion ----------------

def expand_occurrences(sa, n_text: int, n_aln, alns, lens, k_occ: int):
    """All hit occurrences of each read as flat arrays (bwa_cal_pac_pos_pe
    builds the same list per pair, src/BwtMapper.cpp:797-840).

    alns: packed kernel rows (B, A_MAX, 3).  Returns dict with (B, k_occ)
    planes pos/row_idx/valid plus per-read n_occ (TRUE total, so callers
    can detect reads the static cap truncated)."""
    B, A, _ = alns.shape
    meta = alns[:, :, 0]
    k = alns[:, :, 1]
    l = alns[:, :, 2]
    used = jnp.arange(A)[None, :] < n_aln[:, None]
    w = jnp.where(used, l - k + 1, 0)  # (B, A)
    n_occ = w.sum(axis=1)
    starts = jnp.cumsum(w, axis=1) - w  # first slot of each row
    # slot t belongs to row r with starts[r] <= t < starts[r] + w[r]
    t = jnp.arange(k_occ)[None, None, :]  # (1, 1, K)
    in_row = (t >= starts[:, :, None]) & (t < (starts + w)[:, :, None])
    row_of = jnp.where(
        in_row, jnp.arange(A, dtype=jnp.int32)[None, :, None], 0
    ).sum(axis=1)  # (B, K)
    valid = in_row.any(axis=1)
    off = t[:, 0, :] - jnp.take_along_axis(starts, row_of, axis=1)
    sa_row = jnp.take_along_axis(k, row_of, axis=1) + off
    strand = (jnp.take_along_axis(meta, row_of, axis=1) >> 18) & 1
    sa_row_c = jnp.clip(sa_row, 0, n_text)
    pos_f = sa[0, sa_row_c]
    pos_r = n_text - (sa[1, sa_row_c] + lens[:, None])
    pos = jnp.where(strand == 1, pos_f, pos_r)
    return dict(pos=jnp.where(valid, pos, 0), row=row_of, valid=valid,
                n_occ=n_occ)


# ---------------- pairing sweep ----------------

INT_MIN = -(2 ** 31)


def pairing_sweep(occ0, occ1, alns0, alns1, se0, se1, pair_ok,
                  ii, s_mm: int, max_isize: int, g_log_n):
    """pairing (bwape.c:119-215) vectorized over P pairs.

    occj: expand_occurrences dicts for end j; alnsj: packed rows
    (P, A_MAX, 3); sej: dict of SE state per end (pos, strand, mapq,
    seq_q, n_mm, n_gapo, n_gape, score, len); pair_ok: (P,) pairs that
    enter pairing at all.  Returns per-end updated state + cnt_chg +
    the chosen-pair flag (SAM_FPP analog)."""
    P, K = occ0["pos"].shape
    NK = 2 * K
    # per-pair max read length (bwape.c:127: max of the two full_len)
    max_len = jnp.maximum(se0["len"], se1["len"])

    # merged entry list per pair, C sort key (pos<<32 | row<<1 | end):
    # two stable argsorts emulate the u64 lexsort without int64
    pos = jnp.concatenate([occ0["pos"], occ1["pos"]], axis=1)
    row = jnp.concatenate([occ0["row"], occ1["row"]], axis=1)
    end = jnp.concatenate([jnp.zeros((P, K), jnp.int32),
                           jnp.ones((P, K), jnp.int32)], axis=1)
    valid = (jnp.concatenate([occ0["valid"], occ1["valid"]], axis=1)
             & pair_ok[:, None])
    sub = (row << 1) | end
    o1 = jnp.argsort(jnp.where(valid, sub, 0x7FFFFFFF), axis=1,
                     stable=True)
    pos_s = jnp.take_along_axis(pos, o1, axis=1)
    valid_s = jnp.take_along_axis(valid, o1, axis=1)
    o2 = jnp.argsort(jnp.where(valid_s, pos_s, 0x7FFFFFFF), axis=1,
                     stable=True)
    order = jnp.take_along_axis(o1, o2, axis=1)
    pos = jnp.take_along_axis(pos, order, axis=1)
    row = jnp.take_along_axis(row, order, axis=1)
    end = jnp.take_along_axis(end, order, axis=1)
    valid = jnp.take_along_axis(valid, order, axis=1)

    def row_meta(e_arr, r_arr):
        m0 = jnp.take_along_axis(alns0[:, :, 0], r_arr, axis=1)
        m1 = jnp.take_along_axis(alns1[:, :, 0], r_arr, axis=1)
        return jnp.where(e_arr == 0, m0, m1)

    meta = row_meta(end, row)
    strand = (meta >> 18) & 1
    score = (meta >> 19) & 127
    len_of_end = jnp.where(end == 0, se0["len"][:, None],
                           se1["len"][:, None])

    avg, std = ii[1], ii[2]
    has_high = ii[4] > 0.0
    high_b = ii[5].astype(jnp.int32)

    def penalty(l):
        # C float semantics incl. the INT_MIN cast of inf/nan ratios
        # (align/pe.py:156-167)
        ratio = jnp.abs(l.astype(jnp.float32) - avg) / std
        p = -4.343 * jnp.log(
            0.5 * jax.scipy.special.erfc(ratio / np.sqrt(2.0))) + 0.499
        bad = jnp.isnan(p) | jnp.isinf(p) | jnp.isnan(ratio)
        return jnp.where(bad, INT_MIN, p.astype(jnp.int32))

    ones32 = jnp.uint32(0xFFFFFFFF)

    def scan_step(carry, t):
        (o_hi, o_lo, s_hi, s_lo, o_n, subo_n,
         o_set, o_u_pos, o_u_end, o_u_row, o_v_pos, o_v_end, o_v_row,
         lp_pos, lp_row, lp_valid) = carry
        # entry t (per pair): lockstep over P
        e_pos = pos[:, t]
        e_row = row[:, t]
        e_end = end[:, t]
        e_val = valid[:, t]
        e_strand = strand[:, t]
        e_score = score[:, t]
        e_len = len_of_end[:, t]
        is_rev = e_val & (e_strand == 1)
        is_fwd = e_val & (e_strand == 0)

        def aux(carry, u_pos, u_row, u_valid, u_end):
            (o_hi, o_lo, s_hi, s_lo, o_n, subo_n, o_set,
             o_u_pos, o_u_end, o_u_row, o_v_pos, o_v_end, o_v_row) = carry
            l = e_pos + e_len - u_pos
            gate = (is_rev & u_valid & (e_pos > u_pos) & (l >= max_len)
                    & jnp.where(has_high,
                                l <= high_b,
                                l <= max_isize))
            u_meta = row_meta(u_end[:, None], u_row[:, None])[:, 0]
            u_score = (u_meta >> 19) & 127
            s = (e_score + u_score) * 10
            # int32 add wraps like C's (s + INT_MIN stays the low word
            # the u64 key sees; align/pe.py:164-167)
            s = jnp.where(has_high, s + penalty(l), s)
            # key = (s<<32) | hash_64(u_pos<<32 | v_pos): the hash's
            # high word OR-collides into the score word (C quirk)
            h_hi, h_lo = hash_64_u32(u_pos.astype(U32), e_pos.astype(U32))
            k_hi = s.astype(U32) | h_hi
            k_lo = h_lo
            same_hi = gate & (k_hi == o_hi)
            # C compares s>>32 < (o_score<<32 & U64MAX), which is just
            # "o_score's low word is nonzero" (align/pe.py:171-174)
            reset = gate & ~same_hi & (o_lo != 0)
            o_n2 = jnp.where(same_hi, o_n + 1,
                             jnp.where(reset, 1, o_n))
            subo_n2 = jnp.where(reset, subo_n + o_n,
                                jnp.where(gate & ~same_hi, subo_n + 1,
                                          subo_n))
            better = gate & _u64_lt(k_hi, k_lo, o_hi, o_lo)
            better_sub = gate & ~better & _u64_lt(k_hi, k_lo, s_hi, s_lo)
            s_hi2 = jnp.where(better, o_hi, jnp.where(better_sub, k_hi,
                                                      s_hi))
            s_lo2 = jnp.where(better, o_lo, jnp.where(better_sub, k_lo,
                                                      s_lo))
            o_hi2 = jnp.where(better, k_hi, o_hi)
            o_lo2 = jnp.where(better, k_lo, o_lo)
            o_set2 = o_set | better
            o_u_pos2 = jnp.where(better, u_pos, o_u_pos)
            o_u_end2 = jnp.where(better, u_end, o_u_end)
            o_u_row2 = jnp.where(better, u_row, o_u_row)
            o_v_pos2 = jnp.where(better, e_pos, o_v_pos)
            o_v_end2 = jnp.where(better, e_end, o_v_end)
            o_v_row2 = jnp.where(better, e_row, o_v_row)
            return (o_hi2, o_lo2, s_hi2, s_lo2, o_n2, subo_n2, o_set2,
                    o_u_pos2, o_u_end2, o_u_row2, o_v_pos2, o_v_end2,
                    o_v_row2)

        # pair with the opposite end's last two forward entries
        # (slot 1 = most recent first, then slot 0; bwape.c:158-160)
        opp = 1 - e_end
        aux_carry = (o_hi, o_lo, s_hi, s_lo, o_n, subo_n, o_set,
                     o_u_pos, o_u_end, o_u_row, o_v_pos, o_v_end, o_v_row)
        for slot in (1, 0):
            u_pos = jnp.take_along_axis(
                lp_pos, (opp * 2 + slot)[:, None], axis=1)[:, 0]
            u_row = jnp.take_along_axis(
                lp_row, (opp * 2 + slot)[:, None], axis=1)[:, 0]
            u_valid = jnp.take_along_axis(
                lp_valid, (opp * 2 + slot)[:, None], axis=1)[:, 0]
            aux_carry = aux(aux_carry, u_pos, u_row, u_valid, opp)
        (o_hi, o_lo, s_hi, s_lo, o_n, subo_n, o_set,
         o_u_pos, o_u_end, o_u_row, o_v_pos, o_v_end, o_v_row) = aux_carry

        # forward entries shift into last_pos[end]
        col = e_end * 2  # slot0 column of this end
        shift = is_fwd
        # slot0 <- slot1; slot1 <- entry   (only for this end's columns)
        sel0 = jnp.arange(4)[None, :] == col[:, None]
        sel1 = jnp.arange(4)[None, :] == (col + 1)[:, None]
        old1_pos = jnp.take_along_axis(lp_pos, (col + 1)[:, None],
                                       axis=1)[:, 0]
        old1_row = jnp.take_along_axis(lp_row, (col + 1)[:, None],
                                       axis=1)[:, 0]
        old1_val = jnp.take_along_axis(lp_valid, (col + 1)[:, None],
                                       axis=1)[:, 0]
        m = shift[:, None]
        lp_pos = jnp.where(m & sel0, old1_pos[:, None], lp_pos)
        lp_row = jnp.where(m & sel0, old1_row[:, None], lp_row)
        lp_valid = jnp.where(m & sel0, old1_val[:, None], lp_valid)
        lp_pos = jnp.where(m & sel1, e_pos[:, None], lp_pos)
        lp_row = jnp.where(m & sel1, e_row[:, None], lp_row)
        lp_valid = jnp.where(m & sel1, jnp.ones_like(lp_valid), lp_valid)

        return (o_hi, o_lo, s_hi, s_lo, o_n, subo_n, o_set,
                o_u_pos, o_u_end, o_u_row, o_v_pos, o_v_end, o_v_row,
                lp_pos, lp_row, lp_valid), None

    z32 = jnp.zeros(P, jnp.int32)
    init = (jnp.full(P, ones32), jnp.full(P, ones32),
            jnp.full(P, ones32), jnp.full(P, ones32),
            z32, z32, jnp.zeros(P, bool),
            z32, z32, z32, z32, z32, z32,
            jnp.zeros((P, 4), jnp.int32), jnp.zeros((P, 4), jnp.int32),
            jnp.zeros((P, 4), bool))
    carry, _ = jax.lax.scan(scan_step, init, jnp.arange(NK))
    (o_hi, o_lo, s_hi, s_lo, o_n, subo_n, o_set,
     o_u_pos, o_u_end, o_u_row, o_v_pos, o_v_end, o_v_row,
     _, _, _) = carry

    found = o_set  # o_score != U64MAX iff some candidate was taken

    # mapQ_p (bwape.c:169-181): high words are the OR-mixed score words;
    # the difference is a uint64 subtraction in C, so compare unsigned
    # (sub >= o by construction) -- only the <= s_mm*10 case reaches the
    # g_log_n formula, where the value fits int32 exactly
    diff_u = s_hi - o_hi  # uint32
    no_sub = (s_hi == ones32) & (s_lo == ones32)
    n_cap = jnp.clip(subo_n, 0, 255)
    small = (diff_u // 2).astype(jnp.int32)
    mapq_p = jnp.where(
        o_n == 1,
        jnp.where(no_sub, 29,
                  jnp.where(diff_u > jnp.uint32(s_mm * 10), 23,
                            jnp.maximum(small - g_log_n[n_cap], 0))),
        0)

    # chosen rows per end: o_pos[j]
    u_is0 = o_u_end == 0
    ch_pos0 = jnp.where(u_is0, o_u_pos, o_v_pos)
    ch_row0 = jnp.where(u_is0, o_u_row, o_v_row)
    ch_pos1 = jnp.where(u_is0, o_v_pos, o_u_pos)
    ch_row1 = jnp.where(u_is0, o_v_row, o_u_row)

    def end_update(se, alns, ch_pos, ch_row):
        meta = jnp.take_along_axis(alns[:, :, 0], ch_row[:, None],
                                   axis=1)[:, 0]
        r_strand = (meta >> 18) & 1
        matches = (se["pos"] == ch_pos) & (se["strand"] == r_strand)
        return meta, r_strand, matches

    meta0, rst0, m0 = end_update(se0, alns0, ch_pos0, ch_row0)
    meta1, rst1, m1 = end_update(se1, alns1, ch_pos1, ch_row1)

    mq0, mq1 = se0["mapq"], se1["mapq"]
    sq0, sq1 = se0["seq_q"], se1["seq_q"]
    both = m0 & m1
    both_pos = both & (mq0 > 0) & (mq1 > 0)
    mq_sum = jnp.minimum(mq0 + mq1, 60)
    new_mq0 = jnp.where(both_pos, mq_sum, mq0)
    new_mq1 = jnp.where(both_pos, mq_sum, mq1)
    fix0 = both & ~both_pos & (mq0 == 0)
    fix1 = both & ~both_pos & (mq1 == 0)
    new_mq0 = jnp.where(fix0, jnp.minimum(mapq_p + 7, new_mq1), new_mq0)
    new_mq1 = jnp.where(fix1, jnp.minimum(mapq_p + 7, new_mq0), new_mq1)
    only0 = m0 & ~m1
    only1 = m1 & ~m0
    new_sq1 = jnp.where(only0, 0, sq1)
    new_mq1 = jnp.where(only0, jnp.minimum(mq0, mapq_p), new_mq1)
    new_sq0 = jnp.where(only1, 0, sq0)
    new_mq0 = jnp.where(only1, jnp.minimum(mq1, mapq_p), new_mq0)
    neither = ~m0 & ~m1
    mq_n = jnp.maximum(mapq_p - 20, 0)
    new_sq0 = jnp.where(neither, 0, new_sq0)
    new_sq1 = jnp.where(neither, 0, new_sq1)
    new_mq0 = jnp.where(neither, mq_n, new_mq0)
    new_mq1 = jnp.where(neither, mq_n, new_mq1)

    def final_end(se, meta, ch_pos, rst, new_mq, new_sq):
        moved = (se["pos"] != ch_pos) | (se["strand"] != rst)
        out = dict(se)
        out["pos"] = jnp.where(found & moved, ch_pos, se["pos"])
        out["strand"] = jnp.where(found & moved, rst, se["strand"])
        out["n_mm"] = jnp.where(found & moved, meta & 63, se["n_mm"])
        out["n_gapo"] = jnp.where(found & moved, (meta >> 6) & 63,
                                  se["n_gapo"])
        out["n_gape"] = jnp.where(found & moved, (meta >> 12) & 63,
                                  se["n_gape"])
        out["mapq"] = jnp.where(found, new_mq, se["mapq"])
        out["seq_q"] = jnp.where(found, new_sq, se["seq_q"])
        out["proper"] = found
        chg = found & moved & (out["mapq"] > 0)
        return out, chg

    out0, chg0 = final_end(se0, meta0, ch_pos0, rst0, new_mq0, new_sq0)
    out1, chg1 = final_end(se1, meta1, ch_pos1, rst1, new_mq1, new_sq1)
    cnt_chg = (chg0.astype(jnp.int32) + chg1.astype(jnp.int32)).sum()
    return out0, out1, cnt_chg


# ---------------- pair status taxonomy ----------------

# status codes (device enum; the host writes the strings)
ST_PROP, ST_PARTIAL, ST_FWD, ST_REV, ST_NOTPAIR, ST_LOWQ, ST_ABNORMAL, \
    ST_DIFFCHROM = range(8)

INSERT_SIZE_LIMIT = 4096


def pair_status(tables_cid, contig_off, contig_len, n_text: int,
                se0, se1, mapped0, mapped1):
    """ProcessPairStatus (src/StatCollector.cpp:623-948) as accumulators.
    Soft clips only arise from mate rescue: rescued ends carry their
    (leading, trailing) clip widths in se["cl_l"]/se["cl_r"] (injected
    via qc_full's pe_fill; zero for kernel-mapped ends), reproducing
    the host's `pos - cl_left` insert arithmetic and the no-clip gate
    of the PCR-dup key.  Returns (status (P,), actual_insert (P,),
    dup keys (P, 2), counters)."""
    p_pos, q_pos = se0["pos"], se1["pos"]
    p_str, q_str = se0["strand"], se1["strand"]
    p_len, q_len = se0["len"], se1["len"]
    p_mq, q_mq = se0["mapq"], se1["mapq"]
    zz = jnp.zeros_like(p_pos)
    cl1 = se0.get("cl_l", zz)
    cl2 = se0.get("cl_r", zz)
    cl3 = se1.get("cl_l", zz)
    cl4 = se1.get("cl_r", zz)
    cid_p = tables_cid[jnp.clip(p_pos, 0, n_text)]
    cid_q = tables_cid[jnp.clip(q_pos, 0, n_text)]
    off_p = contig_off[jnp.clip(cid_p, 0, contig_off.shape[0] - 1)]
    len_p = contig_len[jnp.clip(cid_p, 0, contig_len.shape[0] - 1)]
    off_q = contig_off[jnp.clip(cid_q, 0, contig_off.shape[0] - 1)]
    len_q = contig_len[jnp.clip(cid_q, 0, contig_len.shape[0] - 1)]

    both = mapped0 & mapped1
    single_p = mapped0 & ~mapped1
    single_q = mapped1 & ~mapped0

    # single-end rows (FirstOnly/SecondOnly): Fwd/Rev Only or LowQual
    def single_status(pos, strnd, ln, mq, off, cln):
        # single rows only exist when the end passed AddSingleAlignment's
        # mapQ >= 20 gate (AddAlignment, StatCollector.cpp:737-760), so
        # the LowQual single branch is dead code in the reference; and
        # non-fitting mapQ>0 singles produce NO row (return 2 without
        # writing): status -1
        rev_fit = off + cln >= pos + ln
        fwd_fit = pos >= off
        st = jnp.where(mq >= 20,
                       jnp.where(strnd == 1,
                                 jnp.where(rev_fit, ST_REV, -1),
                                 jnp.where(fwd_fit, ST_FWD, -1)),
                       -1)
        return st

    st_p = single_status(p_pos, p_str, p_len, p_mq, off_p, len_p)
    st_q = single_status(q_pos, q_str, q_len, q_mq, off_q, len_q)

    # Both: FR geometry gates (pos - leading_clip arithmetic like the
    # host collector; cl* are zero except for rescue-injected ends)
    pa = p_pos - cl1  # clip-adjusted starts
    qa = q_pos - cl3
    fr1 = (p_str == 0) & (q_str == 1) & (p_pos < q_pos)
    fr2 = (q_str == 0) & (p_str == 1) & (q_pos < p_pos)
    mi1 = jnp.where(fr1 & (pa >= off_p), off_p + len_p - pa, -1)
    mi2_1 = jnp.where(fr1 & (off_q + len_q >= qa + q_len),
                      qa + q_len - off_q, -1)
    mi_2 = jnp.where(fr2 & (qa >= off_q), off_q + len_q - qa, -1)
    mi2_2 = jnp.where(fr2 & (off_p + len_p >= pa + p_len),
                      pa + p_len - off_p, -1)
    max_i = jnp.where(fr1, mi1, jnp.where(fr2, mi_2, -1))
    max_i2 = jnp.where(fr1, mi2_1, jnp.where(fr2, mi2_2, -1))
    max_i = jnp.minimum(max_i, INSERT_SIZE_LIMIT - 1)
    max_i2 = jnp.minimum(max_i2, INSERT_SIZE_LIMIT - 1)

    diff_contig = cid_p != cid_q
    not_fr = ~fr1 & ~fr2
    low_q = (p_mq <= 0) | (q_mq <= 0)
    start = jnp.where(fr1, pa, qa)
    end = jnp.where(fr1, qa + q_len, pa + p_len)
    actual = jnp.where(fr1 | fr2, end - start, -1)
    no_clip = jnp.where(fr1, (cl1 == 0) & (cl4 == 0),
                        (cl3 == 0) & (cl2 == 0))
    prop = (max_i != -1) & (max_i2 != -1)
    st_both = jnp.where(
        not_fr | diff_contig, ST_NOTPAIR,
        jnp.where(low_q, ST_LOWQ,
                  jnp.where(prop, ST_PROP, ST_PARTIAL)))

    status = jnp.where(
        both, st_both,
        jnp.where(single_p, st_p,
                  jnp.where(single_q, st_q, -1)))

    # insert-size histogram rows: same-contig NotPair counts bin 0
    # (StatCollector.cpp:668-672); PropPair/PartialPair count `actual`
    take_actual = both & ~not_fr & ~diff_contig & ~low_q
    take_zero = both & ~not_fr & diff_contig
    bins = jnp.where(take_actual, jnp.clip(actual, 0,
                                           INSERT_SIZE_LIMIT - 1), 0)
    ones = (take_actual | take_zero).astype(jnp.int32)
    isize_dist = jnp.zeros(INSERT_SIZE_LIMIT, jnp.int32).at[bins].add(ones)

    # PCR-duplicate keys + pair-read counting: PropPair AND no clips
    # (StatCollector.cpp:698-706 gates both on prop_pair && no_clip)
    keyv = both & ~not_fr & ~diff_contig & ~low_q & prop & no_clip
    dup_keys = jnp.stack(
        [jnp.where(keyv, cid_p, 0x7FFFFFFF),
         jnp.where(keyv, start, 0x7FFFFFFF),
         jnp.where(keyv, end, 0x7FFFFFFF)], axis=1)
    n_pair_reads = 2 * keyv.astype(jnp.int32).sum()

    st_counts = jnp.zeros(8, jnp.int32).at[
        jnp.clip(status, 0, 7)].add((status >= 0).astype(jnp.int32))
    # single rows carry the single end's max_insert fields
    mi_s = jnp.where(single_p, jnp.where((p_str == 0) & (p_pos >= off_p),
                                         off_p + len_p - p_pos, -1),
                     jnp.where(single_q,
                               jnp.where((q_str == 0) & (q_pos >= off_q),
                                         off_q + len_q - q_pos, -1), -1))
    mi2_s = jnp.where(single_p,
                      jnp.where((p_str == 1)
                                & (off_p + len_p >= p_pos + p_len),
                                p_pos + p_len - off_p, -1),
                      jnp.where(single_q,
                                jnp.where((q_str == 1)
                                          & (off_q + len_q
                                             >= q_pos + q_len),
                                          q_pos + q_len - off_q, -1), -1))
    # the reported row `actual` is -1 outside the both-mapped
    # PropPair/PartialPair branch (single-end and NotPair/LowQual rows
    # print -1, StatCollector.cpp:685-721); the histogram above keeps
    # its own take_actual gating
    actual_row = jnp.where(both & ~not_fr & ~diff_contig & ~low_q,
                           actual, -1)
    return dict(status=status, actual=actual_row, isize_dist=isize_dist,
                dup_keys=dup_keys, n_pair_reads=n_pair_reads,
                status_counts=st_counts,
                mi=jnp.where(both, max_i, mi_s),
                mi2=jnp.where(both, max_i2, mi2_s),
                cid_p=cid_p, cid_q=cid_q)
