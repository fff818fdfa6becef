"""Pallas TPU kernel: batched local Smith-Waterman forward pass (K3).

The mate-rescue aligner (reference bwa_sw_core -> aln_local_core,
libbwa/stdaln.c:529-745) runs a local DP over a ~600bp expected-insert
window per unpaired mate.  This kernel computes the forward pass -- best
score and end coordinates -- for a whole batch of (window, read) pairs in
one launch:

- grid over batch tiles; each program holds a (TB, RL) block in VMEM with
  the 8-sublane x 128-lane VPU shape;
- query rows processed with fori_loop; the horizontal (F) gap dependency
  is resolved with log-step prefix scans (see below);
- scoring matches aln_param_bwa / aln_sm_maq: match 11, mismatch -19,
  vs-N -13, gap open 26 + ext 9.

Freeze-F semantics (EXACT, round 4): the C code updates its running F
only at cells whose left neighbor is positive (stdaln.c:278-284 -- `if
(last_h > 0) f = max(f - r, last_h - qr)`), so F is FROZEN (not
decayed, not applied) across zero-score runs.  The gated recurrence
  f_k = gate_k ? max(f_{k-1} - r, h_{k-1} - qr) : f_{k-1}
  h_k = max(hnf_k, gate_k ? f_k : -inf)          gate_k = h_{k-1} > 0
is an affine max-plus scan given the gates: with a_k = gate_k ? -r : 0
and b_k = gate_k ? h_{k-1} - qr : -inf,
  f_k = A_k + max(0, max_{m<=k} (b_m - A_m)),   A = prefix-sum(a),
two log-step lane scans.  The gates themselves depend on h, so the row
iterates the scan to its (unique, acyclic-dependency) fixpoint -- the
serial left-to-right values -- via a while_loop; rows converge in one
or two passes except when an F-opened cell re-opens further gates.
Host oracle: align/dp.aln_local_core forward_pass, itself differential-
tested bit-exact against the compiled reference stdaln.c
(tests/test_ref_differential.py::test_aln_local_matches_reference).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MATCH, MISMATCH, VS_N = 11, -19, -13
GAP_OPEN, GAP_EXT = 26, 9
QR = GAP_OPEN + GAP_EXT

TB = 8  # batch tile (sublanes)
NEG = -(1 << 20)


def _sw_kernel(ref_ref, query_ref, rlen_ref, qlen_ref, out_ref, h_scr, e_scr,
               hrow_scr, best_scr, *, RL: int, QL: int):
    # zero state
    h_scr[:] = jnp.zeros((TB, RL), jnp.int32)
    e_scr[:] = jnp.zeros((TB, RL), jnp.int32)
    best_scr[:] = jnp.zeros((TB, 4), jnp.int32)  # score, end_i, end_j, pad

    lane = jax.lax.broadcasted_iota(jnp.int32, (TB, RL), 1)
    rlen = rlen_ref[:].reshape(TB, 1)
    ref_valid = lane < rlen
    refs = ref_ref[:]
    qall = query_ref[:]  # (TB, QL)
    qiota = jax.lax.broadcasted_iota(jnp.int32, (TB, QL), 1)

    def row(i, _):
        qlen = qlen_ref[:].reshape(TB, 1)
        # row i's query base via one-hot reduction: Mosaic cannot prove
        # lane-dimension dynamic slices are 128-aligned
        q = jnp.sum(jnp.where(qiota == i, qall, 0), axis=1,
                    keepdims=True)  # (TB, 1)
        h_prev = h_scr[:]
        e_prev = e_scr[:]
        valid = ref_valid & (i < qlen)
        # score of aligning q (row i) against each ref column;
        # any N involved scores VS_N even when both are N (aln_sm_maq row 4)
        is_n = (q == 4) | (refs == 4)
        m = jnp.where(is_n, VS_N, jnp.where(refs == q, MATCH, MISMATCH))
        # diagonal: H[i-1][j-1] -> shift right one lane, 0 in lane 0
        diag = pltpu.roll(h_prev, 1, 1)
        diag = jnp.where(lane == 0, 0, diag)
        base = jnp.maximum(diag + m, 0)
        # vertical gap E from the previous row
        e_new = jnp.maximum(e_prev - GAP_EXT, h_prev - QR)
        e_new = jnp.maximum(e_new, 0)
        hnf = jnp.where(valid, jnp.maximum(base, e_new), 0)
        # freeze-F fixpoint (see module docstring): iterate the gated
        # affine max-plus scan until the row's h stabilizes at the
        # serial left-to-right values of stdaln.c:278-284
        hrow_scr[:] = hnf

        def fix_cond(chg):
            return chg > 0

        def fix_body(_chg):
            h = hrow_scr[:]
            h_left = pltpu.roll(h, 1, 1)
            h_left = jnp.where(lane == 0, 0, h_left)
            gate = h_left > 0
            a = jnp.where(gate, -GAP_EXT, 0)
            b = jnp.where(gate, h_left - QR, NEG)
            # inclusive prefix-sum of a and prefix-max of (b - A)
            acc_a = a
            s = 1
            while s < RL:
                sh = pltpu.roll(acc_a, s, 1)
                acc_a = acc_a + jnp.where(lane < s, 0, sh)
                s <<= 1
            v = b - acc_a
            acc_m = v
            s = 1
            while s < RL:
                sh = pltpu.roll(acc_m, s, 1)
                acc_m = jnp.maximum(acc_m, jnp.where(lane < s, NEG, sh))
                s <<= 1
            f = acc_a + jnp.maximum(acc_m, 0)
            h_new = jnp.where(gate & valid, jnp.maximum(hnf, f), hnf)
            hrow_scr[:] = h_new
            return jnp.sum((h_new != h).astype(jnp.int32))

        jax.lax.while_loop(fix_cond, fix_body, jnp.int32(1))
        h = hrow_scr[:]
        h_scr[:] = h
        e_scr[:] = jnp.where(valid, e_new, 0)
        # track best (strictly-greater update preserves C's first-max tie rule)
        row_best = jnp.max(h, axis=1, keepdims=True)  # (TB,1)
        # first-occurrence argmax (int argmax is unsupported in Mosaic):
        # the smallest lane index whose value equals the row max
        row_arg = jnp.min(jnp.where(h == row_best, lane, RL),
                          axis=1, keepdims=True).astype(jnp.int32)
        cur = best_scr[:]
        better = row_best > cur[:, 0:1]  # (TB,1)
        new_best = jnp.concatenate(
            [row_best, row_arg + 1,
             jnp.full((TB, 1), i + 1, jnp.int32),
             jnp.zeros((TB, 1), jnp.int32)], axis=1)
        best_scr[:] = jnp.where(better, new_best, cur)
        return 0

    jax.lax.fori_loop(0, QL, row, 0)
    out_ref[:] = best_scr[:]


@functools.partial(jax.jit, static_argnames=("RL", "QL"))
def sw_forward_batch(refs, queries, rlens, qlens, RL: int, QL: int):
    """Batched local SW forward pass.

    refs: (B, RL) int32 codes (0..4); queries: (B, QL); rlens/qlens: (B,).
    Returns (B, 4) int32: [best_score, end_i(ref,1-based), end_j(query,
    1-based), 0]; zero score means no local match.
    """
    B = refs.shape[0]
    pad = (-B) % TB
    if pad:
        refs = jnp.concatenate([refs, jnp.zeros((pad, RL), jnp.int32)])
        queries = jnp.concatenate([queries, jnp.zeros((pad, QL), jnp.int32)])
        rlens = jnp.concatenate([rlens, jnp.zeros(pad, jnp.int32)])
        qlens = jnp.concatenate([qlens, jnp.zeros(pad, jnp.int32)])
    Bp = refs.shape[0]
    # rank-1 blocks of 8 violate Mosaic's 128-lane tiling; carry the
    # length vectors as (B, 1) so their blocks are (TB, 1) rank-2 tiles
    rlens2 = rlens.reshape(Bp, 1)
    qlens2 = qlens.reshape(Bp, 1)
    grid = (Bp // TB,)
    interpret = jax.default_backend() == "cpu"
    out = pl.pallas_call(
        functools.partial(_sw_kernel, RL=RL, QL=QL),
        out_shape=jax.ShapeDtypeStruct((Bp, 4), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, RL), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, QL), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, 4), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TB, RL), jnp.int32),
            pltpu.VMEM((TB, RL), jnp.int32),
            pltpu.VMEM((TB, RL), jnp.int32),  # current-row fixpoint
            pltpu.VMEM((TB, 4), jnp.int32),
        ],
        interpret=interpret,  # CPU backend (tests) has no Mosaic
    )(refs, queries, rlens2, qlens2)
    return out[:B]


def sw_local_batch_device(jobs: list[tuple[np.ndarray, np.ndarray]],
                          thres: int = 1) -> list:
    """Full aln_local_core over a batch of (ref, query) jobs with the
    DP passes on device: one forward kernel launch finds (score, end),
    one reverse launch on the reversed matched prefixes finds the
    start, then the (tiny) banded global path runs host-side exactly as
    the C does (stdaln.c:529-745 structure; the global aligner is
    align/dp.global_cigar).  Returns per job (score, cigar, (si, sj,
    ei, ej, bi, bj)) -- the contract of align/dp.local_align, to which
    this is differentially pinned (tests/test_sw_pallas.py)."""
    import jax.numpy as jnp

    from ..align.dp import global_cigar

    n = len(jobs)
    if n == 0:
        return []
    RL = max(-(-max(len(r) for r, _ in jobs) // 128) * 128, 128)
    QL = max(-(-max(len(q) for _, q in jobs) // 128) * 128, 128)
    refs = np.zeros((n, RL), np.int32)
    qs = np.zeros((n, QL), np.int32)
    rl = np.zeros(n, np.int32)
    ql = np.zeros(n, np.int32)
    for i, (r, q) in enumerate(jobs):
        refs[i, :len(r)] = r
        qs[i, :len(q)] = q
        rl[i], ql[i] = len(r), len(q)
    fwd = np.asarray(sw_forward_batch(
        jnp.asarray(refs), jnp.asarray(qs), jnp.asarray(rl),
        jnp.asarray(ql), RL=RL, QL=QL))
    # reverse pass on reversed matched prefixes (only surviving jobs)
    live = [i for i in range(n) if fwd[i, 0] >= thres and fwd[i, 1] > 0]
    rr = np.zeros((len(live), RL), np.int32)
    rq = np.zeros((len(live), QL), np.int32)
    rrl = np.zeros(len(live), np.int32)
    rql = np.zeros(len(live), np.int32)
    for j, i in enumerate(live):
        ei, ej = int(fwd[i, 1]), int(fwd[i, 2])
        rr[j, :ei] = jobs[i][0][:ei][::-1]
        rq[j, :ej] = jobs[i][1][:ej][::-1]
        rrl[j], rql[j] = ei, ej
    if live:
        rev = np.asarray(sw_forward_batch(
            jnp.asarray(rr), jnp.asarray(rq), jnp.asarray(rrl),
            jnp.asarray(rql), RL=RL, QL=QL))
    out = []
    rev_of = {i: j for j, i in enumerate(live)}
    for i in range(n):
        score = int(fwd[i, 0])
        if i not in rev_of:
            out.append((score if score else -1, [],
                        (0, 0, int(fwd[i, 1]), int(fwd[i, 2]), 0, 0)))
            continue
        j = rev_of[i]
        ei, ej = int(fwd[i, 1]), int(fwd[i, 2])
        si = ei - int(rev[j, 1]) + 1
        sj = ej - int(rev[j, 2]) + 1
        sub1 = jobs[i][0][si - 1:ei]
        sub2 = jobs[i][1][sj - 1:ej]
        cigar = global_cigar(np.asarray(sub1, np.uint8),
                             np.asarray(sub2, np.uint8))
        # begin cell of the global path (= local_align's bi/bj): the
        # first step lands on (1,1) for M, (1,0) for D, (0,1) for I
        from ..align.dp import FROM_D, FROM_I

        op0 = cigar[0][0] if cigar else 0
        bi = 0 if op0 == FROM_I else 1
        bj = 0 if op0 == FROM_D else 1
        out.append((score, cigar, (si, sj, ei, ej, bi, bj)))
    return out


def sw_forward_reference(ref: np.ndarray, query: np.ndarray
                         ) -> tuple[int, int, int]:
    """Numpy spec of the kernel: the forward pass of aln_local_core
    with the C freeze-F rule (stdaln.c:278-284; identical to
    align/dp.aln_local_core's forward_pass).  Returns (score, end_i,
    end_j) 1-based with end_i on the ref axis."""
    RL, QL = len(ref), len(query)
    h_prev = np.zeros(RL + 1, dtype=np.int64)
    e_prev = np.zeros(RL + 1, dtype=np.int64)
    best = (0, 0, 0)
    for i in range(1, QL + 1):
        h = np.zeros(RL + 1, dtype=np.int64)
        e = np.zeros(RL + 1, dtype=np.int64)
        f = 0
        for j in range(1, RL + 1):
            if ref[j - 1] == 4 or query[i - 1] == 4:
                m = VS_N
            elif ref[j - 1] == query[i - 1]:
                m = MATCH
            else:
                m = MISMATCH
            hv = max(h_prev[j - 1] + m, 0)
            if h[j - 1] > 0:  # freeze-F: update/apply only past live cells
                f = max(f - GAP_EXT, h[j - 1] - QR)
                hv = max(hv, f)
            e[j] = max(e_prev[j] - GAP_EXT, h_prev[j] - QR, 0)
            hv = max(hv, e[j])
            h[j] = hv
            if hv > best[0]:
                best = (int(hv), j, i)
        h_prev, e_prev = h, e
    return best
