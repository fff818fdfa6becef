"""Pallas TPU kernel: batched local Smith-Waterman forward pass (K3).

The mate-rescue aligner (reference bwa_sw_core -> aln_local_core,
libbwa/stdaln.c:529-745) runs a local DP over a ~600bp expected-insert
window per unpaired mate.  This kernel computes the forward pass -- best
score and end coordinates -- for a whole batch of (window, read) pairs in
one launch:

- grid over batch tiles; each program holds a (TB, RL) block in VMEM with
  the 8-sublane x 128-lane VPU shape;
- query rows processed with fori_loop; the horizontal (F) gap dependency
  is resolved with a log-step prefix-max over G_k = H_k + k*gape
  (the SWIPE "lazy-F" formulation, exact for affine gaps);
- scoring matches aln_param_bwa / aln_sm_maq: match 11, mismatch -19,
  vs-N -13, gap open 26 + ext 9.

Semantics note: the C code freezes its running F value across zero-score
cells (stdaln.c:278-284 applies the F update only when the previous cell
is positive) instead of decaying it; the prefix-max formulation uses the
textbook affine-gap recurrence.  The two differ only when a horizontal
gap would cross a dead (H==0) region -- score-irrelevant for accepted
rescues -- and the exact host/native path remains the default; this
kernel backs the optional device rescue scorer and the round-2 batched
rescue pipeline.
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
               best_scr, *, RL: int, QL: int):
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
        hnf = jnp.maximum(base, e_new)
        # lazy-F: F_j = max_{k<j} (hnf_k + k*gape) - qr - (j-1)*gape
        g = hnf + lane * GAP_EXT
        # log-step running max (inclusive), then shift to exclusive
        def scan_step(s, gacc):
            shifted = pltpu.roll(gacc, s, 1)
            shifted = jnp.where(lane < s, NEG, shifted)
            return jnp.maximum(gacc, shifted)

        gacc = g
        s = 1
        while s < RL:
            gacc = scan_step(s, gacc)
            s <<= 1
        gex = pltpu.roll(gacc, 1, 1)
        gex = jnp.where(lane == 0, NEG, gex)
        f = gex - QR - (lane - 1) * GAP_EXT
        h = jnp.maximum(hnf, jnp.maximum(f, 0))
        h = jnp.where(ref_valid & (i < qlen), h, 0)
        h_scr[:] = h
        e_scr[:] = jnp.where(ref_valid & (i < qlen), e_new, 0)
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
            pltpu.VMEM((TB, 4), jnp.int32),
        ],
        interpret=interpret,  # CPU backend (tests) has no Mosaic
    )(refs, queries, rlens2, qlens2)
    return out[:B]


def sw_forward_reference(ref: np.ndarray, query: np.ndarray
                         ) -> tuple[int, int, int]:
    """Numpy spec of the kernel (textbook affine local SW, same scoring).
    Returns (score, end_i, end_j) 1-based."""
    RL, QL = len(ref), len(query)
    h_prev = np.zeros(RL + 1, dtype=np.int64)
    e_prev = np.zeros(RL + 1, dtype=np.int64)
    best = (0, 0, 0)
    for i in range(1, QL + 1):
        h = np.zeros(RL + 1, dtype=np.int64)
        e = np.zeros(RL + 1, dtype=np.int64)
        f = NEG
        for j in range(1, RL + 1):
            if ref[j - 1] == query[i - 1]:
                m = MATCH if ref[j - 1] != 4 else VS_N
            elif ref[j - 1] == 4 or query[i - 1] == 4:
                m = VS_N
            else:
                m = MISMATCH
            e[j] = max(e_prev[j] - GAP_EXT, h_prev[j] - QR, 0)
            f = max(f - GAP_EXT, h[j - 1] - QR)
            h[j] = max(h_prev[j - 1] + m, e[j], f, 0)
            if h[j] > best[0]:
                best = (int(h[j]), j, i)
        h_prev, e_prev = h, e
    return best
