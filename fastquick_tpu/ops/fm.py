"""Device FM-index primitives (pure jnp; jit/vmap-able).

TPU-native formulation of libbwa's rank machinery (bwt_occ / bwt_2occ4,
reference libbwa/bwt.h:98-226 with the __occ_aux popcount trick :89-96):

- BWT packed 16 bases/uint32 word (big-endian in word), Occ checkpoints
  every 128 bases as a separate (n_blocks+1, 4) int32 array.  XLA gathers
  checkpoint rows and 8-word blocks per query; in-block counts use 2-bit
  equality masks + lax.population_count on the VPU.
- The FULL suffix array is resident, so bwt_sa is one gather instead of
  the inverse-Psi walk (libbwa/bwt.c:69).
- Forward and reverse indexes are stacked along a leading axis so a
  per-read strand bit selects the index without divergent gathers.

All row arithmetic follows the BWA closed-interval convention
[k, l] with occ(c, k) counting rows [0..k]; see align/core.py for the
bridge to the host FMIndex.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..index.fmindex import BASES_PER_WORD, OCC_BLOCK, FMIndex

WORDS_PER_BLOCK = OCC_BLOCK // BASES_PER_WORD  # 8

# 2-bit repeated patterns for c = 0..3
_PATTERNS = np.array([0x00000000, 0x55555555, 0xAAAAAAAA, 0xFFFFFFFF],
                     dtype=np.uint32)
_EVEN_BITS = np.uint32(0x55555555)


@dataclass(frozen=True)
class DeviceFM:
    """Stacked forward+reverse FM index arrays (device-resident)."""

    words: jax.Array  # (2, n_blocks+1, 8) uint32 (one Occ block per row)
    occ: jax.Array  # (2, n_blocks+1, 4) int32
    sa: jax.Array  # (2, n+1) int32
    L2: jax.Array  # (2, 4) int32  (BWA L2: #chars < c)
    primary: jax.Array  # (2,) int32
    n: int  # text length (same both directions)

    @classmethod
    def build(cls, fm_fwd: FMIndex, fm_rev: FMIndex) -> "DeviceFM":
        def prep_words(fm):
            # reshape to one Occ block (8 words = 128 bases) per row so a
            # rank query is ONE contiguous row gather; a flat layout with
            # an explicit (B, 8) index array lowers to a slow 8-point
            # XLA gather on TPU
            w = fm.bwt_words
            nb = -(-len(w) // WORDS_PER_BLOCK) + 1  # +1 guard block
            out = np.zeros(nb * WORDS_PER_BLOCK, dtype=np.uint32)
            out[: len(w)] = w
            return out.reshape(nb, WORDS_PER_BLOCK)

        words = np.stack([prep_words(fm_fwd), prep_words(fm_rev)])
        occ = np.stack([fm_fwd.occ, fm_rev.occ]).astype(np.int32)
        sa = np.stack([fm_fwd.sa, fm_rev.sa]).astype(np.int32)
        L2 = np.stack([(fm_fwd.C[:4] - 1), (fm_rev.C[:4] - 1)]).astype(np.int32)
        primary = np.array([fm_fwd.primary, fm_rev.primary], dtype=np.int32)
        return cls(words=jnp.asarray(words), occ=jnp.asarray(occ),
                   sa=jnp.asarray(sa), L2=jnp.asarray(L2),
                   primary=jnp.asarray(primary), n=fm_fwd.n)


def _word_prefix_counts(words8: jax.Array, prefix: jax.Array) -> jax.Array:
    """Count each base c in the first `prefix[...,w]` bases of each word.

    words8: (..., 8) uint32; prefix: (..., 8) int32 in [0, 16].
    Returns (..., 4) int32 counts.
    """
    pats = jnp.asarray(_PATTERNS)  # (4,)
    # mask of the high 2*prefix bits
    shift = (32 - 2 * prefix).astype(jnp.uint32)  # in [0, 32]
    full = jnp.uint32(0xFFFFFFFF)
    mask = jnp.where(prefix >= 16, full,
                     (full << shift.clip(0, 31)) & full)
    mask = jnp.where(prefix <= 0, jnp.uint32(0), mask)  # (..., 8)
    x = words8[..., None, :] ^ pats[:, None]  # (..., 4, 8)
    y = x | (x >> jnp.uint32(1))
    match = (~y) & jnp.uint32(_EVEN_BITS)
    match = match & mask[..., None, :]
    counts = jax.lax.population_count(match).astype(jnp.int32)
    return counts.sum(axis=-1)  # (..., 4)


def occ4(fm: DeviceFM, sel: jax.Array, k: jax.Array) -> jax.Array:
    """Batched bwt_occ4: counts of each base in BWT rows [0..k] of the
    index selected by `sel` (0=forward, 1=reverse).  k in [-1, n].

    sel, k: (B,) int32.  Returns (B, 4) int32.
    """
    kk = k + 1  # half-open bound over n+1 rows
    # primary is a (2,) scalar pair: a select, never a gather (an XLA
    # point-gather costs ~12us fixed on TPU regardless of table size)
    primary = jnp.where(sel == 0, fm.primary[0], fm.primary[1])
    kp = kk - (kk > primary).astype(jnp.int32)
    kp = jnp.clip(kp, 0, fm.n)
    block = kp // OCC_BLOCK
    rem = kp - block * OCC_BLOCK
    ck = fm.occ[sel, block]  # (B, 4)
    words8 = fm.words[sel, jnp.clip(block, 0, fm.words.shape[1] - 1)]
    prefix = jnp.clip(rem[:, None] - jnp.arange(WORDS_PER_BLOCK)[None, :]
                      * BASES_PER_WORD, 0, BASES_PER_WORD)
    inblock = _word_prefix_counts(words8, prefix)  # (B, 4)
    return ck + inblock


def occ4_pair(fm: DeviceFM, sel: jax.Array, ka: jax.Array, kb: jax.Array
              ) -> tuple[jax.Array, jax.Array]:
    """Two occ4 queries per lane through ONE pair of table gathers (the
    gather op cost is latency-dominated, so 2B rows in one gather is
    ~half the cost of two B-row gathers)."""
    B = sel.shape[0]
    both = occ4(fm, jnp.concatenate([sel, sel]),
                jnp.concatenate([ka, kb]))
    return both[:B], both[B:]


def occ1(fm: DeviceFM, sel: jax.Array, k: jax.Array, c: jax.Array) -> jax.Array:
    """Batched single-char occ: counts of base c in rows [0..k]."""
    return jnp.take_along_axis(occ4(fm, sel, k), c[:, None], axis=1)[:, 0]


def backward_ext(fm: DeviceFM, sel: jax.Array, k: jax.Array, l: jax.Array,
                 c: jax.Array) -> tuple[jax.Array, jax.Array]:
    """One backward-search step: closed interval [k,l] extended by c.
    One fused 2B-row table gather + one-hot char/L2 selects (point
    gathers cost ~12us fixed each on TPU; this path runs L times per
    cal_width/match_exact scan)."""
    ok4, ol4 = occ4_pair(fm, sel, k - 1, l)
    selc = jnp.arange(4)[None, :] == c[:, None]  # (B, 4)
    ok = jnp.where(selc, ok4, 0).sum(axis=1)
    ol = jnp.where(selc, ol4, 0).sum(axis=1)
    L2row = jnp.where((sel == 0)[:, None], fm.L2[0][None, :],
                      fm.L2[1][None, :])
    L2c = jnp.where(selc, L2row, 0).sum(axis=1)
    return L2c + ok + 1, L2c + ol


def sa_lookup(fm: DeviceFM, sel: jax.Array, row: jax.Array) -> jax.Array:
    """SA value for rows (single gather; replaces the bwt_sa walk)."""
    return fm.sa[sel, row]


def cal_width(fm: DeviceFM, sel_scalar, seqs: jax.Array,
              lens: jax.Array) -> jax.Array:
    """Batched bwt_cal_width (libbwa/bwtaln.c:73-97).

    seqs: (B, L) codes (0..4); lens: (B,); sel_scalar: index selector
    (scalar or per-row array -- both strands can share ONE scan).
    Returns (B, L+1, 2) int32 [w, bid]; the entry at index lens[b]
    holds (0, bid_final+1).
    """
    seqs = jnp.asarray(seqs)
    B, L = seqs.shape
    sel = jnp.broadcast_to(jnp.asarray(sel_scalar, dtype=jnp.int32), (B,))
    n = fm.n

    def step(carry, i):
        k, l, bid = carry
        c = seqs[:, i].astype(jnp.int32)
        valid_c = c < 4
        nk, nl = backward_ext(fm, sel, k, l, jnp.clip(c, 0, 3))
        nk = jnp.where(valid_c, nk, k)
        nl = jnp.where(valid_c, nl, l)
        restart = (nk > nl) | ~valid_c
        bid = bid + restart.astype(jnp.int32)
        nk = jnp.where(restart, 0, nk)
        nl = jnp.where(restart, n, nl)
        w = nl - nk + 1
        return (nk, nl, bid), jnp.stack([w, bid], axis=1)

    init = (jnp.zeros(B, jnp.int32), jnp.full(B, n, jnp.int32),
            jnp.zeros(B, jnp.int32))
    (k, l, bid), ws = jax.lax.scan(step, init, jnp.arange(L))
    ws = jnp.swapaxes(ws, 0, 1)  # (B, L, 2)
    return width_finalize(ws[:, :, 0], ws[:, :, 1], lens)


def width_finalize(w: jax.Array, bid: jax.Array, lens: jax.Array
                   ) -> jax.Array:
    """(B, L) per-position (w, bid) planes -> the (B, L+1, 2) width
    array with the terminal entry: width[len] = (0, bid_at_len-1 + 1)
    (bwt_cal_width's post-loop `width[len].w = 0; width[len].bid =
    ++bid`).  Shared by the XLA scan (cal_width) and the Pallas width
    kernel (ops/search_pallas.width_pallas)."""
    B, L = w.shape
    ws = jnp.stack([w, bid], axis=2)
    width = jnp.concatenate(
        [ws, jnp.zeros((B, 1, 2), jnp.int32)], axis=1)  # (B, L+1, 2)
    last_bid = jnp.take_along_axis(
        bid, jnp.clip(lens - 1, 0, L - 1)[:, None], axis=1)[:, 0]
    last_bid = jnp.where(lens > 0, last_bid, 0)
    terminal = jnp.stack([jnp.zeros_like(last_bid), last_bid + 1], axis=1)
    return width.at[jnp.arange(B), lens].set(terminal)


def match_exact(fm: DeviceFM, sel_scalar: int, seqs: jax.Array,
                lens: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Batched full-read exact backward search; returns closed [k, l]
    (k > l means no match)."""
    B, L = seqs.shape
    sel = jnp.full((B,), sel_scalar, dtype=jnp.int32)
    n = fm.n

    def step(carry, i):
        k, l, dead = carry
        # process str[len-1-i] per read
        idx = lens - 1 - i
        active = (i < lens) & ~dead
        c = jnp.take_along_axis(seqs, jnp.clip(idx, 0, L - 1)[:, None],
                                axis=1)[:, 0].astype(jnp.int32)
        bad = c > 3
        nk, nl = backward_ext(fm, sel, k, l, jnp.clip(c, 0, 3))
        nk = jnp.where(active & ~bad, nk, k)
        nl = jnp.where(active & ~bad, nl, l)
        dead = dead | (active & (bad | (nk > nl)))
        return (nk, nl, dead), None

    init = (jnp.zeros(B, jnp.int32), jnp.full(B, n, jnp.int32),
            jnp.zeros(B, bool))
    (k, l, dead), _ = jax.lax.scan(step, init, jnp.arange(L))
    k = jnp.where(dead, 1, k)
    l = jnp.where(dead, 0, l)
    return k, l
