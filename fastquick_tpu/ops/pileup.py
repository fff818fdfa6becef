"""Device pileup / statistics accumulators (K4).

The reference's StatCollector scatter-adds (src/StatCollector.cpp:342-422:
per-base depth, Q20/Q30 depth, qual/cycle mismatch histograms) expressed
as jnp segment-sums over the reduced-reference coordinate space.  Every
accumulator is a commutative sum, so multi-chip merging is a psum
(see parallel/mesh.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def depth_pileup(positions: jax.Array, lens: jax.Array, mapped: jax.Array,
                 quals: jax.Array, n_ref: int) -> dict:
    """Accumulate per-position depth and Q20/Q30 depth for gapless
    alignments.

    positions: (B,) pac start positions; lens: (B,); mapped: (B,) bool;
    quals: (B, L) phred values (0 where padded).
    Returns dict of (n_ref,) depth arrays + (256,) qual histogram.
    """
    B, L = quals.shape
    offs = jnp.arange(L)[None, :]
    pos = positions[:, None] + offs  # (B, L)
    valid = mapped[:, None] & (offs < lens[:, None])
    pos_c = jnp.where(valid, pos, n_ref)  # out-of-range dropped
    ones = valid.astype(jnp.int32)
    depth = jnp.zeros(n_ref + 1, jnp.int32).at[pos_c.reshape(-1)].add(
        ones.reshape(-1))[:n_ref]
    q20 = jnp.zeros(n_ref + 1, jnp.int32).at[pos_c.reshape(-1)].add(
        (valid & (quals >= 20)).astype(jnp.int32).reshape(-1))[:n_ref]
    q30 = jnp.zeros(n_ref + 1, jnp.int32).at[pos_c.reshape(-1)].add(
        (valid & (quals >= 30)).astype(jnp.int32).reshape(-1))[:n_ref]
    qhist = jnp.zeros(256, jnp.int32).at[
        jnp.where(valid, quals, 255).reshape(-1).clip(0, 255)].add(
        ones.reshape(-1))
    return {"depth": depth, "q20": q20, "q30": q30, "qual_hist": qhist}
