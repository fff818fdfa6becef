"""Device k-mer read filter (K1).

TPU formulation of the six-projection rolling-hash filter
(reference src/BwtIndexer.h:262-315, src/BwtIndexer.cpp:498-543): the
6 x 512 MiB bitmaps live in HBM as uint32 words; each read contributes its
first three non-overlapping 32-mers; each 32-mer is projected six ways and
the vote count compared against the threshold.

TPUs run without 64-bit ints by default, so the 64-bit kmer register is
carried as (hi, lo) uint32 halves, including the reference's N-value bit
spill across the half boundary (value 4 = 0b100 leaks its top bit into
the neighboring base's field).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

KMER_SIZE = 32
N_TABLES = 6


def kmer_halves(chunks: jax.Array) -> tuple[jax.Array, jax.Array]:
    """chunks: (..., 32) int32 base codes (0..4).
    Returns (hi, lo) uint32 of the 64-bit OR-register."""
    v = chunks.astype(jnp.uint32)
    hi = jnp.zeros(chunks.shape[:-1], jnp.uint32)
    lo = jnp.zeros(chunks.shape[:-1], jnp.uint32)
    for j in range(16):
        hi = hi | (v[..., j] << np.uint32(30 - 2 * j))
    hi = hi | (v[..., 16] >> np.uint32(2))  # N bit spill across the boundary
    for j in range(16, 32):
        lo = lo | ((v[..., j] << np.uint32(2 * (31 - j))) & jnp.uint32(0xFFFFFFFF))
    return hi, lo


def projections(hi: jax.Array, lo: jax.Array) -> jax.Array:
    """Six 32-bit shrinkage projections; returns (..., 6) uint32."""
    u16h = jnp.uint32(0xFFFF0000)
    u16l = jnp.uint32(0xFFFF)
    p0 = hi
    p1 = lo
    p2 = (hi & u16h) | (lo & u16l)
    p3 = (hi << jnp.uint32(16)) | (lo >> jnp.uint32(16))
    p4 = (hi & u16h) | (lo >> jnp.uint32(16))
    p5 = (hi << jnp.uint32(16)) | (lo & u16l)
    return jnp.stack([p0, p1, p2, p3, p4, p5], axis=-1)


def filter_reads(bitmaps: jax.Array, seqs: jax.Array, lens: jax.Array,
                 thresh: int = 3) -> jax.Array:
    """Batched IsReadFiltered inverted: True = read KEPT.

    bitmaps: (6, 2^27) uint32 (layout: bit k at word k>>5, bit k&31, same
    as KmerFilter.bitmaps_uint32); seqs: (B, L) codes; lens: (B,).
    Counts accumulate across the first 3 in-bounds chunks
    (IsReadInHashByCountMoreChunck semantics with the over-read clamped).
    """
    B, L = seqs.shape
    count = jnp.zeros(B, jnp.int32)
    for chunk in range(3):
        s, e = chunk * KMER_SIZE, (chunk + 1) * KMER_SIZE
        if e > L:
            break
        in_bounds = lens >= e
        hi, lo = kmer_halves(seqs[:, s:e].astype(jnp.int32))
        projs = projections(hi, lo)  # (B, 6)
        word_idx = (projs >> jnp.uint32(5)).astype(jnp.int32)
        bit = projs & jnp.uint32(31)
        words = bitmaps[jnp.arange(N_TABLES)[None, :], word_idx]  # (B, 6)
        hits = ((words >> bit) & jnp.uint32(1)).astype(jnp.int32).sum(axis=1)
        count = count + jnp.where(in_bounds, hits, 0)
    return count >= thresh
