"""Pallas SW forward kernel vs its numpy spec and the C-semantics oracle."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from fastquick_tpu.ops.sw_pallas import (
    sw_forward_batch,
    sw_forward_reference,
)

RL, QL = 256, 128


def _cases(seed, n):
    rng = np.random.default_rng(seed)
    refs = np.zeros((n, RL), dtype=np.int32)
    queries = np.zeros((n, QL), dtype=np.int32)
    rlens = np.zeros(n, dtype=np.int32)
    qlens = np.zeros(n, dtype=np.int32)
    for b in range(n):
        rl = int(rng.integers(160, RL))
        ql = int(rng.integers(40, min(QL, rl - 20)))
        ref = rng.integers(0, 4, rl).astype(np.int32)
        kind = b % 4
        if kind == 0:  # embedded read with mismatches
            start = int(rng.integers(0, rl - ql))
            q = ref[start:start + ql].copy()
            for _ in range(int(rng.integers(0, 4))):
                p = int(rng.integers(0, ql))
                q[p] = (q[p] + 1) % 4
        elif kind == 1:  # embedded with a deletion
            start = int(rng.integers(0, rl - ql - 3))
            mid = ql // 2
            q = np.concatenate([ref[start:start + mid],
                                ref[start + mid + 2:start + ql + 2]])
        elif kind == 2:  # random (no good match)
            q = rng.integers(0, 4, ql).astype(np.int32)
        else:  # with N bases
            start = int(rng.integers(0, rl - ql))
            q = ref[start:start + ql].copy()
            q[5] = 4
        refs[b, :rl] = ref
        queries[b, :ql] = q
        rlens[b] = rl
        qlens[b] = ql
    return refs, queries, rlens, qlens


@pytest.mark.parametrize("seed", [0, 1])
def test_kernel_matches_spec(seed):
    n = 24
    refs, queries, rlens, qlens = _cases(seed, n)
    out = np.asarray(sw_forward_batch(
        jnp.asarray(refs), jnp.asarray(queries), jnp.asarray(rlens),
        jnp.asarray(qlens), RL=RL, QL=QL))
    for b in range(n):
        want = sw_forward_reference(refs[b, :rlens[b]], queries[b, :qlens[b]])
        got = (int(out[b, 0]), int(out[b, 1]), int(out[b, 2]))
        assert got == want, f"case {b}: {got} vs {want}"


def test_kernel_matches_c_oracle_exactly():
    """Forward pass agrees EXACTLY (score + end coords) with the
    C-semantics oracle (align/dp.aln_local_core, itself bit-matched to
    the compiled reference stdaln.c): the round-4 freeze-F fixpoint
    removed the textbook-recurrence deviation (old PARITY.md #7)."""
    from fastquick_tpu.align.dp import aln_local_core

    n = 48
    for seed in (7, 8):
        refs, queries, rlens, qlens = _cases(seed, n)
        out = np.asarray(sw_forward_batch(
            jnp.asarray(refs), jnp.asarray(queries), jnp.asarray(rlens),
            jnp.asarray(qlens), RL=RL, QL=QL))
        for b in range(n):
            score, _, (_, _, ei, ej) = aln_local_core(
                refs[b, :rlens[b]].astype(np.uint8),
                queries[b, :qlens[b]].astype(np.uint8), thres=1)
            got = (int(out[b, 0]), int(out[b, 1]), int(out[b, 2]))
            want = (max(score, 0), ei, ej) if score > 0 else (0, 0, 0)
            assert got == want, f"seed {seed} case {b}: {got} vs {want}"


def test_sw_local_batch_device_matches_local_align():
    """The device mate-rescue batch (fwd+rev kernel passes + host
    global path) returns exactly align/dp.local_align's (score, cigar,
    coords) per job -- the contract bwa_sw_core consumes."""
    from fastquick_tpu.align.dp import local_align
    from fastquick_tpu.ops.sw_pallas import sw_local_batch_device

    rng = np.random.default_rng(21)
    jobs = []
    for t in range(40):
        rl = int(rng.integers(60, 500))
        ql = int(rng.integers(20, 120))
        ref = rng.integers(0, 4, rl).astype(np.uint8)
        q = ref[int(rng.integers(0, max(1, rl - ql))):][:ql].copy()
        kind = t % 5
        if kind == 1:
            for _ in range(rng.binomial(len(q), 0.06)):
                p = int(rng.integers(0, len(q)))
                q[p] = (q[p] + rng.integers(1, 4)) % 4
        elif kind == 2:  # deletion
            m = len(q) // 2
            q = np.concatenate([q[:m], q[m + 2:]])
        elif kind == 3:  # insertion
            m = len(q) // 2
            q = np.concatenate(
                [q[:m], rng.integers(0, 4, 2).astype(np.uint8), q[m:]])
        elif kind == 4:  # junk
            q = rng.integers(0, 4, ql).astype(np.uint8)
        jobs.append((ref, q))
    got = sw_local_batch_device(jobs)
    for i, (ref, q) in enumerate(jobs):
        score, cigar, coords = local_align(ref, q, thres=1)
        g_score, g_cigar, g_coords = got[i]
        if score < 1 or not cigar:
            assert not g_cigar, f"job {i}"
            continue
        assert g_score == score, f"job {i}: {g_score} vs {score}"
        assert g_cigar == cigar, f"job {i}: {g_cigar} vs {cigar}"
        assert g_coords == coords, f"job {i}: {g_coords} vs {coords}"
