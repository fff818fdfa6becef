"""Native DP aligners vs the Python oracle (dp.py)."""

import numpy as np
import pytest

from fastquick_tpu.align.dp import (
    aln_global_core,
    aln_local_core,
    aln_path2cigar,
)
from fastquick_tpu.native import get_sw_lib


@pytest.fixture(scope="module")
def lib():
    l = get_sw_lib()
    if l is None:
        pytest.skip("no native toolchain")
    return l


def _native_global(seq1, seq2):
    from fastquick_tpu.align.dp import global_cigar

    return global_cigar(seq1, seq2)


@pytest.mark.parametrize("seed", range(4))
def test_global_matches_python(lib, seed):
    rng = np.random.default_rng(seed)
    for _ in range(10):
        rl = int(rng.integers(20, 200))
        ql = int(rng.integers(20, 200))
        ref = rng.integers(0, 4, rl).astype(np.uint8)
        if seed % 2 == 0:  # related sequences with an indel
            ql = max(20, rl - int(rng.integers(0, 4)))
            q = ref[:ql].copy()
            for _ in range(int(rng.integers(0, 3))):
                p = int(rng.integers(0, ql))
                q[p] = (q[p] + 1) % 4
        else:
            q = rng.integers(0, 4, ql).astype(np.uint8)
        _, path = aln_global_core(ref, q)
        want = aln_path2cigar(path)
        got = _native_global(ref, q)
        assert got == want, f"ref={rl} q={ql}"


@pytest.mark.parametrize("seed", range(4))
def test_local_matches_python(lib, seed):
    from fastquick_tpu.align.dp import local_align
    from fastquick_tpu.native import _sw_lib

    rng = np.random.default_rng(seed + 50)
    for _ in range(10):
        rl = int(rng.integers(150, 500))
        ref = rng.integers(0, 4, rl).astype(np.uint8)
        ql = int(rng.integers(40, 120))
        start = int(rng.integers(0, rl - ql))
        q = ref[start:start + ql].copy()
        for _ in range(int(rng.integers(0, 4))):
            p = int(rng.integers(0, ql))
            q[p] = (q[p] + 1) % 4
        # python reference tuple
        score_p, path, (si, sj, ei, ej) = aln_local_core(ref, q, thres=1)
        want_cigar = aln_path2cigar(path) if path else []
        # native
        got_score, got_cigar, got_coords = local_align(ref, q, thres=1)
        assert got_score == max(int(score_p), int(score_p))
        assert got_cigar == want_cigar
        assert got_coords[:4] == (si, sj, ei, ej)
        if path:
            bi = path[-1][1] - (si - 1)
            bj = path[-1][2] - (sj - 1)
            assert got_coords[4:] == (bi, bj)


def test_sw_core_end_to_end_same(lib):
    """bwa_sw_core through the native path equals a hand-check case."""
    from fastquick_tpu.align.pe import bwa_sw_core

    rng = np.random.default_rng(3)
    text = rng.integers(0, 4, 2000).astype(np.uint8)
    read = text[700:800].copy()
    read[50] = (read[50] + 1) % 4
    cigar, new_beg, cnt = bwa_sw_core(text, 100, read, 600, 400)
    assert cigar is not None
    assert new_beg == 700
    assert (cnt >> 16) == 1  # one mismatch
    assert cigar == [(0, 100)]


def test_local_exact_fastpath_ties_and_n(lib):
    """The memmem fast path must pick the LEFTMOST of repeated exact
    occurrences (the DP's strict-greater argmax rule) and must stay off
    for N-containing queries (N scores -13 even against itself)."""
    from fastquick_tpu.align.dp import (aln_local_core, aln_path2cigar,
                                        local_align)

    rng = np.random.default_rng(7)
    unit = rng.integers(0, 4, 60).astype(np.uint8)
    ref = np.concatenate([unit, rng.integers(0, 4, 30).astype(np.uint8),
                          unit, unit]).astype(np.uint8)
    q = unit.copy()
    score_p, path, (si, sj, ei, ej) = aln_local_core(ref, q, thres=1)
    got_score, got_cigar, got_coords = local_align(ref, q, thres=1)
    assert got_score == int(score_p)
    assert got_coords[:4] == (si, sj, ei, ej)
    assert got_cigar == aln_path2cigar(path)
    assert ei == 60  # leftmost occurrence, not a later one

    qn = unit.copy()
    qn[10] = 4  # N
    score_p, path, (si, sj, ei, ej) = aln_local_core(ref, qn, thres=1)
    got_score, got_cigar, got_coords = local_align(ref, qn, thres=1)
    assert got_score == int(score_p)
    assert got_coords[:4] == (si, sj, ei, ej)
    assert got_cigar == (aln_path2cigar(path) if path else [])
