"""Device FM primitives vs host oracle."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from fastquick_tpu.align.core import bwt_cal_width, occ4_bwa
from fastquick_tpu.index.fmindex import FMIndex
from fastquick_tpu.ops.fm import DeviceFM, cal_width, match_exact, occ4, sa_lookup


@pytest.fixture(scope="module")
def fixture():
    rng = np.random.default_rng(0)
    text = rng.integers(0, 4, 5000).astype(np.uint8)
    fm_f = FMIndex.build(text)
    fm_r = FMIndex.build(text[::-1].copy())
    dev = DeviceFM.build(fm_f, fm_r)
    return text, fm_f, fm_r, dev


def test_occ4_matches_host(fixture):
    text, fm_f, fm_r, dev = fixture
    rng = np.random.default_rng(1)
    B = 256
    ks = rng.integers(-1, fm_f.n + 1, B).astype(np.int32)
    sels = rng.integers(0, 2, B).astype(np.int32)
    got = np.asarray(occ4(dev, jnp.asarray(sels), jnp.asarray(ks)))
    for b in range(B):
        fm = fm_f if sels[b] == 0 else fm_r
        want = occ4_bwa(fm, int(ks[b]))
        np.testing.assert_array_equal(got[b], want, err_msg=f"b={b} k={ks[b]}")


def test_sa_lookup(fixture):
    text, fm_f, fm_r, dev = fixture
    rng = np.random.default_rng(2)
    rows = rng.integers(0, fm_f.n + 1, 100).astype(np.int32)
    sels = rng.integers(0, 2, 100).astype(np.int32)
    got = np.asarray(sa_lookup(dev, jnp.asarray(sels), jnp.asarray(rows)))
    for b in range(100):
        fm = fm_f if sels[b] == 0 else fm_r
        assert got[b] == fm.sa[rows[b]]


def test_cal_width_matches_host(fixture):
    text, fm_f, fm_r, dev = fixture
    rng = np.random.default_rng(3)
    B, L = 16, 64
    seqs = rng.integers(0, 4, (B, L)).astype(np.uint8)
    seqs[0, 10] = 4  # an N
    lens = np.full(B, L, dtype=np.int32)
    lens[1] = 40
    got = np.asarray(cal_width(dev, 0, jnp.asarray(seqs), jnp.asarray(lens)))
    for b in range(B):
        w = np.zeros((L + 1, 2), dtype=np.int64)
        bwt_cal_width(fm_f, int(lens[b]), seqs[b], w)
        np.testing.assert_array_equal(got[b, : lens[b] + 1],
                                      w[: lens[b] + 1], err_msg=f"b={b}")


def test_match_exact_matches_host(fixture):
    text, fm_f, fm_r, dev = fixture
    rng = np.random.default_rng(4)
    B, L = 32, 50
    seqs = np.zeros((B, L), dtype=np.uint8)
    lens = np.full(B, L, dtype=np.int32)
    starts = rng.integers(0, len(text) - L, B)
    for b in range(B):
        seqs[b] = text[starts[b]:starts[b] + L]
    seqs[5] = rng.integers(0, 4, L)  # random junk
    k, l = match_exact(dev, 0, jnp.asarray(seqs), jnp.asarray(lens))
    k, l = np.asarray(k), np.asarray(l)
    for b in range(B):
        lo, hi = fm_f.match_exact(seqs[b])  # half-open rows
        if hi > lo:
            assert (k[b], l[b]) == (lo, hi - 1), f"b={b}"
        else:
            assert k[b] > l[b], f"b={b}"
