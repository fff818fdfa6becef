"""Differential test: native C++ engine vs the exact Python oracle."""

import numpy as np
import pytest

from fastquick_tpu.align.engine import HostEngine
from fastquick_tpu.align.opts import GapOpt
from fastquick_tpu.native import get_aligner_lib
from tests.test_batch_engine import aln_key, make_idx, make_read, synth_reads


@pytest.fixture(scope="module")
def native_ok():
    if get_aligner_lib() is None:
        pytest.skip("no native toolchain")


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_matches_host(native_ok, seed):
    from fastquick_tpu.align.engine import NativeEngine

    idx = make_idx(seed=seed)
    opt = GapOpt()
    reads_h = synth_reads(idx, 120, seed + 100)
    reads_n = synth_reads(idx, 120, seed + 100)
    HostEngine(idx).align_batch(reads_h, opt)
    NativeEngine(idx).align_batch(reads_n, opt)
    for i, (h, n) in enumerate(zip(reads_h, reads_n)):
        hk = [aln_key(a) for a in h.aln]
        nk = [aln_key(a) for a in n.aln]
        assert hk == nk, f"read {i}: host {hk} vs native {nk}"


def test_native_n_bases(native_ok):
    from fastquick_tpu.align.engine import NativeEngine

    idx = make_idx(seed=9)
    opt = GapOpt()
    codes = idx.text[777:877].copy()
    codes[10] = 4
    codes[60] = 4
    rh, rn = make_read(codes.copy()), make_read(codes.copy())
    HostEngine(idx).align_batch([rh], opt)
    NativeEngine(idx).align_batch([rn], opt)
    assert [aln_key(a) for a in rh.aln] == [aln_key(a) for a in rn.aln]


def test_native_mixed_lengths(native_ok):
    from fastquick_tpu.align.engine import NativeEngine

    idx = make_idx(seed=11)
    opt = GapOpt()
    reads_h, reads_n = [], []
    for ln in (36, 50, 76, 100, 151):
        start = 333 + 13 * ln
        codes = idx.text[start:start + ln].copy()
        reads_h.append(make_read(codes.copy()))
        reads_n.append(make_read(codes.copy()))
    HostEngine(idx).align_batch(reads_h, opt)
    NativeEngine(idx).align_batch(reads_n, opt)
    for h, n in zip(reads_h, reads_n):
        assert [aln_key(a) for a in h.aln] == [aln_key(a) for a in n.aln]
