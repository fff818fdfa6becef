"""Differential sweep over non-default alignment options: the native C++
engine must match the exact Python oracle for every option combination
the CLI can express (bwa_aln flags -n/-o/-e/-l/-k/-M/-O/-E/-R)."""

import dataclasses

import numpy as np
import pytest

from fastquick_tpu.align.engine import HostEngine
from fastquick_tpu.align.opts import GapOpt
from fastquick_tpu.native import get_aligner_lib
from tests.test_batch_engine import aln_key, make_idx, synth_reads

SWEEP = [
    dict(fnr=0.0, max_diff=3),            # fixed -n 3
    dict(fnr=0.04),                       # looser error model
    dict(max_gapo=2, max_gape=10),        # more gaps allowed
    dict(max_gapo=0),                     # ungapped
    dict(seed_len=20, max_seed_diff=1),   # tighter seed
    dict(seed_len=10_000),                # seeding disabled (seed > len)
    dict(s_mm=5, s_gapo=9, s_gape=3),     # different penalties
    dict(max_top2=5),                     # early top2 stop
    dict(max_entries=2_000),              # entry-budget exhaustion
]


@pytest.fixture(scope="module")
def native_ok():
    if get_aligner_lib() is None:
        pytest.skip("no native toolchain")


@pytest.mark.parametrize("overrides", SWEEP,
                         ids=["-".join(f"{k}{v}" for k, v in o.items())
                              for o in SWEEP])
def test_native_matches_host_opt_sweep(native_ok, overrides):
    from fastquick_tpu.align.engine import NativeEngine

    idx = make_idx(seed=4)
    opt = dataclasses.replace(GapOpt(), **overrides)
    reads_h = synth_reads(idx, 90, 321)
    reads_n = synth_reads(idx, 90, 321)
    HostEngine(idx).align_batch(reads_h, opt)
    NativeEngine(idx).align_batch(reads_n, opt)
    for i, (h, n) in enumerate(zip(reads_h, reads_n)):
        hk = [aln_key(a) for a in h.aln]
        nk = [aln_key(a) for a in n.aln]
        assert hk == nk, f"{overrides} read {i}: host {hk} vs native {nk}"
