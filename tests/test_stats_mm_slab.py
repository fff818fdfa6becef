"""The mismatch fast path of StatCollector._drain_queue vs the generic
per-read walk.

Ungapped full-length reads whose MD carries mismatches ("50A99") join
the vectorized slab since round 5: the slab computes the same
depth/q20/q30/emp sums, and the mismatch offsets parsed from the MD
feed the mis_emp_* distributions in one vectorized pass.  This test
runs the host pipeline on the drand48 repeat world (25% of pairs carry
2 mismatches) twice -- fast path on vs forced off (parser disabled, so
every mismatch read takes _apply_single) -- and asserts every
accumulator identical, plus that the fast path actually engaged.
"""

import io

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from test_drand48_qc import world  # noqa: F401  (module-scoped fixture)
from test_pe_qc_differential import _load, _read_pairs


def _run_host(world, disable_fast):
    from fastquick_tpu.align.driver import PairEndMapper
    from fastquick_tpu.align.engine import HostEngine
    from fastquick_tpu.align.opts import PeOpt
    from fastquick_tpu.align.pe import IsizeInfo
    from fastquick_tpu.stats import collector as C
    from fastquick_tpu.stats.collector import FileStat, StatCollector

    idx, opt, new_ref = _load(world)
    popt = PeOpt()
    popt.is_sw = 0
    collector = StatCollector()
    collector.restore_vcf_sites(new_ref, opt)
    sio = io.StringIO()
    mapper = PairEndMapper(idx, HostEngine(idx), opt, popt, collector,
                           sam=None, isize_out=sio)
    b0, b1 = _read_pairs(world, idx, opt)
    fsc = FileStat(file_name1=world["fq1"], file_name2=world["fq2"])
    mapper.engine.align_batch(b0, opt)
    mapper.engine.align_batch(b1, opt)

    n_fast = [0]
    orig = C._parse_mismatch_md

    def counting(md, length):
        r = orig(md, length)
        if r is not None:
            n_fast[0] += 1
        return None if disable_fast else r

    C._parse_mismatch_md = counting
    try:
        mapper._process_batch(b0, b1, IsizeInfo(), fsc)
        collector.flush_dense()
    finally:
        C._parse_mismatch_md = orig
    return collector, sio.getvalue(), n_fast[0]


def test_mm_slab_matches_generic(world):  # noqa: F811
    c_fast, rows_fast, n_fast = _run_host(world, disable_fast=False)
    c_gen, rows_gen, n_gen = _run_host(world, disable_fast=True)
    assert n_fast > 50, "world has no mismatch reads; test is vacuous"
    assert rows_fast == rows_gen
    for name in ("mis_emp_rep_dist", "mis_emp_cycle_dist", "emp_rep_dist",
                 "emp_cycle_dist", "depth_dist", "cycle_dist"):
        np.testing.assert_array_equal(getattr(c_fast, name),
                                      getattr(c_gen, name), err_msg=name)
    for name in ("depth", "q20", "q30"):
        np.testing.assert_array_equal(getattr(c_fast.sites, name),
                                      getattr(c_gen.sites, name),
                                      err_msg=name)
    assert c_fast.seq_vec == c_gen.seq_vec
    assert c_fast.qual_vec == c_gen.qual_vec
    assert c_fast.cycle_vec == c_gen.cycle_vec
    assert c_fast.strand_vec == c_gen.strand_vec
