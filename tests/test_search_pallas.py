"""Differential: the Mosaic inner-loop search kernel vs the XLA scan.

ops/search_pallas.py re-expresses batch_search.inner_step as one Pallas
kernel (transposed VMEM-resident layout, in-kernel occ gathers).  Both
paths implement the same bwtgap.c discipline, so on any input the final
per-read results (hit lists, fallback flags) must be IDENTICAL; the host
oracle differential then pins both to the reference semantics.  Runs in
interpret mode on the CPU mesh; the on-chip compiled run is covered by
the FQ_TEST_PLATFORM=axon revalidation sweep (BASELINE.md).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from fastquick_tpu.align.engine import HostEngine
from fastquick_tpu.align.opts import GapOpt
from fastquick_tpu.ops.batch_search import BatchEngine

from test_batch_engine import aln_key, make_idx, make_read, synth_reads


def pallas_engine(idx, mode="scan", **kw):
    eng = BatchEngine(idx, **kw)
    from fastquick_tpu.ops.search_pallas import pack_fm_table

    tab, eng.nbp = pack_fm_table(eng.dev)
    eng.fmtab = jax.numpy.asarray(tab)
    eng.pallas = mode
    return eng


@pytest.mark.parametrize("seed,mode", [(0, "scan"), (1, "scan"),
                                       (0, "resident"), (1, "resident")])
def test_pallas_matches_xla_and_host(seed, mode):
    idx = make_idx(seed=seed)
    opt = GapOpt()
    reads_h = synth_reads(idx, 60, seed + 10)
    reads_x = synth_reads(idx, 60, seed + 10)
    reads_p = synth_reads(idx, 60, seed + 10)
    HostEngine(idx).align_batch(reads_h, opt)
    # pin pool/step_cap: since r4 the resident kernel AUTOS to a bigger
    # pool + looser cap than the XLA path, and the fallback-equality
    # assertion below is only meaningful at matched configs
    ex = BatchEngine(idx, max_batch=64, pool=512, step_cap=768)
    ex.align_batch(reads_x, opt)
    ep = pallas_engine(idx, mode=mode, max_batch=64, pool=512,
                       step_cap=768)
    ep.align_batch(reads_p, opt)
    assert ep.last_fallback == ex.last_fallback
    for i, (h, x, p) in enumerate(zip(reads_h, reads_x, reads_p)):
        hk = [aln_key(a) for a in h.aln]
        xk = [aln_key(a) for a in x.aln]
        pk = [aln_key(a) for a in p.aln]
        assert pk == xk, f"read {i}: pallas {pk} vs xla {xk}"
        assert pk == hk, f"read {i}: pallas {pk} vs host {hk}"


def test_pallas_n_bases_and_lengths():
    idx = make_idx(seed=5)
    opt = GapOpt()
    reads = []
    codes = idx.text[500:600].copy()
    codes[50] = 4
    reads.append(codes)
    for ln in (36, 70, 151):
        start = 1000 + ln * 7
        reads.append(idx.text[start:start + ln].copy())
    rh = [make_read(c.copy()) for c in reads]
    rp = [make_read(c.copy()) for c in reads]
    HostEngine(idx).align_batch(rh, opt)
    pallas_engine(idx, mode="resident").align_batch(rp, opt)
    for h, p in zip(rh, rp):
        assert [aln_key(a) for a in h.aln] == [aln_key(a) for a in p.aln]
