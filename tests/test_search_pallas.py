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


def test_width_pallas_matches_cal_width():
    """The Pallas width kernel's raw (w, bid) planes must be
    bit-identical to the XLA cal_width scan (both implement
    libbwa/bwtaln.c:73-97 bwt_cal_width)."""
    import numpy as np
    import jax.numpy as jnp

    from fastquick_tpu.index.fmindex import FMIndex
    from fastquick_tpu.ops.fm import DeviceFM, cal_width, width_finalize
    from fastquick_tpu.ops.search_pallas import pack_fm_table, width_pallas

    rng = np.random.default_rng(5)
    text = rng.integers(0, 4, 20000).astype(np.uint8)
    fmf = FMIndex.build(text)
    fmr = FMIndex.build(text[::-1].copy())
    dev = DeviceFM.build(fmf, fmr)
    tab, nbp = pack_fm_table(dev)

    M, L = 300, 40
    units = np.full((M, L), 4, np.int32)
    lens = np.zeros(M, np.int32)
    for i in range(M):
        ln = int(rng.integers(1, L + 1))
        s = int(rng.integers(0, len(text) - ln))
        codes = text[s:s + ln].astype(np.int32)
        nerr = int(rng.binomial(ln, 0.08))
        for _ in range(nerr):
            p = int(rng.integers(0, ln))
            codes[p] = int(rng.integers(0, 5))  # incl. N
        units[i, :ln] = codes
        lens[i] = ln
    sel = (np.arange(M) % 2).astype(np.int32)

    wv, bv = width_pallas(jnp.asarray(tab), dev.L2, dev.primary,
                          jnp.asarray(units), jnp.asarray(sel),
                          NBP=nbp, n=dev.n, WB=256)
    got = np.asarray(width_finalize(wv, bv, jnp.asarray(lens)))
    want = np.asarray(cal_width(dev, jnp.asarray(sel),
                                jnp.asarray(units), jnp.asarray(lens)))
    assert np.array_equal(got, want), np.argwhere(got != want)[:5]
