"""One-program QC step: resident Mosaic kernel path vs the XLA path.

Round 5 plumbed the packed VMEM FM table (`fmtab`) through
`qc_step_full` so pod-scale mesh runs use the resident search + Pallas
width kernels (ops/search_pallas.py) instead of the XLA lockstep
formulation.  Both implement the bwtgap.c discipline, so on identical
inputs every accumulator and per-pair row must be identical.  This is
the suite-pinned version of tools/validate_qc_resident.py (which runs
compiled on the real chip); here the kernels run in interpret mode on
the CPU mesh over a subsample of the drand48 repeat world (keeping the
c1==2 duplicated markers 4/5, so the on-device drand48 reservoir draw
is exercised on both paths).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from test_drand48_qc import world  # noqa: F401  (module-scoped fixture)
from test_pe_qc_differential import _load, _read_pairs

N_PAIRS = 128  # 2*128 reads = 256 lanes; covers markers 0-9 incl. the
               # duplicated (c1 == 2) pair (4, 5) of the drand48 world


def _accs(world, fmtab, nbp, pool, step_cap, fb_fill=None, per_read=False):
    from fastquick_tpu.align.opts import PeOpt, bwa_cal_maxdiff
    from fastquick_tpu.ops.fm import DeviceFM
    from fastquick_tpu.ops.qc_full import (build_site_tables,
                                           count_pcr_dups, qc_step_full)
    from fastquick_tpu.stats.collector import StatCollector

    idx, opt, new_ref = _load(world)
    popt = PeOpt()
    sc = StatCollector()
    sc.restore_vcf_sites(new_ref, opt)
    tables = build_site_tables(idx, sc, opt)
    dev = DeviceFM.build(idx.fm_fwd, idx.fm_rev)
    fm = {"words": dev.words, "occ": dev.occ, "sa": dev.sa, "L2": dev.L2,
          "primary": dev.primary}
    b0, b1 = _read_pairs(world, idx, opt)
    assert len(b0) >= N_PAIRS
    b0, b1 = b0[:N_PAIRS], b1[:N_PAIRS]
    B = 2 * N_PAIRS
    L = 128
    seqs = np.full((B, L), 4, np.int32)
    rseqs = np.full((B, L), 4, np.int32)
    quals = np.zeros((B, L), np.int32)
    lens = np.zeros(B, np.int32)
    for i in range(N_PAIRS):
        for j, p in enumerate((b0[i], b1[i])):
            row = 2 * i + j
            lens[row] = p.len
            if p.filtered:
                continue
            seqs[row, :p.len] = p.seq[:p.len]
            rseqs[row, :p.len] = p.rseq[:p.len]
            quals[row, :p.len] = p.qual[:p.len].astype(np.int32) - 33
    md_np = np.array([bwa_cal_maxdiff(i, thres=opt.fnr)
                      for i in range(L + 1)], np.int32)
    opt_args = {"n_text": dev.n, "max_diff": int(md_np.max()),
                "use_seed": True, "pool": pool, "inner": 32,
                "step_cap": step_cap, "max_gapo": opt.max_gapo,
                "max_gape": opt.max_gape, "max_top2": opt.max_top2,
                "seed_len": opt.seed_len, "chain": 1,
                "max_seed_diff": opt.max_seed_diff,
                "ap_prior": popt.ap_prior, "max_isize": popt.max_isize,
                "k_occ": 32, "s_mm": opt.s_mm, "drand48": True}
    md_t = jnp.asarray(md_np)

    @jax.jit
    def step(s, r, q, ln, fbf):
        return qc_step_full(fm, tables, opt_args, s, r, q, ln,
                            bitmaps=None, md_table=md_t,
                            pair_mode=True, fmtab=fmtab, nbp=nbp,
                            fb_fill=fbf, return_per_read=per_read)

    fbf = None
    if fb_fill is not None:
        fbf = (jnp.asarray(fb_fill[0]), jnp.asarray(fb_fill[1]))
    acc = step(jnp.asarray(seqs), jnp.asarray(rseqs),
               jnp.asarray(quals), jnp.asarray(lens), fbf)
    pr = None
    if per_read:
        acc, pr = acc
    acc["n_pcr_dup"] = count_pcr_dups(acc.pop("_pair_keys"))
    out = {k: np.asarray(v) if not isinstance(v, dict)
           else {kk: np.asarray(vv) for kk, vv in v.items()}
           for k, v in acc.items()}
    return (out, pr) if per_read else out


def test_resident_qc_matches_xla(world):  # noqa: F811
    from fastquick_tpu.ops.fm import DeviceFM
    from fastquick_tpu.ops.search_pallas import pack_fm_table

    idx, opt, new_ref = _load(world)
    dev = DeviceFM.build(idx.fm_fwd, idx.fm_rev)
    tab, nbp = pack_fm_table(dev)
    # matched pool/step_cap on both paths: the fallback SETS must then
    # agree (test_search_pallas pins that), so every accumulator is
    # comparable; the resident kernel autos to different defaults
    a_x = _accs(world, None, 0, pool=512, step_cap=768)
    a_r = _accs(world, jnp.asarray(tab), nbp, pool=512, step_cap=768)
    assert int(a_x["n_mapped"]) > 0
    _assert_accs_equal(a_x, a_r)


def _assert_accs_equal(a_x, a_r):
    bad = []
    for k in sorted(a_x):
        if k == "n_fallback":
            # fallback CAUSE bits may differ between formulations (both
            # route those reads to exact host redo); results must not
            continue
        vx, vr = a_x[k], a_r[k]
        if isinstance(vx, dict):
            bad += [f"{k}.{kk}" for kk in vx
                    if not np.array_equal(vx[kk], vr[kk])]
        elif not np.array_equal(vx, vr):
            bad.append(k)
    assert not bad, f"resident != xla on accumulators: {bad}"


def test_resident_qc_matches_xla_under_forced_fallback(world):  # noqa: F811
    """The pod-scale resident path WITH fallback present: a tiny pool
    forces kernel fallback, the fallback reads' host-exact hit lists
    ride `fb_fill` (the two-dispatch product recipe), and the resident
    formulation must match the XLA one on every accumulator -- chained
    with test_drand48_qc's host differential this pins
    resident+fb_fill == XLA+fb_fill == host rows."""
    from fastquick_tpu.align.engine import HostEngine
    from fastquick_tpu.ops.fm import DeviceFM
    from fastquick_tpu.ops.qc_full import pack_host_hits
    from fastquick_tpu.ops.search_pallas import pack_fm_table

    idx, opt, new_ref = _load(world)
    dev = DeviceFM.build(idx.fm_fwd, idx.fm_rev)
    tab, nbp = pack_fm_table(dev)
    fmtab = jnp.asarray(tab)

    # pass 1 (XLA): tiny pool -> some reads overflow to fallback
    a_x1, pr = _accs(world, None, 0, pool=96, step_cap=768, per_read=True)
    fb_mask = np.asarray(pr["fallback"]) != 0
    assert fb_mask.any(), "pool=96 forced no fallback; test is vacuous"

    # the resident kernel must overflow the SAME reads at matched pool
    a_r1, pr_r = _accs(world, fmtab, nbp, pool=96, step_cap=768,
                       per_read=True)
    assert np.array_equal(fb_mask, np.asarray(pr_r["fallback"]) != 0)

    # host-exact hit lists for the fallback rows
    b0, b1 = _read_pairs(world, idx, opt)
    b0, b1 = b0[:N_PAIRS], b1[:N_PAIRS]
    eng = HostEngine(idx)
    eng.align_batch([p for p in b0 if not p.filtered], opt)
    eng.align_batch([p for p in b1 if not p.filtered], opt)
    flat = []
    for i in range(N_PAIRS):
        flat.append(b0[i])
        flat.append(b1[i])
    rows_idx = [b for b in range(len(flat)) if fb_mask[b]]
    fb_n, fb_rows = pack_host_hits([flat[b] for b in rows_idx], rows_idx,
                                   fb_mask.shape[0])

    # pass 2: fills in -> zero effective fallback, both formulations
    a_x = _accs(world, None, 0, pool=96, step_cap=768,
                fb_fill=(fb_n, fb_rows))
    a_r = _accs(world, fmtab, nbp, pool=96, step_cap=768,
                fb_fill=(fb_n, fb_rows))
    assert int(a_x["n_fallback"]) == 0
    assert int(a_r["n_fallback"]) == 0
    _assert_accs_equal(a_x, a_r)
