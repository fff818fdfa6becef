#!/usr/bin/env python
"""On-chip validation: qc_step_full with the RESIDENT Mosaic kernel
(fmtab plumbed, round 5) must produce identical accumulators and
per-pair rows to the XLA lockstep path on the drand48 repeat world.

Runs on the real TPU (never concurrently with another TPU process).
Usage: python tools/validate_qc_resident.py
"""

import os
import sys

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main() -> int:
    import pathlib
    import tempfile

    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/fq_jax_cache")

    class FakeTPF:
        def mktemp(self, x):
            return pathlib.Path(tempfile.mkdtemp(prefix=x))

    import jax.numpy as jnp
    import test_drand48_qc as t

    from fastquick_tpu.align.opts import PeOpt, bwa_cal_maxdiff
    from fastquick_tpu.ops.fm import DeviceFM
    from fastquick_tpu.ops.qc_full import (build_site_tables,
                                           count_pcr_dups, qc_step_full)
    from fastquick_tpu.ops.search_pallas import pack_fm_table
    from fastquick_tpu.stats.collector import StatCollector
    from test_pe_qc_differential import _load, _read_pairs

    world = t.world.__wrapped__(FakeTPF())
    idx, opt, new_ref = _load(world)
    popt = PeOpt()
    sc = StatCollector()
    sc.restore_vcf_sites(new_ref, opt)
    tables = build_site_tables(idx, sc, opt)
    dev = DeviceFM.build(idx.fm_fwd, idx.fm_rev)
    fm = {"words": dev.words, "occ": dev.occ, "sa": dev.sa, "L2": dev.L2,
          "primary": dev.primary}
    tab, nbp = pack_fm_table(dev)
    fmtab = jnp.asarray(tab)

    b0, b1 = _read_pairs(world, idx, opt)
    B0 = 2 * len(b0)
    B = -(-B0 // 256) * 256  # pad to a lane multiple (pairs stay even)
    L = 128
    seqs = np.full((B, L), 4, np.int32)
    rseqs = np.full((B, L), 4, np.int32)
    quals = np.zeros((B, L), np.int32)
    lens = np.zeros(B, np.int32)
    for i in range(len(b0)):
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
                "use_seed": True, "pool": 1024, "inner": 32,
                "step_cap": 1536, "max_gapo": opt.max_gapo,
                "max_gape": opt.max_gape, "max_top2": opt.max_top2,
                "seed_len": opt.seed_len, "chain": 1,
                "max_seed_diff": opt.max_seed_diff,
                "ap_prior": popt.ap_prior, "max_isize": popt.max_isize,
                "k_occ": 32, "s_mm": opt.s_mm, "drand48": True}
    md_t = jnp.asarray(md_np)

    def run(ftab, tag):
        @jax.jit
        def step(s, r, q, ln):
            return qc_step_full(fm, tables, opt_args, s, r, q, ln,
                                bitmaps=None, md_table=md_t,
                                pair_mode=True, fmtab=ftab, nbp=nbp)

        acc = step(jnp.asarray(seqs), jnp.asarray(rseqs),
                   jnp.asarray(quals), jnp.asarray(lens))
        acc["n_pcr_dup"] = count_pcr_dups(acc.pop("_pair_keys"))
        acc = {k: np.asarray(v) if not isinstance(v, dict)
               else {kk: np.asarray(vv) for kk, vv in v.items()}
               for k, v in acc.items()}
        print(f"# {tag}: n_mapped={acc['n_mapped']} "
              f"n_fallback={acc['n_fallback']}")
        return acc

    a_x = run(None, "xla")
    a_r = run(fmtab, "resident")
    bad = 0
    for k in sorted(a_x):
        if k == "n_fallback":
            # fallback CAUSES may differ between formulations (both
            # route to exact host redo); compare results, not causes
            continue
        vx, vr = a_x[k], a_r[k]
        if isinstance(vx, dict):
            for kk in vx:
                if not np.array_equal(vx[kk], vr[kk]):
                    print(f"MISMATCH {k}.{kk}")
                    bad += 1
        elif not np.array_equal(vx, vr):
            print(f"MISMATCH {k}")
            bad += 1
    if bad:
        print(f"FAIL: {bad} mismatching accumulators")
        return 1
    print("OK: resident one-program path == XLA path on every "
          "accumulator and per-pair row")
    return 0


if __name__ == "__main__":
    sys.exit(main())
