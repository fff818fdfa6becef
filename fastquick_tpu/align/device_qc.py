"""Resident-on-chip QC mode (`align --device_qc`).

The SURVEY §5 TPU mapping end-to-end as ONE flag: the k-mer filter
(HBM-resident bitmaps), the inexact FM search, SE selection/mapQ, SA
position resolution and the COMPLETE StatCollector accumulator set run
as a single jitted device program per batch (ops/qc_full.qc_step_full).
The index arrays, filter bitmaps and site tables are uploaded once and
stay resident across batches; accumulators are summed on the host in
int64 and merged into the StatCollector once at the end
(stats/device_merge), after which the standard writers produce the
report files.

QC-only mode: no BAM / pairing / insert-size outputs (the reference's
primary product is the QC summary; the full PE path is `align` without
the flag).  Reads the device could not finish exactly (pool/step caps)
or that need the gapped refine path are realigned on the host oracle
and fed through the normal add_single path, so coverage is complete.
"""

from __future__ import annotations

import numpy as np

from ..stats.device_merge import populate_from_device
from ..utils.logging import notice
from .core import (
    BWA_TYPE_NO_MATCH,
    BWA_TYPE_REPEAT,
    BWA_TYPE_UNIQUE,
    bwa_aln2seq_core,
    bwa_approx_mapQ,
)
from .opts import bwa_cal_maxdiff
from .pe import sa_pos
from .rand import Rand48
from .seqs import FastqReader, read_batch

BATCH = 2048


def _acc_add(total: dict | None, acc: dict) -> dict:
    out = {} if total is None else total
    for k, v in acc.items():
        a = np.asarray(v, dtype=np.int64)
        out[k] = a if k not in out else out[k] + a
    return out


def run_device_qc(idx, opt, collector, fq_pairs, fsc_factory,
                  add_fsc) -> None:
    import jax
    import jax.numpy as jnp

    from ..ops.fm import DeviceFM
    from ..ops.qc_full import build_site_tables, qc_step_full

    tables = build_site_tables(idx, collector, opt)
    dev = DeviceFM.build(idx.fm_fwd, idx.fm_rev)
    fm_arrays = {"words": dev.words, "occ": dev.occ, "sa": dev.sa,
                 "L2": dev.L2, "primary": dev.primary}
    thresh = idx.kmer.thresh
    bitmaps = (jnp.asarray(idx.kmer.bitmaps_uint32())
               if thresh > 0 else None)
    Lpad = 256
    md_np = np.array(
        [bwa_cal_maxdiff(i, thres=opt.fnr) if opt.fnr > 0.0
         else opt.max_diff for i in range(Lpad + 1)], np.int32)
    md_table = jnp.asarray(md_np)
    opt_args = {"n_text": dev.n, "max_diff": int(md_np.max()),
                "use_seed": True, "pool": 1024, "inner": 16,
                "step_cap": 4096, "max_gapo": opt.max_gapo,
                "max_gape": opt.max_gape, "max_top2": opt.max_top2,
                "seed_len": opt.seed_len,
                "max_seed_diff": opt.max_seed_diff}

    # bitmaps/index arrays enter as ARGUMENTS: closed-over they become
    # multi-GiB baked-in constants (slow lowering, uncacheable)
    def step_fn(fma, tab, bm, seqs, rseqs, quals, lens):
        return qc_step_full(fma, tab, opt_args, seqs, rseqs,
                            quals, lens, bitmaps=bm, thresh=thresh,
                            md_table=md_table, return_per_read=True)

    jstep = jax.jit(step_fn, static_argnames=())

    def step(seqs, rseqs, quals, lens):
        return jstep(fm_arrays, tables, bitmaps, seqs, rseqs, quals, lens)
    rng = Rand48()
    rng.srand48(11)
    fms = (idx.fm_fwd, idx.fm_rev)
    acc_total = None
    host_redo: list = []

    from .engine import HostEngine

    try:
        from .engine import NativeEngine

        host_eng = NativeEngine(idx)
    except Exception:
        host_eng = HostEngine(idx)

    for fq1, fq2 in fq_pairs:
        fsc = fsc_factory(fq1, fq2 or fq1)
        for path in ([fq1, fq2] if fq2 else [fq1]):
            reader = FastqReader(path)
            rno = 0
            while True:
                # unfiltered read-in: the k-mer gate runs on-chip
                batch = read_batch(reader, None, BATCH, opt.mode,
                                   opt.trim_qual, opt.frac, rno)
                rno += 1
                if not batch:
                    break
                B = len(batch)
                Bpad = BATCH
                seqs = np.full((Bpad, Lpad), 4, np.int32)
                rseqs = np.full((Bpad, Lpad), 4, np.int32)
                quals = np.zeros((Bpad, Lpad), np.int32)
                lens = np.zeros(Bpad, np.int32)
                for i, p in enumerate(batch):
                    ln = min(p.len, Lpad)
                    seqs[i, :ln] = p.seq[:ln]
                    rseqs[i, :ln] = p.rseq[:ln]
                    quals[i, :ln] = p.qual[:ln].astype(np.int32) - 33
                    lens[i] = ln
                    fsc.num_base += p.full_len
                acc, per_read = step(jnp.asarray(seqs), jnp.asarray(rseqs),
                                     jnp.asarray(quals), jnp.asarray(lens))
                acc = {k: np.asarray(v) for k, v in acc.items()}
                redo = np.asarray(per_read["host_redo"])[:B]
                kept = np.asarray(per_read["kept"])[:B]
                mapped = np.asarray(per_read["mapped"])[:B]
                acc_total = _acc_add(acc_total, acc)
                fsc.num_read += B
                fsc.total_filtered += int((~kept).sum())
                fsc.bwa_unmapped += int((kept & ~mapped & ~redo).sum())
                fsc.total_retained += int(mapped.sum())
                for i in np.nonzero(redo)[0]:
                    host_redo.append(batch[i])
            reader.close()
        add_fsc(fsc)
        notice("%d sequences loaded, %d filtered, %d unmapped, "
               "%d retained (device QC)", fsc.num_read,
               fsc.total_filtered, fsc.bwa_unmapped, fsc.total_retained)

    if acc_total is not None:
        populate_from_device(collector, acc_total)
        notice("Device accumulators merged: %d eligible reads, %d bases "
               "at sites, %d sent to host redo",
               int(acc_total["n_eligible"]), int(acc_total["n_base_mapped"]),
               len(host_redo))

    if host_redo:
        # exact host path for pool/step-cap overflows and gapped hits
        host_eng.align_batch(host_redo, opt)
        for p in host_redo:
            if p.filtered:
                continue
            bwa_aln2seq_core(p.aln, p, True, 0, rng)
            if p.type in (BWA_TYPE_UNIQUE, BWA_TYPE_REPEAT):
                p.pos = sa_pos(fms, p.strand, p.sa, p.len)
                md = (bwa_cal_maxdiff(p.len, thres=opt.fnr)
                      if opt.fnr > 0.0 else opt.max_diff)
                p.seQ = p.mapQ = bwa_approx_mapQ(p, md)
        from .driver import PairEndMapper

        shim = PairEndMapper.__new__(PairEndMapper)
        shim.idx, shim.opt, shim.collector = idx, opt, collector
        shim._refine_gapped(host_redo)
        for p in host_redo:
            if p.filtered or p.type == BWA_TYPE_NO_MATCH:
                continue
            collector.add_single_alignment(idx, p, opt)
        collector.flush_dense()
