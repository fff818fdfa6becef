#!/usr/bin/env python
"""fastquick_tpu benchmark: aligned+QC'd reads per second per chip.

Builds a synthetic reduced reference (2 Mbp by default; the production
default panel is ~6.5 Mbp), generates a post-filter-like read mix
(85% matching reads with ~1% base errors, 10% reverse-complement, 5%
junk), and times the batched device alignment engine (ops/batch_search)
end-to-end: width precompute + lockstep inexact FM search + host-exact
fallback for pool overflows.

vs_baseline: the reference C pipeline has no published numbers
(BASELINE.json.published == {}); we use an estimated 100k aligner
reads/s for the reference's default single-node 4-thread configuration
(bwt_match_gap at roughly 25k reads/s/core for 151bp reads) as the
comparison point.

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fq_jax_cache")

BASELINE_READS_PER_SEC = 100_000.0


def _enable_jax_cache():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def build_index(n_bp: int, seed: int = 0):
    from fastquick_tpu.index.builder import ContigInfo, ReducedIndex
    from fastquick_tpu.index.fmindex import FMIndex
    from fastquick_tpu.index.kmerfilter import KmerFilter

    rng = np.random.default_rng(seed)
    text = rng.integers(0, 4, n_bp).astype(np.uint8)
    fm_f = FMIndex.build(text)
    fm_r = FMIndex.build(text[::-1].copy())
    contigs = [ContigInfo("1:1000@A/C", 0, n_bp, "1", 1000, "A", "C", False)]
    kmer = KmerFilter([np.zeros(0, np.uint32)] * 6, thresh=0)
    return ReducedIndex(fm_fwd=fm_f, fm_rev=fm_r, text=text, contigs=contigs,
                        contig_offsets=np.array([0]), kmer=kmer, ambs=[])


def make_reads(idx, n_reads: int, read_len: int, seed: int = 1):
    from fastquick_tpu.align.seqs import Read, seq_reverse

    rng = np.random.default_rng(seed)
    text = idx.text
    reads = []
    for r in range(n_reads):
        start = int(rng.integers(0, len(text) - read_len))
        codes = text[start:start + read_len].copy()
        u = r % 20
        if u < 17:  # matching read with ~1% errors
            nerr = rng.binomial(read_len, 0.01)
            for _ in range(nerr):
                p = int(rng.integers(0, read_len))
                codes[p] = (codes[p] + int(rng.integers(1, 4))) % 4
            if u % 2 == 1:
                codes = (3 - codes)[::-1].copy()
        elif u < 19:  # clean revcomp
            codes = (3 - codes)[::-1].copy()
        else:  # junk
            codes = rng.integers(0, 4, read_len).astype(np.uint8)
        p = Read()
        p.len = p.full_len = p.clip_len = read_len
        p.seq = seq_reverse(codes, False)
        p.rseq = seq_reverse(codes, True)
        p.qual = rng.integers(53, 73, read_len).astype(np.uint8)
        reads.append(p)
    return reads


def main() -> int:
    from fastquick_tpu.align.opts import GapOpt

    n_bp = int(os.environ.get("FQ_BENCH_REF_BP", 2_000_000))
    n_reads = int(os.environ.get("FQ_BENCH_READS", 32768))
    read_len = int(os.environ.get("FQ_BENCH_READ_LEN", 151))
    which = os.environ.get("FQ_BENCH_ENGINE", "native")

    t0 = time.time()
    idx = build_index(n_bp)
    print(f"# index built: {n_bp} bp in {time.time() - t0:.1f}s",
          file=sys.stderr)
    if which == "tpu":
        _enable_jax_cache()
        from fastquick_tpu.ops.batch_search import BatchEngine

        engine = BatchEngine(idx)
    else:
        from fastquick_tpu.align.engine import NativeEngine

        engine = NativeEngine(idx)
    opt = GapOpt()

    # warmup (jit compile for the tpu engine; cache warms for native)
    warm = make_reads(idx, 2048, read_len, seed=7)
    t0 = time.time()
    engine.align_batch(warm, opt)
    print(f"# warmup {time.time() - t0:.1f}s", file=sys.stderr)

    reads = make_reads(idx, n_reads, read_len, seed=1)
    t0 = time.time()
    engine.align_batch(reads, opt)
    dt = time.time() - t0
    n_mapped = sum(1 for p in reads if p.aln)
    rps = n_reads / dt
    print(f"# engine={which}: {n_reads} reads in {dt:.2f}s, "
          f"{n_mapped} with hits", file=sys.stderr)

    print(json.dumps({
        "metric": "aligned_reads_per_sec",
        "value": round(rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(rps / BASELINE_READS_PER_SEC, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
