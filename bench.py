#!/usr/bin/env python
"""fastquick_tpu benchmark: aligned+QC'd reads per second per chip.

Builds a synthetic reduced reference (2 Mbp by default; the production
default panel is ~6.5 Mbp), generates a post-filter-like read mix
(85% matching reads with ~1% base errors, 10% reverse-complement, 5%
junk), and times the batched device alignment engine (ops/batch_search)
end-to-end: width precompute + lockstep inexact FM search + host-exact
fallback for pool overflows.

Modes (FQ_BENCH_ENGINE): "native" (default) = the production exact
aligner engine; "e2e" = device k-mer filter over the full stream + native
alignment of survivors; "tpu" = the lockstep device search kernel.
The default is the CPU-robust mode because this session's TPU relay
intermittently hangs on repeat dispatches (see CLAUDE.md); measured
device numbers: k-mer filter 262k reads in 0.2ms on-chip.

vs_baseline: the reference C pipeline has no published numbers
(BASELINE.json.published == {}), so the bench MEASURES it: the test
harness compiles the reference's own libbwa from /root/reference at
run time (fastquick_tpu/testing/refbwa.py) and this script times
bwt_match_gap over the same bench world + read mix in the exact
bwa_cal_sa_reg_gap loop shape, threaded across all host cores like the
reference driver (`nproc` threads).  vs_baseline = ours / measured.
If /root/reference is absent the old 25k reads/s/core estimate is the
fallback (reported as baseline_source="estimate").  The e2e stream mode
still uses an estimate (~1M reads/s, filter-dominated).

The default mode reports the production native number as the headline
metric AND, in the same JSON object, the on-chip device-engine number
(`tpu_reads_per_sec`, measured in a subprocess so a relay hang cannot
wedge the bench; null if the chip run fails) plus a bytes-moved/iter
accounting for the device kernel -- the MFU analog for this
gather/select-bound workload.

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_READS_PER_SEC_PER_CORE = 25_000.0
BASELINE_READS_PER_SEC = BASELINE_READS_PER_SEC_PER_CORE * (os.cpu_count()
                                                            or 4)
# filter-dominated e2e stream estimate for the reference on this host:
# IsReadInHashByCountMoreChunck is ~150ns/read/core x 2 cores, plus IO
BASELINE_E2E_READS_PER_SEC = 1_000_000.0
HBM_BW = 8.19e11  # TPU v5e HBM bytes/s (public figure)


def device_kernel_bytes_per_iter(lanes: int, pool: int, read_len: int,
                                 nbuck: int = 128, a_max: int = 48) -> int:
    """Static HBM traffic of one lockstep-search iteration (the device
    engine is bandwidth/latency bound, not FLOPs bound -- this is the
    denominator of its speed-of-light fraction).  The pool is 4 int32
    PLANES (k, l, ai+next, diff) of shape (B, pool); push reads+writes
    each plane once, pop one-hot-reads each plane once.  Measured r03:
    wall time fits D + iters*c with D ~= 115 ms/dispatch (transfer +
    dispatch through the relay) and c(B) ~= 80us + 0.37us*lanes."""
    B = lanes
    pool_rw = 3 * B * pool * 4 * 4      # pop read + push read + write
    freelist = 3 * B * pool * 4         # write-back + window + update
    heads = 3 * B * nbuck * 4
    widths = 2 * B * 2 * (read_len + 1) * 2 * 4  # width planes r/w
    alns = 2 * B * a_max * 3 * 4        # packed 3-word hit rows
    occ = 2 * 2 * B * (8 + 4) * 4       # 2 rank pairs: words8 + ckpt rows
    seqs = B * 2 * read_len * 4
    return pool_rw + freelist + heads + widths + alns + occ + seqs


def _device_env_fix():
    """Known-good axon incantation for this image: with the pool-IPs var
    set, the relay intermittently hangs on repeat dispatches; popping it
    before the first jax import yields a stable 'tpu' backend (same as
    __graft_entry__'s self-test)."""
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)


def _enable_jax_cache():
    # Only for the slow-compiling lockstep search kernel ("tpu" mode);
    # the cache interacts badly with axon remote-compile on small graphs.
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/fq_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 60)


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


def bench_e2e(idx, n_reads: int, read_len: int) -> dict:
    """End-to-end QC throughput: device k-mer filter over the full read
    stream (the stage every read passes through; ~97% of a WGS stream is
    non-marker and stops here) + native exact alignment of survivors.
    This is the `reads aligned+QC'd per second per chip` shape of the
    production pipeline."""
    import jax
    import jax.numpy as jnp

    from fastquick_tpu.align.opts import GapOpt
    from fastquick_tpu.align.engine import NativeEngine
    from fastquick_tpu.align.seqs import Read, seq_reverse
    from fastquick_tpu.index.kmerfilter import KmerFilterBuilder
    from fastquick_tpu.ops.kmer import filter_reads

    rng = np.random.default_rng(11)
    text_str = "".join("ACGT"[c] for c in idx.text[:400_000])
    t0 = time.time()
    kb = KmerFilterBuilder()
    # hash the marker flanks in 2kb contigs like the real index build
    for s in range(0, len(text_str) - 2001, 2001):
        kb.add_seq(text_str[s:s + 2001], ("A", "C"))
    filt = kb.finalize()
    bitmaps = jnp.asarray(filt.bitmaps_uint32())
    print(f"# filter built+uploaded in {time.time() - t0:.1f}s",
          file=sys.stderr)

    marker_frac = 0.03
    n_marker = int(n_reads * marker_frac)
    seqs = np.zeros((n_reads, read_len), dtype=np.int32)
    for i in range(n_reads):
        if i < n_marker:
            s = int(rng.integers(0, 400_000 - read_len))
            codes = idx.text[s:s + read_len].astype(np.int32)
            nerr = rng.binomial(read_len, 0.005)
            for _ in range(nerr):
                p = int(rng.integers(0, read_len))
                codes[p] = (codes[p] + 1) % 4
        else:
            codes = rng.integers(0, 4, read_len).astype(np.int32)
        seqs[i] = codes
    lens = np.full(n_reads, read_len, dtype=np.int32)

    jit_filter = jax.jit(filter_reads, static_argnames=("thresh",))
    # warmup at the SAME shape so the timed call measures execution only;
    # NOTE: no eager device ops here -- eager dispatch through the axon
    # relay costs minutes, everything must stay inside the jit
    seqs_d = jnp.asarray(seqs)
    lens_d = jnp.asarray(lens)
    kept_d = jit_filter(bitmaps, seqs_d, lens_d, thresh=3)
    jax.block_until_ready(kept_d)
    eng = NativeEngine(idx)
    opt = GapOpt()

    def run_pipelined():
        """Chunked pipeline: the device filter (TPU) runs ahead of the
        native alignment of survivors (host CPU) -- jax dispatch is
        async, so queueing every chunk's filter first overlaps the two
        resources exactly like the production align driver's
        prefetch."""
        # chunked overlap loses on THIS relay (754k vs 849k reads/s
        # measured: ~115 ms dispatch latency per chunk beats the
        # filter/align overlap); default to one dispatch, opt into
        # pipelining on real hosts where dispatch is cheap
        nch = int(os.environ.get("FQ_BENCH_E2E_CHUNKS", 1))
        bounds = [(n_reads * c // nch, n_reads * (c + 1) // nch)
                  for c in range(nch)]
        t0 = time.time()
        kept_ds = [jit_filter(bitmaps, seqs_d[a:b], lens_d[a:b], thresh=3)
                   for a, b in bounds]
        n_kept = 0
        n_hits = 0
        for (a, b), kd in zip(bounds, kept_ds):
            kept = np.asarray(kd)
            survivors = np.nonzero(kept)[0] + a
            reads = []
            for i in survivors:
                p = Read()
                codes = seqs[i].astype(np.uint8)
                p.len = p.full_len = p.clip_len = read_len
                p.seq = seq_reverse(codes, False)
                p.rseq = seq_reverse(codes, True)
                p.qual = np.full(read_len, 70, np.uint8)
                reads.append(p)
            eng.align_batch(reads, opt)
            n_kept += len(survivors)
            n_hits += sum(1 for p in reads if p.aln)
        return time.time() - t0, n_kept, n_hits

    # warm the per-chunk filter shape + engine caches
    run_pipelined()
    # best-of-N: the relay intermittently stalls a REPEAT dispatch of a
    # compiled executable for tens of seconds (CLAUDE.md pathology;
    # clean calls measure ~0.2s for 262k reads) -- one stall must not
    # become the recorded per-chip figure
    best = (float("inf"), 0, 0)
    for _ in range(3):
        r = run_pipelined()
        if r[0] < best[0]:
            best = r
    total, n_kept, n_hits = best
    print(f"# e2e (pipelined): {n_reads} reads in {total:.2f}s, "
          f"{n_kept} kept, {n_hits} hits -> {n_reads / total:.0f} reads/s",
          file=sys.stderr)
    return {"rps": n_reads / total, "kept": n_kept}


class ReferenceRunner:
    """Compiled reference libbwa's bwt_match_gap over the same reads,
    one thread per host core (the reference driver passes nproc threads;
    ctypes releases the GIL so threads use real cores).  Built once so
    the paired A-B-A-B protocol can alternate with the native engine in
    one process."""

    def __init__(self, idx, reads, opt):
        from fastquick_tpu.align.opts import bwa_cal_maxdiff
        from fastquick_tpu.testing import refbwa

        if not refbwa.available():
            raise RuntimeError("reference tree unavailable")
        self.rb = refbwa.RefBwa(idx.text)
        n = len(reads)
        stride = max(p.len for p in reads)
        self.s0 = np.zeros((n, stride), dtype=np.uint8)
        self.s1 = np.zeros((n, stride), dtype=np.uint8)
        self.lens = np.zeros(n, dtype=np.int32)
        self.mds = np.zeros(n, dtype=np.int32)
        for i, p in enumerate(reads):
            self.s0[i, : p.len] = p.seq[: p.len]
            self.s1[i, : p.len] = p.rseq[: p.len]
            self.lens[i] = p.len
            self.mds[i] = (bwa_cal_maxdiff(p.len, thres=opt.fnr)
                           if opt.fnr > 0.0 else opt.max_diff)
        self.opt = opt
        self.n = n
        ncore = os.cpu_count() or 1
        self.bounds = [(n * t // ncore, n * (t + 1) // ncore)
                       for t in range(ncore)]
        # warm caches
        self.rb.match_gap_batch(self.s0[:256], self.s1[:256],
                                self.lens[:256], self.mds[:256], opt)

    def run_once(self) -> float:
        """One timed pass; returns elapsed seconds."""
        import threading

        ths = [threading.Thread(
            target=self.rb.match_gap_batch,
            args=(self.s0[a:b], self.s1[a:b], self.lens[a:b],
                  self.mds[a:b], self.opt))
            for a, b in self.bounds]
        t0 = time.time()
        for t in ths:
            t.start()
        for t in ths:
            t.join()
        return time.time() - t0


def paired_measure(engine, reads, opt, ref_runner, pairs: int):
    """Interleaved A-B-A-B measurement: alternate native and reference
    passes in ONE process so host-load swings (3-11% CPU steal, 28-181s
    same-run wall variance on this VM) hit both sides equally.  The old
    separate-loop protocol let a +-50% baseline swing flip the headline
    (r03 measured the reference at 33.7k, r04 at 51.8k on identical
    binaries).  Returns (ours_times, ref_times) lists of wall seconds."""
    ours_times, ref_times = [], []
    for rep in range(pairs):
        t0 = time.time()
        engine.align_batch(reads, opt)
        ours_times.append(time.time() - t0)
        if ref_runner is not None:
            ref_times.append(ref_runner.run_once())
        print(f"# pair {rep + 1}/{pairs}: ours {ours_times[-1]:.2f}s"
              + (f" ref {ref_times[-1]:.2f}s" if ref_runner else ""),
              file=sys.stderr)
    return ours_times, ref_times


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
    if which == "e2e":
        _device_env_fix()
        # NB: no persistent jax cache here -- it interacts badly with the
        # axon remote-compile path (minutes-long stalls); this graph
        # compiles in ~2s anyway
        n_stream = int(os.environ.get("FQ_BENCH_STREAM", 262144))
        r = bench_e2e(idx, n_stream, read_len)
        print(json.dumps({
            "metric": "reads_qc_per_sec_per_chip",
            "value": round(r["rps"], 1),
            "unit": "reads/s",
            "vs_baseline": round(r["rps"] / BASELINE_E2E_READS_PER_SEC, 3),
        }))
        return 0
    if which == "tpu":
        _device_env_fix()
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
    # paired A-B-A-B protocol: alternate ours/reference in one process,
    # best-of-N each side, so host-load swings cancel (see paired_measure)
    measure_ref = (which != "tpu"
                   and os.environ.get("FQ_BENCH_MEASURE_REF", "1") == "1")
    ref_runner = None
    if measure_ref:
        try:
            ref_runner = ReferenceRunner(idx, reads, opt)
        except Exception as e:
            print(f"# reference build failed: {e}", file=sys.stderr)
    pairs = int(os.environ.get("FQ_BENCH_REPS", 5 if ref_runner else 3))
    ours_times, ref_times = paired_measure(engine, reads, opt, ref_runner,
                                           pairs)
    dt = min(ours_times)
    n_mapped = sum(1 for p in reads if p.aln)
    rps = n_reads / dt
    print(f"# engine={which}: {n_reads} reads in {dt:.2f}s (best of "
          f"{pairs}), {n_mapped} with hits", file=sys.stderr)

    baseline = BASELINE_READS_PER_SEC
    baseline_source = "estimate"
    if ref_times:
        baseline = n_reads / min(ref_times)
        baseline_source = "measured-paired"
        print(f"# reference libbwa: best {min(ref_times):.2f}s -> "
              f"{baseline:.0f} reads/s (paired, {pairs} pairs)",
              file=sys.stderr)
    out = {
        "metric": "aligned_reads_per_sec",
        "value": round(rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(rps / baseline, 3),
        "baseline_reads_per_sec": round(baseline, 1),
        "baseline_source": baseline_source,
    }
    if ref_times:
        out["paired_protocol"] = {
            "pairs": pairs,
            "ours_times_s": [round(t, 3) for t in ours_times],
            "ref_times_s": [round(t, 3) for t in ref_times],
            "ours_spread": round(max(ours_times) / min(ours_times), 2),
            "ref_spread": round(max(ref_times) / min(ref_times), 2),
            # per-pair ratio is robust to drift across the run: each
            # pair's ours/ref share the same seconds of machine weather
            "per_pair_ratio": [round((n_reads / o) / (n_reads / r), 3)
                               for o, r in zip(ours_times, ref_times)],
        }
        out["vs_baseline_best_pair"] = max(
            out["paired_protocol"]["per_pair_ratio"])
    if which == "tpu":
        iters = engine.last_iters
        bpi = device_kernel_bytes_per_iter(engine.lanes, engine.pool,
                                           read_len)
        gbs = bpi * iters / dt / 1e9
        out.update({
            "engine": "tpu",
            "kernel": engine.pallas or "xla",
            "iters": iters,
            "fallback_reads": engine.last_fallback,
            "fallback_causes": engine.last_fb_causes,
            "busy_lane_frac": round(
                getattr(engine, "last_busy", 0)
                / max(iters * engine.lanes, 1), 3),
            "bytes_per_iter": bpi,
            "achieved_GBps": round(gbs, 1),
            # the byte model counts every plane pass; for the RESIDENT
            # kernel those planes live in VMEM, so this is a VMEM-
            # bandwidth proxy (it can exceed the HBM figure) -- for the
            # XLA path it approximates real HBM traffic
            "hbm_sol_frac": round(gbs * 1e9 / HBM_BW, 3),
            "traffic_domain": ("vmem" if engine.pallas == "resident"
                               else "hbm"),
        })
        print(json.dumps(out))
        return 0
    # default mode: also measure the on-chip device engine in a
    # subprocess (a relay hang there cannot wedge the headline bench).
    # Probe first: a wedged relay hangs even jax.devices(), so without
    # the probe a sick chip would burn the full subprocess timeout.
    if os.environ.get("FQ_BENCH_TPU_SUB", "1") == "1":
        from fastquick_tpu.utils.device import healthy_tpu

        if not healthy_tpu(timeout=300.0):
            out["tpu_reads_per_sec"] = None
            out["tpu_error"] = "no healthy accelerator (probe)"
            print("# tpu probe failed: skipping device bench",
                  file=sys.stderr)
            print(json.dumps(out))
            return 0
        import subprocess

        # 32768 reads amortize the ~115 ms fixed dispatch cost (the
        # measured D in time = D + iters*c) to ~5% of the wall time
        env = dict(os.environ, FQ_BENCH_ENGINE="tpu",
                   FQ_BENCH_READS="32768", FQ_BENCH_TPU_SUB="0",
                   FQ_BENCH_MEASURE_REF="0")
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                capture_output=True, text=True,
                timeout=int(os.environ.get("FQ_BENCH_TPU_TIMEOUT", 1500)))
            line = [ln for ln in r.stdout.splitlines()
                    if ln.startswith("{")][-1]
            tpu = json.loads(line)
            out["tpu_reads_per_sec"] = tpu["value"]
            for key in ("kernel", "iters", "fallback_reads",
                        "fallback_causes", "busy_lane_frac",
                        "bytes_per_iter", "achieved_GBps",
                        "hbm_sol_frac", "traffic_domain"):
                out[f"tpu_{key}"] = tpu.get(key)
        except Exception as e:  # relay hang/timeout: report null, not 0
            out["tpu_reads_per_sec"] = None
            out["tpu_error"] = type(e).__name__
            print(f"# tpu subprocess failed: {e}", file=sys.stderr)
        # official end-to-end per-chip number (device k-mer filter over
        # the full stream + alignment of survivors): the PRODUCT device
        # path's shape, not just the search microbenchmark
        env_e2e = dict(os.environ, FQ_BENCH_ENGINE="e2e",
                       FQ_BENCH_TPU_SUB="0", FQ_BENCH_MEASURE_REF="0")
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env_e2e,
                capture_output=True, text=True,
                timeout=int(os.environ.get("FQ_BENCH_E2E_TIMEOUT", 900)))
            line = [ln for ln in r.stdout.splitlines()
                    if ln.startswith("{")][-1]
            e2e = json.loads(line)
            out["e2e_reads_qc_per_sec_per_chip"] = e2e["value"]
        except Exception as e:
            out["e2e_reads_qc_per_sec_per_chip"] = None
            out["e2e_error"] = type(e).__name__
            print(f"# e2e subprocess failed: {e}", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
