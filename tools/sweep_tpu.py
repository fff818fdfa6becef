#!/usr/bin/env python
"""On-chip A/B sweep of the lockstep search kernel's static configs.

Runs several (lanes, pool, chain, inner) configs in ONE process against
the bench world (each config is a fresh jit compile: ~8 min through the
axon relay the first time, cached afterwards in /tmp/fq_jax_cache), and
prints one JSON line per config.  Results also verify against the
native engine so a perf experiment can never silently trade away
correctness.

Usage: python tools/sweep_tpu.py "lanes,pool,chain[,inner[,abl+abl|pallas]]" ...
(5th token "pallas" selects the Mosaic inner-loop kernel.)
Defaults to the round-3 ladder if no configs are given.  The optional
5th token sets FQ_BS_ABLATE for that config (profiling only: results
may be wrong, correctness check reported but expected to fail for
noocc/nopush).

NOTE: this dispatches to the single real TPU chip -- never run it
concurrently with another TPU process (CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.pop("PALLAS_AXON_POOL_IPS", None)


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/fq_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 60)

    import numpy as np

    from bench import build_index, device_kernel_bytes_per_iter, make_reads
    from fastquick_tpu.align.opts import GapOpt

    configs = []
    for arg in sys.argv[1:]:
        parts = arg.split(",")
        nums = [int(x) for x in parts[:4]]
        abl = parts[4].replace("+", ",") if len(parts) > 4 else ""
        configs.append((nums + [32])[:4] + [abl])
    if not configs:
        configs = [
            [1024, 512, 4, 32, ""],
            [2048, 512, 4, 32, ""],
            [4096, 512, 4, 32, ""],
            [4096, 256, 4, 32, ""],
            [1024, 512, 1, 32, ""],
        ]

    n_reads = int(os.environ.get("FQ_SWEEP_READS", 8192))
    read_len = int(os.environ.get("FQ_BENCH_READ_LEN", 151))
    t0 = time.time()
    idx = build_index(int(os.environ.get("FQ_BENCH_REF_BP", 2_000_000)))
    reads = make_reads(idx, n_reads, read_len, seed=1)
    print(f"# world ready in {time.time() - t0:.1f}s", file=sys.stderr)

    # golden result from the native exact engine (hit multiset per read)
    from fastquick_tpu.align.engine import NativeEngine

    opt = GapOpt()
    gold_eng = NativeEngine(idx)
    gold_reads = make_reads(idx, n_reads, read_len, seed=1)
    gold_eng.align_batch(gold_reads, opt)
    gold = [sorted((a.n_mm, a.n_gapo, a.n_gape, a.a, a.k, a.l, a.score)
                   for a in p.aln) for p in gold_reads]

    from fastquick_tpu.ops.batch_search import BatchEngine

    for lanes, pool, chain, inner, abl in configs:
        tag = f"lanes={lanes},pool={pool},chain={chain},inner={inner}"
        use_pallas = False
        if abl.startswith("resident"):
            use_pallas = "resident"
            abl = abl[len("resident"):].lstrip("+")
            tag += ",resident"
        elif abl.startswith("pallas"):
            use_pallas = "scan"
            abl = abl[len("pallas"):].lstrip("+")
            tag += ",pallas"
        if abl:
            tag += f",ablate={abl}"
            os.environ["FQ_BS_ABLATE"] = abl
        else:
            os.environ.pop("FQ_BS_ABLATE", None)
        try:
            eng = BatchEngine(idx, lanes=lanes, pool=pool, chain=chain,
                              inner=inner, pallas=use_pallas)
            t0 = time.time()
            eng.align_batch(reads, opt)
            t_compile = time.time() - t0
            best = float("inf")
            for _ in range(int(os.environ.get("FQ_SWEEP_REPS", 2))):
                t0 = time.time()
                eng.align_batch(reads, opt)
                best = min(best, time.time() - t0)
            ok = all(
                sorted((a.n_mm, a.n_gapo, a.n_gape, a.a, a.k, a.l, a.score)
                       for a in p.aln) == gold[i]
                for i, p in enumerate(reads))
            iters = eng.last_iters
            bpi = device_kernel_bytes_per_iter(lanes, pool, read_len)
            print(json.dumps({
                "config": tag,
                "reads_per_sec": round(n_reads / best, 1),
                "ok": bool(ok),
                "iters": iters,
                "fallback": eng.last_fallback,
                "busy_frac": round(eng.last_busy / max(iters * lanes, 1), 3),
                "compile_s": round(t_compile, 1),
                "GBps": round(bpi * iters / best / 1e9, 1),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"config": tag, "error": repr(e)[:200]}),
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
