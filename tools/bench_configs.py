#!/usr/bin/env python
"""Runnable versions of the BASELINE.json benchmark configs.

Each config prints one JSON line {"config", "metric", "value", "unit"}.
Select with args (default: the quick set).  Scale knobs via env.

  1 example      bundled-example full pipeline (index+align+pop+con)
  2 panel100k    10k-marker panel index + 100k simulated PE reads
  3 sample1m     1M-read sample: align + summarize + contamination
  4 wgs_stream   streamed FASTQ shards on one host (scaled down: N
                 shards aligned sequentially with --shard_out + merge)
  5 multisample  N samples sharded + psum-style merge (scaled down)

Configs 4 and 5 are scaled-down single-host stand-ins for the 30x-WGS
and multi-host rows: the sharding/merge machinery they exercise
(align --shard_out, fastquick merge, stats/shard.py) is exactly what a
pod deployment runs per host; tests/test_shard_merge.py pins shard
merges byte-identical to single runs.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EXAMPLE = "/root/reference/example"
RESOURCE = "/root/reference/resource"


def _main(args):
    from fastquick_tpu.cli import main

    rc = main(args)
    assert rc == 0, args


def config_example():
    tmp = tempfile.mkdtemp(prefix="fq_cfg1_")
    cwd = os.getcwd()
    try:
        os.chdir(tmp)
        for f in glob.glob(EXAMPLE + "/*.fastq.gz"):
            shutil.copy(f, ".")
        shutil.copy(EXAMPLE + "/fq.test.list", ".")
        t0 = time.time()
        _main(["index", "--siteVCF", EXAMPLE + "/hapmap.test.vcf.gz",
               "--dbsnpVCF", EXAMPLE + "/dbsnp.test.vcf.gz",
               "--ref", EXAMPLE + "/ref.test.fa", "--out_prefix", "idx"])
        _main(["align", "--fq_list", "fq.test.list",
               "--index_prefix", "idx", "--out_prefix", "out"])
        _main(["pop+con", "--DisableSanityCheck", "--PileupFile",
               "out.Pileup", "--SVDPrefix",
               RESOURCE + "/hapmap_3.3.b37.dat", "--Output", "out"])
        dt = time.time() - t0
        print(json.dumps({"config": "example", "metric": "pipeline_wall",
                          "value": round(dt, 2), "unit": "s"}))
    finally:
        os.chdir(cwd)
        shutil.rmtree(tmp, ignore_errors=True)


def _stress(n_pairs: int) -> None:
    env = dict(os.environ, FQ_STRESS_PAIRS=str(n_pairs))
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "stress_production_scale.py")],
        env=env, capture_output=True, text=True, check=True)
    align_line = [ln for ln in out.stdout.splitlines() if "ALIGN stage" in ln]
    rps = float(align_line[0].split("-> ")[1].split(" ")[0]) if align_line \
        else 0.0
    return time.time() - t0, rps, out.stdout


def config_panel100k():
    wall, rps, _ = _stress(50_000)
    print(json.dumps({"config": "panel100k",
                      "metric": "align_reads_per_sec_e2e",
                      "value": round(rps, 1), "unit": "reads/s",
                      "total_wall_s": round(wall, 1)}))


def config_sample1m():
    wall, rps, _ = _stress(500_000)
    print(json.dumps({"config": "sample1m",
                      "metric": "align_reads_per_sec_e2e",
                      "value": round(rps, 1), "unit": "reads/s",
                      "total_wall_s": round(wall, 1)}))


def _sharded(n_shards: int, config_name: str):
    """Shard the example FASTQs n_shards ways, align each with
    --shard_out, merge, and compare wall vs the single run."""
    import gzip

    tmp = tempfile.mkdtemp(prefix="fq_cfgshard_")
    cwd = os.getcwd()
    try:
        os.chdir(tmp)
        _main(["index", "--siteVCF", EXAMPLE + "/hapmap.test.vcf.gz",
               "--dbsnpVCF", EXAMPLE + "/dbsnp.test.vcf.gz",
               "--ref", EXAMPLE + "/ref.test.fa", "--out_prefix", "idx"])
        # split the bundled fastqs into shards
        recs = [[], []]
        for j, name in enumerate(["ERR013170_1.filt.fastq.gz.1000.fastq.gz",
                                  "ERR013170_2.filt.fastq.gz.1000.fastq.gz"]):
            with gzip.open(os.path.join(EXAMPLE, name), "rt") as fh:
                lines = fh.read().splitlines()
            recs[j] = [lines[i:i + 4] for i in range(0, len(lines), 4)]
        for s in range(n_shards):
            for j in (0, 1):
                with gzip.open(f"shard{s}_{j + 1}.fq.gz", "wt") as fh:
                    for r in recs[j][s::n_shards]:
                        fh.write("\n".join(r) + "\n")
        t0 = time.time()
        shard_prefixes = []
        for s in range(n_shards):
            _main(["align", "--fastq_1", f"shard{s}_1.fq.gz",
                   "--fastq_2", f"shard{s}_2.fq.gz",
                   "--index_prefix", "idx", "--out_prefix", f"sh{s}",
                   "--shard_out"])
            shard_prefixes.append(f"sh{s}")
        _main(["merge", "--index_prefix", "idx", "--out_prefix", "merged"]
              + shard_prefixes)
        dt = time.time() - t0
        print(json.dumps({"config": config_name,
                          "metric": "sharded_align_merge_wall",
                          "value": round(dt, 2), "unit": "s",
                          "n_shards": n_shards}))
    finally:
        os.chdir(cwd)
        shutil.rmtree(tmp, ignore_errors=True)


def config_wgs_stream():
    _sharded(2, "wgs_stream")


def config_multisample():
    _sharded(4, "multisample")


CONFIGS = {
    "example": config_example,
    "panel100k": config_panel100k,
    "sample1m": config_sample1m,
    "wgs_stream": config_wgs_stream,
    "multisample": config_multisample,
}

if __name__ == "__main__":
    names = sys.argv[1:] or ["example", "wgs_stream", "multisample"]
    for n in names:
        CONFIGS[n]()
