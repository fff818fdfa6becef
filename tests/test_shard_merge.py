"""Sharded align runs + merge must reproduce the single-run statistics."""

import gzip
import os

import numpy as np
import pytest

from tests.test_synthetic_e2e import simulate_fastqs, world  # fixtures


def _split_fastq(src, out_a, out_b):
    """Split a gzip FASTQ into two halves by record."""
    with gzip.open(src, "rt") as fh:
        recs = []
        while True:
            h = fh.readline()
            if not h:
                break
            recs.append(h + fh.readline() + fh.readline() + fh.readline())
    half = len(recs) // 2
    with gzip.open(out_a, "wt") as fa:
        fa.writelines(recs[:half])
    with gzip.open(out_b, "wt") as fb:
        fb.writelines(recs[half:])


def test_shard_merge_matches_single_run(world, tmp_path):
    from fastquick_tpu.cli import main

    tmp = world["tmp"]
    fq1, fq2 = str(tmp_path / "s_1.fq.gz"), str(tmp_path / "s_2.fq.gz")
    simulate_fastqs(world, fq1, fq2, alpha=0.0, depth=6, seed=21)

    idx_prefix = str(tmp / "idx")
    if not os.path.exists(idx_prefix + ".FASTQuick.fa.index.npz"):
        rc = main(["index", "--siteVCF", world["cand"], "--dbsnpVCF",
                   world["dbsnp"], "--ref", world["ref_fa"],
                   "--out_prefix", idx_prefix,
                   "--var_short", "200", "--var_long", "0"])
        assert rc == 0

    # single run
    rc = main(["align", "--fastq_1", fq1, "--fastq_2", fq2,
               "--index_prefix", idx_prefix,
               "--out_prefix", str(tmp_path / "single")])
    assert rc == 0

    # two shards + merge
    a1, a2 = str(tmp_path / "a_1.fq.gz"), str(tmp_path / "a_2.fq.gz")
    b1, b2 = str(tmp_path / "b_1.fq.gz"), str(tmp_path / "b_2.fq.gz")
    _split_fastq(fq1, a1, b1)
    _split_fastq(fq2, a2, b2)
    for pre, (f1, f2) in (("shardA", (a1, a2)), ("shardB", (b1, b2))):
        rc = main(["align", "--fastq_1", f1, "--fastq_2", f2,
                   "--index_prefix", idx_prefix,
                   "--out_prefix", str(tmp_path / pre), "--shard_out"])
        assert rc == 0
        assert os.path.exists(tmp_path / f"{pre}.shard.npz")
    rc = main(["merge", "--index_prefix", idx_prefix,
               "--out_prefix", str(tmp_path / "merged"),
               str(tmp_path / "shardA"), str(tmp_path / "shardB")])
    assert rc == 0

    # order-insensitive outputs must match exactly
    for f in ("DepthDist", "GCDist", "EmpRepDist", "EmpCycleDist",
              "RawInsertSizeDist", "AdjustedInsertSizeDist"):
        single = open(tmp_path / f"single.{f}").read()
        merged = open(tmp_path / f"merged.{f}").read()
        assert single == merged, f"{f} differs"
    # Summary: all lines except the FASTQ-file accounting block must match
    s_lines = open(tmp_path / "single.Summary").read().splitlines()
    m_lines = open(tmp_path / "merged.Summary").read().splitlines()
    assert s_lines == m_lines
    # pileup depth per marker matches (order within marker may differ)
    def pileup_depths(p):
        out = {}
        for line in open(p):
            c = line.split("\t")
            out[int(c[1])] = (int(c[3]), "".join(sorted(c[4].upper())))
        return out

    assert (pileup_depths(tmp_path / "single.Pileup")
            == pileup_depths(tmp_path / "merged.Pileup"))
