#!/usr/bin/env python
"""Production-scale stress: 10k-marker index build + align + pop+con.

Synthesizes a 35 Mbp genome, selects ~10k markers (9k short + 1k long),
builds the full index, aligns a few hundred thousand PE reads (mix of
marker-covering and background), and runs the contamination estimate.
Reports wall times per stage.  Not part of the pytest suite (minutes).
"""

from __future__ import annotations

import gzip
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fastquick_tpu.cli import main


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _write_world(tmp, gstr, glen, positions, rng, ref, cand, dbsnp):
    with open(ref, "w") as fh:
        fh.write(">1\n")
        for i in range(0, glen, 60):
            fh.write(gstr[i:i + 60] + "\n")
    with open(cand, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\t"
                 "FILTER\tINFO\n")
        for p in positions:
            r = gstr[p - 1]
            a = "ACGT"[("ACGT".index(r) + 1) % 4]
            af = rng.uniform(0.05, 0.95)
            fh.write(f"1\t{p}\trs{p}\t{r}\t{a}\t.\tPASS\tAF={af:.3f}\n")
    with open(dbsnp, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\t"
                 "FILTER\tINFO\n")
        for p in positions[::7]:
            r = gstr[p - 1]
            a = "ACGT"[("ACGT".index(r) + 1) % 4]
            fh.write(f"1\t{p}\trs{p}\t{r}\t{a}\t.\tPASS\t.\n")


def _write_reads(gstr, glen, positions, n_markers, n_pairs, rng, comp,
                 fq1, fq2):
    with gzip.open(fq1, "wt", compresslevel=1) as f1, \
            gzip.open(fq2, "wt", compresslevel=1) as f2:
        for i in range(n_pairs):
            if i % 10 < 3:  # 30% marker-covering
                pos = positions[int(rng.integers(0, n_markers))]
                ins = int(rng.integers(250, 420))
                fs = max(0, pos - 1 - int(rng.integers(60, ins - 60)))
            else:  # background genome fragment
                ins = int(rng.integers(250, 420))
                fs = int(rng.integers(0, glen - ins))
            frag = gstr[fs:fs + ins]
            f1.write(f"@s{i}/1\n{frag[:150]}\n+\n{'I' * 150}\n")
            f2.write(f"@s{i}/2\n{frag[-150:].translate(comp)[::-1]}\n+\n"
                     f"{'I' * 150}\n")


def run(n_markers_short=9000, n_markers_long=1000, n_pairs=100_000):
    # FQ_STRESS_DIR: fixed dir whose world/index/read artifacts are
    # reused across runs (iterate on one stage without rebuilding);
    # FQ_STRESS_STAGES: comma list among index,align,popcon (default all)
    fixed = os.environ.get("FQ_STRESS_DIR")
    stages = set(os.environ.get("FQ_STRESS_STAGES",
                                "index,align,popcon").split(","))
    if fixed:
        os.makedirs(fixed, exist_ok=True)
        tmp = fixed
    else:
        tmp = tempfile.mkdtemp(prefix="fq_stress_")
    rng = np.random.default_rng(0)
    spacing = 3200
    n_markers = n_markers_short + n_markers_long
    glen = (n_markers + 2) * spacing
    log(f"genome {glen/1e6:.1f} Mbp, {n_markers} markers, tmp={tmp}")

    t0 = time.time()
    genome = rng.integers(0, 4, glen).astype(np.uint8)
    gstr = "".join("ACGT"[c] for c in genome)
    ref = os.path.join(tmp, "g.fa")
    positions = [(i + 1) * spacing for i in range(n_markers)]
    have_world = fixed and os.path.exists(os.path.join(tmp, "dbsnp.vcf"))
    cand = os.path.join(tmp, "cand.vcf")
    dbsnp = os.path.join(tmp, "dbsnp.vcf")
    if have_world:
        log("world artifacts reused")
    else:
        _write_world(tmp, gstr, glen, positions, rng, ref, cand, dbsnp)
        log(f"world written in {time.time()-t0:.1f}s")

    t0 = time.time()
    idx_prefix = os.path.join(tmp, "idx")
    if "index" in stages and not (
            fixed and os.path.exists(idx_prefix + ".FASTQuick.fa.index.npz")):
        rc = main(["index", "--siteVCF", cand, "--dbsnpVCF", dbsnp,
                   "--ref", ref, "--out_prefix", idx_prefix,
                   "--var_short", str(n_markers_short),
                   "--var_long", str(n_markers_long)])
        assert rc == 0
        log(f"INDEX stage: {time.time()-t0:.1f}s")
    else:
        log("INDEX stage: reused")

    t0 = time.time()
    comp = str.maketrans("ACGT", "TGCA")
    fq1 = os.path.join(tmp, "r_1.fq.gz")
    fq2 = os.path.join(tmp, "r_2.fq.gz")
    if not (fixed and os.path.exists(fq2)):
        _write_reads(gstr, glen, positions, n_markers, n_pairs, rng, comp,
                     fq1, fq2)
        log(f"reads written: {2*n_pairs} in {time.time()-t0:.1f}s")

    if "align" in stages:
        t0 = time.time()
        rc = main(["align", "--fastq_1", fq1, "--fastq_2", fq2,
                   "--index_prefix", idx_prefix,
                   "--out_prefix", os.path.join(tmp, "out")])
        assert rc == 0
        dt = time.time() - t0
        log(f"ALIGN stage: {dt:.1f}s -> {2*n_pairs/dt:.0f} reads/s e2e")

    if "popcon" not in stages:
        return tmp
    t0 = time.time()
    # SVD resources from a small panel over the same markers
    panel = os.path.join(tmp, "panel.vcf")
    with open(panel, "w") as fh:
        ns = 60
        fh.write("##fileformat=VCFv4.2\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                 + "\t".join(f"S{k}" for k in range(ns)) + "\n")
        for p in positions[::4]:
            r = gstr[p - 1]
            a = "ACGT"[("ACGT".index(r) + 1) % 4]
            genos = rng.binomial(2, 0.3, ns)
            gt = "\t".join("0/0" if g == 0 else ("0/1" if g == 1 else "1/1")
                           for g in genos)
            fh.write(f"1\t{p}\trs{p}\t{r}\t{a}\t.\tPASS\t.\tGT\t{gt}\n")
    rc = main(["pop+con", "--RefVCF", panel])
    assert rc == 0
    rc = main(["pop+con", "--DisableSanityCheck",
               "--PileupFile", os.path.join(tmp, "out.Pileup"),
               "--SVDPrefix", panel, "--NumPC", "2",
               "--Output", os.path.join(tmp, "out")])
    assert rc == 0
    log(f"POP+CON stage: {time.time()-t0:.1f}s")
    with open(os.path.join(tmp, "out.selfSM")) as fh:
        fh.readline()
        log("selfSM: " + fh.readline().strip())
    with open(os.path.join(tmp, "out.Summary")) as fh:
        for line in fh:
            if "Depth" in line or "Mapping" in line:
                log("summary: " + line.strip())
    return tmp


if __name__ == "__main__":
    run(n_pairs=int(os.environ.get("FQ_STRESS_PAIRS", 100_000)))
