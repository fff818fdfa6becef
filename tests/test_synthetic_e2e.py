"""Synthetic full-pipeline test: genome -> markers -> reads -> QC -> contamination.

Simulates a small genome with SNP markers, a reference panel (for SVD on
the fly), and paired-end reads from diploid samples (optionally mixed for
contamination), then runs the real CLI chain and checks the science:
marker pileups populated, genotype calls match simulation, depth accounts
consistent, and the contamination estimate recovers the mixing fraction.
"""

import gzip
import math
import os
import subprocess

import numpy as np
import pytest

N_MARKERS = 120
FLANK = 250
SPACING = 3000
READ_LEN = 100
INSERT = 300


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    """Genome + marker VCFs + reference panel + two sample genotype sets."""
    tmp = tmp_path_factory.mktemp("synth")
    rng = np.random.default_rng(42)
    glen = N_MARKERS * SPACING + 10000
    genome = rng.integers(0, 4, glen).astype(np.uint8)
    gstr = "".join("ACGT"[c] for c in genome)
    ref_fa = tmp / "genome.fa"
    with open(ref_fa, "w") as fh:
        fh.write(">1\n")
        for i in range(0, glen, 60):
            fh.write(gstr[i:i + 60] + "\n")

    positions = [(i + 1) * SPACING for i in range(N_MARKERS)]  # 1-based
    afs = rng.uniform(0.1, 0.9, N_MARKERS)
    refs = [gstr[p - 1] for p in positions]
    alts = ["ACGT"[(genome[p - 1] + 1 + rng.integers(0, 3)) % 4]
            for p in positions]
    alts = []
    for p in positions:
        r = genome[p - 1]
        alts.append("ACGT"[(r + int(rng.integers(1, 4))) % 4])

    # candidate site VCF
    cand = tmp / "cand.vcf"
    with open(cand, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\t"
                 "FILTER\tINFO\n")
        for p, r, a, af in zip(positions, refs, alts, afs):
            fh.write(f"1\t{p}\trs{p}\t{r}\t{a}\t.\tPASS\tAF={af:.4f}\n")

    # dbSNP: the markers themselves + some extra sites
    dbsnp = tmp / "dbsnp.vcf"
    with open(dbsnp, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\t"
                 "FILTER\tINFO\n")
        for p, r, a in zip(positions, refs, alts):
            fh.write(f"1\t{p}\trs{p}\t{r}\t{a}\t.\tPASS\t.\n")

    # reference panel VCF with GT for SVD
    n_panel = 80
    panel = tmp / "panel.vcf"
    panel_geno = np.zeros((N_MARKERS, n_panel), dtype=int)
    with open(panel, "w") as fh:
        samples = "\t".join(f"S{i}" for i in range(n_panel))
        fh.write("##fileformat=VCFv4.2\n")
        fh.write(f"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                 f"{samples}\n")
        for m, (p, r, a, af) in enumerate(zip(positions, refs, alts, afs)):
            genos = rng.binomial(2, af, n_panel)
            panel_geno[m] = genos
            gt = "\t".join("0/0" if g == 0 else ("0/1" if g == 1 else "1/1")
                           for g in genos)
            fh.write(f"1\t{p}\trs{p}\t{r}\t{a}\t.\tPASS\tAF={af:.4f}\tGT\t"
                     f"{gt}\n")

    # two diploid sample genotype sets
    geno_a = rng.binomial(2, afs)
    geno_b = rng.binomial(2, afs)
    return dict(tmp=tmp, genome=genome, gstr=gstr, ref_fa=str(ref_fa),
                cand=str(cand), dbsnp=str(dbsnp), panel=str(panel),
                positions=positions, refs=refs, alts=alts, afs=afs,
                geno_a=geno_a, geno_b=geno_b, rng=rng)


def simulate_fastqs(world, out1, out2, alpha=0.0, depth=12, seed=7,
                    junk_frac=0.0):
    """PE reads covering each marker region; fraction alpha comes from
    sample B (the 'contaminant'), rest from sample A.  junk_frac adds
    that fraction of random-sequence pairs (k-mer-filter fodder)."""
    rng = np.random.default_rng(seed)
    gstr = world["gstr"]
    comp = str.maketrans("ACGT", "TGCA")
    with gzip.open(out1, "wt") as f1, gzip.open(out2, "wt") as f2:
        rid = 0
        for m, pos in enumerate(world["positions"]):
            for _ in range(depth):
                from_b = rng.random() < alpha
                geno = world["geno_b"][m] if from_b else world["geno_a"][m]
                has_alt = rng.random() < geno / 2.0
                # fragment covering the marker; insert length varies so the
                # inferred insert-size distribution has nonzero spread
                insert = int(rng.integers(INSERT - 60, INSERT + 60))
                frag_start = pos - 1 - int(rng.integers(READ_LEN // 2,
                                                        insert - READ_LEN // 2))
                frag_start = max(0, frag_start)
                frag = list(gstr[frag_start:frag_start + insert])
                mp = pos - 1 - frag_start
                if 0 <= mp < len(frag) and has_alt:
                    frag[mp] = world["alts"][m]
                frag = "".join(frag)
                r1 = frag[:READ_LEN]
                r2 = frag[-READ_LEN:].translate(comp)[::-1]
                q = "I" * READ_LEN
                f1.write(f"@sim{rid}/1\n{r1}\n+\n{q}\n")
                f2.write(f"@sim{rid}/2\n{r2}\n+\n{q}\n")
                rid += 1
                if junk_frac and rng.random() < junk_frac:
                    j1 = "".join("ACGT"[c] for c in
                                 rng.integers(0, 4, READ_LEN))
                    j2 = "".join("ACGT"[c] for c in
                                 rng.integers(0, 4, READ_LEN))
                    f1.write(f"@junk{rid}/1\n{j1}\n+\n{q}\n")
                    f2.write(f"@junk{rid}/2\n{j2}\n+\n{q}\n")
                    rid += 1


@pytest.fixture(scope="module")
def pipeline(world):
    from fastquick_tpu.cli import main

    tmp = world["tmp"]
    fq1, fq2 = str(tmp / "a_1.fq.gz"), str(tmp / "a_2.fq.gz")
    simulate_fastqs(world, fq1, fq2, alpha=0.0)
    rc = main(["index", "--siteVCF", world["cand"], "--dbsnpVCF",
               world["dbsnp"], "--ref", world["ref_fa"],
               "--out_prefix", str(tmp / "idx"),
               "--var_short", "200", "--var_long", "0"])
    assert rc == 0
    rc = main(["align", "--fastq_1", fq1, "--fastq_2", fq2,
               "--index_prefix", str(tmp / "idx"),
               "--out_prefix", str(tmp / "clean")])
    assert rc == 0
    # SVD on the fly from the panel
    rc = main(["pop+con", "--RefVCF", world["panel"]])
    assert rc == 0
    rc = main(["pop+con", "--DisableSanityCheck",
               "--PileupFile", str(tmp / "clean.Pileup"),
               "--SVDPrefix", world["panel"], "--NumPC", "2",
               "--Output", str(tmp / "clean")])
    assert rc == 0
    return tmp


def test_markers_selected(world, pipeline):
    from fastquick_tpu.io.vcf import VcfReader

    with VcfReader(str(pipeline / "idx.FASTQuick.fa.SelectedSite.vcf")) as r:
        recs = list(r)
    # flank 250, spacing 3000 -> every marker selectable
    assert len(recs) == N_MARKERS


def test_pileup_covers_markers(world, pipeline):
    depths = {}
    with open(pipeline / "clean.Pileup") as fh:
        for line in fh:
            cols = line.split("\t")
            depths[int(cols[1])] = int(cols[3])
    covered = [p for p in world["positions"] if depths.get(p, 0) > 0]
    assert len(covered) > N_MARKERS * 0.9
    assert np.mean([depths[p] for p in covered]) > 3


def test_summary_depth_plausible(pipeline):
    with open(pipeline / "clean.Summary") as fh:
        text = fh.read()
    depth_line = [l for l in text.splitlines()
                  if l.startswith("Estimated Read Depth")][0]
    val = float(depth_line.split(":")[1].split("[")[0])
    assert 1.0 < val < 20.0


def test_vcf_genotypes_match_simulation(world, pipeline):
    from fastquick_tpu.io.vcf import VcfReader

    gt_map = {"0/0": 0, "0/1": 1, "1/1": 2}
    correct = total = 0
    with VcfReader(str(pipeline / "clean.vcf")) as r:
        for rec in r:
            pos = rec.pos
            m = world["positions"].index(pos)
            sample = rec.rest[1]
            gt = gt_map[sample.split(":")[0]]
            depth = len(rec.info_dict().get("AC", ""))
            total += 1
            if gt == world["geno_a"][m]:
                correct += 1
    assert total > N_MARKERS * 0.9
    assert correct / total > 0.9, f"genotype concordance {correct}/{total}"


def test_clean_sample_contamination_low(pipeline):
    with open(pipeline / "clean.selfSM") as fh:
        fh.readline()
        cols = fh.readline().split("\t")
    freemix = float(cols[6])
    assert freemix < 0.05, f"clean sample FREEMIX {freemix}"


def test_contaminated_sample_detected(world, pipeline):
    from fastquick_tpu.cli import main

    tmp = world["tmp"]
    fq1, fq2 = str(tmp / "c_1.fq.gz"), str(tmp / "c_2.fq.gz")
    simulate_fastqs(world, fq1, fq2, alpha=0.15, depth=12, seed=9)
    rc = main(["align", "--fastq_1", fq1, "--fastq_2", fq2,
               "--index_prefix", str(tmp / "idx"),
               "--out_prefix", str(tmp / "cont")])
    assert rc == 0
    rc = main(["pop+con", "--DisableSanityCheck",
               "--PileupFile", str(tmp / "cont.Pileup"),
               "--SVDPrefix", world["panel"], "--NumPC", "2",
               "--Output", str(tmp / "cont")])
    assert rc == 0
    with open(tmp / "cont.selfSM") as fh:
        fh.readline()
        cols = fh.readline().split("\t")
    freemix = float(cols[6])
    assert 0.05 < freemix < 0.30, f"contaminated FREEMIX {freemix} vs 0.15"
