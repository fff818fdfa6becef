"""pop+con --BamFile path: mpileup-lite over the aligned BAM must agree
with the --PileupFile path on the synthetic world."""

import os

import pytest

from tests.test_synthetic_e2e import world, pipeline  # fixtures


def _freemix(path):
    with open(path) as fh:
        fh.readline()
        return float(fh.readline().split("\t")[6])


def test_bam_input_matches_pileup_input(world, pipeline, tmp_path):
    from fastquick_tpu.cli import main

    rc = main(["pop+con", "--DisableSanityCheck",
               "--BamFile", str(pipeline / "clean.bam"),
               "--Reference", world["ref_fa"],
               "--SVDPrefix", world["panel"], "--NumPC", "2",
               "--Output", str(tmp_path / "frombam")])
    assert rc == 0
    fm_bam = _freemix(tmp_path / "frombam.selfSM")
    fm_pile = _freemix(pipeline / "clean.selfSM")
    # same underlying alignments; pileup acquisition differs only in
    # filter details (mapQ>=13 vs the Pileup's mapQ>=20 gate), so the
    # estimates agree closely
    assert abs(fm_bam - fm_pile) < 0.02, (fm_bam, fm_pile)
    assert fm_bam < 0.05


def test_bam_pileup_depths_reasonable(world, pipeline, tmp_path):
    from fastquick_tpu.io.fasta import FastaFile
    from fastquick_tpu.pop.estimator import ContaminationEstimator
    from fastquick_tpu.pop.pileup import pileup_from_bam

    est = ContaminationEstimator(num_pc=2)
    est.read_choose_bed(world["panel"] + ".bed")
    ref = FastaFile(world["ref_fa"])

    def fetch(chrom, pos):
        s = ref.fetch(chrom, pos, pos)
        return s if s else None

    v = pileup_from_bam(est.bed_vec, est.choose_bed,
                        str(pipeline / "clean.bam"), fetch)
    assert v.num_marker() > 100
    assert 3 < v.avg_depth < 20
    # bases are pileup symbols: ref matches encoded as . or ,
    some = v.base_info[0]
    assert any(b in ".," for b in some)


def test_baq_is_live_on_bam_path(world, pipeline):
    """The BAM path must actually apply extended-BAQ quality capping
    (SimplePileupViewer.cpp:688 MPLP_REALN; bam_md.c:212 flag=3): the
    pileup quals with BAQ must differ from the raw quals somewhere, and
    only downward (BAQ caps, never raises).  Guards against the BAQ
    stage being silently disabled -- kpa_glocal itself is pinned
    bit-exact to the compiled reference by
    tests/test_ref_baq_differential.py."""
    from fastquick_tpu.io.fasta import FastaFile
    from fastquick_tpu.pop.estimator import ContaminationEstimator
    from fastquick_tpu.pop.pileup import pileup_from_bam

    est = ContaminationEstimator(num_pc=2)
    est.read_choose_bed(world["panel"] + ".bed")
    ref = FastaFile(world["ref_fa"])

    def fetch(chrom, pos):
        s = ref.fetch(chrom, pos, pos)
        return s if s else None

    def fetch_range(chrom, start0, end0):
        s = ref.fetch(chrom, start0 + 1, end0)
        return s or ""

    v_baq = pileup_from_bam(est.bed_vec, est.choose_bed,
                            str(pipeline / "clean.bam"), fetch,
                            ref_range_fetch=fetch_range, baq=True)
    v_raw = pileup_from_bam(est.bed_vec, est.choose_bed,
                            str(pipeline / "clean.bam"), fetch,
                            ref_range_fetch=fetch_range, baq=False)
    # BAQ caps quals; bases capped below the pileup's base-quality gate
    # drop out, so depths/markers may shrink -- never grow -- and on
    # markers with identical depth the qual multiset can only go down
    changed = v_baq.num_marker() != v_raw.num_marker()
    total_b = sum(len(q) for q in v_baq.qual_info)
    total_r = sum(len(q) for q in v_raw.qual_info)
    assert total_b <= total_r, "BAQ must never ADD pileup bases"
    changed = changed or total_b != total_r
    for qb, qr in zip(v_baq.qual_info, v_raw.qual_info):
        if len(qb) == len(qr) and qb != qr:
            changed = True
            assert sum(qb) <= sum(qr), "BAQ raised quals (must only cap)"
    assert changed, "BAQ had no effect on the BAM pileup"
