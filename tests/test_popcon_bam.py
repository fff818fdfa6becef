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
