"""`align --device_qc` (resident-on-chip QC mode) on the bundled example.

The only read that maps in the example is an exact SE-eligible ungapped
match, so the device-QC accumulator path must reproduce the host
pipeline's site-level outputs byte-for-byte (pair-only outputs -- isize,
dup counters -- are out of scope for the QC-only mode)."""

import filecmp
import os

import pytest

jax = pytest.importorskip("jax")

EXAMPLE = "/root/reference/example"


@pytest.fixture(scope="module")
def outputs(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("dqc")
    from fastquick_tpu.cli import main

    rc = main(["index",
               "--siteVCF", f"{EXAMPLE}/hapmap.test.vcf.gz",
               "--dbsnpVCF", f"{EXAMPLE}/dbsnp.test.vcf.gz",
               "--ref", f"{EXAMPLE}/ref.test.fa",
               "--out_prefix", str(tmp / "idx")])
    assert rc == 0
    cwd = os.getcwd()
    os.chdir(EXAMPLE)  # fq.test.list has relative paths
    try:
        rc = main(["align", "--fq_list", f"{EXAMPLE}/fq.test.list",
                   "--index_prefix", str(tmp / "idx"),
                   "--out_prefix", str(tmp / "host"), "--engine", "host"])
        assert rc == 0
        rc = main(["align", "--fq_list", f"{EXAMPLE}/fq.test.list",
                   "--index_prefix", str(tmp / "idx"),
                   "--out_prefix", str(tmp / "dev"), "--device_qc"])
        assert rc == 0
    finally:
        os.chdir(cwd)
    return tmp


def test_site_outputs_match_host(outputs):
    for sfx in ("Pileup", "DepthDist", "EmpRepDist", "EmpCycleDist",
                "GCDist"):
        assert filecmp.cmp(str(outputs / f"host.{sfx}"),
                           str(outputs / f"dev.{sfx}"),
                           shallow=False), sfx


def test_depth_covered_matches_example(outputs):
    # TestRead_2 is the only mapping read: 137 bases at depth 1, and it
    # does not cover the marker itself (Pileup legitimately empty, same
    # as the host run -- compared byte-identical above)
    with open(outputs / "dev.DepthDist") as fh:
        rows = [ln.split("\t") for ln in fh.read().splitlines()]
    d = {int(r[0]): int(r[1]) for r in rows}
    assert d.get(1) == 137
    with open(outputs / "dev.Pileup") as fh:
        assert fh.read() == ""


def test_no_bam_written_in_qc_mode(outputs):
    assert not (outputs / "dev.bam").exists()
    assert (outputs / "host.bam").exists()
