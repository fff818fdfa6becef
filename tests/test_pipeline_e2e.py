"""End-to-end pipeline regression on the bundled example.

Locks in the observed outputs of the full chain (index -> align ->
pop+con) so behavioral drift is caught.  The reference binary cannot be
built in this image (no htslib), so these goldens are from our exact
host-oracle implementation, which is unit-verified against the
reference's algorithms.
"""

import os
import subprocess
import sys

import pytest

EXAMPLE = "/root/reference/example"


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
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
                   "--out_prefix", str(tmp / "out"), "--engine", "host"])
    finally:
        os.chdir(cwd)
    assert rc == 0
    rc = main(["pop+con", "--DisableSanityCheck",
               "--PileupFile", str(tmp / "out.Pileup"),
               "--SVDPrefix", "/root/reference/resource/hapmap_3.3.b37.dat",
               "--Output", str(tmp / "out")])
    assert rc == 0
    return tmp


def test_insert_size_table_golden(pipeline):
    with open(pipeline / "out.InsertSizeTable") as fh:
        lines = fh.read().splitlines()
    assert lines == [
        "TestRead_2\t1833\t-1\t-1\t*\t*\t69\t0\t*\t22:3304@C/A|L\t169\t129"
        "\t137\t137M\tFwdOnly"
    ]


def test_summary_golden(pipeline):
    with open(pipeline / "out.Summary") as fh:
        text = fh.read()
    assert "Estimated Read Depth : 0.0759003[137/1805]" in text
    assert "Reduced Genome Size : 1805" in text
    assert "Q20 Base Fraction : 0.883212" in text
    assert "Contamination Level : 0.5" in text  # appended by pop+con


def test_sequence_csv_golden(pipeline):
    with open(pipeline / "out.Sequence.csv") as fh:
        lines = fh.read().splitlines()
    assert lines[-1].startswith("Total,75774,502,0,1,1,")


def test_bam_golden(pipeline):
    from fastquick_tpu.io.bam import BamReader

    recs = list(BamReader(str(pipeline / "out.bam")))
    mapped = [(r["qname"], r["flag"], r["pos"] + 1, r["mapq"], r["cigar"])
              for r in recs if not r["flag"] & 4]
    assert mapped == [("TestRead_2", 137, 2472, 37, [("M", 137)])]


def test_selfsm_golden(pipeline):
    with open(pipeline / "out.selfSM") as fh:
        header, row = fh.read().splitlines()
    cols = row.split("\t")
    assert cols[3] == "9787"  # markers in hapmap_3.3 panel
    assert cols[6] == "0.5"  # FREEMIX (degenerate: no shared markers)


def test_device_engine_same_outputs(pipeline, tmp_path):
    """The tpu engine path produces the identical InsertSizeTable."""
    from fastquick_tpu.cli import main

    cwd = os.getcwd()
    os.chdir(EXAMPLE)
    try:
        rc = main(["align", "--fq_list", f"{EXAMPLE}/fq.test.list",
                   "--index_prefix", str(pipeline / "idx"),
                   "--out_prefix", str(tmp_path / "dev"),
                   "--engine", "tpu"])
    finally:
        os.chdir(cwd)
    assert rc == 0
    with open(pipeline / "out.InsertSizeTable") as fh:
        want = fh.read()
    with open(tmp_path / "dev.InsertSizeTable") as fh:
        got = fh.read()
    assert got == want
    with open(pipeline / "out.Summary") as a, \
            open(tmp_path / "dev.Summary") as b:
        # pop+con appended a line to the reference copy; compare prefix
        sa = a.read()
        sb = b.read()
    assert sa.startswith(sb.replace("Contamination Level : 0.5\n", "")) or \
        sb in sa


def test_pipelined_stats_equals_inline(pipeline, tmp_path):
    """The stats+output worker (PEworker analog) must be order-exact:
    a multi-batch pipelined run equals an inline (statq=None) run
    byte-for-byte across every output."""
    import filecmp

    import fastquick_tpu.align.driver as drv
    from fastquick_tpu.cli import main

    def run(prefix, inline):
        orig_pb = drv.PairEndMapper._process_batch
        orig_run = drv.PairEndMapper.run

        def pb_inline(self, b0, b1, last_ii, fsc, statq=None):
            return orig_pb(self, b0, b1, last_ii, fsc, None)

        def run_small(self, fq1, fq2, fsc, batch_size=64):
            return orig_run(self, fq1, fq2, fsc, batch_size)

        drv.PairEndMapper.run = run_small
        if inline:
            drv.PairEndMapper._process_batch = pb_inline
        try:
            rc = main(["align",
                       "--fastq_1",
                       f"{EXAMPLE}/ERR013170_1.filt.fastq.gz.1000.fastq.gz",
                       "--fastq_2",
                       f"{EXAMPLE}/ERR013170_2.filt.fastq.gz.1000.fastq.gz",
                       "--index_prefix", str(pipeline / "idx"),
                       "--out_prefix", prefix])
        finally:
            drv.PairEndMapper.run = orig_run
            drv.PairEndMapper._process_batch = orig_pb
        assert rc == 0

    run(str(tmp_path / "pipe"), inline=False)
    run(str(tmp_path / "seq"), inline=True)
    for sfx in ("Summary", "Pileup", "DepthDist", "GCDist", "EmpRepDist",
                "EmpCycleDist", "RawInsertSizeDist",
                "AdjustedInsertSizeDist", "SexChromInfo", "vcf",
                "InsertSizeTable", "FASTQ.csv", "Sequence.csv", "bam"):
        assert filecmp.cmp(str(tmp_path / f"pipe.{sfx}"),
                           str(tmp_path / f"seq.{sfx}"),
                           shallow=False), sfx
