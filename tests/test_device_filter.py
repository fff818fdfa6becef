"""--device_filter: the k-mer gate on the accelerator must reproduce the
host/native filter exactly through the full align CLI."""

import filecmp
import os

from tests.test_synthetic_e2e import simulate_fastqs, world


def test_device_filter_matches_host(world, tmp_path):
    from fastquick_tpu.cli import main

    tmp = world["tmp"]
    idx = str(tmp / "idx")
    if not os.path.exists(idx + ".FASTQuick.fa.index.npz"):
        rc = main(["index", "--siteVCF", world["cand"], "--dbsnpVCF",
                   world["dbsnp"], "--ref", world["ref_fa"],
                   "--out_prefix", idx,
                   "--var_short", "200", "--var_long", "0"])
        assert rc == 0
    fq1, fq2 = str(tmp_path / "d_1.fq.gz"), str(tmp_path / "d_2.fq.gz")
    simulate_fastqs(world, fq1, fq2, alpha=0.0, depth=2, seed=99,
                    junk_frac=0.3)
    for tag, extra in (("host", []), ("dev", ["--device_filter"])):
        rc = main(["align", "--fastq_1", fq1, "--fastq_2", fq2,
                   "--index_prefix", idx,
                   "--out_prefix", str(tmp_path / tag)] + extra)
        assert rc == 0
    for ext in ("Summary", "Pileup", "bam", "DepthDist", "Sequence.csv"):
        assert filecmp.cmp(str(tmp_path / ("host." + ext)),
                           str(tmp_path / ("dev." + ext)),
                           shallow=False), ext
