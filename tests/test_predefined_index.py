"""Predefined-marker index mode (RefBuilder InputPredefinedMarker,
src/RefBuilder.cpp:464-574): re-indexing from a FASTQuick-format
SelectedSite.vcf must reproduce the exact same reduced reference, and
the example.predefine.marker.index.sh flow must be drivable end to end.
"""

import filecmp
import os

from tests.test_synthetic_e2e import simulate_fastqs, world


def test_predefined_roundtrip(world, tmp_path):
    from fastquick_tpu.cli import main

    tmp = world["tmp"]
    idx1 = str(tmp / "idx")
    if not os.path.exists(idx1 + ".FASTQuick.fa.index.npz"):
        rc = main(["index", "--siteVCF", world["cand"], "--dbsnpVCF",
                   world["dbsnp"], "--ref", world["ref_fa"],
                   "--out_prefix", idx1,
                   "--var_short", "200", "--var_long", "0"])
        assert rc == 0
    selected = idx1 + ".FASTQuick.fa.SelectedSite.vcf"
    head = open(selected).read(4096)
    assert "##FASTQuickVersion" in head  # marks FASTQuick format

    idx2 = str(tmp_path / "pre")
    rc = main(["index", "--predefinedVCF", selected, "--dbsnpVCF",
               world["dbsnp"], "--ref", world["ref_fa"],
               "--out_prefix", idx2,
               "--var_short", "200", "--var_long", "0"])
    assert rc == 0
    # identical reduced reference and marker set
    assert filecmp.cmp(idx1 + ".FASTQuick.fa", idx2 + ".FASTQuick.fa",
                       shallow=False)
    s1 = [l for l in open(selected) if not l.startswith("##")]
    s2 = [l for l in open(idx2 + ".FASTQuick.fa.SelectedSite.vcf")
          if not l.startswith("##")]
    assert s1 == s2

    # align against the predefined-built index: identical outputs
    fq1, fq2 = str(tmp_path / "p_1.fq.gz"), str(tmp_path / "p_2.fq.gz")
    simulate_fastqs(world, fq1, fq2, alpha=0.0, depth=2, seed=77)
    outs = []
    for tag, pre in (("a", idx1), ("b", idx2)):
        rc = main(["align", "--fastq_1", fq1, "--fastq_2", fq2,
                   "--index_prefix", pre,
                   "--out_prefix", str(tmp_path / tag)])
        assert rc == 0
        outs.append(tmp_path / tag)
    a, b = outs
    for ext in ("Summary", "Pileup", "bam", "DepthDist"):
        assert filecmp.cmp(str(a) + "." + ext, str(b) + "." + ext,
                           shallow=False), ext
