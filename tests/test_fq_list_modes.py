"""fq_list with mixed pair-end and single-end lines (reference
BwtMapper ctor, src/BwtMapper.cpp:230-260)."""

import gzip
import os

import pytest

from tests.test_synthetic_e2e import simulate_fastqs, world


def test_mixed_fq_list(world, tmp_path):
    from fastquick_tpu.cli import main

    tmp = world["tmp"]
    idx_prefix = str(tmp / "idx")
    if not os.path.exists(idx_prefix + ".FASTQuick.fa.index.npz"):
        rc = main(["index", "--siteVCF", world["cand"], "--dbsnpVCF",
                   world["dbsnp"], "--ref", world["ref_fa"],
                   "--out_prefix", idx_prefix,
                   "--var_short", "200", "--var_long", "0"])
        assert rc == 0
    fq1, fq2 = str(tmp_path / "m_1.fq.gz"), str(tmp_path / "m_2.fq.gz")
    simulate_fastqs(world, fq1, fq2, alpha=0.0, depth=3, seed=33)
    lst = tmp_path / "list.tsv"
    lst.write_text(f"# comment line\n{fq1}\t{fq2}\n{fq1}\n")
    rc = main(["align", "--fq_list", str(lst),
               "--index_prefix", idx_prefix,
               "--out_prefix", str(tmp_path / "mix")])
    assert rc == 0
    # FASTQ.csv lists both entries (PE pair + SE repeated name)
    lines = open(tmp_path / "mix.FASTQ.csv").read().splitlines()
    assert len(lines) == 3
    assert lines[1].split(",")[1] == os.path.basename(fq1)
    assert lines[2].split(",")[1] == os.path.basename(fq1)
    # Sequence.csv: PE row has 2x reads of SE row
    rows = open(tmp_path / "mix.Sequence.csv").read().splitlines()[1:]
    pe_reads = int(rows[0].split(",")[2])
    se_reads = int(rows[1].split(",")[2])
    assert pe_reads == 2 * se_reads
    assert os.path.exists(tmp_path / "mix.Summary")
