"""End-to-end index build on the bundled example + artifact checks."""

import os
import subprocess
import sys

import numpy as np
import pytest

EXAMPLE = "/root/reference/example"


@pytest.fixture(scope="module")
def built_index(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("index")
    from fastquick_tpu.cli import main

    rc = main(["index",
               "--siteVCF", f"{EXAMPLE}/hapmap.test.vcf.gz",
               "--dbsnpVCF", f"{EXAMPLE}/dbsnp.test.vcf.gz",
               "--ref", f"{EXAMPLE}/ref.test.fa",
               "--out_prefix", str(tmp / "test_out_ref")])
    assert rc == 0
    return str(tmp / "test_out_ref")


def test_artifacts_exist(built_index):
    new_ref = built_index + ".FASTQuick.fa"
    for suffix in ["", ".SelectedSite.vcf", ".bed", ".gc", ".dbSNP.subset.vcf",
                   ".param", ".pac", ".ann", ".amb", ".index.npz", ".kmer.npz",
                   ".fai"]:
        assert os.path.exists(new_ref + suffix), f"missing {suffix}"


def test_selected_sites_are_valid_markers(built_index):
    from fastquick_tpu.io.vcf import VcfReader

    new_ref = built_index + ".FASTQuick.fa"
    with VcfReader(new_ref + ".SelectedSite.vcf") as r:
        assert any("##FASTQuickVersion" in m for m in r.meta_lines)
        recs = list(r)
    assert len(recs) > 0
    for rec in recs:
        assert len(rec.ref) == 1 and len(rec.alt) == 1
        af = rec.get_af()
        assert af is not None and 0.01 <= af <= 0.99
    # ordering: chrom lexicographic, pos ascending
    keys = [(rec.chrom, rec.pos) for rec in recs]
    assert keys == sorted(keys)


def test_contigs_match_marker_order(built_index):
    from fastquick_tpu.io.fasta import read_fasta
    from fastquick_tpu.io.vcf import VcfReader

    new_ref = built_index + ".FASTQuick.fa"
    seqs = read_fasta(new_ref)
    with VcfReader(new_ref + ".SelectedSite.vcf") as r:
        recs = list(r)
    assert len(seqs) == len(recs)
    for (name, seq), rec in zip(seqs, recs):
        is_long = "L" in rec.id
        flank = 1000 if is_long else 250
        want = f"{rec.chrom}:{rec.pos}@{rec.ref}/{rec.alt}"
        if is_long:
            want += "|L"
        assert name == want
        assert len(seq) == 2 * flank + 1
        assert seq[flank].upper() == rec.ref.upper()  # center = ref allele


def test_gc_records(built_index):
    from fastquick_tpu.io.gc import read_gc_records
    from fastquick_tpu.io.fasta import read_fasta

    new_ref = built_index + ".FASTQuick.fa"
    recs = read_gc_records(new_ref + ".gc")
    seqs = read_fasta(new_ref)
    assert len(recs) == len(seqs)
    for gc, (_, seq) in zip(recs, seqs):
        assert len(gc) == len(seq)
        assert gc.max() <= 100


def test_index_roundtrip_and_queries(built_index):
    from fastquick_tpu.index.builder import load_index
    from fastquick_tpu.index.seq import encode

    new_ref = built_index + ".FASTQuick.fa"
    idx = load_index(new_ref)
    assert idx.l_pac == sum(c.length for c in idx.contigs)
    # exact search for a slice of the packed text
    q = idx.text[300:340]
    lo, hi = idx.fm_fwd.match_exact(q)
    positions = [int(idx.fm_fwd.sa[r]) for r in range(lo, hi)]
    assert 300 in positions
    # reverse index finds the reversed query
    qr = q[::-1]
    lo, hi = idx.fm_rev.match_exact(qr)
    rpos = [int(idx.fm_rev.sa[r]) for r in range(lo, hi)]
    assert (idx.l_pac - 340) in rpos
    # coor_pac2real
    ci, off = idx.coor_pac2real(idx.contigs[0].length + 5 if len(idx.contigs) > 1 else 5)
    if len(idx.contigs) > 1:
        assert ci == 1 and off == 5


def test_dbsnp_subset_within_flanks(built_index):
    from fastquick_tpu.io.vcf import VcfReader, normalize_chrom
    from fastquick_tpu.io.region import RegionList

    new_ref = built_index + ".FASTQuick.fa"
    rl = RegionList()
    with open(new_ref + ".bed") as fh:
        for line in fh:
            c, s, e = line.split()
            rl.add(c, int(s), int(e))
    rl.collapse()
    with VcfReader(new_ref + ".dbSNP.subset.vcf") as r:
        recs = list(r)
    assert len(recs) > 0
    for rec in recs:
        assert rl.is_overlapped(normalize_chrom(rec.chrom), rec.pos)


def test_param_roundtrip(built_index):
    from fastquick_tpu.index.builder import read_param

    p = read_param(built_index + ".FASTQuick.fa")
    assert p["NUM_VAR_LONG"] == 1000
    assert p["NUM_VAR_SHORT"] == 9000
    assert p["SHORT_FLANK_LENGTH"] == 250
    assert p["LONG_FLANK_LENGTH"] == 1000


def test_kmer_filter_keeps_marker_reads(built_index):
    from fastquick_tpu.index.builder import load_index
    from fastquick_tpu.index.seq import decode, encode

    new_ref = built_index + ".FASTQuick.fa"
    idx = load_index(new_ref)
    # read sliced from a contig passes; random read fails
    contig_read = idx.text[idx.contigs[0].offset + 10:idx.contigs[0].offset + 110]
    assert idx.kmer.is_read_kept(contig_read)
    rng = np.random.default_rng(0)
    junk = rng.integers(0, 4, 100).astype(np.uint8)
    assert not idx.kmer.is_read_kept(junk)
