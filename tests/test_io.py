"""IO layer tests: FASTA/fai, VCF, regions, GC records."""

import gzip
import os

import numpy as np
import pytest

from fastquick_tpu.io.fasta import FastaFile, build_fai, read_fasta
from fastquick_tpu.io.gc import read_gc_records, write_gc_records
from fastquick_tpu.io.region import RegionList
from fastquick_tpu.io.vcf import VcfReader, normalize_chrom, parse_vcf_line

EXAMPLE = "/root/reference/example"


def test_fai_build_matches_samtools(tmp_path):
    # the bundled ref.test.fa ships a samtools-made .fai: compare
    entries = build_fai(f"{EXAMPLE}/ref.test.fa")
    with open(f"{EXAMPLE}/ref.test.fa.fai") as fh:
        want = [line.split("\t") for line in fh.read().splitlines()]
    assert len(entries) == len(want)
    for e, w in zip(entries, want):
        assert e.name == w[0]
        assert e.length == int(w[1])
        assert e.offset == int(w[2])
        assert e.line_bases == int(w[3])
        assert e.line_bytes == int(w[4])


def test_fasta_fetch(tmp_path):
    p = tmp_path / "t.fa"
    p.write_text(">c1\nACGTACGTGG\nTTTTAAAACC\n>c2\nGGGG\n")
    fa = FastaFile(str(p))
    assert fa.fetch("c1", 1, 4) == "ACGT"
    assert fa.fetch("c1", 9, 12) == "GGTT"  # crosses a line boundary
    assert fa.fetch("c1", 18, 25) == "ACC"  # clamped at the end
    assert fa.fetch("c1", -5, 3) == "ACG"  # clamped at the start
    assert fa.fetch("c2", 1, 4) == "GGGG"
    assert fa.fetch("nope", 1, 4) is None
    fa.close()


def test_fasta_fetch_example():
    fa = FastaFile(f"{EXAMPLE}/ref.test.fa")
    seqs = dict(read_fasta(f"{EXAMPLE}/ref.test.fa"))
    name = fa.order[0]
    full = seqs[name]
    assert fa.fetch(name, 1, len(full)) == full
    assert fa.fetch(name, 101, 150) == full[100:150]
    fa.close()


def test_vcf_reader_example():
    with VcfReader(f"{EXAMPLE}/hapmap.test.vcf.gz") as r:
        assert r.header_line.startswith("#CHROM")
        recs = list(r)
    assert len(recs) > 0
    r0 = recs[0]
    assert r0.pos > 0
    assert r0.ref
    # AF parse across records
    n_af = sum(1 for rec in recs if rec.get_af() is not None)
    assert n_af >= 0  # may or may not have AF; just exercises the parser


def test_vcf_af_stod_semantics():
    rec = parse_vcf_line("1\t100\trs1\tA\tG\t.\tPASS\tAF=0.25,0.5;DP=10")
    assert rec.get_af() == 0.25  # stod stops at the comma
    rec2 = parse_vcf_line("1\t100\trs1\tA\tG\t.\tPASS\tDP=10")
    assert rec2.get_af() is None


def test_normalize_chrom():
    assert normalize_chrom("chr11") == "11"
    assert normalize_chrom("11") == "11"
    assert normalize_chrom("chrX") == "X"
    assert normalize_chrom("x") == "X"


def test_region_list(tmp_path):
    """Reference RegionList semantics: CLOSED [start, end] intervals
    (src/RegionList.cpp:48-117; the round-4 compiled-StatCollector
    differential pinned these after catching the old half-open
    convention losing every flank's left-edge site)."""
    bed = tmp_path / "r.bed"
    bed.write_text("chr1\t10\t20\n1\t15\t30\n2\t5\t8\n")
    rl = RegionList().read_region_list(str(bed))
    assert rl.total_size() == 25  # [10,30] (21) + [5,8] (4)
    assert rl.is_overlapped("1", 10)  # closed: start included
    assert rl.is_overlapped("1", 30)  # closed: end included
    assert not rl.is_overlapped("1", 31)
    assert rl.is_overlapped("2", 5)
    assert rl.is_overlapped("2", 8)
    assert not rl.is_overlapped("2", 9)
    assert rl.overlap_len("1", 0, 100) == 21


def test_region_list_c_quirks():
    # AddRegion overwrites per start (last end wins, :74)
    rl = RegionList()
    rl.add("1", 5, 50)
    rl.add("1", 5, 20)
    rl.collapse()
    assert rl.regions["1"] == [(5, 20)]
    # Collapse: point-touching merges, gap-of-one stays separate
    rl = RegionList()
    rl.add("1", 0, 10)
    rl.add("1", 10, 15)
    rl.add("1", 17, 20)
    rl.collapse()
    assert rl.regions["1"] == [(0, 15), (17, 20)]


def test_region_joins():
    a = RegionList()
    a.add("1", 0, 10)
    a.add("1", 20, 30)
    a.collapse()
    b = RegionList()
    b.add("1", 5, 25)
    b.collapse()
    inner = a.join_inner(b)
    assert inner.regions["1"] == [(5, 10), (20, 25)]
    outer = a.join_outer(b)
    assert outer.regions["1"] == [(0, 30)]
    # the intersection's strict comparisons drop single-point overlaps
    # (Join :145-151 quirk): [0,10]&[20,30] vs [10,20] -> empty
    c = RegionList()
    c.add("1", 10, 20)
    c.collapse()
    assert not a.join_inner(c).regions.get("1")


def test_gc_records_roundtrip(tmp_path):
    p = tmp_path / "t.gc"
    recs = [np.arange(5, dtype=np.uint8), np.array([100, 0, 55], dtype=np.uint8)]
    write_gc_records(str(p), recs)
    back = read_gc_records(str(p))
    assert len(back) == 2
    np.testing.assert_array_equal(back[0], recs[0])
    np.testing.assert_array_equal(back[1], recs[1])
