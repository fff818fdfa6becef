"""RefBuilder callable-region mask + target-region selection."""

import numpy as np
import pytest

from fastquick_tpu.index.refbuilder import RefBuilder


def _write_world(tmp_path, n_markers=30, spacing=2000, seed=0):
    rng = np.random.default_rng(seed)
    glen = n_markers * spacing + 5000
    gstr = "".join("ACGT"[c] for c in rng.integers(0, 4, glen))
    ref = tmp_path / "g.fa"
    with open(ref, "w") as fh:
        fh.write(">1\n")
        for i in range(0, glen, 60):
            fh.write(gstr[i:i + 60] + "\n")
    positions = [(i + 1) * spacing for i in range(n_markers)]
    cand = tmp_path / "cand.vcf"
    with open(cand, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\t"
                 "FILTER\tINFO\n")
        for p in positions:
            r = gstr[p - 1]
            a = "ACGT"[("ACGT".index(r) + 1) % 4]
            fh.write(f"1\t{p}\trs{p}\t{r}\t{a}\t.\tPASS\tAF=0.3\n")
    dbsnp = tmp_path / "dbsnp.vcf"
    with open(dbsnp, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\t"
                 "FILTER\tINFO\n")
    return ref, cand, dbsnp, positions


def test_bed_mask_excludes_uncallable(tmp_path):
    ref, cand, dbsnp, positions = _write_world(tmp_path)
    # callable only around the first 10 markers
    mask = tmp_path / "mask.bed"
    with open(mask, "w") as fh:
        for p in positions[:10]:
            fh.write(f"1\t{p - 300}\t{p + 300}\n")
    rb = RefBuilder(vcf_path=str(cand), ref_path=str(ref),
                    new_ref=str(tmp_path / "out.fa"), dbsnp_path=str(dbsnp),
                    mask_path=str(mask), flank_short_len=250,
                    flank_long_len=250, num_variant_short=100,
                    num_variant_long=0)
    rb.select_marker("Empty")
    selected = {m.pos for m in rb.ordered_markers()}
    assert selected == set(positions[:10])


def test_unsorted_overlapping_mask_bed(tmp_path):
    ref, cand, dbsnp, positions = _write_world(tmp_path)
    mask = tmp_path / "mask.bed"
    # intentionally unsorted, duplicated starts with different ends
    lines = []
    for p in reversed(positions[:6]):
        lines.append(f"1\t{p - 300}\t{p - 100}\n")  # too small alone
        lines.append(f"1\t{p - 300}\t{p + 300}\n")  # superseding (max end)
    mask.write_text("".join(lines))
    rb = RefBuilder(vcf_path=str(cand), ref_path=str(ref),
                    new_ref=str(tmp_path / "out.fa"), dbsnp_path=str(dbsnp),
                    mask_path=str(mask), flank_short_len=250,
                    flank_long_len=250, num_variant_short=100,
                    num_variant_long=0)
    rb.select_marker("Empty")
    selected = {m.pos for m in rb.ordered_markers()}
    assert selected == set(positions[:6])


def test_target_region_priority(tmp_path):
    ref, cand, dbsnp, positions = _write_world(tmp_path)
    target = tmp_path / "target.bed"
    # target covers markers 20..24 only
    with open(target, "w") as fh:
        for p in positions[20:25]:
            fh.write(f"1\t{p - 10}\t{p + 10}\n")
    rb = RefBuilder(vcf_path=str(cand), ref_path=str(ref),
                    new_ref=str(tmp_path / "out.fa"), dbsnp_path=str(dbsnp),
                    flank_short_len=250, flank_long_len=250,
                    num_variant_short=8, num_variant_long=0)
    rb.select_marker(str(target))
    ordered = rb.ordered_markers()
    target_ids = [m for m in ordered if "$E" in m.rec.id]
    # the 5 target markers selected first (tagged $E), quota fills with 3 more
    assert len(target_ids) == 5
    assert {m.pos for m in target_ids} == set(positions[20:25])
    assert len(ordered) == 8
