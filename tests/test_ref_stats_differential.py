"""Statistics engine vs the COMPILED reference StatCollector.

Until round 4 the stats outputs had no external oracle (the e2e goldens
come from this repo's own host pipeline -- VERDICT r03 weak #6).  This
module compiles the reference's actual src/StatCollector.cpp (plus its
vendored libStatGen; no htslib needed, see testing/refstats.py) and
drives it over the SAME post-processed read pairs our align pipeline
produced on an adversarial synthetic world, then byte-diffs every
product statistics file the two engines write: Summary, DepthDist,
GCDist, EmpRepDist, EmpCycleDist, Raw/AdjustedInsertSizeDist,
SexChromInfo, Pileup, vcf, FASTQ.csv, Sequence.csv and the
.InsertSizeTable row stream.
"""

import filecmp
import os

import numpy as np
import pytest

from fastquick_tpu.testing import refstats
from fastquick_tpu.testing.synthworld import build_synth_pe_world

pytestmark = pytest.mark.skipif(not refstats.available(),
                                reason="reference src/ not present")


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("refstats_world")
    return build_synth_pe_world(tmp, depth=40)


def test_all_stats_outputs_byte_match_reference(world, tmp_path):
    try:
        refstats.get_lib()
    except RuntimeError as e:
        pytest.skip(str(e))
    from fastquick_tpu.align.driver import (PairEndMapper,
                                            load_contig_sizes)
    from fastquick_tpu.align.engine import HostEngine, NativeEngine
    from fastquick_tpu.align.opts import GapOpt, PeOpt
    from fastquick_tpu.align.pe import IsizeInfo
    from fastquick_tpu.align.seqs import FastqReader, read_batch
    from fastquick_tpu.index.builder import load_index, read_param
    from fastquick_tpu.stats.collector import FileStat, StatCollector

    new_ref = world["idx_prefix"] + ".FASTQuick.fa"
    params = read_param(new_ref)
    opt = GapOpt()
    opt.num_variant_long = params["NUM_VAR_LONG"]
    opt.num_variant_short = params["NUM_VAR_SHORT"]
    opt.flank_len = params["SHORT_FLANK_LENGTH"]
    opt.flank_long_len = params["LONG_FLANK_LENGTH"]
    idx = load_index(new_ref)
    popt = PeOpt()
    collector = StatCollector()
    collector.restore_vcf_sites(new_ref, opt)
    _, genome_size, n_size = load_contig_sizes(params["REFERENCE_PATH"])
    collector.set_genome_size(genome_size, n_size)

    ours = str(tmp_path / "ours")
    theirs = str(tmp_path / "ref")
    isize_out = open(ours + ".InsertSizeTable", "w")
    try:
        engine = NativeEngine(idx)
    except RuntimeError:
        engine = HostEngine(idx)
    mapper = PairEndMapper(idx, engine, opt, popt, collector,
                           sam=None, isize_out=isize_out)
    batches = []
    for path in (world["fq1"], world["fq2"]):
        r = FastqReader(path)
        batches.append(read_batch(r, idx.kmer, 10 ** 6, opt.mode, 0,
                                  1.0, 0))
        r.close()
    b0, b1 = batches
    fsc = FileStat(file_name1=world["fq1"], file_name2=world["fq2"])
    mapper.engine.align_batch(b0, opt)
    mapper.engine.align_batch(b1, opt)
    mapper._process_batch(b0, b1, IsizeInfo(), fsc)
    collector.flush_dense()
    isize_out.close()
    collector.add_fsc(fsc)
    collector.process_core(ours, opt)

    # the reference engine over the SAME post-processed pairs,
    # mirroring the driver's gating (_stats_out): both-filtered and
    # both-unmapped pairs never reach AddAlignment
    pairs = []
    for p, q in zip(b0, b1):
        if p.filtered and q.filtered:
            continue
        if p.type == 0 and q.type == 0:
            continue  # both-unmapped pairs never reach AddAlignment
        pairs.append((p, q))  # filtered ends ride as NO_MATCH ends
    refstats.run_reference_collector(new_ref, theirs, pairs, opt, fsc,
                                     genome_size, n_size)

    produced = sorted(os.path.basename(f).split(".", 1)[1]
                      for f in os.listdir(tmp_path)
                      if os.path.basename(f).startswith("ref."))
    assert len(produced) >= 12, produced
    diffs = []
    for sfx in produced:
        a, b = ours + "." + sfx, theirs + "." + sfx
        assert os.path.exists(a), f"ours missing {sfx}"
        if not filecmp.cmp(a, b, shallow=False):
            diffs.append(sfx)
    assert not diffs, f"outputs differ from compiled reference: {diffs}"
    # the world must exercise the interesting paths
    summary = open(ours + ".Summary").read()
    assert "nan" not in summary.split("Duplication Rate")[1][:20]
    table = open(ours + ".InsertSizeTable").read()
    assert "PropPair" in table and ("FwdOnly" in table
                                    or "RevOnly" in table)
