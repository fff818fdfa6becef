"""qc_step_full(pair_mode) vs the host collector: the device PE step's
accumulators must reproduce StatCollector's InsertSizeTable-level
statistics EXACTLY on a clean PE world (VERDICT r02 item #3).

World design keeps the device path's pinned deviations out of scope so
equality is exact: unique ungapped reads (no drand48 divergence, no
refine/clip shifts), occurrence counts within the device cap, no mate
rescue (is_sw=0 on the host side; rescue is host-only by design).
Compared quantities:
  insert_size_dist (4096 bins)  == collector.insert_size_dist
  num_pcr_dup / num_pair_reads  == collector counters
  status counts                 == the .InsertSizeTable status column
Plus mesh==single bitwise for the same pair accumulators.
"""

import gzip
import io
from collections import Counter

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

N_MARKERS = 40
FLANK = 250
SPACING = 2500
READ_LEN = 100


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("peqc")
    rng = np.random.default_rng(77)
    glen = N_MARKERS * SPACING + 8000
    genome = rng.integers(0, 4, glen).astype(np.uint8)
    gstr = "".join("ACGT"[c] for c in genome)
    with open(tmp / "genome.fa", "w") as fh:
        fh.write(">1\n")
        for i in range(0, glen, 60):
            fh.write(gstr[i:i + 60] + "\n")
    positions = [(i + 1) * SPACING for i in range(N_MARKERS)]
    refs = [gstr[p - 1] for p in positions]
    alts = ["ACGT"[(genome[p - 1] + int(rng.integers(1, 4))) % 4]
            for p in positions]
    for name, extra in (("cand.vcf", "AF=0.3000"), ("dbsnp.vcf", ".")):
        with open(tmp / name, "w") as fh:
            fh.write("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\t"
                     "QUAL\tFILTER\tINFO\n")
            for p, r, a in zip(positions, refs, alts):
                fh.write(f"1\t{p}\trs{p}\t{r}\t{a}\t.\tPASS\t{extra}\n")

    comp = str.maketrans("ACGT", "TGCA")
    fq1, fq2 = str(tmp / "p_1.fq.gz"), str(tmp / "p_2.fq.gz")
    with gzip.open(fq1, "wt") as f1, gzip.open(fq2, "wt") as f2:
        rid = 0
        for m, pos in enumerate(positions):
            for d in range(14):
                insert = int(rng.integers(250, 420))
                fs = max(0, pos - 1 - int(rng.integers(READ_LEN // 2,
                                                       insert - READ_LEN)))
                frag = list(gstr[fs:fs + insert])
                if rid % 4 == 1:  # a couple of mismatches
                    for _ in range(2):
                        j = int(rng.integers(0, len(frag)))
                        frag[j] = "ACGT"[("ACGT".index(frag[j])
                                          + int(rng.integers(1, 4))) % 4]
                frag = "".join(frag)
                r1 = frag[:READ_LEN]
                r2 = frag[-READ_LEN:].translate(comp)[::-1]
                if rid % 9 == 8:  # duplicate pair (PCR-dup fodder)
                    pass  # rid advances; same frag reused below
                q = "I" * READ_LEN
                f1.write(f"@p{rid}/1\n{r1}\n+\n{q}\n")
                f2.write(f"@p{rid}/2\n{r2}\n+\n{q}\n")
                if rid % 9 == 8:  # exact duplicate insert
                    f1.write(f"@d{rid}/1\n{r1}\n+\n{q}\n")
                    f2.write(f"@d{rid}/2\n{r2}\n+\n{q}\n")
                if rid % 11 == 10:  # junk mate -> single-end statuses
                    jr = "".join("ACGT"[c]
                                 for c in rng.integers(0, 4, READ_LEN))
                    f1.write(f"@s{rid}/1\n{r1}\n+\n{q}\n")
                    f2.write(f"@s{rid}/2\n{jr}\n+\n{q}\n")
                rid += 1

    from fastquick_tpu.cli import main

    rc = main(["index", "--siteVCF", str(tmp / "cand.vcf"),
               "--dbsnpVCF", str(tmp / "dbsnp.vcf"),
               "--ref", str(tmp / "genome.fa"),
               "--out_prefix", str(tmp / "idx"),
               "--var_short", "100", "--var_long", "0"])
    assert rc == 0
    return dict(tmp=tmp, fq1=fq1, fq2=fq2)


def _load(world):
    from fastquick_tpu.align.opts import GapOpt
    from fastquick_tpu.index.builder import load_index, read_param

    new_ref = str(world["tmp"] / "idx") + ".FASTQuick.fa"
    params = read_param(new_ref)
    opt = GapOpt()
    opt.num_variant_long = params["NUM_VAR_LONG"]
    opt.num_variant_short = params["NUM_VAR_SHORT"]
    opt.flank_len = params["SHORT_FLANK_LENGTH"]
    opt.flank_long_len = params["LONG_FLANK_LENGTH"]
    idx = load_index(new_ref)
    return idx, opt, new_ref


def _read_pairs(world, idx, opt):
    from fastquick_tpu.align.seqs import FastqReader, read_batch

    batches = []
    for path in (world["fq1"], world["fq2"]):
        r = FastqReader(path)
        batches.append(read_batch(r, idx.kmer, 10 ** 6, opt.mode, 0,
                                  1.0, 0))
        r.close()
    assert len(batches[0]) == len(batches[1])
    return batches


@pytest.fixture(scope="module")
def host_state(world):
    """Run the host PE pipeline (exact oracle engine, no mate rescue)."""
    from fastquick_tpu.align.driver import PairEndMapper
    from fastquick_tpu.align.engine import HostEngine
    from fastquick_tpu.align.opts import PeOpt
    from fastquick_tpu.align.pe import IsizeInfo
    from fastquick_tpu.stats.collector import FileStat, StatCollector

    idx, opt, new_ref = _load(world)
    popt = PeOpt()
    popt.is_sw = 0  # mate rescue is host-only by design; disable for parity
    collector = StatCollector()
    collector.restore_vcf_sites(new_ref, opt)
    sio = io.StringIO()
    mapper = PairEndMapper(idx, HostEngine(idx), opt, popt, collector,
                           sam=None, isize_out=sio)
    b0, b1 = _read_pairs(world, idx, opt)
    fsc = FileStat(file_name1=world["fq1"], file_name2=world["fq2"])
    mapper.engine.align_batch(b0, opt)
    mapper.engine.align_batch(b1, opt)
    mapper._process_batch(b0, b1, IsizeInfo(), fsc)
    collector.flush_dense()
    return dict(collector=collector, rows=sio.getvalue().splitlines(),
                n_pairs=len(b0))


def _device_accs(world, axis=None):
    from fastquick_tpu.align.opts import PeOpt, bwa_cal_maxdiff
    from fastquick_tpu.ops.fm import DeviceFM
    from fastquick_tpu.ops.qc_full import build_site_tables, qc_step_full
    from fastquick_tpu.stats.collector import StatCollector

    idx, opt, new_ref = _load(world)
    popt = PeOpt()
    sc = StatCollector()
    sc.restore_vcf_sites(new_ref, opt)
    tables = build_site_tables(idx, sc, opt)
    dev = DeviceFM.build(idx.fm_fwd, idx.fm_rev)
    fm = {"words": dev.words, "occ": dev.occ, "sa": dev.sa, "L2": dev.L2,
          "primary": dev.primary}
    b0, b1 = _read_pairs(world, idx, opt)
    B = 2 * len(b0)
    L = 128
    seqs = np.full((B, L), 4, np.int32)
    rseqs = np.full((B, L), 4, np.int32)
    quals = np.zeros((B, L), np.int32)
    lens = np.zeros(B, np.int32)
    for i in range(len(b0)):
        for j, p in enumerate((b0[i], b1[i])):
            row = 2 * i + j
            lens[row] = p.len
            if p.filtered:
                continue  # all-N rows stay unmapped on device
            seqs[row, :p.len] = p.seq[:p.len]
            rseqs[row, :p.len] = p.rseq[:p.len]
            quals[row, :p.len] = p.qual[:p.len].astype(np.int32) - 33
    md_np = np.array([bwa_cal_maxdiff(i, thres=opt.fnr)
                      for i in range(L + 1)], np.int32)
    opt_args = {"n_text": dev.n, "max_diff": int(md_np.max()),
                "use_seed": True, "pool": 512, "inner": 16,
                "step_cap": 64 * L, "max_gapo": opt.max_gapo,
                "max_gape": opt.max_gape, "max_top2": opt.max_top2,
                "seed_len": opt.seed_len,
                "max_seed_diff": opt.max_seed_diff,
                "ap_prior": popt.ap_prior, "max_isize": popt.max_isize,
                "k_occ": 32, "s_mm": opt.s_mm}
    if axis is None:
        md_t = jnp.asarray(md_np)

        @jax.jit
        def step(s, r, q, ln):
            return qc_step_full(fm, tables, opt_args, s, r, q, ln,
                                bitmaps=None, md_table=md_t,
                                pair_mode=True)

        acc = step(jnp.asarray(seqs), jnp.asarray(rseqs),
                   jnp.asarray(quals), jnp.asarray(lens))
        from fastquick_tpu.ops.qc_full import count_pcr_dups

        acc["n_pcr_dup"] = count_pcr_dups(acc.pop("_pair_keys"))
        return acc
    from fastquick_tpu.parallel.mesh import (make_mesh,
                                             make_sharded_qc_full_step)

    mesh = make_mesh(8)
    run = make_sharded_qc_full_step(
        mesh, fm, tables, opt_args, bitmaps=None,
        md_table=jnp.asarray(md_np), pair_mode=True)
    # pad rows to a multiple of 2*8 so pairs never straddle shards
    pad = (-B) % 16
    if pad:
        seqs = np.concatenate([seqs, np.full((pad, L), 4, np.int32)])
        rseqs = np.concatenate([rseqs, np.full((pad, L), 4, np.int32)])
        quals = np.concatenate([quals, np.zeros((pad, L), np.int32)])
        lens = np.concatenate([lens, np.zeros(pad, np.int32)])
    return run(jnp.asarray(seqs), jnp.asarray(rseqs), jnp.asarray(quals),
               jnp.asarray(lens))


STATUS_NAMES = {0: "PropPair", 1: "PartialPair", 2: "FwdOnly",
                3: "RevOnly", 4: "NotPair", 5: "LowQual"}


def test_pair_accumulators_match_host(world, host_state):
    acc = _device_accs(world)
    assert int(acc["n_fallback"]) == 0  # else the worlds aren't comparable
    col = host_state["collector"]
    assert np.array_equal(np.asarray(acc["isize_dist"], np.int64),
                          np.asarray(col.insert_size_dist, np.int64))
    assert int(acc["n_pcr_dup"]) == col.num_pcr_dup
    assert int(acc["n_pair_reads"]) == col.num_pair_reads
    assert col.num_pcr_dup > 0  # the world must exercise dup detection
    host_counts = Counter(r.rsplit("\t", 1)[1]
                          for r in host_state["rows"])
    dev_counts = np.asarray(acc["pair_status_counts"])
    for code, name in STATUS_NAMES.items():
        assert int(dev_counts[code]) == host_counts.get(name, 0), name
    assert host_counts.get("PropPair", 0) > 0
    assert host_counts.get("FwdOnly", 0) + host_counts.get("RevOnly", 0) > 0


def test_pair_mesh_equals_single(world):
    single = _device_accs(world)
    mesh = _device_accs(world, axis="dp")
    for key in ("isize_dist", "pair_status_counts", "n_pair_reads",
                "n_pcr_dup"):
        assert np.array_equal(np.asarray(single[key]),
                              np.asarray(mesh[key])), key
