"""One-program device QC with the drand48 reservoir draw on a
REPEAT-HEAVY world vs the host pipeline (removes pinned deviation (a)).

World: PE reads over markers whose flank windows are duplicated in the
genome, so every read from those markers hits a width-2 SA interval
(c1 == 2) and the reference's drand48 draw (libbwa/bwase.c:19-44)
decides the reported position of unpaired/low-quality ends.  Ungapped
by construction (gapped ends are the separate host-refine deviation).

Compared quantities go beyond status counts: the full
.InsertSizeTable ROWS (positions included) rendered from the device
per-pair fields must equal the host collector's rows byte-for-byte --
a first-best-hit selection fails this on the repeat markers.
"""

import gzip
import io
from collections import Counter

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

N_MARKERS = 30
FLANK = 250
SPACING = 2500
READ_LEN = 100

_STATUS = ["PropPair", "PartialPair", "FwdOnly", "RevOnly", "NotPair",
           "LowQual"]


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("drand_world")
    rng = np.random.default_rng(99)
    glen = N_MARKERS * SPACING + 8000
    genome = rng.integers(0, 4, glen).astype(np.uint8)
    positions = [(i + 1) * SPACING for i in range(N_MARKERS)]
    # duplicate flank windows: markers (4,5), (12,13), (20,21) share
    # identical +-FLANK windows -> c1 == 2 for every read on them
    for src, dst in ((4, 5), (12, 13), (20, 21)):
        ps, pd = positions[src] - 1, positions[dst] - 1
        genome[pd - FLANK - 60:pd + FLANK + 61] = \
            genome[ps - FLANK - 60:ps + FLANK + 61]
    gstr = "".join("ACGT"[c] for c in genome)
    with open(tmp / "genome.fa", "w") as fh:
        fh.write(">1\n")
        for i in range(0, glen, 60):
            fh.write(gstr[i:i + 60] + "\n")
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
            for d in range(12):
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
                q = "I" * READ_LEN
                f1.write(f"@p{rid}/1\n{r1}\n+\n{q}\n")
                f2.write(f"@p{rid}/2\n{r2}\n+\n{q}\n")
                if rid % 7 == 6:  # junk mate -> FwdOnly/RevOnly rows,
                    # whose positions expose the drand48 draw on the
                    # duplicated markers
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


@pytest.fixture(scope="module")
def host_state(world):
    from test_pe_qc_differential import _load, _read_pairs

    from fastquick_tpu.align.driver import PairEndMapper
    from fastquick_tpu.align.engine import HostEngine
    from fastquick_tpu.align.opts import PeOpt
    from fastquick_tpu.align.pe import IsizeInfo
    from fastquick_tpu.stats.collector import FileStat, StatCollector

    idx, opt, new_ref = _load(world)
    popt = PeOpt()
    popt.is_sw = 0
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
                names=[p.name for p in b0], n_pairs=len(b0))


def _device_run(world, axis=None, pool=512, step_cap=None, fb_fill=None,
                pe_fill=None, per_read=False):
    from test_pe_qc_differential import _load, _read_pairs

    from fastquick_tpu.align.opts import PeOpt, bwa_cal_maxdiff
    from fastquick_tpu.ops.fm import DeviceFM
    from fastquick_tpu.ops.qc_full import (build_site_tables,
                                           count_pcr_dups, qc_step_full)
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
                continue
            seqs[row, :p.len] = p.seq[:p.len]
            rseqs[row, :p.len] = p.rseq[:p.len]
            quals[row, :p.len] = p.qual[:p.len].astype(np.int32) - 33
    md_np = np.array([bwa_cal_maxdiff(i, thres=opt.fnr)
                      for i in range(L + 1)], np.int32)
    opt_args = {"n_text": dev.n, "max_diff": int(md_np.max()),
                "use_seed": True, "pool": pool, "inner": 16,
                "step_cap": step_cap or 64 * L, "max_gapo": opt.max_gapo,
                "max_gape": opt.max_gape, "max_top2": opt.max_top2,
                "seed_len": opt.seed_len,
                "max_seed_diff": opt.max_seed_diff,
                "ap_prior": popt.ap_prior, "max_isize": popt.max_isize,
                "k_occ": 32, "s_mm": opt.s_mm,
                "drand48": True}  # the point of this module
    if axis is None:
        md_t = jnp.asarray(md_np)

        @jax.jit
        def step(s, r, q, ln, fbf, pef):
            return qc_step_full(fm, tables, opt_args, s, r, q, ln,
                                bitmaps=None, md_table=md_t,
                                pair_mode=True, fb_fill=fbf,
                                pe_fill=pef,
                                return_per_read=per_read)

        fbf = None
        if fb_fill is not None:
            fbf = (jnp.asarray(fb_fill[0]), jnp.asarray(fb_fill[1]))
        acc = step(jnp.asarray(seqs), jnp.asarray(rseqs),
                   jnp.asarray(quals), jnp.asarray(lens), fbf, pe_fill)
        pr = None
        if per_read:
            acc, pr = acc
        acc["n_pcr_dup"] = count_pcr_dups(acc.pop("_pair_keys"))
        if per_read:
            return idx, acc, pr
        return idx, acc
    from fastquick_tpu.parallel.mesh import (make_mesh,
                                             make_sharded_qc_full_step)

    mesh = make_mesh(axis)
    run = make_sharded_qc_full_step(
        mesh, fm, tables, opt_args, bitmaps=None,
        md_table=jnp.asarray(md_np), pair_mode=True)
    pad = (-B) % (2 * axis)
    if pad:
        seqs = np.concatenate([seqs, np.full((pad, L), 4, np.int32)])
        rseqs = np.concatenate([rseqs, np.full((pad, L), 4, np.int32)])
        quals = np.concatenate([quals, np.zeros((pad, L), np.int32)])
        lens = np.concatenate([lens, np.zeros(pad, np.int32)])
    return idx, run(jnp.asarray(seqs), jnp.asarray(rseqs),
                    jnp.asarray(quals), jnp.asarray(lens))


def _render_rows(idx, rows, names, n_pairs):
    """Device per-pair fields -> .InsertSizeTable lines (the dryrun's
    renderer, __graft_entry__._write_product)."""
    r = {k: np.asarray(v)[:n_pairs] for k, v in rows.items()}
    cnames = [c.name for c in idx.contigs]
    coffs = np.asarray([c.offset for c in idx.contigs])
    out = []
    for i in range(n_pairs):
        st = int(r["status"][i])
        if st < 0:
            continue

        def side(j):
            if not r[f"mapped{j}"][i]:
                return ("*", "*", 0, "*")
            cid = int(r["cid_p"][i] if j == 0 else r["cid_q"][i])
            pos = int(r[f"pos{j}"][i]) - int(coffs[cid]) + 1
            ln = int(r[f"len{j}"][i])
            return (cnames[cid], str(pos), ln, f"{ln}M")

        c0, p0, l0, g0 = side(0)
        c1, p1, l1, g1 = side(1)
        m0, m1 = bool(r["mapped0"][i]), bool(r["mapped1"][i])
        f1 = 0x41 | (0x4 if not m0 else 0) \
            | (0x10 if int(r["strand0"][i]) else 0) \
            | (0x2 if bool(r["proper"][i]) else 0)
        f2 = 0x81 | (0x4 if not m1 else 0) \
            | (0x10 if int(r["strand1"][i]) else 0) \
            | (0x2 if bool(r["proper"][i]) else 0)
        out.append(
            f"{names[i]}\t{int(r['mi'][i])}\t{int(r['mi2'][i])}\t"
            f"{int(r['actual'][i])}\t{c0}\t{p0}\t{f1}\t{l0}\t{g0}\t"
            f"{c1}\t{p1}\t{f2}\t{l1}\t{g1}\t{_STATUS[st]}")
    return out


def test_world_exercises_repeats(world, host_state):
    """c1 == 2 ends must actually occur, else the draw is untested."""
    statuses = Counter(r.rsplit("\t", 1)[1] for r in host_state["rows"])
    assert statuses.get("FwdOnly", 0) + statuses.get("RevOnly", 0) > 10


def test_rows_match_host_with_drand48(world, host_state):
    idx, acc = _device_run(world)
    assert int(acc["n_fallback"]) == 0
    col = host_state["collector"]
    assert np.array_equal(np.asarray(acc["isize_dist"], np.int64),
                          np.asarray(col.insert_size_dist, np.int64))
    assert int(acc["n_pcr_dup"]) == col.num_pcr_dup
    assert int(acc["n_pair_reads"]) == col.num_pair_reads
    dev_rows = _render_rows(idx, acc["_pair_rows"], host_state["names"],
                            host_state["n_pairs"])
    assert dev_rows == host_state["rows"]


def test_mesh_equals_single_with_drand48(world):
    idx, single = _device_run(world)
    _, mesh = _device_run(world, axis=8)
    for k in sorted(single):
        if k.startswith("_") or k in ("n_reads", "n_filtered"):
            continue  # padding rows count as extra filtered reads
        a = np.asarray(single[k])
        b = np.asarray(mesh[k])
        assert np.array_equal(a, b), k
    rs, rm = single["_pair_rows"], mesh["_pair_rows"]
    npair = np.asarray(rs["status"]).shape[0]
    for k in rs:
        assert np.array_equal(np.asarray(rs[k]),
                              np.asarray(rm[k])[:npair]), k


def test_rows_match_host_under_forced_fallback(world, host_state):
    """Stream exactness WITH fallback present (removes the PARITY.md
    caveat): force kernel fallback with a tiny pool, host-align the
    fallback reads, re-run with `fb_fill` -- the device drand48 stream
    must then consume the filled reads' draws in order and every
    .InsertSizeTable row must still equal the host's byte-for-byte."""
    from test_pe_qc_differential import _load, _read_pairs

    from fastquick_tpu.align.engine import HostEngine
    from fastquick_tpu.ops.qc_full import pack_host_hits

    # pass 1: tiny pool -> some reads overflow to fallback
    idx, acc1, pr = _device_run(world, pool=96, per_read=True)
    fb_mask = np.asarray(pr["fallback"]) != 0
    assert fb_mask.any(), "pool=96 forced no fallback; test is vacuous"

    # host-align the whole batch once (the fallback rows' hit lists)
    idx2, opt, _ = _load(world)
    b0, b1 = _read_pairs(world, idx2, opt)
    eng = HostEngine(idx2)
    eng.align_batch([p for p in b0 if not p.filtered], opt)
    eng.align_batch([p for p in b1 if not p.filtered], opt)
    flat = []
    for i in range(len(b0)):
        flat.append(b0[i])
        flat.append(b1[i])
    rows_idx = [b for b in range(len(flat)) if b < fb_mask.shape[0]
                and fb_mask[b]]
    fb_n, fb_rows = pack_host_hits([flat[b] for b in rows_idx], rows_idx,
                                   fb_mask.shape[0])

    # pass 2: same tiny pool + fills -> zero effective fallback
    idx, acc = _device_run(world, pool=96, fb_fill=(fb_n, fb_rows))
    assert int(acc["n_fallback"]) == 0
    col = host_state["collector"]
    assert np.array_equal(np.asarray(acc["isize_dist"], np.int64),
                          np.asarray(col.insert_size_dist, np.int64))
    dev_rows = _render_rows(idx, acc["_pair_rows"], host_state["names"],
                            host_state["n_pairs"])
    assert dev_rows == host_state["rows"]
