"""One-program device QC with mate rescue injected (removes pinned
deviation (c)): device pair statuses must carry POST-rescue positions.

World: PE pairs where one mate carries 8 scattered mismatches (or 8
mismatches + a 4-bp deletion) -- unalignable by the bounded-difference
search but rescuable by bwa_paired_sw's local SW in the mate window
(libbwa/bwape.c:463-).  The two-dispatch recipe: device pass 1 -> host
builds candidate pairs from the device per-pair fields and runs the
exact rescue (through the same SW engines the product uses) -> pass 2
with `pe_fill` injects the post-rescue end state, so the device
.InsertSizeTable rows (statuses, positions, mapQs) equal the host
pipeline's rows byte-for-byte, rescued pairs included."""

import gzip
import io

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from test_drand48_qc import _STATUS  # noqa: E402,F401

N_MARKERS = 24
FLANK = 250
SPACING = 2500
READ_LEN = 100


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("rescue_world")
    rng = np.random.default_rng(123)
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

    def mutate(s, nerr, rng):
        s = list(s)
        for _ in range(nerr):
            j = int(rng.integers(0, len(s)))
            s[j] = "ACGT"[("ACGT".index(s[j]) + int(rng.integers(1, 4)))
                          % 4]
        return "".join(s)

    fq1, fq2 = str(tmp / "r_1.fq.gz"), str(tmp / "r_2.fq.gz")
    with gzip.open(fq1, "wt") as f1, gzip.open(fq2, "wt") as f2:
        rid = 0
        for m, pos in enumerate(positions):
            for d in range(10):
                insert = int(rng.integers(260, 340))
                fs = max(0, pos - 1 - int(rng.integers(READ_LEN // 2,
                                                       insert - READ_LEN)))
                frag = gstr[fs:fs + insert]
                r1 = frag[:READ_LEN]
                r2t = frag[-READ_LEN:]
                kind = d % 5
                if kind == 3:  # rescuable: 8 mismatches, ungapped
                    r2t = mutate(r2t, 8, rng)
                elif kind == 4:  # rescuable: mismatches + 4bp deletion
                    r2x = frag[-(READ_LEN + 4):]
                    cut = int(rng.integers(20, READ_LEN - 20))
                    r2t = r2x[:cut] + r2x[cut + 4:]
                    r2t = mutate(r2t, 8, rng)
                elif kind == 2:  # SEARCH-gapped: a single 1bp deletion
                    # (maps with n_gapo=1; the host refine path then
                    # computes the cigar + post-refine position)
                    r2x = frag[-(READ_LEN + 1):]
                    cut = int(rng.integers(25, READ_LEN - 25))
                    r2t = r2x[:cut] + r2x[cut + 1:]
                r2 = r2t.translate(comp)[::-1]
                q = "I" * READ_LEN
                f1.write(f"@r{rid}/1\n{r1}\n+\n{q}\n")
                f2.write(f"@r{rid}/2\n{r2}\n+\n{q}\n")
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
    popt = PeOpt()  # is_sw=1: rescue ACTIVE (the point of this module)
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
    n_resc = sum(1 for p in b0 + b1
                 if p.type == 3)  # BWA_TYPE_MATESW
    return dict(collector=collector, rows=sio.getvalue().splitlines(),
                names=[p.name for p in b0], n_pairs=len(b0),
                n_resc=n_resc)


def _render_rows_cig(idx, rows, names, n_pairs, cig_override):
    """test_drand48_qc._render_rows with per-(pair, end) cigar strings
    for rescued ends (the host renders cigars from host data)."""
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
            cg = cig_override.get((i, j), f"{ln}M")
            return (cnames[cid], str(pos), ln, cg)

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


def test_rescued_rows_match_host(world, host_state):
    from test_drand48_qc import _device_run
    from test_pe_qc_differential import _load, _read_pairs

    from fastquick_tpu.align.opts import PeOpt
    from fastquick_tpu.align.core import BWA_TYPE_UNIQUE
    from fastquick_tpu.align.pe import (BWA_TYPE_MATESW,
                                        BWA_TYPE_NO_MATCH, SAM_FPP,
                                        bwa_paired_sw,
                                        infer_isize_from_hist_f64)
    from fastquick_tpu.ops.qc_full import pack_pe_fill
    from fastquick_tpu.stats.collector import cigar_str

    assert host_state["n_resc"] >= 8, host_state["n_resc"]

    # ---- pass 1: plain device run ----
    idx, acc1 = _device_run(world)
    rows1 = {k: np.asarray(v) for k, v in acc1["_pair_rows"].items()}
    P = host_state["n_pairs"]

    # ---- host rescue over candidate pairs built from device fields ----
    idx2, opt, _ = _load(world)
    b0, b1 = _read_pairs(world, idx2, opt)
    for i in range(P):
        for j, p in ((0, b0[i]), (1, b1[i])):
            mapped = bool(rows1[f"mapped{j}"][i])
            p.type = BWA_TYPE_UNIQUE if mapped else BWA_TYPE_NO_MATCH
            p.pos = int(rows1[f"pos{j}"][i])
            p.strand = int(rows1[f"strand{j}"][i])
            p.mapQ = int(rows1[f"mapq{j}"][i])
            p.seQ = int(rows1[f"seq_q{j}"][i])
            p.n_mm = int(rows1[f"n_mm{j}"][i])
            p.n_gapo = int(rows1[f"n_gapo{j}"][i])
            p.n_gape = int(rows1[f"n_gape{j}"][i])
            if bool(rows1["proper"][i]):
                p.extra_flag |= SAM_FPP
            if not mapped:
                # the host's unmapped ends keep calloc'd state
                # (pos=0, mapQ=0, seQ=0); the device fields for
                # unmapped ends are don't-cares
                p.pos = 0
                p.mapQ = 0
                p.seQ = 0
    popt = PeOpt()
    # the product rescue recipe: f64 inference over the device's EXACT
    # integer isize histogram -- windows bit-match the host pipeline's
    ii = infer_isize_from_hist_f64(
        np.asarray(acc1["_isize_hist"]), int(acc1["_isize_maxlen"]),
        popt.ap_prior, len(idx2.text))
    bwa_paired_sw(idx2.text, list(zip(b0, b1)), popt, ii, opt.mode)

    resc_idx = [i for i in range(P)
                if b0[i].type == BWA_TYPE_MATESW
                or b1[i].type == BWA_TYPE_MATESW]
    assert len(resc_idx) >= 8, len(resc_idx)

    # ---- gapped-end refinement (the other half of deviation (c)):
    # search-gapped primaries get their post-refine cigar + position
    # host-side (bwa_refine_gapped, bwase.c:339) and ride the same
    # injection ----
    from fastquick_tpu.align.refine import refine_gapped_core
    from fastquick_tpu.align.seqs import seq_reverse

    n_gapped = 0
    refine_idx = []
    for i in range(P):
        if i in resc_idx:
            continue
        did = False
        for j, p in ((0, b0[i]), (1, b1[i])):
            if p.type == BWA_TYPE_NO_MATCH or p.type == BWA_TYPE_MATESW:
                continue
            if p.n_gapo == 0:
                continue
            fwd = p.seq[: p.len][::-1]  # un-reverse to forward codes
            seq = p.rseq[: p.len] if p.strand else fwd
            ext = (1 if p.strand else -1) * (p.n_gapo + p.n_gape)
            p.cigar, p.pos = refine_gapped_core(
                idx2.text, p.len, np.asarray(seq, np.uint8), p.pos, ext)
            did = True
            n_gapped += 1
        if did:
            refine_idx.append(i)
    assert n_gapped >= 8, n_gapped
    inj_idx = sorted(set(resc_idx) | set(refine_idx))
    fill = pack_pe_fill([(b0[i], b1[i]) for i in inj_idx], inj_idx, P)
    fill = {k: jnp.asarray(v) for k, v in fill.items()}

    # ---- pass 2: inject, then compare rows byte-for-byte ----
    idx, acc = _device_run(world, pe_fill=fill)
    cig = {}
    for i in inj_idx:
        for j, p in ((0, b0[i]), (1, b1[i])):
            if p.cigar:
                cig[(i, j)] = cigar_str(p)
    dev_rows = _render_rows_cig(idx, acc["_pair_rows"],
                                host_state["names"], P, cig)
    assert dev_rows == host_state["rows"]
    col = host_state["collector"]
    assert np.array_equal(np.asarray(acc["isize_dist"], np.int64),
                          np.asarray(col.insert_size_dist, np.int64))
    assert int(acc["n_pair_reads"]) == col.num_pair_reads
