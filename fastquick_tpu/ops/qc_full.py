"""Device full QC step: inexact search + the complete StatCollector
accumulator set, designed for data-parallel mesh execution.

This is the SURVEY §5 TPU mapping of the reference's align+stats core
(src/StatCollector.cpp AddSingleAlignment :424-621 and the accumulator
fields of src/StatCollector.h:70-119) as ONE jitted device program:

  k-mer filter -> batched inexact FM search (ops/batch_search kernel)
  -> SE hit selection (bwa_aln2seq_core best-class widths, bwase.c:19-97)
  -> approx mapQ (bwase.c:102-111) -> SA position resolution
  -> per-base accumulation over the covered (B, L) grid.

Accumulators produced (all integer tensors, so multi-chip merging is an
exact psum -- see parallel/mesh.make_sharded_qc_full_step):

  dense site space (S,):  depth, q20, q30      (StatCollector.h DepthVec..)
  histograms:             emp_rep/mis_emp_rep (256), emp_cycle/
                          mis_emp_cycle (256), qual_hist (256)
  marker pileups (M,CAP): packed per-marker entries (base/qual/mapq/
                          strand/cycle) in global read order, the device
                          form of seqVec/qualVec/cycleVec/maqVec/strandVec
  counters:               n_reads, n_filtered, n_mapped, n_eligible,
                          n_base_mapped, n_gapped, n_fallback, n_xy,
                          pileup_ovf

Semantics notes (device-path contract, differentially tested against the
host oracle where they overlap):
  - hit selection runs the reference's drand48 reservoir draw on device
    when opt_args["drand48"] is set (ops/drand48_device, exact stream;
    tests/test_drand48_qc.py pins host-identical rows on a repeat-heavy
    world); without the flag it is deterministic first-best-hit.
    c1/c2/mapQ depend only on class widths either way.
  - only ungapped primary hits feed the per-base accumulators (gapped
    hits are counted in n_gapped; the production driver routes those
    reads through the host refine path).
  - reads the search kernel could not finish (pool/step caps) are counted
    in n_fallback and excluded here; the driver realigns them exactly.
  - depth_dist / gc_dist / pos_num / num_pos_cov* are SOLVE-time
    reductions over the dense depth vector (collector.get_depth_dist),
    not accumulation state, so they are not duplicated here.

Per-read results are lane-local in the search kernel, so every tensor
this module returns is bitwise identical under any data-parallel
sharding of the read batch -- the property the multichip tests pin.
"""

from __future__ import annotations

from dataclasses import dataclass, field
import jax
import jax.numpy as jnp
import numpy as np

from ..align.opts import G_LOG_N
from .batch_search import A_MAX, _search_kernel
from .kmer import filter_reads

PILEUP_CAP = 64  # per-marker pileup slots (device tensor width)

# packed pileup entry: present(1) | base(3) | qual(7) | mapq(7) |
# strand(1) | cycle(10)  (cycle < 1024; device path caps read len well
# below that)
def _pack_entry(base, qual, mapq, strand, cycle):
    return (1 | (base << 1) | (qual << 4) | (mapq << 11)
            | (strand << 18) | (cycle << 19))


def unpack_entry(v: np.ndarray):
    """Host-side unpack -> (base, qual, mapq, strand, cycle)."""
    v = np.asarray(v)
    return ((v >> 1) & 7, (v >> 4) & 127, (v >> 11) & 127,
            (v >> 18) & 1, (v >> 19) & 1023)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SiteTables:
    """Pac-coordinate site tables (device arrays, replicated per chip).

    Index n_text is the out-of-range guard row (site -1, marker -1)."""

    site_idx: jax.Array   # (n+1,) int32: dense-site index or -1
    marker_id: jax.Array  # (n+1,) int32: marker index or -1
    text: jax.Array       # (n+1,) int32 codes (guard row 4)
    dbsnp: jax.Array      # (S,) bool over the dense site space
    is_xy: jax.Array      # (n+1,) bool: position on an X/Y contig
    contig_id: jax.Array  # (n+1,) int32: contig index (guard row -1)
    contig_off: jax.Array  # (C,) int32: contig pac offsets
    contig_len: jax.Array  # (C,) int32: contig lengths
    n_sites: int = field(metadata=dict(static=True))
    n_markers: int = field(metadata=dict(static=True))


def build_site_tables(idx, sc, opt) -> SiteTables:
    """Build pac-space tables from a ReducedIndex + a StatCollector that
    has run restore_vcf_sites (mirrors the coordinate math of
    add_single_alignment: real = contig.pos - flank + (pac - offset))."""
    n = idx.l_pac
    site_idx = np.full(n + 1, -1, np.int32)
    marker_id = np.full(n + 1, -1, np.int32)
    is_xy = np.zeros(n + 1, bool)
    contig_id = np.full(n + 1, -1, np.int32)
    sites = sc.sites
    for ci, contig in enumerate(idx.contigs):
        contig_id[contig.offset:contig.offset + contig.length] = ci
        flank = opt.flank_long_len if contig.is_long else opt.flank_len
        start_real = contig.pos - flank  # 1-based real coord of pac offset
        chrom = contig.chrom[3:] if contig.chrom.startswith("chr") \
            else contig.chrom
        pos1, didx = sites.index_range(
            chrom, start_real, start_real + contig.length)
        pac = contig.offset + (pos1 - start_real)
        ok = (pac >= 0) & (pac < n)
        site_idx[pac[ok]] = didx[ok]
        # marker position -> pac coordinate
        mpac = contig.offset + (contig.pos - start_real)
        if 0 <= mpac < n:
            tbl = sc.vcf_table.get(chrom)
            if tbl is not None and contig.pos in tbl:
                marker_id[mpac] = tbl[contig.pos]
        if chrom in ("X", "Y"):
            is_xy[contig.offset:contig.offset + contig.length] = True
    return SiteTables(
        site_idx=jnp.asarray(site_idx),
        marker_id=jnp.asarray(marker_id),
        text=jnp.asarray(np.concatenate(
            [idx.text.astype(np.int32), [4]])),
        dbsnp=jnp.asarray(sites.dbsnp),
        is_xy=jnp.asarray(is_xy),
        contig_id=jnp.asarray(contig_id),
        contig_off=jnp.asarray(
            np.array([c.offset for c in idx.contigs], np.int32)),
        contig_len=jnp.asarray(
            np.array([c.length for c in idx.contigs], np.int32)),
        n_sites=int(sites.total),
        n_markers=len(sc.vcf_rec_vec))


def synthetic_site_tables(text: np.ndarray, n_markers: int = 8,
                          flank: int = 250, seed: int = 0) -> SiteTables:
    """Standalone tables over a synthetic text (tests / dryrun): markers
    evenly spaced, each with a +/-flank in-region window, every position
    of which is a dense site; every 3rd site dbsnp."""
    n = len(text)
    rng = np.random.default_rng(seed)
    mpos = np.linspace(flank, n - flank - 1, n_markers).astype(np.int64)
    site_idx = np.full(n + 1, -1, np.int32)
    marker_id = np.full(n + 1, -1, np.int32)
    nxt = 0
    for mi, mp in enumerate(mpos):
        lo, hi = mp - flank, mp + flank + 1
        span = np.arange(lo, hi)
        fresh = site_idx[span] < 0
        site_idx[span[fresh]] = nxt + np.arange(int(fresh.sum()))
        nxt += int(fresh.sum())
        marker_id[mp] = mi
    S = nxt
    dbsnp = (np.arange(S) % 3) == 0
    is_xy = np.zeros(n + 1, bool)
    is_xy[: n // 8] = True
    contig_id = np.full(n + 1, -1, np.int32)
    bounds = np.linspace(0, n, n_markers + 1).astype(np.int64)
    for mi in range(n_markers):
        contig_id[bounds[mi]:bounds[mi + 1]] = mi
    del rng
    return SiteTables(
        site_idx=jnp.asarray(site_idx),
        marker_id=jnp.asarray(marker_id),
        text=jnp.asarray(np.concatenate([text.astype(np.int32), [4]])),
        dbsnp=jnp.asarray(dbsnp),
        is_xy=jnp.asarray(is_xy),
        contig_id=jnp.asarray(contig_id),
        contig_off=jnp.asarray(bounds[:-1].astype(np.int32)),
        contig_len=jnp.asarray(np.diff(bounds).astype(np.int32)),
        n_sites=S, n_markers=n_markers)


_G_LOG_N = jnp.asarray(np.array(G_LOG_N, np.int32))


def _approx_mapq(c1, c2, mm_eq_max):
    """bwa_approx_mapQ (bwase.c:102-111), vectorized."""
    g = _G_LOG_N[jnp.clip(c2, 0, 255)]
    q = jnp.where(c2 == 0, 37, jnp.where(23 < g, 0, 23 - g))
    q = jnp.where(mm_eq_max, 25, q)
    q = jnp.where(c1 > 1, 0, q)
    q = jnp.where(c1 == 0, 23, q)
    return q


def ragged_unreverse(arr: jax.Array, lens: jax.Array,
                     fill: int = 4) -> jax.Array:
    """Row-wise arr[b, lens[b]-1-j] (undo bwa's stored reversal with
    per-row lengths; fixes the fixed-width jnp.flip bug for short rows)."""
    B, L = arr.shape
    idx = lens[:, None] - 1 - jnp.arange(L)[None, :]
    out = jnp.take_along_axis(arr, jnp.clip(idx, 0, L - 1), axis=1)
    return jnp.where(idx >= 0, out, fill)


def se_select(n_aln, alns, draw=None):
    """SE selection from the kernel's ordered hit list (packed rows
    [mm|go<<6|ge<<12|a<<18|score<<19, k, l]): best class widths ->
    (mapped, strand, row, c1, c2, n_mm, n_gapo, n_gape).  c1/c2 match
    bwa_aln2seq_core.  The within-class pick is the reference's
    drand48 reservoir draw when `draw` = (f0_sel, row_sel) from
    ops/drand48_device.aln2seq_draw_scan is given; otherwise the
    deterministic first best hit at interval offset 0."""
    B = n_aln.shape[0]
    used = jnp.arange(A_MAX)[None, :] < n_aln[:, None]  # (B, A_MAX)
    score = (alns[:, :, 0] >> 19) & 127
    width = jnp.where(used, alns[:, :, 2] - alns[:, :, 1] + 1, 0)
    best = jnp.where(n_aln > 0, score[:, 0], -1)
    in_best = used & (score == best[:, None])
    c1 = jnp.where(in_best, width, 0).sum(axis=1)
    c2 = jnp.where(used & ~in_best, width, 0).sum(axis=1)
    mapped = n_aln > 0
    if draw is not None:
        f0, row = draw
    else:
        first = alns[:, 0]  # hits are recorded best-score-first
        f0, row = first[:, 0], first[:, 1]
    return (mapped, (f0 >> 18) & 1, row, c1, c2,
            f0 & 63, (f0 >> 6) & 63, (f0 >> 12) & 63)


def _pileup_ranks(mk_flat: jax.Array, valid: jax.Array):
    """Arrival rank of each candidate within its marker, in flattened
    (read-major) order == global read order within the shard."""
    K = mk_flat.shape[0]
    keys = jnp.where(valid, mk_flat, jnp.int32(0x3FFFFFFF))
    order = jnp.argsort(keys, stable=True)
    sk = keys[order]
    is_start = jnp.concatenate(
        [jnp.ones(1, bool), sk[1:] != sk[:-1]])
    start_pos = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, jnp.arange(K), 0))
    rank_sorted = jnp.arange(K) - start_pos
    ranks = jnp.zeros(K, jnp.int32).at[order].set(
        rank_sorted.astype(jnp.int32))
    return ranks


def pack_host_hits(reads, rows_idx, B, A_MAX_=A_MAX):
    """Pack host-engine hit lists into the kernel's (B, A_MAX, 3) form
    for `qc_step_full(fb_fill=...)`: fb_n[b] = -1 marks rows without a
    fill; packed rows are [mm|go<<6|ge<<12|a<<18|score<<19, k, l] in
    the engine's recording order (identical to the kernel's -- the
    zero-fallback drand differentials pin that)."""
    fb_n = np.full(B, -1, np.int32)
    fb_rows = np.zeros((B, A_MAX_, 3), np.int32)
    for p, b in zip(reads, rows_idx):
        fb_n[b] = min(len(p.aln), A_MAX_)
        for j, a in enumerate(p.aln[:A_MAX_]):
            fb_rows[b, j, 0] = (a.n_mm | (a.n_gapo << 6) | (a.n_gape << 12)
                                | (a.a << 18) | (a.score << 19))
            fb_rows[b, j, 1] = a.k
            fb_rows[b, j, 2] = a.l
    return fb_n, fb_rows


def pack_pe_fill(pairs, pair_idx, P):
    """Pack host-rescued/refined pair ends for qc_step_full(pe_fill=...).

    pairs: [(p0, p1)] Read objects AFTER align.pe.bwa_paired_sw (and
    refine); pair_idx: their pair-row indices in the device batch.
    The device SW kernel computes the rescue scores in the product path
    (align/pe._batch_local_sw, default-on in device mode); this packs
    the resulting end state so device pair statuses and accumulators
    carry POST-rescue/refine positions (deletes deviation (c))."""
    from ..align.dp import FROM_D, FROM_M, FROM_S
    from ..align.pe import BWA_TYPE_NO_MATCH, SAM_FPP

    fill = {"mask": np.zeros(P, np.int32)}
    for f in ("pos", "strand", "mapq", "seq_q", "n_mm", "n_gapo",
              "n_gape", "proper", "mapped", "cl_l", "cl_r", "span"):
        fill[f + "0"] = np.zeros(P, np.int32)
        fill[f + "1"] = np.zeros(P, np.int32)
    for (p0, p1), i in zip(pairs, pair_idx):
        fill["mask"][i] = 1
        for j, p in ((0, p0), (1, p1)):
            fill[f"pos{j}"][i] = p.pos
            fill[f"strand{j}"][i] = p.strand
            fill[f"mapq{j}"][i] = p.mapQ
            fill[f"seq_q{j}"][i] = p.seQ
            fill[f"n_mm{j}"][i] = p.n_mm
            fill[f"n_gapo{j}"][i] = p.n_gapo
            fill[f"n_gape{j}"][i] = p.n_gape
            fill[f"proper{j}"][i] = 1 if (p.extra_flag & SAM_FPP) else 0
            fill[f"mapped{j}"][i] = 1 if p.type != BWA_TYPE_NO_MATCH \
                else 0
            # soft-clip widths (rescued ends): the host collector's
            # pos - cl_left insert arithmetic + no-clip dup gate
            fill[f"span{j}"][i] = p.len
            if p.cigar:
                if p.cigar[0][0] == FROM_S:
                    fill[f"cl_l{j}"][i] = p.cigar[0][1]
                if p.cigar[-1][0] == FROM_S:
                    fill[f"cl_r{j}"][i] = p.cigar[-1][1]
                fill[f"span{j}"][i] = sum(
                    ln for op, ln in p.cigar if op in (FROM_M, FROM_D))
    return fill


def qc_step_full(fm_arrays: dict, tables: SiteTables, opt_args: dict,
                 seqs, rseqs, quals, lens,
                 bitmaps=None, thresh: int = 3,
                 pileup_cap: int = PILEUP_CAP,
                 marker_base: jax.Array | None = None,
                 md_table: jax.Array | None = None,
                 return_per_read: bool = False,
                 pair_mode: bool = False,
                 last_ii: jax.Array | None = None,
                 last_drand: jax.Array | None = None,
                 fb_fill: tuple | None = None,
                 pe_fill: dict | None = None,
                 fmtab=None, nbp: int = 0,
                 axis_names: tuple = ()):
    """One shard's full QC step (traceable; runs inside shard_map).

    seqs: (B, L) reversed codes; rseqs: (B, L) revcomp codes (both as
    stored by bwa's seq_reverse); quals: (B, L) phred in read
    orientation; lens: (B,).  marker_base: (M,) per-marker slot offset
    for this shard's pileup entries (0 on a single device; the mesh
    wrapper passes the all-gathered prefix counts so psum == global
    concat in read order).

    fb_fill: optional (fb_n (B,), fb_rows (B, A_MAX, 3)) host-exact hit
    lists for kernel-fallback reads (pack_host_hits).  Filled reads are
    treated as device-finished: the drand48 stream then consumes their
    draws IN ORDER, so stream exactness holds on batches WITH fallback
    (the two-dispatch recipe: run once, host-align the fallback reads,
    re-run with the fills)."""
    B, L = seqs.shape
    S, M = tables.n_sites, tables.n_markers
    n_text = int(opt_args["n_text"])

    fwd = ragged_unreverse(seqs, lens)  # forward codes, ragged-correct
    if bitmaps is not None:
        kept = filter_reads(bitmaps, fwd, lens, thresh)
    else:
        kept = jnp.ones(B, bool)

    if md_table is not None:  # per-read maxdiff (bwa_cal_maxdiff by len)
        md_of_len = md_table[jnp.clip(lens, 0, md_table.shape[0] - 1)]
    else:
        md_of_len = jnp.full(B, jnp.int32(opt_args["max_diff"]))
    md = jnp.where(kept, md_of_len, -1)
    use_seed = (lens > int(opt_args.get("seed_len", 32))) \
        if opt_args.get("use_seed", True) else jnp.zeros(B, bool)
    # the RESIDENT Mosaic kernel + Pallas width kernel carry over to
    # the mesh path when the caller supplies the packed VMEM FM table
    # (ops/search_pallas.pack_fm_table); CPU callers (tests, dryrun)
    # pass fmtab=None and keep the XLA lockstep formulation
    use_pallas = "resident" if (fmtab is not None and B % 128 == 0) \
        else False
    n_aln, alns, fallback, _rounds, _busy = _search_kernel(
        fm_arrays["words"], fm_arrays["occ"], fm_arrays["sa"],
        fm_arrays["L2"], fm_arrays["primary"],
        seqs, lens, md, use_seed,
        B=B, NP=int(opt_args.get("pool", 256)),
        K_INNER=int(opt_args.get("inner", 16)),
        CH_STEPS=int(opt_args.get("chain", 4)),
        step_cap=int(opt_args.get("step_cap", 64 * L)),
        s_mm=3, s_gapo=11, s_gape=4,
        max_gapo=int(opt_args.get("max_gapo", 1)),
        max_gape=int(opt_args.get("max_gape", 6)),
        indel_end_skip=5, max_del_occ=10, max_entries=2000000,
        max_top2=int(opt_args.get("max_top2", 30)),
        seed_len=int(opt_args.get("seed_len", 32)),
        max_seed_diff=int(opt_args.get("max_seed_diff", 2)),
        n_text=n_text, pallas=use_pallas, fmtab=fmtab, nbp=int(nbp))
    if fb_fill is not None:
        fb_n, fb_rows = fb_fill
        has_fill = (fallback != 0) & (fb_n >= 0)
        n_aln = jnp.where(has_fill, fb_n, n_aln)
        alns = jnp.where(has_fill[:, None, None], fb_rows, alns)
        fallback = jnp.where(has_fill, 0, fallback)

    draw = None
    drand_state = None
    if opt_args.get("drand48", False):
        # reference drand48 reservoir selection (bwase.c:19-44): one
        # global stream in read order.  On a mesh every shard gathers
        # the batch's hit lists, runs the identical sequential scan and
        # slices its own rows -- bitwise mesh == single.
        from .drand48_device import aln2seq_draw_scan, seed_state

        if last_drand is None:
            state0 = jnp.asarray(seed_state(
                int(opt_args.get("drand_seed", 11))))
        else:
            state0 = last_drand
        g_n, g_alns = n_aln, alns
        for ax in axis_names:  # gather outermost-last: global row order
            g_n = jax.lax.all_gather(g_n, ax)
            g_alns = jax.lax.all_gather(g_alns, ax)
        g_n = g_n.reshape(-1)
        g_alns = g_alns.reshape(-1, A_MAX, 3)
        f0g, rowg, drand_state = aln2seq_draw_scan(g_n, g_alns, state0,
                                                   A_MAX=A_MAX)
        if axis_names:
            rank = jnp.int32(0)
            for ax in axis_names[::-1]:
                rank = rank * jax.lax.axis_size(ax) + jax.lax.axis_index(ax)
            base = rank * B
            f0 = jax.lax.dynamic_slice(f0g, (base,), (B,))
            row_d = jax.lax.dynamic_slice(rowg, (base,), (B,))
        else:
            f0, row_d = f0g, rowg
        draw = (f0, row_d)

    mapped, strand, row, c1, c2, n_mm, n_gapo, n_gape = se_select(
        n_aln, alns, draw=draw)
    mapped = mapped & kept & (fallback == 0)
    mapq = _approx_mapq(c1, c2, n_mm == md_of_len)
    # SA row -> pac pos (bwa_cal_pac_pos / pe.sa_pos): strand 1 reads the
    # forward SA; strand 0 converts through the reverse index
    row_c = jnp.clip(row, 0, n_text)
    sa_f = fm_arrays["sa"][0, row_c]
    sa_r = fm_arrays["sa"][1, row_c]
    pos = jnp.where(strand == 1, sa_f, n_text - (sa_r + lens))

    pair_acc = {}
    if pair_mode:
        # ---- reference PE semantics on device (ops/pe_device): rows
        # (2i, 2i+1) are mates.  isize inference uses SE mapQ (pre-
        # pairing, bwape.c:55); the pairing sweep may move an end or
        # rewrite mapQ; statuses/dups accumulate after.  Mate-rescue SW
        # stays host-side (pinned deviation; the product driver routes
        # rescued reads through the host path).
        from .pe_device import (expand_occurrences, infer_isize_from_hist,
                                isize_hist_local, pair_status,
                                pairing_sweep)

        k_occ = int(opt_args.get("k_occ", 32))
        ap_prior = float(opt_args.get("ap_prior", 1e-5))
        max_isize = int(opt_args.get("max_isize", 500))

        def half(x, j):
            return x[j::2]

        se = []
        for j in (0, 1):
            se.append(dict(
                pos=half(pos, j), strand=half(strand, j),
                mapq=half(mapq, j), seq_q=half(mapq, j),
                n_mm=half(n_mm, j), n_gapo=half(n_gapo, j),
                n_gape=half(n_gape, j), len=half(lens, j)))
        mapped0, mapped1 = half(mapped, 0), half(mapped, 1)

        hist, mlen = isize_hist_local(
            se[0]["pos"], se[1]["pos"], se[0]["len"], se[1]["len"],
            se[0]["mapq"], se[1]["mapq"], mapped0 & mapped1)
        for ax in axis_names:  # ICI first when ('host','chip')-reversed
            hist = jax.lax.psum(hist, ax)
            mlen = jax.lax.pmax(mlen, ax)
        ii = infer_isize_from_hist(hist, mlen, ap_prior, n_text,
                                   last_ii=last_ii)

        occ0 = expand_occurrences(fm_arrays["sa"], n_text, half(n_aln, 0),
                                  alns[0::2], se[0]["len"], k_occ)
        occ1 = expand_occurrences(fm_arrays["sa"], n_text, half(n_aln, 1),
                                  alns[1::2], se[1]["len"], k_occ)
        occ_fit = (occ0["n_occ"] <= k_occ) & (occ1["n_occ"] <= k_occ)
        pair_ok = mapped0 & mapped1 & occ_fit
        out0, out1, cnt_chg = pairing_sweep(
            occ0, occ1, alns[0::2], alns[1::2], se[0], se[1], pair_ok,
            ii, int(opt_args.get("s_mm", 3)), max_isize, _G_LOG_N)

        # ---- second-phase expansion (removes deviation (b)): pairs the
        # k_occ cap truncated re-expand at k_occ2 and re-run the sweep.
        # The reference pairs every <=max_occ=100000-occurrence end
        # (src/BwtMapper.cpp:721-907); the device handles the common
        # case densely and the repeat-heavy tail through this gathered
        # OVF_CAP-wide pass -- only pairs beyond k_occ2 (or beyond
        # OVF_CAP per batch) remain counted in n_pair_ovf.
        k_occ2 = int(opt_args.get("k_occ2", 512))
        ovf_cap = int(opt_args.get("ovf_cap", 64))
        fits2 = (occ0["n_occ"] <= k_occ2) & (occ1["n_occ"] <= k_occ2)
        ovf_pair = mapped0 & mapped1 & ~occ_fit & fits2
        # the OVF_CAP budget counts pairs in GLOBAL read order so a
        # mesh run selects exactly the pairs a single-device run would
        # (mesh == single bitwise)
        base = jnp.int32(0)
        if axis_names:
            cnt_l = ovf_pair.astype(jnp.int32).sum()
            g_cnt = cnt_l
            for ax in axis_names:
                g_cnt = jax.lax.all_gather(g_cnt, ax)
            g_cnt = g_cnt.reshape(-1)
            r_of = jnp.int32(0)
            for ax in axis_names[::-1]:
                r_of = (r_of * jax.lax.axis_size(ax)
                        + jax.lax.axis_index(ax))
            base = jnp.where(jnp.arange(g_cnt.shape[0]) < r_of,
                             g_cnt, 0).sum()
        rank = base + jnp.cumsum(ovf_pair.astype(jnp.int32)) - 1
        within = ovf_pair & (rank < ovf_cap)
        lrank = jnp.cumsum(within.astype(jnp.int32)) - 1
        Pp = mapped0.shape[0]
        sel = jnp.zeros(ovf_cap, jnp.int32).at[
            jnp.where(within, lrank, ovf_cap)].set(
            jnp.arange(Pp, dtype=jnp.int32), mode="drop")
        live = jnp.arange(ovf_cap) < within.astype(jnp.int32).sum()
        a0s, a1s = alns[0::2][sel], alns[1::2][sel]
        se0s = {kk: vv[sel] for kk, vv in se[0].items()}
        se1s = {kk: vv[sel] for kk, vv in se[1].items()}
        occ0b = expand_occurrences(fm_arrays["sa"], n_text,
                                   half(n_aln, 0)[sel], a0s,
                                   se0s["len"], k_occ2)
        occ1b = expand_occurrences(fm_arrays["sa"], n_text,
                                   half(n_aln, 1)[sel], a1s,
                                   se1s["len"], k_occ2)
        out0b, out1b, cnt_chgb = pairing_sweep(
            occ0b, occ1b, a0s, a1s, se0s, se1s, live, ii,
            int(opt_args.get("s_mm", 3)), max_isize, _G_LOG_N)
        sel_w = jnp.where(live, sel, Pp)  # drop dead rows in the merge
        for f in out0:
            out0[f] = out0[f].at[sel_w].set(out0b[f], mode="drop")
            out1[f] = out1[f].at[sel_w].set(out1b[f], mode="drop")
        cnt_chg = cnt_chg + cnt_chgb
        pair_ok = pair_ok | within

        # ---- mate-rescue / refine injection (removes deviation (c)):
        # pe_fill carries host-computed post-rescue/post-refine end
        # state for candidate pairs (the device SW kernel does the
        # scoring in the product path; the cigar/MD glue is host work).
        # Injected ends flow into pair statuses, per-base accumulation
        # and the .InsertSizeTable rows exactly like kernel-mapped ends.
        if pe_fill is not None:
            fmask = pe_fill["mask"] != 0
            for j, out in ((0, out0), (1, out1)):
                for f in ("pos", "strand", "mapq", "seq_q", "n_mm",
                          "n_gapo", "n_gape"):
                    out[f] = jnp.where(fmask, pe_fill[f"{f}{j}"], out[f])
                out["proper"] = jnp.where(
                    fmask, pe_fill[f"proper{j}"] != 0, out["proper"])
                zcl = jnp.zeros_like(out["pos"])
                out["cl_l"] = jnp.where(fmask, pe_fill[f"cl_l{j}"], zcl)
                out["cl_r"] = jnp.where(fmask, pe_fill[f"cl_r{j}"], zcl)
                # cigar reference span (sum of M/D) for the demotion
                out["span"] = jnp.where(fmask, pe_fill[f"span{j}"],
                                        out["len"])

        def ileave(a0, a1):
            return jnp.stack([a0, a1], axis=1).reshape(-1)

        pos = ileave(out0["pos"], out1["pos"])
        strand = ileave(out0["strand"], out1["strand"])
        mapq = ileave(out0["mapq"], out1["mapq"])
        n_mm = ileave(out0["n_mm"], out1["n_mm"])
        n_gapo = ileave(out0["n_gapo"], out1["n_gapo"])
        n_gape = ileave(out0["n_gape"], out1["n_gape"])
        if pe_fill is not None:
            # a rescued previously-unmapped end becomes mapped
            fmask2 = ileave(fmask, fmask)
            fmap = ileave(pe_fill["mapped0"] != 0,
                          pe_fill["mapped1"] != 0)
            mapped = jnp.where(fmask2, fmap, mapped)

        # contig-overhang demotion (AddAlignment, StatCollector.cpp:
        # 725-734; ungapped pos_end = pos + len -- gapped ends are a
        # pinned deviation, they route host-side in the product driver)
        cid = tables.contig_id[jnp.clip(pos, 0, n_text)]
        offv = tables.contig_off[jnp.clip(cid, 0,
                                          tables.contig_off.shape[0] - 1)]
        clnv = tables.contig_len[jnp.clip(cid, 0,
                                          tables.contig_len.shape[0] - 1)]
        # pos_end = pos + cigar ref span (bwase.c:419-433); span == len
        # except for rescue-injected cigared ends
        span_il = lens
        if pe_fill is not None:
            span_il = jnp.where(fmask2,
                                ileave(out0["span"], out1["span"]), lens)
        mapped = mapped & (cid >= 0) & (pos + span_il - offv <= clnv)
        mapped0, mapped1 = half(mapped, 0), half(mapped, 1)

        ps = pair_status(tables.contig_id, tables.contig_off,
                         tables.contig_len, n_text, out0, out1,
                         mapped0, mapped1)
        pair_acc = {
            "isize_dist": ps["isize_dist"],
            "pair_status_counts": ps["status_counts"],
            "n_pair_reads": ps["n_pair_reads"],
            "n_pair_cnt_chg": cnt_chg,
            "n_pair_ovf": (mapped0 & mapped1 & ~occ_fit
                           & ~within).astype(jnp.int32).sum(),
            "_pair_keys": ps["dup_keys"],
            "_ii": ii,
            # the EXACT psum'd integer isize histogram: host-side f64
            # inference over it (align/pe.infer_isize_from_hist_f64)
            # bit-matches the host pipeline's windows -- the mate-rescue
            # recipe's isize source
            "_isize_hist": hist,
            "_isize_maxlen": mlen,
            # per-pair row data (NOT psum-able; the mesh wrapper
            # all-gathers these in global read order so the host can
            # write identical .InsertSizeTable rows for any mesh shape)
            "_pair_rows": {
                "status": ps["status"], "actual": ps["actual"],
                "mi": ps["mi"], "mi2": ps["mi2"],
                "cid_p": ps["cid_p"], "cid_q": ps["cid_q"],
                "pos0": out0["pos"], "pos1": out1["pos"],
                "strand0": out0["strand"], "strand1": out1["strand"],
                "mapq0": out0["mapq"], "mapq1": out1["mapq"],
                "len0": out0["len"], "len1": out1["len"],
                "proper": out0["proper"],
                "mapped0": mapped0, "mapped1": mapped1,
                # per-end diff counts + seQ: enough host-side state to
                # drive the exact bwa_paired_sw rescue for candidate
                # pairs (the pe_fill recipe)
                "n_mm0": out0["n_mm"], "n_mm1": out1["n_mm"],
                "n_gapo0": out0["n_gapo"], "n_gapo1": out1["n_gapo"],
                "n_gape0": out0["n_gape"], "n_gape1": out1["n_gape"],
                "seq_q0": out0["seq_q"], "seq_q1": out1["seq_q"],
            },
        }

    gapped = mapped & ((n_gapo > 0) | (n_gape > 0))
    eligible = mapped & (mapq >= 20) & ~gapped

    # ---- per-base accumulation over the covered grid ----
    offs = jnp.arange(L)[None, :]
    cover = eligible[:, None] & (offs < lens[:, None])
    pacp = jnp.where(cover, pos[:, None] + offs, n_text)
    pacp = jnp.clip(pacp, 0, n_text)
    # read bases / quals / cycles in reference orientation
    rq = ragged_unreverse(quals, lens, fill=0)
    ref_read = jnp.where((strand == 0)[:, None], fwd,
                         ragged_unreverse(rseqs, lens))
    ref_qual = jnp.where((strand == 0)[:, None], rq, quals)
    cycle = jnp.where((strand == 0)[:, None], offs,
                      jnp.clip(lens[:, None] - 1 - offs, 0, L))
    site = tables.site_idx[pacp]          # (B, L)
    mk = tables.marker_id[pacp]
    fb_base = tables.text[pacp]
    in_reg = cover & (site >= 0)
    site_c = jnp.where(in_reg, site, S)
    bq = jnp.clip(ref_qual, 0, 93)
    mism = in_reg & (ref_read < 4) & (fb_base < 4) & (ref_read != fb_base)
    mism = mism & ~jnp.concatenate(
        [tables.dbsnp, jnp.zeros(1, bool)])[jnp.clip(site_c, 0, S)]

    ones = in_reg.astype(jnp.int32).reshape(-1)
    flat_site = site_c.reshape(-1)
    tier = ((bq >= 20).astype(jnp.int32) + (bq >= 30)).reshape(-1)
    dense3 = jnp.zeros(3 * (S + 1), jnp.int32).at[
        flat_site + tier * (S + 1)].add(ones)
    d0 = dense3[: S] + dense3[S + 1: 2 * S + 1] + dense3[2 * S + 2:][: S]
    q20 = dense3[S + 1: 2 * S + 1][: S] + dense3[2 * S + 2:][: S]
    q30 = dense3[2 * S + 2:][: S]

    bq_flat = jnp.where(in_reg, bq, 255).reshape(-1)
    emp_rep = jnp.zeros(256, jnp.int32).at[
        jnp.clip(bq_flat, 0, 255)].add(ones)
    cyc_flat = jnp.where(in_reg, cycle, 255).reshape(-1)
    emp_cycle = jnp.zeros(256, jnp.int32).at[
        jnp.clip(cyc_flat, 0, 255)].add(ones)
    mism_ones = mism.astype(jnp.int32).reshape(-1)
    mis_emp_rep = jnp.zeros(256, jnp.int32).at[
        jnp.clip(bq_flat, 0, 255)].add(mism_ones)
    mis_emp_cycle = jnp.zeros(256, jnp.int32).at[
        jnp.clip(cyc_flat, 0, 255)].add(mism_ones)

    # ---- marker pileups in read order ----
    on_mk = in_reg & (mk >= 0)
    mk_flat = jnp.where(on_mk, mk, -1).reshape(-1)
    ranks = _pileup_ranks(mk_flat, mk_flat >= 0)
    packed = _pack_entry(
        jnp.clip(ref_read, 0, 4), bq, jnp.clip(mapq[:, None] + 0 * offs,
                                               0, 127),
        jnp.broadcast_to((strand == 1)[:, None].astype(jnp.int32), (B, L)),
        jnp.clip(cycle, 0, 1023)).reshape(-1)
    base_off = (jnp.zeros(M + 1, jnp.int32) if marker_base is None
                else jnp.concatenate(
                    [marker_base.astype(jnp.int32),
                     jnp.zeros(1, jnp.int32)]))
    mk_c = jnp.clip(mk_flat, 0, M)
    slot = ranks + base_off[mk_c]
    ok = (mk_flat >= 0) & (slot < pileup_cap)
    pileup = jnp.zeros((M, pileup_cap), jnp.int32).at[
        jnp.where(ok, mk_c, M), jnp.clip(slot, 0, pileup_cap - 1)
    ].add(jnp.where(ok, packed, 0), mode="drop")
    pileup_cnt = jnp.zeros(M + 1, jnp.int32).at[mk_c].add(
        (mk_flat >= 0).astype(jnp.int32))[:M]
    pileup_ovf = ((mk_flat >= 0) & ~ok).astype(jnp.int32).sum()

    n_xy = (eligible & jnp.concatenate(
        [tables.is_xy[jnp.clip(pos, 0, n_text)][:, None]], axis=1)[:, 0]
    ).astype(jnp.int32).sum()

    acc = {
        "depth": d0, "q20": q20, "q30": q30,
        "emp_rep": emp_rep, "mis_emp_rep": mis_emp_rep,
        "emp_cycle": emp_cycle, "mis_emp_cycle": mis_emp_cycle,
        "pileup": pileup, "pileup_cnt": pileup_cnt,
        "pileup_ovf": pileup_ovf,
        "n_reads": jnp.int32(B),
        "n_filtered": (~kept).astype(jnp.int32).sum(),
        "n_mapped": mapped.astype(jnp.int32).sum(),
        "n_eligible": eligible.astype(jnp.int32).sum(),
        "n_gapped": gapped.astype(jnp.int32).sum(),
        "n_fallback": (fallback != 0).astype(jnp.int32).sum(),
        "n_base_mapped": in_reg.astype(jnp.int32).sum(),
        "n_xy": n_xy,
    }
    if drand_state is not None:
        acc["_drand_state"] = drand_state  # stream continuation state
    acc.update(pair_acc)
    if not return_per_read:
        return acc
    # per-read flags for the driver (NOT psum-able; the mesh wrapper
    # never requests them): which reads the host must redo exactly --
    # kernel overflows, plus gapped primaries (host refine path)
    per_read = {
        "kept": kept,
        "mapped": mapped,
        "eligible": eligible,
        "fallback": fallback,
        "host_redo": kept & ((fallback != 0)
                             | (mapped & gapped & (mapq >= 20))),
    }
    return acc, per_read


def count_pcr_dups(keys: jax.Array) -> jax.Array:
    """num_pcr_dup from a (K, 3) multiset of (contig, start, end)
    pac-coordinate pair keys (0x7FFFFFFF sentinel rows = no proper
    pair).  Every repeat of a key beyond its first occurrence counts 2
    reads (the reference's duplicate_table adds 2 per already-seen
    insert signature, StatCollector.cpp:698-704); the count depends only
    on the multiset, so shard/gather order is free."""
    order = jnp.lexsort((keys[:, 2], keys[:, 1], keys[:, 0]))
    s = keys[order]
    valid = s[:, 0] != 0x7FFFFFFF
    same = (s[1:] == s[:-1]).all(axis=1) & valid[1:]
    return 2 * same.astype(jnp.int32).sum()


def local_pileup_counts(tables: SiteTables, opt_args, fm_arrays,
                        seqs, rseqs, quals, lens, bitmaps=None,
                        thresh: int = 3):
    """Phase-A helper for the mesh wrapper: this shard's per-marker entry
    counts (so cross-shard slot offsets can be exchanged before the
    accumulation pass).  Cheap relative to re-running search twice only
    on small mesh steps; the production driver caches the search."""
    out = qc_step_full(fm_arrays, tables, opt_args, seqs, rseqs, quals,
                       lens, bitmaps=bitmaps, thresh=thresh)
    return out["pileup_cnt"]
