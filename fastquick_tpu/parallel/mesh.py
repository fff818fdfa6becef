"""Multi-chip scaling: data-parallel QC over a device mesh.

The reference is single-node pthreads (SURVEY 2f); the TPU-native scaling
model is: FASTQ shards data-parallel over a ``jax.sharding.Mesh`` axis
'dp', the reduced-reference index replicated per chip (it is a few MB),
and every statistic merged with psum -- all StatCollector accumulators
are vectors/histograms/counters, hence commutative sums
(reference src/StatCollector.h:70-119).

The sharded step below is the device QC slice: k-mer filter -> exact-match
backward search (both strands) -> position resolution -> pileup
scatter-adds -> psum.  The full inexact engine (ops/batch_search.py) runs
per-shard with the same layout; its outputs feed the same psum-merged
accumulators.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.fm import DeviceFM, match_exact, sa_lookup
from ..ops.kmer import filter_reads
from ..ops.pileup import depth_pileup
from ..ops.qc_full import SiteTables, qc_step_full, ragged_unreverse


def shard_map_compat(f, mesh, in_specs, out_specs):
    """jax.shard_map across API revisions (check_rep -> check_vma)."""
    from jax import shard_map

    try:
        return shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    except TypeError:
        return shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def make_mesh_2d(n_hosts: int, chips_per_host: int) -> Mesh:
    """Multi-host mesh: ('host', 'chip').  Device order follows
    jax.devices(), which enumerates per-process (per-host) devices
    contiguously, so axis 'chip' rides ICI and axis 'host' rides DCN.
    The QC workload is data-parallel with one psum of small accumulators
    at the end, reduced hierarchically chip-axis (ICI) first, then
    host-axis (DCN) -- see make_sharded_qc_step(axis=('host','chip'))."""
    devs = jax.devices()[: n_hosts * chips_per_host]
    return Mesh(np.array(devs).reshape(n_hosts, chips_per_host),
                ("host", "chip"))


def qc_step_local(words, occ, sa, L2, primary, n_text: int,
                  bitmaps, thresh: int,
                  seqs, rseqs, lens, quals):
    """Single-shard QC step (runs inside shard_map).

    seqs/rseqs: (B, L) reversed / revcomp codes; lens: (B,);
    quals: (B, L) phred.  Returns stat accumulators (commutative sums).
    """
    fm = DeviceFM(words=words, occ=occ, sa=sa, L2=L2, primary=primary,
                  n=n_text)
    B, L = seqs.shape
    # K1: k-mer filter on the forward read (per-row unreversal -- a plain
    # jnp.flip misaligns reads shorter than the pad width)
    fwd = ragged_unreverse(seqs, lens)
    kept = filter_reads(bitmaps, fwd, lens, thresh) if bitmaps is not None \
        else jnp.ones(B, bool)
    # K2: exact-match backward search, both strands; strand a searches
    # index 1-a (bwt_match_gap convention, libbwa/bwtgap.c:148)
    k0, l0 = match_exact(fm, 1, seqs, lens)  # reversed read on reverse index
    k1, l1 = match_exact(fm, 0, rseqs, lens)  # revcomp read on forward index
    hit0 = kept & (k0 <= l0)
    hit1 = kept & (k1 <= l1) & ~hit0
    # position conversion mirrors bwa_cal_pac_pos (src/BwtMapper.cpp:294-328)
    sel1 = jnp.ones(B, jnp.int32)
    pos0 = n_text - (sa_lookup(fm, sel1, jnp.where(hit0, k0, 0)) + lens)
    pos1 = sa_lookup(fm, jnp.zeros(B, jnp.int32), jnp.where(hit1, k1, 0))
    mapped = hit0 | hit1
    positions = jnp.where(hit0, pos0, pos1)
    stats = depth_pileup(positions, lens, mapped, quals, n_text)
    stats["n_mapped"] = mapped.astype(jnp.int32).sum()
    stats["n_reads"] = jnp.int32(B)
    stats["n_filtered"] = (~kept).astype(jnp.int32).sum()
    return stats


def make_sharded_qc_step(mesh: Mesh, fm_arrays: dict, n_text: int,
                         bitmaps=None, thresh: int = 3,
                         axis: str | tuple[str, ...] = "dp"):
    """Build the pjit-ed multi-chip QC step: reads sharded over `axis`
    (a mesh axis name or a tuple like ('host','chip')), index
    replicated, stats psum-merged.  With a tuple, the reduction runs
    innermost axis first (ICI) and the outer axis last (DCN)."""
    axes = (axis,) if isinstance(axis, str) else tuple(axis)

    def step(words, occ, sa, L2, primary, seqs, rseqs, lens, quals):
        stats = qc_step_local(words, occ, sa, L2, primary, n_text,
                              bitmaps, thresh, seqs, rseqs, lens, quals)
        for ax in reversed(axes):  # innermost (ICI) first, DCN last
            stats = jax.tree.map(lambda x, _ax=ax: jax.lax.psum(x, _ax),
                                 stats)
        return stats

    shard_axes = axes if len(axes) > 1 else axes[0]
    sharded = shard_map_compat(
        step, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(),
                  P(shard_axes, None), P(shard_axes, None), P(shard_axes),
                  P(shard_axes, None)),
        out_specs=P())

    @jax.jit
    def run(seqs, rseqs, lens, quals):
        return sharded(fm_arrays["words"], fm_arrays["occ"], fm_arrays["sa"],
                       fm_arrays["L2"], fm_arrays["primary"],
                       seqs, rseqs, lens, quals)

    return run


def make_sharded_qc_full_step(mesh: Mesh, fm_arrays: dict,
                              tables: SiteTables, opt_args: dict,
                              bitmaps=None, thresh: int = 3,
                              pileup_cap: int = 64,
                              axis: str | tuple[str, ...] = "dp",
                              md_table=None, pair_mode: bool = False,
                              fmtab=None, nbp: int = 0):
    """The PRODUCT multi-chip step: reads data-parallel over `axis`,
    index + site tables replicated, the full inexact engine + the
    complete StatCollector accumulator set per shard, every tensor
    psum-merged (ops/qc_full.qc_step_full).

    Marker pileups must keep GLOBAL read order (the .Pileup strings are
    order-sensitive): each shard all-gathers the per-marker entry counts
    (one small (M,)-int collective riding ICI first, DCN last), shifts
    its local entries to the global slot offsets, and then the psum of
    the disjoint-slot tensors IS ordered concatenation.  All
    accumulators are integer, so mesh output == single-device output
    bitwise (pinned by tests/test_multichip.py)."""
    axes = (axis,) if isinstance(axis, str) else tuple(axis)

    def step(words, occ, sa, L2, primary, seqs, rseqs, quals, lens,
             last_ii, fb_n, fb_rows):
        fmd = {"words": words, "occ": occ, "sa": sa, "L2": L2,
               "primary": primary}
        out = qc_step_full(fmd, tables, opt_args, seqs, rseqs, quals,
                           lens, bitmaps=bitmaps, thresh=thresh,
                           pileup_cap=pileup_cap, md_table=md_table,
                           pair_mode=pair_mode, last_ii=last_ii,
                           fb_fill=(fb_n, fb_rows),
                           fmtab=fmtab, nbp=nbp,
                           axis_names=tuple(reversed(axes)))
        # drand48 stream state: computed from the gathered global scan,
        # identical on every shard -- carry it around the psum untouched
        dstate = out.pop("_drand_state", None)
        ii = None
        if pair_mode:
            # the isize info was inferred from the psum'd global
            # histogram, so it is identical on every shard: pass it
            # through the final psum untouched
            ii = out.pop("_ii")
            # already psum'd inside the step: carry around the psum loop
            ih = out.pop("_isize_hist")
            iml = out.pop("_isize_maxlen")
            # PCR-dup counting needs the GLOBAL key multiset (the
            # reference's duplicate_table spans the whole run): gather
            # the per-shard keys; the count is computed identically on
            # every shard AFTER the psum loop (it must not be summed)
            gkeys = out.pop("_pair_keys")
            for ax in reversed(axes):
                gkeys = jax.lax.all_gather(gkeys, ax)
            # per-pair row data: all-gather each field in global shard
            # order (shards are contiguous row blocks, so concatenation
            # IS global read order)
            rows = out.pop("_pair_rows")

            def gather_flat(x):
                for ax in reversed(axes):
                    x = jax.lax.all_gather(x, ax)
                return x.reshape(-1)

            rows = {kk: gather_flat(vv) for kk, vv in rows.items()}
        M = tables.n_markers
        cnt = out["pileup_cnt"]  # (M,) this shard's entries per marker
        g = cnt
        for ax in reversed(axes):  # gather innermost (ICI) first
            g = jax.lax.all_gather(g, ax)
        g = g.reshape(-1, M)  # (n_shards, M) in global shard order
        rank = jnp.int32(0)
        for ax in axes:
            rank = rank * mesh.shape[ax] + jax.lax.axis_index(ax)
        off = jnp.where(jnp.arange(g.shape[0])[:, None] < rank, g, 0
                        ).sum(axis=0)  # (M,) my global slot base
        prow = jnp.broadcast_to(jnp.arange(M)[:, None], (M, pileup_cap))
        cold = jnp.arange(pileup_cap)[None, :]
        tgt = cold + off[:, None]
        valid = cold < cnt[:, None]
        shifted = jnp.zeros((M, pileup_cap), jnp.int32).at[
            prow, tgt].add(jnp.where(valid, out["pileup"], 0),
                           mode="drop")
        out["pileup"] = shifted
        out["pileup_ovf"] = out["pileup_ovf"] + (
            valid & (tgt >= pileup_cap)).astype(jnp.int32).sum()
        for ax in reversed(axes):  # psum ICI first, DCN last
            out = jax.tree.map(lambda x, _ax=ax: jax.lax.psum(x, _ax), out)
        if pair_mode:
            from ..ops.qc_full import count_pcr_dups

            out["n_pcr_dup"] = count_pcr_dups(gkeys.reshape(-1, 3))
            out["_ii"] = ii
            out["_isize_hist"] = ih
            out["_isize_maxlen"] = iml
            out["_pair_rows"] = rows
        if dstate is not None:
            out["_drand_state"] = dstate
        return out

    shard_axes = axes if len(axes) > 1 else axes[0]
    sharded = shard_map_compat(
        step, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(),
                  P(shard_axes, None), P(shard_axes, None),
                  P(shard_axes, None), P(shard_axes), P(),
                  P(shard_axes), P(shard_axes, None, None)),
        out_specs=P())

    @jax.jit
    def run(seqs, rseqs, quals, lens, last_ii=None, fb_fill=None):
        if last_ii is None:
            last_ii = jnp.zeros(7, jnp.float32)
        if fb_fill is None:
            from ..ops.qc_full import A_MAX as _A

            fb_n = jnp.full(seqs.shape[0], -1, jnp.int32)
            fb_rows = jnp.zeros((seqs.shape[0], _A, 3), jnp.int32)
        else:
            fb_n, fb_rows = fb_fill
        return sharded(fm_arrays["words"], fm_arrays["occ"],
                       fm_arrays["sa"], fm_arrays["L2"],
                       fm_arrays["primary"], seqs, rseqs, quals, lens,
                       last_ii, fb_n, fb_rows)

    return run
