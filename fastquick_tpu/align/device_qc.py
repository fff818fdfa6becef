"""Resident-on-chip QC mode (`align --device_qc`) -- product grade.

Round-2 shipped this flag as a QC-only demo (no BAM, no pairing, no
insert sizes).  It is now the FULL product pipeline with the three bulk
phases on the accelerator and the byte-order-sensitive logic on the
host, so `align --device_qc` emits the BAM plus all 14 statistics files
BYTE-IDENTICAL to the host pipeline (pinned by tests/test_device_qc.py
on a 10k-read PE world with repeats and gapped reads):

  device: k-mer filter   (ops/kmer over HBM-resident bitmaps)
  device: inexact search (ops/batch_search lockstep kernel; exact host
          fallback for pool/step-cap overflows)
  host:   drand48 hit draw, PE isize/pairing, mate-rescue SW, gapped
          refine, SAM/BAM out, pair-status rows + dup table (the
          reference's own cold path: bwase.c/bwape.c post-processing)
  device: per-base dense-site + histogram accumulation for the
          ungapped full-length majority (DeviceDenseStats below): pac
          positions -> site indices -> depth/Q20/Q30 + empirical
          quality/cycle (mis)match histograms as one jitted program;
          commutative integer sums, so device==host exactly.  Marker
          pileups stay host-side in arrival order (they are
          order-sensitive strings; reference src/StatCollector.cpp
          UpdateInfoVecAtMarker:342-363), as do gapped/clipped/trimmed
          reads (reference's per-CIGAR walk :579-618).

The single-program search+stats step (ops/qc_full.qc_step_full) remains
the mesh scale-out path (parallel/mesh, __graft_entry__).
"""

from __future__ import annotations

import numpy as np

from ..utils.logging import notice

_PAD_B = 4096  # device batch rows (fixed shape -> one compile)
_PAD_L = 256


class DeviceDenseStats:
    """Device backend for StatCollector's dense-site accumulation.

    collector._drain_queue routes every eligible ungapped full-length
    read here (instead of the numpy vectorized path); flush() runs the
    jitted accumulation program and adds the integer results into the
    collector's arrays.  Inputs are reference-oriented codes/quals, so
    the site/mismatch/cycle math matches AddSingleAlignment's walk
    (src/StatCollector.cpp:437-618) exactly."""

    def __init__(self, idx, collector, opt):
        import jax
        import jax.numpy as jnp

        from ..ops.qc_full import build_site_tables

        self._jnp = jnp
        self.tables = build_site_tables(idx, collector, opt)
        self.S = self.tables.n_sites
        self.n_text = idx.l_pac
        self._pos: list[int] = []
        self._strand: list[int] = []
        self._len: list[int] = []
        self._codes: list[np.ndarray] = []
        self._quals: list[np.ndarray] = []
        self.reads_accumulated = 0

        S = self.S
        n_text = self.n_text

        def accum(tab, pos, strand, codes, quals, lens):
            B, L = codes.shape
            offs = jnp.arange(L, dtype=jnp.int32)[None, :]
            cover = offs < lens[:, None]
            pacp = jnp.where(cover, pos[:, None] + offs, n_text)
            pacp = jnp.clip(pacp, 0, n_text)
            site = tab.site_idx[pacp]
            in_reg = cover & (site >= 0)
            site_c = jnp.where(in_reg, site, S)
            fb = tab.text[pacp]
            codes = codes.astype(jnp.int32)
            bq = jnp.clip(quals.astype(jnp.int32), 0, 255)
            mism = in_reg & (codes < 4) & (fb < 4) & (codes != fb)
            mism = mism & ~jnp.concatenate(
                [tab.dbsnp, jnp.zeros(1, bool)])[jnp.clip(site_c, 0, S)]
            cycle = jnp.where((strand == 1)[:, None],
                              lens[:, None] - 1 - offs, offs)
            ones = in_reg.astype(jnp.int32).reshape(-1)
            tier = ((bq >= 20).astype(jnp.int32) + (bq >= 30)).reshape(-1)
            dense3 = jnp.zeros(3 * (S + 1), jnp.int32).at[
                site_c.reshape(-1) + tier * (S + 1)].add(ones)
            bq_f = jnp.where(in_reg, bq, 255).reshape(-1)
            cy_f = jnp.where(in_reg, jnp.clip(cycle, 0, 255),
                             255).reshape(-1)
            m_ones = mism.astype(jnp.int32).reshape(-1)
            emp_rep = jnp.zeros(256, jnp.int32).at[bq_f].add(ones)
            emp_cyc = jnp.zeros(256, jnp.int32).at[cy_f].add(ones)
            mis_rep = jnp.zeros(256, jnp.int32).at[bq_f].add(m_ones)
            mis_cyc = jnp.zeros(256, jnp.int32).at[cy_f].add(m_ones)
            return dense3, emp_rep, emp_cyc, mis_rep, mis_cyc

        import jax

        self._fn = jax.jit(accum)

    def add(self, p) -> None:
        """Queue one eligible ungapped full-length read (called from
        _drain_queue in arrival order; sums are commutative)."""
        ln = p.len
        if p.strand == 0:
            codes = p.seq[:ln].astype(np.uint8)
            quals = p.qual[:ln].astype(np.uint8) - 33
        else:
            c = p.seq[:ln][::-1]
            codes = np.where(c < 4, 3 - c, 4).astype(np.uint8)
            quals = p.qual[:ln][::-1].astype(np.uint8) - 33
        self._pos.append(p.pos)
        self._strand.append(int(p.strand))
        self._len.append(ln)
        self._codes.append(codes)
        self._quals.append(quals)
        self.reads_accumulated += 1

    def flush(self, collector) -> None:
        if not self._pos:
            return
        jnp = self._jnp
        n = len(self._pos)
        for lo in range(0, n, _PAD_B):
            hi = min(lo + _PAD_B, n)
            m = hi - lo
            codes = np.full((_PAD_B, _PAD_L), 4, np.uint8)
            quals = np.zeros((_PAD_B, _PAD_L), np.uint8)
            pos = np.zeros(_PAD_B, np.int32)
            strand = np.zeros(_PAD_B, np.int32)
            lens = np.zeros(_PAD_B, np.int32)
            for i in range(m):
                k = lo + i
                ln = min(self._len[k], _PAD_L)
                codes[i, :ln] = self._codes[k][:ln]
                quals[i, :ln] = self._quals[k][:ln]
                pos[i] = self._pos[k]
                strand[i] = self._strand[k]
                lens[i] = ln
            dense3, emp_rep, emp_cyc, mis_rep, mis_cyc = [
                np.asarray(x, np.int64) for x in self._fn(
                    self.tables, jnp.asarray(pos), jnp.asarray(strand),
                    jnp.asarray(codes), jnp.asarray(quals),
                    jnp.asarray(lens))]
            S = self.S
            c0, c1, c2 = (dense3[:S], dense3[S + 1:2 * S + 1],
                          dense3[2 * S + 2:][:S])
            q20 = c1 + c2
            collector.sites.depth += c0 + q20
            collector.sites.q20 += q20
            collector.sites.q30 += c2
            collector.emp_rep_dist += emp_rep
            collector.emp_cycle_dist += emp_cyc
            collector.mis_emp_rep_dist += mis_rep
            collector.mis_emp_cycle_dist += mis_cyc
        self._pos.clear()
        self._strand.clear()
        self._len.clear()
        self._codes.clear()
        self._quals.clear()

    def report(self) -> None:
        notice("Device dense accumulation: %d reads", self.reads_accumulated)
