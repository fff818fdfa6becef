"""Alignment engines: fill Read.aln for a batch of reads.

The HostEngine runs the exact-semantics search from core.py read by read
(the behavioral oracle).  The TPU engine (ops/batch_search.py) runs the
same state machine batched across reads under jit and is differential-
tested against this one.
"""

from __future__ import annotations

import numpy as np

from ..index.builder import ReducedIndex
from .core import GapStack, bwt_cal_width, bwt_match_gap
from .opts import GapOpt, bwa_cal_maxdiff
from .seqs import Read


class HostEngine:
    """bwa_cal_sa_reg_gap equivalent (reference src/BwtMapper.cpp:63-168)."""

    def __init__(self, idx: ReducedIndex):
        self.idx = idx
        self.fms = (idx.fm_fwd, idx.fm_rev)

    def align_batch(self, reads: list[Read], opt: GapOpt) -> None:
        import copy

        local_opt = copy.copy(opt)
        max_len = max((r.len for r in reads), default=0)
        if opt.fnr > 0.0:
            local_opt.max_diff = bwa_cal_maxdiff(max_len, thres=opt.fnr)
        if local_opt.max_diff < local_opt.max_gapo:
            local_opt.max_gapo = local_opt.max_diff
        stack = GapStack(local_opt.max_diff, local_opt.max_gapo,
                         local_opt.max_gape, local_opt)
        seed_w = (np.zeros((opt.seed_len + 1, 2), dtype=np.int64),
                  np.zeros((opt.seed_len + 1, 2), dtype=np.int64))
        w = (np.zeros((max_len + 1, 2), dtype=np.int64),
             np.zeros((max_len + 1, 2), dtype=np.int64))
        for p in reads:
            p.sa = 0
            p.type = 0
            p.c1 = p.c2 = 0
            p.n_aln = 0
            p.aln = []
            if p.filtered:
                continue
            seqs = (p.seq, p.rseq)
            w[0][: p.len + 1] = 0
            w[1][: p.len + 1] = 0
            bwt_cal_width(self.fms[0], p.len, seqs[0], w[0])
            bwt_cal_width(self.fms[1], p.len, seqs[1], w[1])
            if opt.fnr > 0.0:
                local_opt.max_diff = bwa_cal_maxdiff(p.len, thres=opt.fnr)
            local_opt.seed_len = (opt.seed_len if opt.seed_len < p.len
                                  else 0x7FFFFFFF)
            if p.len > opt.seed_len:
                seed_w[0][:] = 0
                seed_w[1][:] = 0
                bwt_cal_width(self.fms[0], opt.seed_len,
                              seqs[0][p.len - opt.seed_len:], seed_w[0])
                bwt_cal_width(self.fms[1], opt.seed_len,
                              seqs[1][p.len - opt.seed_len:], seed_w[1])
            p.aln = bwt_match_gap(
                self.fms, p.len, seqs, w,
                None if p.len <= opt.seed_len else seed_w, local_opt, stack)
            p.n_aln = len(p.aln)
