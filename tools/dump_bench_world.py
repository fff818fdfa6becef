#!/usr/bin/env python
"""Dump the bench.py synthetic world (index arrays + read batch) to a
flat binary file for the native profiling harness (tools/prof_aligner.cpp).

Format: little-endian; int64 n, then per direction (fwd, rev):
  int32 primary, int32 L2[4], int64 n_words, uint32 words[],
  int64 n_occ, int32 occ[], int64 n_sa, int32 sa[]
then: int32 B, int32 L, uint8 seqs[B*2*L], int32 lens[B], int32 max_diffs[B].
"""
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from fastquick_tpu.align.opts import GapOpt, bwa_cal_maxdiff


def main():
    n_bp = int(os.environ.get("FQ_BENCH_REF_BP", 2_000_000))
    n_reads = int(os.environ.get("FQ_BENCH_READS", 32768))
    read_len = int(os.environ.get("FQ_BENCH_READ_LEN", 151))
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fq_bench_world.bin"

    idx = bench.build_index(n_bp)
    reads = bench.make_reads(idx, n_reads, read_len, seed=1)
    opt = GapOpt()

    L = max(r.len for r in reads)
    B = len(reads)
    seqs = np.full((B, 2, L), 4, dtype=np.uint8)
    lens = np.zeros(B, dtype=np.int32)
    mds = np.zeros(B, dtype=np.int32)
    for i, r in enumerate(reads):
        seqs[i, 0, :r.len] = r.seq[:r.len]
        seqs[i, 1, :r.len] = r.rseq[:r.len]
        lens[i] = r.len
        mds[i] = (bwa_cal_maxdiff(r.len, thres=opt.fnr) if opt.fnr > 0
                  else opt.max_diff)

    with open(out, "wb") as f:
        f.write(struct.pack("<q", len(idx.text)))
        for fm in (idx.fm_fwd, idx.fm_rev):
            words = np.ascontiguousarray(
                np.concatenate([fm.bwt_words, np.zeros(8, np.uint32)]))
            occ = np.ascontiguousarray(fm.occ.astype(np.int32))
            sa = np.ascontiguousarray(fm.sa.astype(np.int32))
            f.write(struct.pack("<i", int(fm.primary)))
            f.write(np.ascontiguousarray(
                (fm.C[:4] - 1).astype(np.int32)).tobytes())
            f.write(struct.pack("<q", words.size))
            f.write(words.tobytes())
            f.write(struct.pack("<q", occ.size))
            f.write(occ.tobytes())
            f.write(struct.pack("<q", sa.size))
            f.write(sa.tobytes())
        f.write(struct.pack("<ii", B, L))
        f.write(seqs.tobytes())
        f.write(lens.tobytes())
        f.write(mds.tobytes())
    print(f"wrote {out}: n={len(idx.text)} B={B} L={L}")


if __name__ == "__main__":
    main()
