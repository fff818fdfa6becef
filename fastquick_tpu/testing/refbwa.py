"""ctypes wrapper over the compiled reference libbwa (differential oracle).

Builds a shared library at first use from the UNMODIFIED reference
sources (`REF_LIBBWA`, default /root/reference/libbwa) plus the original
shim `refbwa_shim.c` that lives next to this module.  Nothing from the
reference tree is copied into this repository; the reference is treated
as an external read-only dependency of the test suite, exactly like a
system library.

This closes the round-1 "self-referential goldens" hole: the rebuilt
engines (align/core.py host oracle, native/aligner.cpp, ops/
batch_search.py) are differential-tested read-by-read against the
actual compiled C of libbwa/bwtgap.c, bwase.c, bwape.c and stdaln.c.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

REF_LIBBWA = os.environ.get("FQ_REF_LIBBWA", "/root/reference/libbwa")
_SHIM = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "refbwa_shim.c")

# reference sources the shim needs (bwt build, search, SE post, DP, PE)
_SOURCES = [
    "bwt.c", "bwtgap.c", "bwtaln.c", "bwtmisc.c", "bwtio.c", "is.c",
    "utils.c", "bwase.c", "bwape.c", "stdaln.c", "bntseq.c", "bwaseqio.c",
    "kstring.c", "bamlite.c", "cs2nt.c", "QSufSort.c", "bwt_gen.c",
]

_lib = None
_build_error: str | None = None


def available() -> bool:
    return os.path.isdir(REF_LIBBWA) and os.path.isfile(
        os.path.join(REF_LIBBWA, "bwtgap.c"))


def _so_path() -> str:
    tag = hashlib.sha256(
        (REF_LIBBWA + "|" + open(_SHIM, "rb").read().decode()).encode()
    ).hexdigest()[:16]
    return os.path.join(tempfile.gettempdir(), f"fq_refbwa_{tag}.so")


def _build() -> str:
    so = _so_path()
    if os.path.exists(so):
        return so
    srcs = [os.path.join(REF_LIBBWA, s) for s in _SOURCES] + [_SHIM]
    # the reference builds libbwa as C++ (-x c++, libbwa/CMakeLists.txt)
    statgen_inc = os.path.join(os.path.dirname(REF_LIBBWA),
                               "VerifyBamID", "statgen")
    cmd = (["g++", "-O2", "-fPIC", "-shared", "-w", "-x", "c++",
            "-I", REF_LIBBWA, "-I", statgen_inc, "-o", so + ".tmp"]
           + srcs + ["-lz", "-lm", "-lpthread"])
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(so + ".tmp", so)
    return so


def get_lib():
    """Compiled reference library handle (or raises)."""
    global _lib, _build_error
    if _lib is not None:
        return _lib
    if _build_error is not None:
        raise RuntimeError(_build_error)
    try:
        lib = ctypes.CDLL(_build())
    except Exception as e:  # record once; tests skip on it
        _build_error = f"refbwa build failed: {e}"
        raise RuntimeError(_build_error) from e
    c = ctypes
    lib.rb_build.restype = c.c_void_p
    lib.rb_build.argtypes = [c.c_void_p, c.c_int32]
    lib.rb_destroy.argtypes = [c.c_void_p]
    lib.rb_primary.restype = c.c_int32
    lib.rb_primary.argtypes = [c.c_void_p, c.c_int32]
    lib.rb_sa.restype = c.c_int32
    lib.rb_sa.argtypes = [c.c_void_p, c.c_int32, c.c_int32]
    lib.rb_occ.restype = c.c_int32
    lib.rb_occ.argtypes = [c.c_void_p, c.c_int32, c.c_int32, c.c_int32]
    lib.rb_cal_width.argtypes = [c.c_void_p, c.c_int32, c.c_int32,
                                 c.c_void_p, c.c_void_p, c.c_void_p]
    lib.rb_match_gap.restype = c.c_int32
    lib.rb_match_gap.argtypes = [c.c_void_p] + [c.c_int32] * 1 + \
        [c.c_void_p] * 2 + [c.c_int32] * 12 + [c.c_void_p, c.c_int32]
    lib.rb_match_gap_batch.restype = c.c_int64
    lib.rb_match_gap_batch.argtypes = [c.c_void_p, c.c_int32, c.c_int32] + \
        [c.c_void_p] * 4 + [c.c_int32] * 10 + [c.c_void_p]
    lib.rb_aln2seq.restype = c.c_int32
    lib.rb_aln2seq.argtypes = [c.c_int32, c.c_void_p, c.c_int64, c.c_int32,
                               c.c_int32, c.c_int32, c.c_int32, c.c_void_p,
                               c.c_void_p, c.c_int32]
    lib.rb_aln_global.restype = c.c_int32
    lib.rb_aln_global.argtypes = [c.c_void_p, c.c_int32, c.c_void_p,
                                  c.c_int32, c.c_int32, c.c_void_p,
                                  c.c_void_p, c.c_int32]
    lib.rb_aln_local.restype = c.c_int32
    lib.rb_aln_local.argtypes = [c.c_void_p, c.c_int32, c.c_void_p,
                                 c.c_int32, c.c_int32] + [c.c_void_p] * 4
    lib.rb_se_sam.restype = c.c_int32
    lib.rb_se_sam.argtypes = [c.c_void_p, c.c_void_p, c.c_int32,
                              c.c_int64, c.c_int32, c.c_int32] + \
        [c.c_void_p] * 8 + [c.c_int32] * 3
    lib.rb_infer_isize.restype = c.c_int32
    lib.rb_infer_isize.argtypes = [c.c_int32] + [c.c_void_p] * 10 + \
        [c.c_double, c.c_int64, c.c_void_p]
    lib.rb_pairing.restype = c.c_int32
    lib.rb_pairing.argtypes = [c.c_void_p, c.c_int32, c.c_void_p,
                               c.c_int32, c.c_void_p, c.c_int32,
                               c.c_void_p, c.c_int32, c.c_int32,
                               c.c_void_p]
    _lib = lib
    return lib


def _vp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


class RefBwa:
    """In-memory forward+reverse reference FM index pair."""

    def __init__(self, text: np.ndarray):
        self.lib = get_lib()
        t = np.ascontiguousarray(text, dtype=np.uint8)
        self._t = t
        self.h = self.lib.rb_build(_vp(t), len(t))
        self.n = len(t)

    def __del__(self):
        if getattr(self, "h", None):
            self.lib.rb_destroy(self.h)
            self.h = None

    def primary(self, which: int) -> int:
        return int(self.lib.rb_primary(self.h, which))

    def sa(self, which: int, row: int) -> int:
        return int(self.lib.rb_sa(self.h, which, row))

    def occ(self, which: int, k: int, c: int) -> int:
        return int(self.lib.rb_occ(self.h, which, k, c))

    def cal_width(self, which: int, seq: np.ndarray):
        seq = np.ascontiguousarray(seq, dtype=np.uint8)
        n = len(seq)
        w = np.zeros(n + 1, dtype=np.int64)
        bid = np.zeros(n + 1, dtype=np.int32)
        self.lib.rb_cal_width(self.h, which, n, _vp(seq), _vp(w), _vp(bid))
        return w, bid

    def match_gap(self, seq0: np.ndarray, seq1: np.ndarray, opt,
                  max_diff: int, cap: int = 4096) -> np.ndarray:
        """Run bwt_match_gap on one read; rows of
        [n_mm, n_gapo, n_gape, a, k, l, score]."""
        s0 = np.ascontiguousarray(seq0, dtype=np.uint8)
        s1 = np.ascontiguousarray(seq1, dtype=np.uint8)
        out = np.zeros((cap, 7), dtype=np.int32)
        n = self.lib.rb_match_gap(
            self.h, len(s0), _vp(s0), _vp(s1), opt.s_mm, opt.s_gapo,
            opt.s_gape, max_diff, opt.max_gapo, opt.max_gape,
            opt.indel_end_skip, opt.max_del_occ, opt.max_entries,
            opt.max_top2, opt.seed_len, opt.max_seed_diff, _vp(out), cap)
        return out[:n].copy()

    def match_gap_batch(self, seqs0: np.ndarray, seqs1: np.ndarray,
                        lens: np.ndarray, max_diffs: np.ndarray,
                        opt) -> tuple[int, np.ndarray]:
        """Timing-grade batch loop (bwa_cal_sa_reg_gap shape: one stack +
        width buffers reused across reads).  seqs0/seqs1: (N, stride)
        uint8 padded code arrays.  Releases the GIL (plain ctypes call),
        so parallel threads measure real multi-core reference throughput.
        Returns (total SA rows hit, per-read n_aln)."""
        s0 = np.ascontiguousarray(seqs0, dtype=np.uint8)
        s1 = np.ascontiguousarray(seqs1, dtype=np.uint8)
        ln = np.ascontiguousarray(lens, dtype=np.int32)
        md = np.ascontiguousarray(max_diffs, dtype=np.int32)
        n_aln = np.zeros(len(ln), dtype=np.int32)
        total = self.lib.rb_match_gap_batch(
            self.h, len(ln), s0.shape[1], _vp(s0), _vp(s1), _vp(ln),
            _vp(md), opt.s_mm, opt.s_gapo, opt.s_gape, opt.max_gapo,
            opt.max_gape, opt.indel_end_skip, opt.max_del_occ,
            opt.max_entries, opt.max_top2, opt.seed_len,
            opt.max_seed_diff, _vp(n_aln))
        return int(total), n_aln

    def se_sam(self, seed: int, seqs0: np.ndarray, seqs1: np.ndarray,
               quals: np.ndarray, lens: np.ndarray, max_diffs: np.ndarray,
               aln_list: list[np.ndarray], n_multi: int = 3,
               mode: int = 3, max_top2: int = 30) -> list[str]:
        """Drive the reference SE post-processing chain (aln2seq ->
        cal_pac_pos -> refine_gapped incl. MD/NM -> print_sam1) over a
        batch and return the SAM lines the actual C printed.  seqs0/
        seqs1: (N, stride) padded reversed / revcomp codes; quals:
        (N, stride) uint8 ASCII (phred+33); aln_list: per-read
        rb_match_gap row arrays.  Reads print as r0..r{N-1}."""
        import os
        import tempfile

        s0 = np.ascontiguousarray(seqs0, dtype=np.uint8)
        s1 = np.ascontiguousarray(seqs1, dtype=np.uint8)
        q = np.ascontiguousarray(quals, dtype=np.uint8)
        ln = np.ascontiguousarray(lens, dtype=np.int32)
        md = np.ascontiguousarray(max_diffs, dtype=np.int32)
        cnt = np.array([len(a) for a in aln_list], dtype=np.int32)
        off = np.zeros(len(aln_list), dtype=np.int32)
        off[1:] = np.cumsum(cnt[:-1])
        rows = (np.concatenate([np.asarray(a, np.int32).reshape(-1, 7)
                                for a in aln_list])
                if cnt.sum() else np.zeros((0, 7), np.int32))
        rows = np.ascontiguousarray(rows)
        # capture fd 1 (bwa_print_sam1 printf's to stdout)
        import sys

        sys.stdout.flush()
        saved = os.dup(1)
        with tempfile.TemporaryFile() as tf:
            os.dup2(tf.fileno(), 1)
            try:
                self.lib.rb_se_sam(
                    self.h, _vp(self._t), self.n, seed, len(ln),
                    s0.shape[1], _vp(s0), _vp(s1), _vp(q), _vp(ln),
                    _vp(md), _vp(off), _vp(cnt), _vp(rows), n_multi,
                    mode, max_top2)
            finally:
                os.dup2(saved, 1)
                os.close(saved)
            tf.seek(0)
            text = tf.read().decode()
        return [l for l in text.splitlines() if l]

    def aln2seq(self, aln_rows: np.ndarray, seed: int, set_main: int,
                n_multi: int, length: int, max_diff: int,
                multi_cap: int = 64):
        rows = np.ascontiguousarray(aln_rows, dtype=np.int32)
        main = np.zeros(9, dtype=np.int64)
        multi = np.zeros((multi_cap, 5), dtype=np.int64)
        nm = self.lib.rb_aln2seq(len(rows), _vp(rows), seed, set_main,
                                 n_multi, length, max_diff, _vp(main),
                                 _vp(multi), multi_cap)
        return main, multi[:nm].copy()


def aln_global(ref: np.ndarray, read: np.ndarray, band: int):
    """Reference aln_global_core; returns (score, [(op, len)...]) with
    ops in bwa_cigar 2-bit convention (0=M,1=I,2=D,3=S)."""
    lib = get_lib()
    r = np.ascontiguousarray(ref, dtype=np.uint8)
    q = np.ascontiguousarray(read, dtype=np.uint8)
    cig = np.zeros(256, dtype=np.uint16)
    nc = np.zeros(1, dtype=np.int32)
    score = lib.rb_aln_global(_vp(r), len(r), _vp(q), len(q), band,
                              _vp(cig), _vp(nc), 256)
    ops = [(int(x) >> 14, int(x) & 0x3FFF) for x in cig[: int(nc[0])]]
    return int(score), ops


def aln_local(ref: np.ndarray, read: np.ndarray, band: int):
    lib = get_lib()
    r = np.ascontiguousarray(ref, dtype=np.uint8)
    q = np.ascontiguousarray(read, dtype=np.uint8)
    o = [np.zeros(1, dtype=np.int32) for _ in range(4)]
    score = lib.rb_aln_local(_vp(r), len(r), _vp(q), len(q), band,
                             _vp(o[0]), _vp(o[1]), _vp(o[2]), _vp(o[3]))
    return int(score), (int(o[0][0]), int(o[1][0]), int(o[2][0]),
                        int(o[3][0]))


def pairing(aln0: np.ndarray, aln1: np.ndarray, arr: np.ndarray,
            p_fields: np.ndarray, s_mm: int, max_isize: int,
            ii6: np.ndarray):
    """Reference pairing() (bwape.c:119).  p_fields: (2, 10) int64 rows
    [pos, strand, mapQ, seQ, extra_flag, n_mm, n_gapo, n_gape, score,
    full_len], updated in place.  Returns (cnt_chg, p_fields)."""
    lib = get_lib()
    a0 = np.ascontiguousarray(aln0, dtype=np.int32)
    a1 = np.ascontiguousarray(aln1, dtype=np.int32)
    ar = np.ascontiguousarray(arr, dtype=np.uint64)
    pf = np.ascontiguousarray(p_fields, dtype=np.int64).copy()
    ii = np.ascontiguousarray(ii6, dtype=np.float64)
    cnt = lib.rb_pairing(_vp(a0), len(a0), _vp(a1), len(a1), _vp(ar),
                         len(ar), _vp(pf), s_mm, max_isize, _vp(ii))
    return int(cnt), pf


def infer_isize(pairs: dict, ap_prior: float, L: int):
    """Reference infer_isize over dict of per-end arrays (pos, strand,
    len, mapq, type); returns (ret, avg, std, low, high, high_bayesian,
    ap_prior)."""
    lib = get_lib()
    n = len(pairs["pos0"])
    a = {k: np.ascontiguousarray(v, dtype=np.int64 if k.startswith("pos")
                                 else np.int32)
         for k, v in pairs.items()}
    out = np.zeros(6, dtype=np.float64)
    ret = lib.rb_infer_isize(
        n, _vp(a["pos0"]), _vp(a["pos1"]), _vp(a["strand0"]),
        _vp(a["strand1"]), _vp(a["len0"]), _vp(a["len1"]), _vp(a["mapq0"]),
        _vp(a["mapq1"]), _vp(a["type0"]), _vp(a["type1"]),
        ap_prior, L, _vp(out))
    return (int(ret), *out.tolist())
