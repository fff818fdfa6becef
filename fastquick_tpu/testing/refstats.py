"""Compile-and-drive harness for the reference STATISTICS engine.

Builds a shared library from the UNMODIFIED reference sources --
src/{StatCollector,RegionList,InsertSizeEstimator}.cpp plus the
vendored libStatGen (misc/bam, misc/vcf, VerifyBamID/statgen) and
libbwa -- via `refstats_shim.cpp`.  Unlike the full FASTQuick binary,
none of this needs htslib, so the actual C++ stats engine CAN run in
this image as an external oracle: feed it the same post-processed read
pairs our pipeline produced and byte-diff every product statistics
file (tests/test_ref_stats_differential.py)."""

from __future__ import annotations

import ctypes
import glob
import hashlib
import os
import subprocess
import tempfile

import numpy as np

REF = "/root/reference"
_SHIM = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "refstats_shim.cpp")

_SRC_GLOBS = [
    "src/StatCollector.cpp", "src/RegionList.cpp",
    "src/InsertSizeEstimator.cpp",
    "misc/bam/*.cpp", "misc/vcf/*.cpp",
    "VerifyBamID/statgen/*.cpp", "VerifyBamID/statgen/*.c",
]
# statgen sources to skip (none currently; PhoneHome is needed for
# link symbols but stays disabled at runtime, statgen/PhoneHome.h:25)
_EXCLUDE: set[str] = set()

_LIBBWA_SOURCES = [
    "bwt.c", "bwtgap.c", "bwtaln.c", "bwtmisc.c", "bwtio.c", "is.c",
    "utils.c", "bwase.c", "bwape.c", "stdaln.c", "bntseq.c",
    "bwaseqio.c", "kstring.c", "bamlite.c", "cs2nt.c", "QSufSort.c",
    "bwt_gen.c",
]

_lib = None


def available() -> bool:
    return os.path.isfile(os.path.join(REF, "src", "StatCollector.cpp"))


def _so_path() -> str:
    tag = hashlib.sha256(
        (REF + "|" + repr(sorted(_EXCLUDE)) + "|"
         + open(_SHIM, "rb").read().decode()).encode()
    ).hexdigest()[:16]
    return os.path.join(tempfile.gettempdir(), f"fq_refstats_{tag}.so")


def _build() -> str:
    so = _so_path()
    if os.path.exists(so):
        return so
    srcs = []
    for g in _SRC_GLOBS:
        for p in sorted(glob.glob(os.path.join(REF, g))):
            if os.path.basename(p) in _EXCLUDE:
                continue
            srcs.append(p)
    srcs += [os.path.join(REF, "libbwa", s) for s in _LIBBWA_SOURCES]
    srcs.append(_SHIM)
    inc = [os.path.join(REF, d) for d in
           ("src", "misc", "misc/bam", "misc/vcf", "libbwa",
            "VerifyBamID/statgen")]
    cmd = (["g++", "-O1", "-fPIC", "-shared", "-w", "-x", "c++",
            "-D__STDC_LIMIT_MACROS"]
           + [a for d in inc for a in ("-I", d)]
           + ["-o", so + ".tmp"] + srcs + ["-lz", "-lm", "-lpthread"])
    r = subprocess.run(cmd, capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError("refstats build failed:\n" + r.stderr[-4000:])
    os.replace(so + ".tmp", so)
    return so


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(_build())
    c = ctypes
    lib.rs_run.restype = c.c_int32
    lib.rs_run.argtypes = (
        [c.c_char_p] * 3 + [c.c_int32] * 5 + [c.c_int64] * 2
        + [c.c_int32] * 2
        + [c.c_void_p] * 5 + [c.c_char_p] + [c.c_void_p] * 4
        + [c.c_char_p] + [c.c_void_p]
        + [c.c_char_p] * 2 + [c.c_void_p])
    _lib = lib
    return lib


NF = 12


def run_reference_collector(ref_path: str, out_prefix: str,
                            pairs: list, opt, fsc,
                            genome_size: int, n_size: int) -> None:
    """Drive the compiled reference StatCollector over post-processed
    read pairs (our align driver's Read objects after refine/MD) and
    write every product statistics file under out_prefix."""
    lib = get_lib()
    n = len(pairs)
    ends = []
    for p, q in pairs:
        ends.append(p)
        ends.append(q)
    stride = max((e.full_len for e in ends if e is not None), default=1)
    present = np.zeros(2 * n, np.int8)
    ifields = np.zeros((2 * n, NF), np.int32)
    pos = np.zeros(2 * n, np.int64)
    seqs = np.zeros((2 * n, stride), np.uint8)
    quals = np.zeros((2 * n, stride), np.uint8)
    mds, names = [], []
    cig_pairs = []
    cig_off = np.zeros(2 * n, np.int64)
    cig_cnt = np.zeros(2 * n, np.int32)
    md_off = np.zeros(2 * n + 1, np.int64)
    name_off = np.zeros(2 * n + 1, np.int64)
    for e, s in enumerate(ends):
        if s is None:
            md_off[e + 1] = md_off[e]
            name_off[e + 1] = name_off[e]
            continue
        # filtered ends ride through as NO_MATCH bwa_seq_t (the driver
        # passes the objects, and ProcessPairStatus reads their flags)
        present[e] = 1
        f = ifields[e]
        f[0] = s.type
        f[1] = s.strand
        f[2] = getattr(s, "mapQ", 0) or 0
        f[3] = getattr(s, "seQ", 0) or 0
        f[4] = s.len
        f[5] = s.full_len
        f[6] = s.clip_len
        f[7] = getattr(s, "extra_flag", 0)
        f[8] = getattr(s, "nm", 0) or 0
        f[9] = s.n_mm
        f[10] = s.n_gapo
        f[11] = s.n_gape
        pos[e] = s.pos
        seqs[e, :s.full_len] = s.seq[:s.full_len]
        quals[e, :s.full_len] = s.qual[:s.full_len]
        md = s.md or ""
        mds.append(md)
        md_off[e + 1] = md_off[e] + len(md)
        names.append(s.name or "")
        name_off[e + 1] = name_off[e] + len(s.name or "")
        cig_off[e] = len(cig_pairs)
        if s.cigar:
            cig_cnt[e] = len(s.cigar)
            cig_pairs.extend(s.cigar)
    md_buf = "".join(mds).encode()
    name_buf = "".join(names).encode()
    cig = (np.array(cig_pairs, np.int32).reshape(-1, 2)
           if cig_pairs else np.zeros((0, 2), np.int32))
    fsc_nums = np.array(
        [fsc.num_read, fsc.num_base, getattr(fsc, "hash_filtered", 0),
         fsc.total_filtered, fsc.bwa_unmapped, fsc.total_mapq,
         fsc.total_retained], np.int64)

    def vp(a):
        return a.ctypes.data_as(ctypes.c_void_p)

    rc = lib.rs_run(
        ref_path.encode(), out_prefix.encode(),
        (out_prefix + ".InsertSizeTable").encode(),
        opt.flank_len, opt.flank_long_len, opt.read_len,
        opt.num_variant_short, opt.num_variant_long,
        genome_size, n_size, n, stride,
        vp(present), vp(np.ascontiguousarray(ifields)), vp(pos),
        vp(np.ascontiguousarray(seqs)), vp(np.ascontiguousarray(quals)),
        ctypes.c_char_p(md_buf), vp(md_off),
        vp(np.ascontiguousarray(cig)), vp(cig_off), vp(cig_cnt),
        ctypes.c_char_p(name_buf), vp(name_off),
        fsc.file_name1.encode(), fsc.file_name2.encode(), vp(fsc_nums))
    if rc != 0:
        raise RuntimeError(f"rs_run failed rc={rc}")
