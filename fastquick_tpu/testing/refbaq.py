"""ctypes wrapper over the compiled reference kprobaln.c (BAQ oracle).

`kpa_glocal` (VerifyBamID/samtools/kprobaln.c:72-247) is the banded
glocal profile-HMM behind samtools BAQ; the reference's mpileup applies
it to every BAM read (bam_md.c:212-327 via SimplePileupViewer.cpp:255).
The file is stdlib-only C, so unlike the htslib-dependent bam_md.c it
compiles in this image; we build it UNMODIFIED from /root/reference at
test time (nothing vendored) and diff `pop/baq.py`'s reimplementation
bit-for-bit: identical `state` and `q` arrays on randomized inputs.

The bam_md.c glue (band/window from the CIGAR footprint, extended-BAQ
smoothing) cannot be compiled (htslib headers); the test suite instead
replicates that glue from the oracle's outputs and diffs the final
capped quals (tests/test_ref_baq_differential.py).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

REF_KPROBALN = os.environ.get(
    "FQ_REF_KPROBALN", "/root/reference/VerifyBamID/samtools/kprobaln.c")

_lib = None
_build_error: str | None = None


def available() -> bool:
    return os.path.isfile(REF_KPROBALN)


class _KpaPar(ctypes.Structure):
    _fields_ = [("d", ctypes.c_float), ("e", ctypes.c_float),
                ("bw", ctypes.c_int)]


def _so_path() -> str:
    tag = hashlib.sha256(open(REF_KPROBALN, "rb").read()).hexdigest()[:16]
    return os.path.join(tempfile.gettempdir(), f"fq_refbaq_{tag}.so")


def _build() -> str:
    so = _so_path()
    if os.path.exists(so):
        return so
    # samtools builds kprobaln.c as C (CMakeLists.txt); -O2 like the
    # reference release build.  No sources are copied or modified.
    cmd = ["gcc", "-O2", "-fPIC", "-shared", "-w", "-o", so + ".tmp",
           REF_KPROBALN, "-lm"]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(so + ".tmp", so)
    return so


def get_lib():
    global _lib, _build_error
    if _lib is not None:
        return _lib
    if _build_error is not None:
        raise RuntimeError(_build_error)
    try:
        lib = ctypes.CDLL(_build())
    except Exception as e:
        _build_error = f"refbaq build failed: {e}"
        raise RuntimeError(_build_error) from e
    lib.kpa_glocal.restype = ctypes.c_int
    lib.kpa_glocal.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(_KpaPar),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_uint8)]
    _lib = lib
    return lib


def kpa_glocal(ref: np.ndarray, query: np.ndarray, iqual: np.ndarray,
               bw: int, d: float = 0.001, e: float = 0.1
               ) -> tuple[np.ndarray, np.ndarray, int]:
    """Run the COMPILED reference kpa_glocal.  Returns (state, q, Pr)
    with the same conventions as pop/baq.kpa_glocal."""
    lib = get_lib()
    ref = np.ascontiguousarray(ref, dtype=np.uint8)
    query = np.ascontiguousarray(query, dtype=np.uint8)
    iqual = np.ascontiguousarray(iqual, dtype=np.uint8)
    l_ref, l_query = len(ref), len(query)
    state = np.zeros(max(l_query, 1), dtype=np.int32)
    q = np.zeros(max(l_query, 1), dtype=np.uint8)
    par = _KpaPar(d=d, e=e, bw=bw)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    pr = lib.kpa_glocal(
        ref.ctypes.data_as(u8p), l_ref,
        query.ctypes.data_as(u8p), l_query,
        iqual.ctypes.data_as(u8p), ctypes.byref(par),
        state.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        q.ctypes.data_as(u8p))
    return (state[:l_query].astype(np.int64),
            q[:l_query].astype(np.int64), int(pr))
