"""Compile-and-drive harness for the reference CONTAMINATION estimator.

The full VerifyBamID2 cannot build here (SimplePileupViewer's BAM path
needs htslib), but the estimator itself -- ReadSVDMatrix,
ComputeMixLLKs, the Amoeba optimization ladder, CalculateLLK0 -- only
needs the text-pileup interface, so this harness compiles the
UNMODIFIED ContaminationEstimator.cpp + MathGenMin/MathGold/Random +
statgen against a faithful stub SimplePileupViewer.h (refvb2_stub/; it
replicates the reference's trivial ReadPileup text parsing, quirks
included) and drives it exactly as vb2Main.cpp does.  The quoted
include of SimplePileupViewer.h resolves by including-file directory,
so ContaminationEstimator.{h,cpp} are copied into the build sandbox
next to the stub -- nothing lands in the repository.
"""

from __future__ import annotations

import ctypes
import glob
import hashlib
import os
import shutil
import subprocess
import tempfile

import numpy as np

REF = "/root/reference"
VB2 = os.path.join(REF, "VerifyBamID")
_HERE = os.path.dirname(os.path.abspath(__file__))
_SHIM = os.path.join(_HERE, "refvb2_shim.cpp")
_STUB = os.path.join(_HERE, "refvb2_stub", "SimplePileupViewer.h")

_lib = None


def available() -> bool:
    return os.path.isfile(os.path.join(VB2, "ContaminationEstimator.cpp"))


def _so_path() -> str:
    tag = hashlib.sha256(
        (REF + "|" + open(_SHIM).read() + "|" + open(_STUB).read()).encode()
    ).hexdigest()[:16]
    return os.path.join(tempfile.gettempdir(), f"fq_refvb2_{tag}.so")


def _build() -> str:
    so = _so_path()
    if os.path.exists(so):
        return so
    sandbox = tempfile.mkdtemp(prefix="fq_refvb2_build_")
    for f in ("ContaminationEstimator.cpp", "ContaminationEstimator.h"):
        shutil.copy(os.path.join(VB2, f), sandbox)
    shutil.copy(_STUB, sandbox)
    shutil.copy(_SHIM, sandbox)
    srcs = [os.path.join(sandbox, "ContaminationEstimator.cpp"),
            os.path.join(sandbox, "refvb2_shim.cpp")]
    srcs += [os.path.join(VB2, s)
             for s in ("MathGenMin.cpp", "MathGold.cpp", "Random.cpp")]
    srcs += sorted(glob.glob(os.path.join(VB2, "statgen", "*.cpp")))
    srcs += sorted(glob.glob(os.path.join(VB2, "statgen", "*.c")))
    inc = [sandbox, VB2, os.path.join(VB2, "statgen")]
    cmd = (["g++", "-O1", "-fPIC", "-shared", "-w", "-x", "c++",
            "-fopenmp"]
           + [a for d in inc for a in ("-I", d)]
           + ["-o", so + ".tmp"] + srcs + ["-lz", "-lm", "-lpthread"])
    r = subprocess.run(cmd, capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError("refvb2 build failed:\n" + r.stderr[-4000:])
    os.replace(so + ".tmp", so)
    return so


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(_build())
    c = ctypes
    lib.rv_run.restype = c.c_int
    lib.rv_run.argtypes = [c.c_char_p] * 6 + [c.c_int] * 3 \
        + [c.c_double, c.c_void_p]
    _lib = lib
    return lib


def run_reference_estimator(svd_prefix: str, bed: str, pileup: str,
                            out_prefix: str, n_pc: int = 2,
                            heter: bool = True, nthread: int = 1,
                            epsilon: float = 1e-10) -> dict:
    """Drive the compiled reference estimator; returns alpha/llks/PCs."""
    lib = get_lib()
    out = np.zeros(5 + 2 * n_pc, np.float64)
    rc = lib.rv_run(
        (svd_prefix + ".UD").encode(), (svd_prefix + ".V").encode(),
        (svd_prefix + ".mu").encode(), bed.encode(), pileup.encode(),
        out_prefix.encode(), n_pc, 1 if heter else 0, nthread, epsilon,
        out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise RuntimeError(f"rv_run failed rc={rc}")
    return {"alpha": float(out[0]), "llk1": float(out[1]),
            "llk0": float(out[2]), "n_marker": int(out[3]),
            "avg_depth": float(out[4]),
            "pc": out[5:5 + n_pc].tolist(),
            "pc2": out[5 + n_pc:5 + 2 * n_pc].tolist()}
