"""Scaling-efficiency harness: data-parallel QC step at 1..N devices.

Measures the sharded QC step (parallel/mesh.py) throughput as the mesh
grows, reporting efficiency vs linear scaling -- the BASELINE.md target is
>= 80% from 1 chip to N.  On this single-chip session the harness runs
functionally on the virtual CPU mesh (tests/test_multichip.py asserts
result equality); on a real pod slice the same entry point produces the
honest numbers.
"""

from __future__ import annotations

import time

import numpy as np


def measure_scaling(device_counts: list[int] | None = None,
                    reads_per_device: int = 4096, read_len: int = 151,
                    n_bp: int = 1 << 20, repeats: int = 3) -> list[dict]:
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..index.fmindex import FMIndex
    from ..ops.fm import DeviceFM
    from .mesh import make_mesh, make_sharded_qc_step

    rng = np.random.default_rng(0)
    text = rng.integers(0, 4, n_bp).astype(np.uint8)
    fm_f = FMIndex.build(text)
    fm_r = FMIndex.build(text[::-1].copy())
    dev = DeviceFM.build(fm_f, fm_r)
    fm_arrays = {"words": dev.words, "occ": dev.occ, "sa": dev.sa,
                 "L2": dev.L2, "primary": dev.primary}

    avail = len(jax.devices())
    if device_counts is None:
        device_counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= avail]

    results = []
    base_rps = None
    for nd in device_counts:
        mesh = make_mesh(nd)
        step = make_sharded_qc_step(mesh, fm_arrays, dev.n)
        B = reads_per_device * nd
        seqs = np.zeros((B, read_len), dtype=np.int32)
        for b in range(B):
            s = int(rng.integers(0, n_bp - read_len))
            seqs[b] = text[s:s + read_len]
        rseqs = (3 - seqs)[:, ::-1].copy()
        # stored convention: seqs reversed, rseqs revcomp
        seqs_rev = seqs[:, ::-1].copy()
        lens = np.full(B, read_len, dtype=np.int32)
        quals = rng.integers(20, 40, (B, read_len)).astype(np.int32)
        sh1 = NamedSharding(mesh, P("dp"))
        sh2 = NamedSharding(mesh, P("dp", None))
        args = (jax.device_put(jnp.asarray(seqs_rev), sh2),
                jax.device_put(jnp.asarray(rseqs), sh2),
                jax.device_put(jnp.asarray(lens), sh1),
                jax.device_put(jnp.asarray(quals), sh2))
        out = step(*args)  # compile + warm
        jax.block_until_ready(out["depth"])
        best = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            out = step(*args)
            jax.block_until_ready(out["depth"])
            best = min(best, time.time() - t0)
        rps = B / best
        if base_rps is None:
            base_rps = rps / nd * device_counts[0]
        eff = rps / (base_rps / device_counts[0] * nd)
        results.append({"devices": nd, "reads_per_sec": round(rps, 1),
                        "efficiency": round(eff, 3),
                        "n_mapped": int(out["n_mapped"])})
    return results


if __name__ == "__main__":
    import json
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    for r in measure_scaling():
        print(json.dumps(r))
