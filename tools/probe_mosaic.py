"""Probe Mosaic (Pallas TPU) features needed by the search inner-loop
kernel (ops/search_pallas.py plan):

 1. scalar read of a VMEM ref element with a traced (fori_loop) index
 2. dynamic sublane-slice load from a VMEM table + dynamic store
 3. VMEM -> SMEM async copy (index vector for the scalar gather loop)
 4. lax.population_count on int32
 5. in-kernel transpose (B, 16) -> (16, B)
 6. VMEM capacity: how big a scratch compiles on this chip

Run on the real chip: `python tools/probe_mosaic.py [probe...]`.
Each probe compiles + runs one tiny kernel and prints OK/FAIL + time.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 256
NT = 64  # table rows


def timed(name, fn):
    try:
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        t1 = time.perf_counter()
        out2 = fn()
        jax.block_until_ready(out2)
        t2 = time.perf_counter()
        print(f"{name}: OK compile+run {t1-t0:.2f}s run2 {(t2-t1)*1e3:.2f}ms")
        return np.asarray(out)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:400]}")
        return None


def probe_scalar_gather():
    """fori_loop over lanes: idx from SMEM scratch (copied from VMEM),
    dynamic sublane row load from table, dynamic sublane row store."""
    def kernel(idx_ref, tab_ref, out_ref, smem_idx, sem):
        cp = pltpu.make_async_copy(idx_ref, smem_idx, sem)
        cp.start()
        cp.wait()

        def body(b, _):
            i = smem_idx[b]
            out_ref[pl.ds(b, 1), :] = tab_ref[pl.ds(i, 1), :]
            return 0

        jax.lax.fori_loop(0, B, body, 0)

    idx = jnp.asarray(np.random.randint(0, NT, (B,)), jnp.int32)
    tab = jnp.asarray(np.arange(NT * 16).reshape(NT, 16), jnp.int32)

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 16), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((B,), jnp.int32),
                        pltpu.SemaphoreType.DMA(())],
    )
    out = timed("scalar_gather(smem-idx)", lambda: jax.jit(f)(idx, tab))
    if out is not None:
        ref = np.asarray(tab)[np.asarray(idx)]
        print("   values:", "MATCH" if (out == ref).all() else "MISMATCH")


def probe_vmem_scalar_read():
    """Scalar element read straight from a VMEM ref with traced index."""
    def kernel(idx_ref, tab_ref, out_ref):
        def body(b, _):
            i = idx_ref[b, 0]
            out_ref[pl.ds(b, 1), :] = tab_ref[pl.ds(i, 1), :]
            return 0

        jax.lax.fori_loop(0, B, body, 0)

    idx = jnp.asarray(np.random.randint(0, NT, (B, 1)), jnp.int32)
    tab = jnp.asarray(np.arange(NT * 16).reshape(NT, 16), jnp.int32)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 16), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = timed("vmem_scalar_read", lambda: jax.jit(f)(idx, tab))
    if out is not None:
        ref = np.asarray(tab)[np.asarray(idx)[:, 0]]
        print("   values:", "MATCH" if (out == ref).all() else "MISMATCH")


def probe_popcount():
    def kernel(x_ref, out_ref):
        out_ref[:] = jax.lax.population_count(x_ref[:])

    x = jnp.asarray(np.random.randint(0, 2**31, (8, 128)), jnp.int32)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = timed("popcount", lambda: jax.jit(f)(x))
    if out is not None:
        ref = np.vectorize(lambda v: bin(int(v) & 0xFFFFFFFF).count("1"))(
            np.asarray(x).astype(np.int64))
        print("   values:", "MATCH" if (out == ref).all() else "MISMATCH")


def probe_transpose():
    def kernel(x_ref, out_ref):
        out_ref[:] = x_ref[:].T

    x = jnp.asarray(np.arange(B * 16).reshape(B, 16), jnp.int32)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((16, B), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = timed("transpose(B,16)->(16,B)", lambda: jax.jit(f)(x))
    if out is not None:
        print("   values:",
              "MATCH" if (out == np.asarray(x).T).all() else "MISMATCH")


def probe_vmem_cap(mb):
    n_rows = (mb * 1024 * 1024) // (1024 * 4)

    def kernel(x_ref, out_ref, scr):
        scr[0:8, :] = x_ref[:]
        out_ref[:] = scr[0:8, :] + 1

    x = jnp.zeros((8, 1024), jnp.int32)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 1024), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n_rows, 1024), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(mb + 8) * 1024 * 1024),
    )
    timed(f"vmem_scratch_{mb}MB", lambda: jax.jit(f)(x))


def probe_roll_cumsum():
    def kernel(x_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 256), 1)
        acc = x_ref[:]
        s = 1
        while s < 256:
            sh = pltpu.roll(acc, s, 1)
            acc = acc + jnp.where(lane < s, 0, sh) * 0 + jnp.where(
                lane < s, acc * 0, sh)
            s <<= 1
        out_ref[:] = acc

    x = jnp.ones((8, 256), jnp.int32)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 256), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = timed("roll_cumsum", lambda: jax.jit(f)(x))
    if out is not None:
        print("   values:", "MATCH" if (out[:, -1] == 256).all()
              else f"MISMATCH {out[0, :8]} last={out[0, -1]}")


PROBES = {
    "scalar_gather": probe_scalar_gather,
    "vmem_scalar_read": probe_vmem_scalar_read,
    "popcount": probe_popcount,
    "transpose": probe_transpose,
    "cumsum": probe_roll_cumsum,
    "vmem16": lambda: probe_vmem_cap(16),
    "vmem32": lambda: probe_vmem_cap(32),
    "vmem64": lambda: probe_vmem_cap(64),
    "vmem100": lambda: probe_vmem_cap(100),
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(PROBES)
    print("jax", jax.__version__, "devices", jax.devices())
    for nm in names:
        PROBES[nm]()
