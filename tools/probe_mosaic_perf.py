"""Perf probes for the planned search inner-loop Pallas kernel.

Measures, on the real chip, with the measurement loop INSIDE the kernel
(so relay dispatch overhead amortizes out):

 - gather_loop: scalar fori_loop gathering NB rows of 16 int32 from a
   table (the per-iteration FM occ-table fetch; 2 loads+1 store per row)
 - onehot_pass: a (NP, B) one-hot select+sum pass (the pop/push pool
   access style) x NPASS
 - vpu_mix: the approximate per-iteration VPU op mix (pop 4 planes +
   push 9 children x 4 planes + heads)

Usage: python tools/probe_mosaic_perf.py [reps]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = int(os.environ.get("FQ_PROBE_B", 1024))
NP = int(os.environ.get("FQ_PROBE_NP", 512))
NT = 1 << 17  # table rows (8 MB)
REPS = (int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit()
        else 64)


def bench(name, f, *args, per=1):
    out = jax.jit(f)(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = jax.jit(f)(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"{name}: total {dt*1e3:.2f}ms -> {dt/REPS*1e6:.2f}us/rep"
          f" ({dt/REPS/per*1e9:.2f}ns per unit)")


def gather_loop():
    NB = 2 * B  # two occ queries per lane per iteration

    def kernel(idx_ref, tab_ref, out_ref, smem_idx, scr, sem):
        def rep(r, _):
            cp = pltpu.make_async_copy(idx_ref, smem_idx, sem)
            cp.start()
            cp.wait()

            def body(b, _):
                i = (smem_idx[b] + r) & (NT - 1)
                scr[pl.ds(b, 1), :] = tab_ref[pl.ds(i, 1), :]
                return 0

            jax.lax.fori_loop(0, NB, body, 0)
            return 0

        jax.lax.fori_loop(0, REPS, rep, 0)
        out_ref[:] = scr[0:8, :]

    idx = jnp.asarray(np.random.randint(0, NT, (NB,)), jnp.int32)
    tab = jnp.asarray(np.random.randint(0, 100, (NT, 16)), jnp.int32)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 16), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((NB,), jnp.int32),
                        pltpu.VMEM((NB, 16), jnp.int32),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )
    bench(f"gather_loop({NB} rows)", f, idx, tab, per=NB)


def onehot_pass(npass=16):
    def kernel(x_ref, slot_ref, out_ref):
        def rep(r, acc):
            s = slot_ref[:] + r  # (1, B)
            iota = jax.lax.broadcasted_iota(jnp.int32, (NP, B), 0)
            total = acc
            for _ in range(npass):
                m = iota == s
                total = total + jnp.where(m, x_ref[:], 0).sum(
                    axis=0, keepdims=True)
                s = s + 1
            return total

        out_ref[:] = jax.lax.fori_loop(0, REPS, rep,
                                       jnp.zeros((1, B), jnp.int32))

    x = jnp.asarray(np.random.randint(0, 100, (NP, B)), jnp.int32)
    slot = jnp.asarray(np.random.randint(0, NP - npass - REPS, (1, B)),
                       jnp.int32)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )
    bench(f"onehot_pass x{npass} (NP={NP},B={B})", f, x, slot, per=npass)


def push_mix():
    """9-children push: 9 x [(NP,B) mask + 4-plane select-write]."""
    NCH = 9

    def kernel(slot_ref, p0, p1, p2, p3, out_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (NP, B), 0)

        def rep(r, acc):
            planes = [p0[:], p1[:], p2[:], p3[:]]
            newp = planes
            for c in range(NCH):
                s = (slot_ref[:] + c * 13 + r) % NP
                m = iota == s
                val = acc[None, :] + c
                newp = [jnp.where(m, val, pp) for pp in newp]
            for pp, ref in zip(newp, (p0, p1, p2, p3)):
                ref[:] = pp
            return acc + newp[0].sum(axis=0)[0:1]

        out_ref[:] = jax.lax.fori_loop(
            0, REPS, rep, jnp.zeros((B,), jnp.int32))[None, :]

    slot = jnp.asarray(np.random.randint(0, NP, (1, B)), jnp.int32)
    planes = [jnp.zeros((NP, B), jnp.int32) for _ in range(4)]
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        input_output_aliases={},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )
    bench("push_mix (9ch x 4 planes)", f, slot, *planes)


def gather_unroll(unroll=8):
    """Same scalar gather, body unrolled: does loop overhead dominate?"""
    NB = 2 * B

    def kernel(idx_ref, tab_ref, out_ref, smem_idx, scr, sem):
        def rep(r, _):
            cp = pltpu.make_async_copy(idx_ref, smem_idx, sem)
            cp.start()
            cp.wait()

            def body(b0, _):
                for u in range(unroll):
                    b = b0 * unroll + u
                    i = (smem_idx[b] + r) & (NT - 1)
                    scr[pl.ds(b, 1), :] = tab_ref[pl.ds(i, 1), :]
                return 0

            jax.lax.fori_loop(0, NB // unroll, body, 0)
            return 0

        jax.lax.fori_loop(0, REPS, rep, 0)
        out_ref[:] = scr[0:8, :]

    idx = jnp.asarray(np.random.randint(0, NT, (NB,)), jnp.int32)
    tab = jnp.asarray(np.random.randint(0, 100, (NT, 16)), jnp.int32)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 16), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((NB,), jnp.int32),
                        pltpu.VMEM((NB, 16), jnp.int32),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )
    bench(f"gather_unroll{unroll}({NB} rows)", f, idx, tab, per=NB)


def vgather():
    """Vectorized row gather via take_along_axis on the sublane dim --
    does Mosaic lower it at all, and at what speed?"""
    NB = 2 * B

    def kernel(idx_ref, tab_ref, out_ref):
        def rep(r, acc):
            idx = (idx_ref[:] + r) & (NT - 1)  # (NB, 1)
            g = jnp.take_along_axis(
                tab_ref[:], jnp.broadcast_to(idx, (NB, 16)), axis=0)
            return acc + g[0:8, :]

        out_ref[:] = jax.lax.fori_loop(0, REPS, rep,
                                       jnp.zeros((8, 16), jnp.int32))

    idx = jnp.asarray(np.random.randint(0, NT, (NB, 1)), jnp.int32)
    tab = jnp.asarray(np.random.randint(0, 100, (NT, 16)), jnp.int32)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 16), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )
    bench(f"vgather({NB} rows)", f, idx, tab, per=NB)


def width_pass(npass=8):
    """(LW, B) masked one-hot reduce passes (the width/seed lookups)."""
    LW = 160

    def kernel(x_ref, col_ref, out_ref):
        def rep(r, acc):
            col = col_ref[:] + (r & 7)
            iota = jax.lax.broadcasted_iota(jnp.int32, (LW, B), 0)
            total = acc
            for _ in range(npass):
                total = total + jnp.sum(
                    jnp.where(iota == col, x_ref[:], 0), axis=0,
                    keepdims=True)
                col = col + 1
            return total

        out_ref[:] = jax.lax.fori_loop(0, REPS, rep,
                                       jnp.zeros((1, B), jnp.int32))

    x = jnp.asarray(np.random.randint(0, 100, (LW, B)), jnp.int32)
    col = jnp.asarray(np.random.randint(0, LW - 16, (1, B)), jnp.int32)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    bench(f"width_pass x{npass} (LW={LW},B={B})", f, x, col, per=npass)


PROBES = {
    "gather": gather_loop,
    "gather_unroll": gather_unroll,
    "vgather": vgather,
    "onehot": onehot_pass,
    "push": push_mix,
    "width": width_pass,
}

if __name__ == "__main__":
    print("jax", jax.__version__, "devices", jax.devices(), "REPS", REPS,
          "B", B, "NP", NP)
    names = [a for a in sys.argv[1:] if not a.isdigit()] or list(PROBES)
    for nm in names:
        PROBES[nm]()
