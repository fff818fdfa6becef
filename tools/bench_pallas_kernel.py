"""Standalone timing of the Mosaic search inner-loop kernel.

Times inner_scan_pallas on a FROZEN synthetic lane state (the lockstep
kernel executes the same instruction stream regardless of state
contents, so a frozen state times exactly without evolution effects).
Varying K_INNER separates the per-call overhead (boundary transposes +
in->out VMEM copies + dispatch) from the per-iteration cost; ablate
flags price individual blocks.

Usage: python tools/bench_pallas_kernel.py [K_INNER[,ablate]] ...
Defaults: 64 256 64,nogather 64,norank 64,nopush 64,noshadow
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fq_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 60)

B = int(os.environ.get("FQ_KB_LANES", 1024))
NP = int(os.environ.get("FQ_KB_POOL", 512))
L = int(os.environ.get("FQ_KB_L", 256))
SL = 32
N_TEXT = int(os.environ.get("FQ_KB_N", 2_000_000))
REPS = int(os.environ.get("FQ_KB_REPS", 5))


def make_state(rng):
    from fastquick_tpu.ops.batch_search import A_MAX, NBUCK

    def ri(shape, hi):
        return jnp.asarray(rng.integers(0, hi, shape).astype(np.int32))

    lane = dict(
        read_idx=ri(B, 1000), seqs=ri((B, 2, L), 4),
        lens=jnp.full(B, 151, jnp.int32), md0=jnp.full(B, 5, jnp.int32),
        max_diff=jnp.full(B, 5, jnp.int32),
        use_seed=jnp.ones(B, bool),
        pk=ri((B, NP), N_TEXT), pl=ri((B, NP), N_TEXT),
        pai=ri((B, NP), 1 << 20), pdiff=ri((B, NP), 1 << 14),
        heads=ri((B, NBUCK), NP), freelist=ri((B, NP), NP),
        free_top=jnp.full(B, NP // 2, jnp.int32),
        n_entries=jnp.full(B, 8, jnp.int32),
        best_score=jnp.full(B, 100, jnp.int32),
        best_cnt=jnp.zeros(B, jnp.int32), n_aln=jnp.zeros(B, jnp.int32),
        al0=ri((B, A_MAX), 1 << 20), al1=ri((B, A_MAX), N_TEXT),
        al2=ri((B, A_MAX), N_TEXT),
        ww0=ri((B, L + 1), N_TEXT), wb0=ri((B, L + 1), 6),
        ww1=ri((B, L + 1), N_TEXT), wb1=ri((B, L + 1), 6),
        sw0=ri((B, SL + 1, 2), N_TEXT), sw1=ri((B, SL + 1, 2), N_TEXT),
        ch_on=jnp.asarray(rng.integers(0, 2, B) > 0),
        # ch invariants: [k, l, i, a, mm, go, ge, ldp] with a in {0,1}
        ch=jnp.concatenate(
            [ri((B, 2), N_TEXT), ri((B, 1), L) + 1, ri((B, 1), 2),
             ri((B, 4), 40)], axis=1),
        done=jnp.zeros(B, bool), overflow=jnp.zeros(B, jnp.int32),
        steps=jnp.zeros(B, jnp.int32))
    return lane


def main():
    from fastquick_tpu.ops.search_pallas import inner_scan_pallas

    rng = np.random.default_rng(0)
    nbo = N_TEXT // 128 + 2
    nbp = -(-nbo // 8) * 8
    tab = jnp.asarray(rng.integers(0, 1 << 30, (2 * nbp, 16))
                      .astype(np.int32))
    L2 = jnp.asarray(np.array([[0, 500000, 1000000, 1500000]] * 2,
                              np.int32))
    primary = jnp.asarray(np.array([1234, 4321], np.int32))
    lane = make_state(rng)

    args = sys.argv[1:] or ["64", "256", "64,nogather", "64,norank",
                            "64,nopush", "64,noshadow"]
    results = {}
    for spec in args:
        parts = spec.split(",")
        k_inner = int(parts[0])
        abl = tuple(sorted(parts[1:]))

        def run():
            out = inner_scan_pallas(
                lane, tab, L2, primary, NP=NP, K_INNER=k_inner, L=L,
                NBP=nbp, n=N_TEXT, s_mm=3, s_gapo=11, s_gape=4,
                max_gapo=1, max_gape=6, indel_end_skip=5,
                max_del_occ=10, max_entries=2000000, max_top2=30,
                seed_len=32, max_seed_diff=2, step_cap=768, ablate=abl)
            return out["steps"]

        runj = jax.jit(run)
        t0 = time.time()
        jax.block_until_ready(runj())
        t_compile = time.time() - t0
        best = float("inf")
        for _ in range(REPS):
            t0 = time.time()
            jax.block_until_ready(runj())
            best = min(best, time.time() - t0)
        tag = f"K={k_inner}" + (f",{'+'.join(abl)}" if abl else "")
        results[tag] = best
        print(f"{tag}: {best*1e3:.2f}ms total -> {best/k_inner*1e6:.1f}"
              f"us/iter (compile {t_compile:.0f}s)", flush=True)
    if "K=64" in results and "K=256" in results:
        per_iter = (results["K=256"] - results["K=64"]) / 192
        fixed = results["K=64"] - 64 * per_iter
        print(f"# fit: per-iter {per_iter*1e6:.1f}us, per-call fixed "
              f"{fixed*1e3:.2f}ms")


if __name__ == "__main__":
    main()
