"""Device (TPU) contamination-likelihood evaluator.

jit-compiled formulation of ComputeMixLLKs (reference
VerifyBamID/ContaminationEstimator.h:206-281): the per-marker pileups are
pre-collapsed to (class, qual)-bin count matrices by the estimator
(estimator._prepare), so one likelihood evaluation is

    af        = clip((UD @ pc + mu) / 2)           # PCA AF model (h:236-250)
    base_lk   = counts @ log(v).T                  # (markers, 9) matmul (MXU)
    marker_ll = logsumexp(base_lk + log gf1 gf2)   # 3x3 genotype mixture
    llk       = psum(sum(marker_ll))               # over markers

The log-sum-exp stabilization (instead of the host path's exp-then-log)
keeps the evaluation exact in float32 on TPU; markers whose mixture
likelihood underflows to 0 in the reference (dropped there via the
`marker_lk > 0` gate) have all-(-inf) rows here and contribute 0 the same
way.  The reference parallelizes this loop with an OpenMP reduction
(ContaminationEstimator.h:210-213) whose sum order is already
nondeterministic; the device path replaces it with a marker-sharded
``shard_map`` + ``psum`` over a ``jax.sharding.Mesh``, so one
contamination solve scales over chips/hosts.

Opt-in via ``ContaminationEstimator(use_device=True)`` or the pop+con
``--DeviceLLK`` flag; the numpy path stays the bit-parity default.
"""

from __future__ import annotations

import numpy as np

from .estimator import LK_ERR, LK_NOERR, MAX_AF, MIN_AF, N_CLASS, N_QBINS


class DeviceLLK:
    """jit llk(pc1, pc2, alpha); optionally marker-sharded over a mesh."""

    def __init__(self, counts: np.ndarray, UD: np.ndarray, means: np.ndarray,
                 known_af: np.ndarray | None = None, mesh=None,
                 axis: str = "dp", dtype=None):
        import jax
        import jax.numpy as jnp

        self._jnp = jnp
        dtype = dtype or jnp.float32
        M, nbins = counts.shape
        npc = UD.shape[1]

        # per-bin error rate and conditional-LK tables tiled over bins
        q = np.arange(N_QBINS, dtype=np.float64)
        eps = np.tile(np.power(10.0, q / -10.0), N_CLASS)
        cls = np.repeat(np.arange(N_CLASS), N_QBINS)
        lk_err = LK_ERR[:, cls]  # (3, bins)
        lk_noerr = LK_NOERR[:, cls]

        # pad the marker axis so each mesh shard is equal-sized; padded
        # rows have zero counts and af=0.5, contributing exactly 0
        n_shards = 1
        if mesh is not None:
            n_shards = int(np.prod([mesh.shape[a] for a in
                                    ((axis,) if isinstance(axis, str)
                                     else axis)]))
        Mp = -(-M // n_shards) * n_shards
        if Mp != M:
            counts = np.concatenate(
                [counts, np.zeros((Mp - M, nbins), counts.dtype)])
            UD = np.concatenate([UD, np.zeros((Mp - M, npc), UD.dtype)])
            means = np.concatenate([means, np.ones(Mp - M, means.dtype)])
            if known_af is not None:
                known_af = np.concatenate(
                    [known_af, np.full(Mp - M, 0.5, known_af.dtype)])

        self._counts = jnp.asarray(counts, dtype)
        self._UD = jnp.asarray(UD, dtype)
        self._means = jnp.asarray(means, dtype)
        self._known_af = (None if known_af is None
                          else jnp.asarray(known_af, dtype))
        self._eps = jnp.asarray(eps, dtype)
        self._lk_err = jnp.asarray(lk_err, dtype)
        self._lk_noerr = jnp.asarray(lk_noerr, dtype)
        use_known = known_af is not None

        def log_gf(af):
            """log genotype frequencies [(1-af)^2, 2af(1-af), af^2]."""
            la, l1a = jnp.log(af), jnp.log1p(-af)
            return jnp.stack(
                [2.0 * l1a, jnp.log(jnp.asarray(2.0, dtype)) + la + l1a,
                 2.0 * la], axis=1)  # (M, 3)

        # TPU f32 matmuls default to bf16 MXU passes; these two tiny
        # contractions set the likelihood's precision, so force full f32
        # (measured on-chip: rel err 2.4e-4 -> <2e-5 vs the numpy oracle)
        hp = jax.lax.Precision.HIGHEST

        def marker_llks(counts_s, UD_s, means_s, kaf_s, pc1, pc2, alpha):
            if use_known:
                af1 = af2 = jnp.clip(kaf_s, MIN_AF, MAX_AF)
            else:
                af1 = jnp.clip((jnp.matmul(UD_s, pc1, precision=hp)
                                + means_s) * 0.5, MIN_AF, MAX_AF)
                af2 = jnp.clip((jnp.matmul(UD_s, pc2, precision=hp)
                                + means_s) * 0.5, MIN_AF, MAX_AF)
            lg1, lg2 = log_gf(af1), log_gf(af2)
            e_mix = (alpha * self._lk_err[:, None, :]
                     + (1 - alpha) * self._lk_err[None, :, :])
            n_mix = (alpha * self._lk_noerr[:, None, :]
                     + (1 - alpha) * self._lk_noerr[None, :, :])
            v = e_mix * self._eps + n_mix * (1 - self._eps)  # (3, 3, bins)
            tiny = jnp.asarray(np.finfo(np.float32).tiny, dtype)
            logv = jnp.log(jnp.maximum(v, tiny))
            base_lk = jnp.matmul(counts_s, logv.reshape(9, -1).T,
                                 precision=hp)  # (M, 9)
            tot = base_lk + (lg1[:, :, None] + lg2[:, None, :]).reshape(-1, 9)
            m = jnp.max(tot, axis=1)
            ll = m + jnp.log(jnp.exp(tot - m[:, None]).sum(axis=1))
            # all-underflow markers are dropped (reference marker_lk>0 gate)
            return jnp.where(jnp.isfinite(ll), ll, 0.0).sum()

        if mesh is None:
            self._fn = jax.jit(
                lambda pc1, pc2, alpha: marker_llks(
                    self._counts, self._UD, self._means, self._known_af,
                    pc1, pc2, alpha))
        else:
            from jax.sharding import PartitionSpec as P

            from ..parallel.mesh import shard_map_compat

            axes = (axis,) if isinstance(axis, str) else tuple(axis)
            spec = axes if len(axes) > 1 else axes[0]

            def step(counts_s, UD_s, means_s, kaf_s, pc1, pc2, alpha):
                ll = marker_llks(counts_s, UD_s, means_s, kaf_s,
                                 pc1, pc2, alpha)
                for ax in reversed(axes):
                    ll = jax.lax.psum(ll, ax)
                return ll

            kaf_spec = P(spec) if use_known else P()
            sharded = shard_map_compat(
                step, mesh=mesh,
                in_specs=(P(spec, None), P(spec, None), P(spec), kaf_spec,
                          P(), P(), P()),
                out_specs=P())
            kaf = (self._known_af if use_known
                   else jnp.zeros((), dtype))  # placeholder, unused
            self._fn = jax.jit(
                lambda pc1, pc2, alpha: sharded(
                    self._counts, self._UD, self._means, kaf,
                    pc1, pc2, alpha))
        self._dtype = dtype

    def __call__(self, pc1, pc2, alpha: float) -> float:
        jnp = self._jnp
        pc1 = jnp.asarray(np.asarray(pc1, np.float64), self._dtype)
        pc2 = jnp.asarray(np.asarray(pc2, np.float64), self._dtype)
        a = jnp.asarray(float(alpha), self._dtype)
        return float(self._fn(pc1, pc2, a))
