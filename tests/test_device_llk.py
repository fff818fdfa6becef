"""Device (jit) contamination likelihood vs the numpy oracle.

The device path (pop/device_llk.py) is the TPU mapping of ComputeMixLLKs
(SURVEY §5): float32 log-sum-exp on the accelerator, optionally
marker-sharded over a mesh with a psum merge.  These tests run it on the
virtual 8-device CPU mesh from tests/conftest.py."""

import numpy as np
import pytest

from tests.test_popcon import _build_estimator


def _prep(est):
    est._prepare()
    return est


def test_device_llk_matches_numpy():
    est = _prep(_build_estimator(400, seed=3, alpha_true=0.1))
    from fastquick_tpu.pop.device_llk import DeviceLLK

    dev = DeviceLLK(est._counts, est._UD_act, est._means_act)
    for pc, a in [([0.0, 0.0], 0.03), ([0.05, -0.02], 0.2),
                  ([-0.1, 0.1], 0.45)]:
        ref = est.compute_mix_llks(pc, pc, a)
        got = dev(pc, pc, a)
        assert got == pytest.approx(ref, rel=2e-5), (pc, a)


def test_device_llk_sharded_equals_unsharded():
    import jax

    from fastquick_tpu.parallel.mesh import make_mesh
    from fastquick_tpu.pop.device_llk import DeviceLLK

    est = _prep(_build_estimator(403, seed=5, alpha_true=0.15))  # odd M
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    single = DeviceLLK(est._counts, est._UD_act, est._means_act)
    sharded = DeviceLLK(est._counts, est._UD_act, est._means_act, mesh=mesh)
    for pc, a in [([0.0, 0.0], 0.03), ([0.02, 0.08], 0.3)]:
        assert sharded(pc, pc, a) == pytest.approx(single(pc, pc, a),
                                                   rel=1e-5)


def test_device_optimize_matches_numpy_alpha(tmp_path):
    alpha_true = 0.12
    ref = _build_estimator(800, seed=9, alpha_true=alpha_true)
    ref.is_heter = False
    ref.optimize(str(tmp_path / "np"))

    dev = _build_estimator(800, seed=9, alpha_true=alpha_true)
    dev.is_heter = False
    dev.use_device = True
    dev.optimize(str(tmp_path / "dev"))

    a_np = min(ref.global_alpha, 1 - ref.global_alpha)
    a_dev = min(dev.global_alpha, 1 - dev.global_alpha)
    assert a_dev == pytest.approx(a_np, abs=5e-3)
    assert a_dev == pytest.approx(alpha_true, abs=0.05)


def test_device_llk_known_af():
    est = _prep(_build_estimator(300, seed=7, alpha_true=0.1))
    from fastquick_tpu.pop.device_llk import DeviceLLK

    rng = np.random.default_rng(0)
    kaf = rng.uniform(0.05, 0.95, est._counts.shape[0])
    est.is_af_known = True
    est._known_af_act = kaf
    dev = DeviceLLK(est._counts, est._UD_act, est._means_act, known_af=kaf)
    ref = est.compute_mix_llks([0.0, 0.0], [0.0, 0.0], 0.25)
    assert dev([0.0, 0.0], [0.0, 0.0], 0.25) == pytest.approx(ref, rel=2e-5)
