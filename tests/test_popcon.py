"""Contamination/ancestry estimator tests on simulated pileups."""

import math

import numpy as np
import pytest

from fastquick_tpu.pop.estimator import AmoebaMinimizer, ContaminationEstimator
from fastquick_tpu.pop.pileup import PileupData

RESOURCE = "/root/reference/resource/1000g.phase3.10k.b37.vcf.gz"


def test_amoeba_quadratic():
    m = AmoebaMinimizer(lambda v: float((v[0] - 3) ** 2 + (v[1] + 2) ** 2 + 5))
    m.reset(2)
    m.point = np.array([0.0, 0.0])
    val = m.minimize(1e-10)
    assert abs(val - 5) < 1e-6
    assert abs(m.point[0] - 3) < 1e-4
    assert abs(m.point[1] + 2) < 1e-4


def test_amoeba_rosenbrock():
    m = AmoebaMinimizer(lambda v: float(
        100 * (v[1] - v[0] ** 2) ** 2 + (1 - v[0]) ** 2))
    m.reset(2)
    m.point = np.array([-1.0, 1.0])
    val = m.minimize(1e-12)
    assert val < 1e-6


def _build_estimator(n_markers, seed, alpha_true, num_pc=2,
                     pc1=None, pc2=None, depth=8.0):
    """Simulate pileups under the reference's own generative model."""
    rng = np.random.default_rng(seed)
    est = ContaminationEstimator(num_pc=num_pc, epsilon=1e-8)
    est.read_choose_bed(RESOURCE + ".bed")
    est.read_matrix_ud(RESOURCE + ".UD")
    est.read_mean(RESOURCE + ".mu")
    # subset markers
    est.bed_vec = est.bed_vec[:n_markers]
    est.pos_vec = est.pos_vec[:n_markers]
    est.UD = est.UD[:n_markers]
    est.means = est.means[:n_markers]

    pc1 = np.array(pc1 if pc1 is not None else [0.0] * num_pc)
    pc2 = np.array(pc2 if pc2 is not None else [0.0] * num_pc)
    af1 = np.clip((est.UD @ pc1 + est.means) / 2.0, 0.001, 0.999)
    af2 = np.clip((est.UD @ pc2 + est.means) / 2.0, 0.001, 0.999)
    g1 = rng.binomial(2, af1)  # contaminating sample genotypes
    g2 = rng.binomial(2, af2)  # intended sample genotypes
    eps = 10 ** (-30 / 10.0)

    viewer = PileupData(is_pileup_input=True)
    gi = 0
    for i, (chrom, pos) in enumerate(est.pos_vec):
        d = rng.poisson(depth)
        if d == 0:
            continue
        bases = []
        for _ in range(d):
            g = g1[i] if rng.random() < alpha_true else g2[i]
            is_alt = rng.random() < g / 2.0
            if rng.random() < eps:
                is_alt = not is_alt  # simplistic error flip
            ref, alt = est.choose_bed[chrom][pos]
            bases.append(alt.upper() if is_alt else ".")
        viewer.pos_index.setdefault(chrom, {})[pos] = gi
        gi += 1
        viewer.base_info.append(bases)
        viewer.qual_info.append([30 + 33] * len(bases))
        viewer.num_bases += len(bases)
        viewer.effective_num_site += 1
    viewer.avg_depth = viewer.num_bases / viewer.num_marker()
    est.viewer = viewer
    est.is_sanity_check_disabled = True
    return est


@pytest.mark.parametrize("alpha_true", [0.02, 0.10])
def test_recovers_contamination_within_ancestry(alpha_true, tmp_path):
    est = _build_estimator(3000, seed=int(alpha_true * 1000),
                           alpha_true=alpha_true)
    est.is_heter = False  # WithinAncestry
    est.optimize(str(tmp_path / "out"))
    a = est.global_alpha if est.global_alpha < 0.5 else 1 - est.global_alpha
    assert abs(a - alpha_true) < 0.02, f"alpha {a} vs true {alpha_true}"


def test_clean_sample_low_alpha(tmp_path):
    est = _build_estimator(3000, seed=7, alpha_true=0.0)
    est.is_heter = False
    est.optimize(str(tmp_path / "out"))
    a = est.global_alpha if est.global_alpha < 0.5 else 1 - est.global_alpha
    assert a < 0.02
    # outputs written
    assert (tmp_path / "out.Ancestry").exists()


def test_heter_model_runs(tmp_path):
    est = _build_estimator(1500, seed=3, alpha_true=0.05)
    est.is_heter = True
    est.optimize(str(tmp_path / "out"))
    a = est.global_alpha if est.global_alpha < 0.5 else 1 - est.global_alpha
    assert 0.0 <= a <= 0.15


def test_sanity_check_gate():
    est = _build_estimator(1200, seed=1, alpha_true=0.0)
    est.is_sanity_check_disabled = False
    assert est.sanity_check()  # >1000 markers present
    # tiny marker set fails
    est2 = _build_estimator(50, seed=2, alpha_true=0.0)
    est2.is_sanity_check_disabled = False
    assert not est2.sanity_check()
