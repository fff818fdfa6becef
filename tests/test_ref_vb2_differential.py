"""Contamination/ancestry estimator vs the COMPILED reference.

testing/refvb2 compiles the reference's actual ContaminationEstimator
(+ its AmoebaMinimizer) against a faithful text-pileup stub; this
module drives it and our pop/estimator over IDENTICAL inputs -- the
bundled hapmap SVD resource and a synthetic contaminated pileup under
the reference's own generative model -- and compares the estimates.

Tolerances: the two implementations evaluate bit-different float sums
(ours factorizes the per-base products by counts; the C loops reads),
so the Nelder-Mead trajectories are not bit-identical; the OPTIMA must
still agree tightly.
"""

import os

import numpy as np
import pytest

from fastquick_tpu.testing import refvb2

pytestmark = pytest.mark.skipif(not refvb2.available(),
                                reason="reference VerifyBamID/ absent")

RESOURCE = "/root/reference/resource/hapmap_3.3.b37.dat"


def _write_pileup(path, est, alpha_true, seed, n_markers, depth=8.0):
    """Samtools-style pileup lines under the reference's AF model
    (AF = (UD.PC + mu)/2, ContaminationEstimator.h:236-250)."""
    rng = np.random.default_rng(seed)
    pc1 = np.array([0.02, -0.01])
    pc2 = np.array([-0.015, 0.03])
    af1 = np.clip((est.UD[:, :2] @ pc1 + est.means) / 2.0, 0.001, 0.999)
    af2 = np.clip((est.UD[:, :2] @ pc2 + est.means) / 2.0, 0.001, 0.999)
    g1 = rng.binomial(2, af1)
    g2 = rng.binomial(2, af2)
    eps = 10 ** (-30 / 10.0)
    with open(path, "w") as fh:
        for i, (chrom, pos) in enumerate(est.pos_vec[:n_markers]):
            d = int(rng.poisson(depth))
            if d == 0:
                continue
            ref, alt = est.choose_bed[chrom][pos]
            bases = []
            for _ in range(d):
                g = g1[i] if rng.random() < alpha_true else g2[i]
                is_alt = rng.random() < g / 2.0
                if rng.random() < eps:
                    is_alt = not is_alt
                bases.append(alt.upper() if is_alt else ".")
            quals = "?" * d  # ord('?') = 63 -> Q30
            fh.write(f"{chrom}\t{pos}\t{ref}\t{d}\t"
                     f"{''.join(bases)}\t{quals}\n")


@pytest.mark.parametrize("alpha_true", [0.02, 0.12])
def test_estimates_match_reference(alpha_true, tmp_path):
    try:
        refvb2.get_lib()
    except RuntimeError as e:
        pytest.skip(str(e))
    from fastquick_tpu.pop.estimator import ContaminationEstimator
    from fastquick_tpu.pop.pileup import read_pileup_file

    seed = int(alpha_true * 1000) + 5
    ours = ContaminationEstimator(num_pc=2, epsilon=1e-10)
    ours.read_choose_bed(RESOURCE + ".bed")
    ours.read_matrix_ud(RESOURCE + ".UD")
    ours.read_mean(RESOURCE + ".mu")
    pileup = str(tmp_path / "sim.pileup")
    _write_pileup(pileup, ours, alpha_true, seed, n_markers=4000)

    ours.viewer = read_pileup_file(ours.choose_bed, pileup)
    ours.is_sanity_check_disabled = True
    ours.optimize(str(tmp_path / "ours"))

    ref = refvb2.run_reference_estimator(
        RESOURCE, RESOURCE + ".bed", pileup, str(tmp_path / "ref"),
        n_pc=2, heter=True, nthread=1, epsilon=1e-10)

    our_alpha = min(ours.global_alpha, 1 - ours.global_alpha)
    ref_alpha = min(ref["alpha"], 1 - ref["alpha"])
    assert ref["n_marker"] == len(ours.UD)
    assert abs(ref["avg_depth"] - ours.viewer.avg_depth) < 1e-9
    assert abs(our_alpha - ref_alpha) < 2e-3, (our_alpha, ref_alpha)
    assert abs(our_alpha - alpha_true) < 0.02
    # log-likelihoods at the optima
    assert abs(ours.llk1 - ref["llk1"]) < 1e-4 * abs(ref["llk1"])
    assert abs(ours.llk0 - ref["llk0"]) < 1e-4 * abs(ref["llk0"])
    # ancestry coordinates of both mixture components
    for a, b in zip(list(ours.global_pc) + list(ours.global_pc2), ref["pc"] + ref["pc2"]):
        assert abs(a - b) < 5e-3, (ours.global_pc, ours.global_pc2,
                                   ref["pc"], ref["pc2"])
    # the reference wrote its own .Ancestry via the REAL OptimizeLLK
    assert os.path.exists(str(tmp_path / "ref") + ".Ancestry")
