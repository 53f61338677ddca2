"""Metric parity against the reference's numpy/scipy implementations
(imported read-only from /root/reference - they are torch-free)."""

import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE_ROOT, has_reference

from dyadic_interaction_modeling_tpu.metrics import eval_utils as ours
from dyadic_interaction_modeling_tpu.metrics.reporting import (
    print_biwi_metrics,
    print_metrics,
    print_metrics_full,
)

if has_reference() and REFERENCE_ROOT not in sys.path:
    sys.path.insert(0, REFERENCE_ROOT)

needs_ref = pytest.mark.skipif(not has_reference(), reason="reference not mounted")


def _clips(n=4, t=60, d=56, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randn(t + i, d).astype(np.float64) for i in range(n)]


@needs_ref
def test_frechet_distance_parity():
    from metrics.eval_utils import calculate_activation_statistics as ref_stats
    from metrics.eval_utils import calculate_frechet_distance as ref_fd

    a = np.random.RandomState(0).randn(100, 8)
    b = np.random.RandomState(1).randn(120, 8) * 1.3 + 0.2
    mu1, s1 = ours.calculate_activation_statistics(a)
    mu2, s2 = ours.calculate_activation_statistics(b)
    rmu1, rs1 = ref_stats(a)
    rmu2, rs2 = ref_stats(b)
    np.testing.assert_allclose(mu1, rmu1)
    np.testing.assert_allclose(s1, rs1)
    assert ours.calculate_frechet_distance(mu1, s1, mu2, s2) == pytest.approx(
        ref_fd(rmu1, rs1, rmu2, rs2), rel=1e-10)


@needs_ref
def test_sid_parity():
    from metrics.eval_utils import calcuate_sid as ref_sid

    gt = _clips(3, 80)
    pred = _clips(3, 80, seed=7)
    for typ in ("pose", "exp"):
        assert ours.calcuate_sid(gt, pred, type=typ) == pytest.approx(
            ref_sid(gt, pred, type=typ), rel=1e-8)


@needs_ref
def test_sts_parity():
    from metrics.eval_utils import sts as ref_sts

    x = np.random.RandomState(0).randn(50, 6)
    y = np.random.RandomState(1).randn(50, 6)
    assert ours.sts(x, y) == pytest.approx(ref_sts(x, y), rel=1e-9)


@needs_ref
def test_print_metrics_matches_reference_battery(capsys):
    """Full battery on the same inputs: every reference-printed number must
    match ours (the reference prints; ours returns a dict)."""
    import mymetrics as ref_my

    gt = _clips(3, 70, seed=1)
    pred = _clips(3, 70, seed=2)
    x = _clips(3, 70, seed=3)
    ref_fid_pose, ref_fid_exp = ref_my.print_metrics(gt, pred, x)
    capsys.readouterr()
    out = print_metrics(gt, pred, x, verbose=False)
    assert out["fid_pose"] == pytest.approx(ref_fid_pose, rel=1e-8)
    assert out["fid_exp"] == pytest.approx(ref_fid_exp, rel=1e-8)


def test_print_metrics_full_shapes():
    gt = _clips(2, 40)
    pred = _clips(2, 40, seed=5)
    x = _clips(2, 40, seed=6)
    out = print_metrics_full(gt, pred, x, verbose=False)
    assert set(out) == {"fid", "pfid", "mse", "var_gt", "var"}
    assert all(np.isfinite(v) for v in out.values())


def test_biwi_metrics():
    rng = np.random.RandomState(0)
    n_v = 50
    templates = {"F2": rng.randn(n_v * 3) * 0.01}
    gt = [rng.randn(10, n_v * 3) * 0.1]
    pred = [g + rng.randn(*g.shape) * 0.01 for g in gt]
    out = print_biwi_metrics(gt, pred, ["F2_01"], templates,
                             mouth_map=list(range(10)), upper_map=list(range(20, 30)),
                             n_vertices=n_v, verbose=False)
    assert out["lve"] > 0 and np.isfinite(out["fdd"])
    # identical prediction -> lve 0, fdd 0
    out0 = print_biwi_metrics(gt, gt, ["F2_01"], templates,
                              mouth_map=list(range(10)), upper_map=list(range(20, 30)),
                              n_vertices=n_v, verbose=False)
    assert out0["lve"] == 0.0 and out0["fdd"] == 0.0


def test_perplexity_matches_manual():
    rng = np.random.RandomState(0)
    logits = rng.randn(2, 5, 7)
    targets = rng.randint(0, 7, (2, 5))
    targets[0, 0] = -100
    p = ours.perplexity_from_logits(logits, targets)
    assert np.isfinite(p) and p > 1
