"""Evaluation metric primitives (L5) - host-side numpy/scipy.

Parity target: ``/root/reference/code/metrics/eval_utils.py``. These run on
host CPU on final predictions (tiny tensors relative to model compute), and
``scipy.linalg.sqrtm`` is kept for bit-identical Frechet distances - the
TPU does the generation, numpy does the scoring.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
from scipy import linalg


def calculate_activation_statistics(activations: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(eval_utils.py:6-10)"""
    mu = np.mean(activations, axis=0)
    cov = np.cov(activations, rowvar=False)
    return mu, cov


def calculate_frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Frechet distance between two Gaussians (eval_utils.py:12-46)."""
    mu1 = np.atleast_1d(mu1)
    mu2 = np.atleast_1d(mu2)
    sigma1 = np.atleast_2d(sigma1)
    sigma2 = np.atleast_2d(sigma2)
    assert mu1.shape == mu2.shape
    assert sigma1.shape == sigma2.shape

    diff = mu1 - mu2

    def _sqrtm(a):
        out = linalg.sqrtm(a)  # scipy >= 1.17 deprecated the disp/errest API
        return out[0] if isinstance(out, tuple) else out

    covmean = _sqrtm(sigma1.dot(sigma2))
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = _sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError(
                f"Imaginary component {np.max(np.abs(covmean.imag))}")
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def calculate_variance(activations: np.ndarray) -> float:
    """(eval_utils.py:48-49)"""
    return float(np.sum(np.var(activations, axis=0)))


def calcuate_sid(gt: Sequence[np.ndarray], pred: Sequence[np.ndarray],
                 type: str = "exp") -> float:
    """Style Intensity Diversity: entropy of k-means-cluster histogram
    (eval_utils.py:51-83). k=40 for expression dims (6:), k=20 for pose (:6).

    Keeps sklearn KMeans with random_state=0 for reproducibility parity.
    """
    from sklearn.cluster import KMeans

    k = 40 if type == "exp" else 20
    sl = slice(6, None) if type == "exp" else slice(0, 6)
    merge_gt = np.concatenate(gt, axis=0)[:, sl]
    kmeans_gt = KMeans(n_clusters=k, random_state=0, n_init="auto").fit(merge_gt)
    merge_pred = np.concatenate(pred, axis=0)[:, sl]
    labels = kmeans_gt.predict(merge_pred)
    hist = np.bincount(labels, minlength=k).astype(np.float64)
    hist = hist / hist.sum()
    eps = 1e-6
    entropy = float(np.sum(hist * np.log2(hist + eps)))
    return -entropy


def sts(x: np.ndarray, y: np.ndarray, timestep: float = 0.1) -> float:
    """Temporal-derivative distance (eval_utils.py:85-91), vectorised:
    sqrt(sum over dims/steps of ((dx - dy)^2 / timestep))."""
    dx = np.diff(x, axis=0)
    dy = np.diff(y, axis=0)
    return float(np.sqrt(np.sum((dx - dy) ** 2) / timestep))


def perplexity_from_logits(logits: np.ndarray, targets: np.ndarray,
                           ignore_index: int = -100) -> float:
    """torcheval.metrics.Perplexity equivalent (x_engine.py:68-88):
    exp(mean NLL over non-ignored target positions)."""
    logits = np.asarray(logits, dtype=np.float64)
    targets = np.asarray(targets)
    logp = logits - logits.max(axis=-1, keepdims=True)
    logp = logp - np.log(np.exp(logp).sum(axis=-1, keepdims=True))
    keep = targets != ignore_index
    safe = np.clip(targets, 0, logits.shape[-1] - 1)
    nll = -np.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return float(np.exp(nll[keep].mean()))
