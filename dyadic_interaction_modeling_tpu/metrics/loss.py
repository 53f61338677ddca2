"""Training losses (L5).

Parity targets: ``/root/reference/code/metrics/loss.py:6-27`` plus the
pairwise-distance continuous loss shared by the SLM family
(seq2seq_pretrain.py:256-268, seq2seq.py:260-262).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def calc_vq_loss(pred: Array, target: Array, quant_loss: Array,
                 quant_loss_weight: float = 1.0) -> Tuple[Array, Tuple[Array, Array]]:
    """L1 reconstruction + weighted quantization loss (loss.py:6-11)."""
    rec_loss = jnp.mean(jnp.abs(pred - target))
    quant_loss = jnp.mean(quant_loss)
    return quant_loss * quant_loss_weight + rec_loss, (rec_loss, quant_loss)


def calc_vq_loss_AV(pred: Array, target: Array, quant_loss: Array,
                    quant_loss_weight: float = 1.0,
                    motion_dim: int = 56) -> Tuple[Array, Tuple[Array, Array]]:
    """Audio-visual split variant (loss.py:13-22): separate L1 terms for the
    56-d motion and 768-d audio slices, summed."""
    pred_v, pred_a = pred[..., :motion_dim], pred[..., motion_dim:]
    target_v, target_a = target[..., :motion_dim], target[..., motion_dim:]
    rec_loss = jnp.mean(jnp.abs(pred_v - target_v)) + jnp.mean(jnp.abs(pred_a - target_a))
    quant_loss = jnp.mean(quant_loss)
    return quant_loss * quant_loss_weight + rec_loss, (rec_loss, quant_loss)


def calc_logit_loss(pred: Array, target: Array, ignore_index: Optional[int] = None) -> Array:
    """Cross entropy over flattened logits (loss.py:24-27).

    With ``ignore_index`` this matches torch's F.cross_entropy(ignore_index=...)
    mean semantics (sum over kept positions / number kept).
    """
    v = pred.shape[-1]
    logits = pred.reshape(-1, v)
    labels = target.reshape(-1)
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    safe_labels = jnp.clip(labels, 0, v - 1)
    nll = -jnp.take_along_axis(log_probs, safe_labels[:, None], axis=-1)[:, 0]
    if ignore_index is None:
        return jnp.mean(nll)
    keep = (labels != ignore_index).astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(keep), 1.0)
    return jnp.sum(nll * keep) / denom


def pairwise_distance_loss(pred: Array, target: Array, mask: Array,
                           pose_dims: int = 6) -> Array:
    """Masked mean L2-norm loss, split pose/expression then summed.

    Parity with seq2seq_pretrain.py:256-268: targets drop frame 0 BEFORE this
    call; here ``pred``/``target`` are already aligned (N, C) with a boolean
    frame mask (N,). torch's F.pairwise_distance uses eps=1e-6 inside the
    norm; we match that.
    """
    eps = 1e-6
    # torch F.pairwise_distance computes ||x1 - x2 + eps||_2 (eps added to the
    # signed difference before the norm).
    diff = pred - target + eps

    def _norm(x):
        return jnp.sqrt(jnp.sum(jnp.square(x), axis=-1))

    d_pose = _norm(diff[..., :pose_dims])
    d_exp = _norm(diff[..., pose_dims:])
    m = mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(m), 1.0)
    return jnp.sum(d_exp * m) / denom + jnp.sum(d_pose * m) / denom
