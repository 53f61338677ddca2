"""Sentiment probe (reference: ``code/sentiment.py``).

A small MLP probe over 56-d EMOCA frames (56 -> 256 -> 256 -> 3) used to
measure whether generated listener motion carries sentiment, plus the
reference's thresholded classifier on the softmax outputs
(sentiment.py:105-121: negative if p[2] > 0.03, else neutral if p[0] > 0.41,
else positive).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class SentimentMLP(nn.Module):
    """fc1 -> relu -> fc2 -> relu -> fc3 (sentiment.py:13-32)."""

    hidden: int = 256
    n_classes: int = 3
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.fc1 = nn.Dense(self.hidden, dtype=self.dtype)
        self.fc2 = nn.Dense(self.hidden, dtype=self.dtype)
        self.fc3 = nn.Dense(self.n_classes, dtype=self.dtype)

    def __call__(self, x: Array) -> Array:
        return self.fc3(nn.relu(self.fc2(nn.relu(self.fc1(x)))))

    def extract(self, x: Array) -> Array:
        """Penultimate features (sentiment.py:29-32)."""
        return self.fc2(nn.relu(self.fc1(x)))


def threshold_classifier(probs: np.ndarray,
                         neg_thresh: float = 0.03,
                         neutral_thresh: float = 0.41) -> np.ndarray:
    """Reference's prioritised thresholds (sentiment.py:111-120):
    class 2 (negative) if p2 > 0.03, else class 0 (neutral) if p0 > 0.41,
    else class 1 (positive)."""
    probs = np.asarray(probs)
    out = np.ones(probs.shape[:-1], dtype=np.int32)  # default positive (1)
    out = np.where(probs[..., 0] > neutral_thresh, 0, out)
    out = np.where(probs[..., 2] > neg_thresh, 2, out)
    return out


def weighted_ce_loss(logits: Array, labels: Array,
                     class_weights: Optional[Array] = None) -> Array:
    """CrossEntropy with class weights (sentiment.py:49: weights
    [432/113, 423/195, 432/115])."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if class_weights is None:
        return jnp.mean(nll)
    w = jnp.take(class_weights, labels)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-12)


# numpy, NOT jnp: module-level device arrays initialize the backend at
# import (opens the TPU tunnel before CLIs can force the platform)
DEFAULT_CLASS_WEIGHTS = np.asarray([432 / 113, 423 / 195, 432 / 115],
                                   dtype=np.float32)


def train_probe(frames: np.ndarray, labels: np.ndarray, *, epochs: int = 20,
                lr: float = 1e-4, batch_size: int = 256,
                seed: int = 0) -> Tuple[SentimentMLP, Dict]:
    """Train the per-frame probe (mirrors the commented training loop,
    sentiment.py:46-77). frames (N, 56), labels (N,) in {0,1,2}."""
    import optax

    model = SentimentMLP()
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, frames.shape[1])))
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            return weighted_ce_loss(model.apply(p, x), y, DEFAULT_CLASS_WEIGHTS)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    n = frames.shape[0]
    loss = None
    for _ in range(epochs):
        order = rng.permutation(n)
        for i in range(0, n - batch_size + 1, batch_size):
            idx = order[i: i + batch_size]
            params, opt_state, loss = step(params, opt_state,
                                           jnp.asarray(frames[idx]),
                                           jnp.asarray(labels[idx]))
    return model, {"params": params, "final_loss": float(loss) if loss is not None else None}


def classify_clips(model: SentimentMLP, params, clips) -> np.ndarray:
    """Per-clip sentiment: mean-frame probe + threshold classifier
    (sentiment.py:84-121 applies the probe per frame vector)."""
    preds = []
    for clip in clips:
        logits = model.apply(params, jnp.asarray(np.asarray(clip).mean(axis=0))[None])
        probs = np.asarray(jax.nn.softmax(logits, axis=-1))[0]
        preds.append(int(threshold_classifier(probs)))
    return np.asarray(preds)
