"""Token / continuous seq2seq engine (L4).

Parity target: ``/root/reference/code/x_engine.py`` - epoch loops for
ListenerGenerator-style models with boolean length masks built from
``src_len`` (:20-22) and validation perplexity via torcheval (:64-88,
reimplemented in metrics.eval_utils.perplexity_from_logits).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable

import jax
import numpy as np

from ..metrics.eval_utils import perplexity_from_logits
from ..models.xtrans import ar_inputs_targets
from ..utils.logging import get_logger


def make_lg_train_step(model, use_ids: bool = False) -> Callable:
    """Jitted train step for ListenerGenerator batches
    (src_v, tgt, mask, speaker_ids, listener_ids)."""

    def loss_fn(params, batch):
        src, tgt, mask, sp, li = batch
        out = model.apply({"params": params}, src, tgt, mask,
                          sp if use_ids else None, li if use_ids else None)
        return out.loss

    @jax.jit
    def step(state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        return state.apply_gradients(grads=grads), loss

    return step


def train_epoch(state, loader: Iterable, step: Callable, epoch: int = 0,
                print_freq: int = 200, logger=None):
    """x_engine.train_epoch loop shape (:8-36)."""
    logger = logger or get_logger()
    loss = None
    for i, batch in enumerate(loader):
        state, loss = step(state, batch)
        if (i + 1) % print_freq == 0:
            logger.info(f"Epoch {epoch} batch {i + 1}: loss {float(loss):.4f}")
    return state, (float(loss) if loss is not None else None)


def make_continuous_train_step(model) -> Callable:
    """Jitted train step for ContinuousSeq2Seq batches (src, tgt, mask)
    (x_engine.train_continuous_epoch :38-62; the model returns the masked
    MSE AR loss directly)."""

    def loss_fn(params, src, tgt, mask):
        return model.apply({"params": params}, src, tgt, mask)

    @jax.jit
    def step(state, src, tgt, mask):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, src, tgt, mask)
        return state.apply_gradients(grads=grads), loss

    return step


def train_continuous_epoch(state, loader: Iterable, step: Callable,
                           epoch: int = 0, print_freq: int = 100, logger=None):
    """x_engine.train_continuous_epoch loop shape (:38-62): batches are
    (src, tgt, mask) with the boolean mask prebuilt from src_len."""
    logger = logger or get_logger()
    losses = []
    for i, (src, tgt, mask) in enumerate(loader):
        state, loss = step(state, src, tgt, mask)
        losses.append(loss)
        if (i + 1) % print_freq == 0:
            logger.info(f"Epoch {epoch} batch {i + 1}: "
                        f"loss {float(np.mean([float(x) for x in losses])):.4f}")
            losses = []
    return state, (float(losses[-1]) if losses else None)


def evaluate_continuous_epoch(params, model, loader: Iterable) -> float:
    """Mean validation MSE (x_engine.evaluate_continuous_epoch :89-105)."""
    fwd = jax.jit(lambda p, s, t, m: model.apply({"params": p}, s, t, m))
    losses = [float(fwd(params, src, tgt, mask)) for src, tgt, mask in loader]
    return float(np.mean(losses)) if losses else float("nan")


def evaluate_epoch(params, model, loader: Iterable, use_ids: bool = False
                   ) -> Dict[str, float]:
    """Validation loss + token perplexity (x_engine.evaluate_epoch :64-88).

    Perplexity is computed from the decoder logits over non-ignored target
    positions, matching torcheval.metrics.Perplexity semantics.
    """
    def _eval(m, src, tgt, mask, sp, li):
        out = m(src, tgt, mask, sp, li)
        x_sp, z_li = m._encode_streams(src, tgt, mask)
        _, logits = m.generator(x_sp, z_li, mask, None)
        _, targets = ar_inputs_targets(z_li)
        return out.loss, logits, targets

    @jax.jit
    def fwd(params, src, tgt, mask, sp, li):
        return model.apply({"params": params}, src, tgt, mask, sp, li,
                           method=_eval)

    losses, ppls = [], []
    for batch in loader:
        src, tgt, mask, sp, li = batch
        loss, logits, targets = fwd(params, src, tgt, mask,
                                    sp if use_ids else None,
                                    li if use_ids else None)
        losses.append(float(loss))
        ppls.append(perplexity_from_logits(np.asarray(logits), np.asarray(targets)))
    return {"loss": float(np.mean(losses)), "perplexity": float(np.mean(ppls))}
