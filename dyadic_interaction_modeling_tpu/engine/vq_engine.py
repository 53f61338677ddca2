"""VQ-VAE training engine (L4).

Parity target: the train/validate loops of
``/root/reference/code/train_vq.py:133-263`` (forward -> calc_vq_loss ->
backward -> poly LR -> meters; best-val checkpoint gating), rebuilt as a
single jitted data-parallel train step:

* the batch is sharded over the mesh's ``data`` axis; parameters are
  replicated; XLA inserts the gradient all-reduce over ICI (the reference's
  DDP/NCCL all-reduce, train_vq.py:195 + baseTrainer.py:62),
* loss = L1 reconstruction + weighted quantization loss (metrics.loss),
* the LR schedule is folded into the optimizer (no host round trips).
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Iterable, Optional, Tuple

import jax

from ..metrics.loss import calc_vq_loss, calc_vq_loss_AV
from ..utils.logging import AverageMeter, get_logger
from .train_state import TrainState


def make_vq_train_step(model, quant_loss_weight: float = 1.0,
                       audio_visual: bool = False) -> Callable:
    """Returns jitted (state, batch) -> (state, metrics).

    ``audio_visual`` selects the split AV loss used by the speaker VQ
    (metrics/loss.py:13-22; train path in train_vq.py uses the plain loss).
    """
    loss_fn_inner = calc_vq_loss_AV if audio_visual else calc_vq_loss

    def loss_fn(params, batch):
        dec, emb_loss, enc = model.apply({"params": params}, batch)
        total, (rec, quant) = loss_fn_inner(dec, batch, emb_loss, quant_loss_weight)
        return total, {"loss": total, "rec_loss": rec, "quant_loss": quant,
                       "perplexity": enc.perplexity}

    @jax.jit
    def step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch)
        state = state.apply_gradients(grads=grads)
        return state, metrics

    return step


def make_vq_eval_step(model, quant_loss_weight: float = 1.0,
                      audio_visual: bool = False) -> Callable:
    loss_fn_inner = calc_vq_loss_AV if audio_visual else calc_vq_loss

    @jax.jit
    def step(params, batch) -> Dict:
        dec, emb_loss, enc = model.apply({"params": params}, batch)
        total, (rec, quant) = loss_fn_inner(dec, batch, emb_loss, quant_loss_weight)
        return {"loss": total, "rec_loss": rec, "quant_loss": quant,
                "perplexity": enc.perplexity}

    return step


def train_epoch(state: TrainState, loader: Iterable, train_step: Callable,
                epoch: int = 0, print_freq: int = 500, logger=None,
                meters: Optional[Dict[str, AverageMeter]] = None,
                writer=None, step_offset: int = 0, lr: Optional[float] = None
                ) -> Tuple[TrainState, Dict[str, float]]:
    """Host loop mirroring train_vq.train (train_vq.py:174-233).

    ``writer``: optional utils.observability.MetricsWriter; batch scalars are
    written at the print cadence with the reference's tags
    (train_vq.py:230-233), at global step ``step_offset + i + 1``.
    """
    logger = logger or get_logger()
    meters = meters or {k: AverageMeter() for k in
                        ("loss", "rec_loss", "quant_loss", "perplexity", "batch_time")}
    t0 = time.time()
    metrics = None
    for i, batch in enumerate(loader):
        state, metrics = train_step(state, batch)
        if (i + 1) % print_freq == 0:
            # sync once per print window, not per step
            for k in ("loss", "rec_loss", "quant_loss", "perplexity"):
                meters[k].update(float(metrics[k]))
            meters["batch_time"].update(time.time() - t0)
            t0 = time.time()
            logger.info(
                f"Epoch {epoch} iter {i + 1}: loss {meters['loss'].val:.4f} "
                f"rec {meters['rec_loss'].val:.4f} quant {meters['quant_loss'].val:.4f} "
                f"ppl {meters['perplexity'].val:.1f}")
            if writer is not None:
                step = step_offset + i + 1
                writer.add_scalar("train_batch/loss", meters["rec_loss"].val, step)
                writer.add_scalar("train_batch/loss_2", meters["quant_loss"].val, step)
                if lr is not None:
                    writer.add_scalar("learning_rate", lr, step)
    if metrics is None:
        return state, {}
    out = {k: float(metrics[k]) for k in ("loss", "rec_loss", "quant_loss", "perplexity")}
    return state, out


def validate(params, loader: Iterable, eval_step: Callable) -> Dict[str, float]:
    """Mirrors train_vq.validate (train_vq.py:238-263)."""
    sums: Dict[str, float] = {}
    n = 0
    for batch in loader:
        metrics = eval_step(params, batch)
        for k, v in metrics.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        n += 1
    return {k: v / max(n, 1) for k, v in sums.items()}
