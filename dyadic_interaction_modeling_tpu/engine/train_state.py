"""Train state with frozen-submodule optimizer masks (L4).

The reference freezes submodules by toggling ``requires_grad``
(e.g. ``/root/reference/code/seq2seq_pretrain.py:100-113``) and feeding only
``filter(lambda p: p.requires_grad, ...)`` to Adam
(``finetune_s2s_pretrain.py:105``). Here freezing is an ``optax.masked``
transform: frozen leaves get ``set_to_zero`` updates, so they stay exactly at
their loaded values while living in the same pytree (which keeps checkpoint
layout and pjit shardings uniform).
"""

from __future__ import annotations

from typing import Any, Iterable, Optional

import jax
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    """flax TrainState; kept as a subclass for future extra fields."""


def frozen_mask(params: Any, frozen_substrings: Iterable[str]) -> Any:
    """Boolean pytree: True = trainable, False = frozen.

    ``frozen_substrings`` are '/'-joined param-path substrings, matching the
    specs exported from models.slm (SLM_FROZEN_SUBSTRINGS etc.).
    """
    frozen_substrings = tuple(frozen_substrings)

    def _path_str(path) -> str:
        parts = []
        for p in path:
            parts.append(str(getattr(p, "key", getattr(p, "idx", p))))
        return "/".join(parts)

    return jax.tree_util.tree_map_with_path(
        lambda path, _: not any(s in _path_str(path) for s in frozen_substrings),
        params,
    )


def make_optimizer(
    learning_rate,
    weight_decay: float = 0.0,
    clip_norm: float = 0.0,
    trainable_mask: Optional[Any] = None,
    b1: float = 0.9,
    b2: float = 0.999,
) -> optax.GradientTransformation:
    """Adam/AdamW matching the reference's optimizers, with optional freeze mask
    and global-norm clipping (x_engine_pt.py:37-38)."""
    chain = []
    if clip_norm and clip_norm > 0:
        chain.append(optax.clip_by_global_norm(clip_norm))
    if weight_decay and weight_decay > 0:
        chain.append(optax.adamw(learning_rate, b1=b1, b2=b2, weight_decay=weight_decay))
    else:
        chain.append(optax.adam(learning_rate, b1=b1, b2=b2))
    tx = optax.chain(*chain)
    if trainable_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            jax.tree_util.tree_map(lambda t: "train" if t else "freeze", trainable_mask),
        )
    return tx


def create_train_state(
    model,
    params,
    learning_rate,
    weight_decay: float = 0.0,
    clip_norm: float = 0.0,
    frozen_substrings: Iterable[str] = (),
) -> TrainState:
    import jax.numpy as jnp

    p = params["params"] if "params" in params else params
    # Own the buffers: train steps DONATE their state (pt_engine), which
    # requires every leaf to be a distinct buffer this state exclusively
    # holds. Grafted/partial-loaded trees can alias one array in two slots
    # (e.g. the same VQ checkpoint as speaker AND listener tokenizer), and
    # two states built from the same init tree would share buffers - either
    # way donation would delete a buffer someone else still references.
    p = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), p)
    mask = frozen_mask(p, frozen_substrings) if frozen_substrings else None
    tx = make_optimizer(learning_rate, weight_decay, clip_norm, mask)
    return TrainState.create(apply_fn=model.apply, params=p, tx=tx)
