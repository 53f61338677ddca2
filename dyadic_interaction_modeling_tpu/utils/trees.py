"""Pytree helpers: parameter counting / summaries / path-predicate masks.

Parity target: ``BaseModel.summary`` (``/root/reference/code/base/base_model.py:21-30``)
which logs trainable parameter count; here models are param pytrees, so the
count is a tree reduction and "trainable" is expressed by a freeze mask
(see engine.train_state).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


def param_count(params: Any) -> int:
    return sum(int(jnp.size(p)) for p in jax.tree_util.tree_leaves(params))


def param_summary(params: Any, logger=None, name: str = "model") -> float:
    """Log and return trainable parameter count in millions."""
    millions = param_count(params) / 1e6
    msg = f"===>{name} parameters: {millions:.3f} M"
    if logger is not None:
        logger.info(msg)
    else:
        print(msg)
    return millions


def path_mask(params: Any, predicate: Callable[[str], bool]) -> Any:
    """Boolean pytree: predicate applied to '/'-joined param path.

    Used to express the reference's ``requires_grad`` freezing
    (e.g. seq2seq_pretrain.py:100-113) as an optax gradient mask.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def _key_str(path):
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "idx"):
                parts.append(str(p.idx))
            else:
                parts.append(str(p))
        return "/".join(parts)

    paths = {_key_str(path): predicate(_key_str(path)) for path, _ in flat}

    def _build(path, leaf):
        return paths[_key_str(path)]

    return jax.tree_util.tree_map_with_path(_build, params)
