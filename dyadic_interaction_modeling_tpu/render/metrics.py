"""Render evaluation metrics (reference: ``Pirender/trainers/base.py:472-485``
LPIPS tracking).

True LPIPS needs the learned per-layer linear weights of the lpips package
(not shipped in this environment); ``perceptual_distance`` computes the same
form - unit-normalised VGG feature differences averaged over layers and
space - which reduces to LPIPS with uniform linear weights. With imported
lpips linear weights (``lin_weights``) it is exact.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from .perceptual import VGG19Features, apply_imagenet_normalization

Array = jax.Array

LPIPS_LAYERS = ("relu_1_2", "relu_2_2", "relu_3_4", "relu_4_4", "relu_5_4")


def lpips_lin_to_weights(state_dict, layers: Sequence[str] = LPIPS_LAYERS
                         ) -> Dict[str, Array]:
    """Import the lpips package's learned per-layer linear weights.

    The lpips checkpoint stores one 1x1 conv per tap as
    ``lin{i}.model.1.weight`` with shape (1, C, 1, 1) (also accepted:
    ``lins.{i}.model.1.weight``, the ModuleList spelling). Returns
    ``{layer_name: (C,)}`` for ``PerceptualDistance(lin_weights=...)``,
    making the distance exactly LPIPS. Strict key accounting like the
    HuBERT importer: every lin weight must be consumed, every layer covered.
    Reference consumer: ``Pirender/trainers/base.py:472-485``.
    """
    import numpy as np

    found: Dict[int, Array] = {}
    leftover = []
    for k, v in state_dict.items():
        parts = k.split(".")
        if (len(parts) == 4 and parts[0].startswith("lin")
                and parts[1] == "model" and parts[2] == "1"
                and parts[3] == "weight"):
            idx = int(parts[0][3:])
        elif (len(parts) == 5 and parts[0] == "lins"
              and parts[2] == "model" and parts[3] == "1"
              and parts[4] == "weight"):
            idx = int(parts[1])
        else:
            leftover.append(k)
            continue
        arr = np.array(getattr(v, "detach", lambda: v)().cpu().numpy()
                       if hasattr(v, "detach") else v)
        if arr.ndim != 4 or arr.shape[0] != 1 or arr.shape[2:] != (1, 1):
            raise ValueError(f"{k}: expected (1, C, 1, 1), got {arr.shape}")
        found[idx] = jnp.asarray(arr.reshape(-1))
    if leftover:
        raise KeyError(f"unrecognized lpips keys: {sorted(leftover)[:8]}")
    if sorted(found) != list(range(len(layers))):
        raise KeyError(f"expected lin0..lin{len(layers) - 1}, got {sorted(found)}")
    return {name: found[i] for i, name in enumerate(layers)}


class PerceptualDistance:
    """LPIPS-style distance between image batches in [-1, 1] (NHWC)."""

    def __init__(self, vgg_params: Optional[Dict] = None,
                 layers: Sequence[str] = LPIPS_LAYERS,
                 lin_weights: Optional[Dict[str, Array]] = None,
                 rng: Optional[jax.Array] = None):
        self.layers = list(layers)
        self.model = VGG19Features(self.layers)
        if vgg_params is None:
            vgg_params = self.model.init(
                rng if rng is not None else jax.random.PRNGKey(0),
                jnp.zeros((1, 64, 64, 3)))
        self.params = vgg_params
        self.lin_weights = lin_weights

    def __call__(self, a: Array, b: Array) -> Array:
        fa = self.model.apply(self.params, apply_imagenet_normalization(a))
        fb = self.model.apply(self.params, apply_imagenet_normalization(b))
        total = 0.0
        for name in self.layers:
            xa = fa[name]
            xb = fb[name]
            xa = xa / jnp.maximum(jnp.linalg.norm(xa, axis=-1, keepdims=True), 1e-10)
            xb = xb / jnp.maximum(jnp.linalg.norm(xb, axis=-1, keepdims=True), 1e-10)
            d = jnp.square(xa - xb)
            if self.lin_weights is not None and name in self.lin_weights:
                d = d * self.lin_weights[name][None, None, None, :]
                total = total + jnp.mean(jnp.sum(d, axis=-1), axis=(1, 2))
            else:
                total = total + jnp.mean(d, axis=(1, 2, 3))
        return total  # (B,)
