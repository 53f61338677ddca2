"""Perceptual losses (reference: ``code/Pirender/loss/perceptual.py``).

Multi-scale VGG19 feature distance with optional gram-matrix style loss:

* images in [-1, 1] are imagenet-normalised (perceptual.py:359-366),
* features taken at ``relu_i_1`` taps, L1 distance, averaged over
  ``num_scales`` dyadic downscales (perceptual.py:110-140),
* style loss: L1 between gram matrices, weighted ``style_to_perceptual``
  (=250 for the final loss, config/face.yaml:40-44).

VGG19 weights import from a torchvision ``vgg19(pretrained=True)``
state_dict via ``torch_vgg19_to_flax`` (torchvision itself is not needed -
any saved state_dict file works). Without pretrained weights the loss
degrades to the same formula over a randomly-initialised VGG (still a valid
training signal - random-feature perceptual distance) or plain L1 via
``network='l1'``.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])

# VGG19 configuration: conv channel plan with 'M' maxpools
_VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]


def _relu_tap_names() -> Dict[str, int]:
    """Map 'relu_b_i' names to conv indices in _VGG19_CFG order."""
    taps = {}
    block, idx_in_block, conv_idx = 1, 1, 0
    for v in _VGG19_CFG:
        if v == "M":
            block += 1
            idx_in_block = 1
        else:
            taps[f"relu_{block}_{idx_in_block}"] = conv_idx
            conv_idx += 1
            idx_in_block += 1
    return taps


VGG19_TAPS = _relu_tap_names()


class VGG19Features(nn.Module):
    """VGG19 trunk returning activations at the requested relu taps (NHWC)."""

    layers: Sequence[str]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Dict[str, Array]:
        wanted = {VGG19_TAPS[name]: name for name in self.layers}
        last = max(wanted)
        feats = {}
        conv_idx = 0
        for v in _VGG19_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            x = nn.Conv(v, (3, 3), padding="SAME", dtype=self.dtype,
                        name=f"conv_{conv_idx}")(x)
            x = nn.relu(x)
            if conv_idx in wanted:
                feats[wanted[conv_idx]] = x
            if conv_idx == last:
                break
            conv_idx += 1
        return feats


def torch_vgg19_to_flax(state_dict: Mapping[str, np.ndarray]) -> Dict:
    """torchvision vgg19 ``features.*`` weights -> VGG19Features params."""
    def _np(t):
        return np.asarray(t.detach().cpu().numpy()) if hasattr(t, "detach") else np.asarray(t)

    # torchvision indices of conv layers inside .features
    tv_conv_indices = []
    i = 0
    for v in _VGG19_CFG:
        if v == "M":
            i += 1  # maxpool
        else:
            tv_conv_indices.append(i)
            i += 2  # conv + relu
    params = {}
    for conv_idx, tv_idx in enumerate(tv_conv_indices):
        w = _np(state_dict[f"features.{tv_idx}.weight"])  # (out, in, kh, kw)
        b = _np(state_dict[f"features.{tv_idx}.bias"])
        params[f"conv_{conv_idx}"] = {"kernel": w.transpose(2, 3, 1, 0), "bias": b}
    return {"params": params}


def apply_imagenet_normalization(x: Array) -> Array:
    """[-1, 1] -> imagenet-normalised (perceptual.py:359-366)."""
    x = (x + 1) / 2
    return (x - IMAGENET_MEAN.astype(x.dtype)) / IMAGENET_STD.astype(x.dtype)


def _gram(feat: Array) -> Array:
    b, h, w, c = feat.shape
    f = feat.reshape(b, h * w, c)
    return jnp.einsum("bnc,bnd->bcd", f, f,
                      preferred_element_type=jnp.float32) / (h * w * c)


class PerceptualLoss:
    """Functional perceptual loss holding VGG params as a closure."""

    def __init__(self, layers: Sequence[str] = ("relu_1_1", "relu_2_1", "relu_3_1",
                                                "relu_4_1", "relu_5_1"),
                 num_scales: int = 4, use_style_loss: bool = False,
                 weight_style_to_perceptual: float = 0.0,
                 network: str = "vgg19",
                 vgg_params: Optional[Dict] = None,
                 rng: Optional[jax.Array] = None):
        self.layers = list(layers)
        self.num_scales = num_scales
        self.use_style_loss = use_style_loss
        self.weight_style = weight_style_to_perceptual
        self.network = network
        # smallest input the deepest tap can survive: each 'M' before it
        # halves the resolution, and pooling a 1-px map produces an EMPTY
        # tensor whose mean is NaN (the torch reference would error instead;
        # we skip scales that are too small - only reachable at tiny
        # resolutions the reference never trains at).
        pools = 0
        deepest = max(VGG19_TAPS[n] for n in self.layers) if network != "l1" else 0
        conv_idx = 0
        for v in _VGG19_CFG:
            if v == "M":
                pools += 1
            else:
                if conv_idx == deepest:
                    break
                conv_idx += 1
        self._min_size = 2 ** pools
        if network == "l1":
            self.model = None
            self.params = None
        else:
            self.model = VGG19Features(self.layers)
            if vgg_params is None:
                vgg_params = self.model.init(
                    rng if rng is not None else jax.random.PRNGKey(0),
                    jnp.zeros((1, 64, 64, 3)))
            self.params = vgg_params

    def __call__(self, inp: Array, target: Array) -> Array:
        if self.model is None:
            return jnp.mean(jnp.abs(inp - target))
        inp = apply_imagenet_normalization(inp)
        target = apply_imagenet_normalization(target)
        loss = 0.0
        style_loss = 0.0
        for scale in range(self.num_scales):
            if min(inp.shape[1], inp.shape[2]) < self._min_size:
                break  # deepest tap would pool to an empty map (NaN)
            fi = self.model.apply(self.params, inp)
            ft = self.model.apply(self.params, target)
            for name in self.layers:
                loss = loss + jnp.mean(jnp.abs(
                    fi[name] - jax.lax.stop_gradient(ft[name])))
                if self.use_style_loss and scale == 0:
                    style_loss = style_loss + jnp.mean(jnp.abs(
                        _gram(fi[name]) - jax.lax.stop_gradient(_gram(ft[name]))))
            if scale != self.num_scales - 1:
                b, h, w, c = inp.shape
                inp = jax.image.resize(inp, (b, h // 2, w // 2, c), "bilinear")
                target = jax.image.resize(target, (b, h // 2, w // 2, c), "bilinear")
        if self.use_style_loss:
            return loss + self.weight_style * style_loss
        return loss
