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

# numpy, NOT jnp: a module-level device array would initialize the jax
# backend at import time - before CLIs can force the platform, which on the
# axon plugin means opening the TPU tunnel even for CPU-only runs
IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], dtype=np.float32)

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
    return ((x - jnp.asarray(IMAGENET_MEAN, x.dtype))
            / jnp.asarray(IMAGENET_STD, x.dtype))


# ---------------------------------------------------------------------------
# additional perceptual trunks (reference perceptual.py:203-343). The shipped
# face.yaml uses vgg19 only; vgg16 / alexnet / resnet50 are provided for the
# reference's full `network=` surface. (inception_v3 / robust_resnet50 /
# vgg_face download weights at construction in the reference - their trunks
# are reachable only with those files and are intentionally not rebuilt.)
# ---------------------------------------------------------------------------

_VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"]


def _vgg_tap_names(cfg) -> Dict[str, int]:
    taps = {}
    block, idx_in_block, conv_idx = 1, 1, 0
    for v in cfg:
        if v == "M":
            block += 1
            idx_in_block = 1
        else:
            taps[f"relu_{block}_{idx_in_block}"] = conv_idx
            conv_idx += 1
            idx_in_block += 1
    return taps


VGG16_TAPS = _vgg_tap_names(_VGG16_CFG)


class VGG16Features(nn.Module):
    """VGG16 trunk, relu taps (reference _vgg16, perceptual.py:222-237)."""

    layers: Sequence[str]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Dict[str, Array]:
        wanted = {VGG16_TAPS[name]: name for name in self.layers}
        last = max(wanted)
        feats = {}
        conv_idx = 0
        for v in _VGG16_CFG:
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


def torch_vgg16_to_flax(state_dict: Mapping[str, np.ndarray]) -> Dict:
    """torchvision vgg16 ``features.*`` weights -> VGG16Features params."""
    def _np(t):
        return np.asarray(t.detach().cpu().numpy()) if hasattr(t, "detach") else np.asarray(t)

    tv_conv_indices = []
    i = 0
    for v in _VGG16_CFG:
        if v == "M":
            i += 1
        else:
            tv_conv_indices.append(i)
            i += 2
    params = {}
    for conv_idx, tv_idx in enumerate(tv_conv_indices):
        w = _np(state_dict[f"features.{tv_idx}.weight"])
        b = _np(state_dict[f"features.{tv_idx}.bias"])
        params[f"conv_{conv_idx}"] = {"kernel": w.transpose(2, 3, 1, 0), "bias": b}
    return {"params": params}


# AlexNet features plan: (out_ch, kernel, stride, padding), 'M' = maxpool 3x2.
_ALEXNET_CFG = [(64, 11, 4, 2), "M", (192, 5, 1, 2), "M",
                (384, 3, 1, 1), (256, 3, 1, 1), (256, 3, 1, 1), "M"]
# reference taps (perceptual.py:239-252): conv_i = pre-relu, relu_i = post
ALEXNET_TAPS = {"conv_1": 0, "relu_1": 0, "conv_2": 1, "relu_2": 1,
                "conv_3": 2, "relu_3": 2, "conv_4": 3, "relu_4": 3,
                "conv_5": 4, "relu_5": 4}


class AlexNetFeatures(nn.Module):
    """AlexNet trunk with the reference's conv/relu taps
    (_alexnet, perceptual.py:239-252)."""

    layers: Sequence[str]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Dict[str, Array]:
        feats = {}
        conv_idx = 0
        for v in _ALEXNET_CFG:
            if v == "M":
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
                continue
            ch, k, s, p = v
            x = nn.Conv(ch, (k, k), strides=(s, s), padding=[(p, p), (p, p)],
                        dtype=self.dtype, name=f"conv_{conv_idx}")(x)
            if f"conv_{conv_idx + 1}" in self.layers:
                feats[f"conv_{conv_idx + 1}"] = x
            x = nn.relu(x)
            if f"relu_{conv_idx + 1}" in self.layers:
                feats[f"relu_{conv_idx + 1}"] = x
            conv_idx += 1
        return feats


def torch_alexnet_to_flax(state_dict: Mapping[str, np.ndarray]) -> Dict:
    """torchvision alexnet ``features.*`` weights -> AlexNetFeatures params."""
    def _np(t):
        return np.asarray(t.detach().cpu().numpy()) if hasattr(t, "detach") else np.asarray(t)

    tv_conv_indices = [0, 3, 6, 8, 10]  # torchvision alexnet.features conv slots
    params = {}
    for conv_idx, tv_idx in enumerate(tv_conv_indices):
        w = _np(state_dict[f"features.{tv_idx}.weight"])
        b = _np(state_dict[f"features.{tv_idx}.bias"])
        params[f"conv_{conv_idx}"] = {"kernel": w.transpose(2, 3, 1, 0), "bias": b}
    return {"params": params}


# ResNet50: (blocks, out_width) per stage; bottleneck expansion 4.
_RESNET50_STAGES = [(3, 64), (4, 128), (6, 256), (3, 512)]


class _FoldedBN(nn.Module):
    """Eval-mode BatchNorm folded to scale/bias - exact for a FROZEN feature
    trunk (the reference's perceptual networks run requires_grad=False with
    torch BN in eval); the importer computes
    scale = gamma / sqrt(running_var + eps), bias = beta - mean * scale."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


class ResNet50Features(nn.Module):
    """ResNet50 trunk with taps at each stage output
    (_resnet50, perceptual.py:285-302: layer_1 .. layer_4)."""

    layers: Sequence[str]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Dict[str, Array]:
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = _FoldedBN(64, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        feats = {}
        for si, (blocks, width) in enumerate(_RESNET50_STAGES):
            stride = 1 if si == 0 else 2
            for bi in range(blocks):
                prefix = f"layer{si + 1}_{bi}"
                s = stride if bi == 0 else 1
                out_ch = width * 4
                shortcut = x
                if bi == 0:
                    shortcut = nn.Conv(out_ch, (1, 1), strides=(s, s),
                                       use_bias=False, dtype=self.dtype,
                                       name=f"{prefix}_down")(x)
                    shortcut = _FoldedBN(out_ch, dtype=self.dtype,
                                         name=f"{prefix}_down_bn")(shortcut)
                h = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype,
                            name=f"{prefix}_c1")(x)
                h = nn.relu(_FoldedBN(width, dtype=self.dtype,
                                      name=f"{prefix}_b1")(h))
                h = nn.Conv(width, (3, 3), strides=(s, s),
                            padding=[(1, 1), (1, 1)], use_bias=False,
                            dtype=self.dtype, name=f"{prefix}_c2")(h)
                h = nn.relu(_FoldedBN(width, dtype=self.dtype,
                                      name=f"{prefix}_b2")(h))
                h = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                            name=f"{prefix}_c3")(h)
                h = _FoldedBN(out_ch, dtype=self.dtype, name=f"{prefix}_b3")(h)
                x = nn.relu(h + shortcut)
            name = f"layer_{si + 1}"
            if name in self.layers:
                feats[name] = x
            if name == sorted(self.layers)[-1]:
                break
        return feats


def _fold_bn(sd, prefix, _np, eps=1e-5):
    gamma = _np(sd[f"{prefix}.weight"])
    beta = _np(sd[f"{prefix}.bias"])
    mean = _np(sd[f"{prefix}.running_mean"])
    var = _np(sd[f"{prefix}.running_var"])
    scale = gamma / np.sqrt(var + eps)
    return {"scale": scale, "bias": beta - mean * scale}


def torch_resnet50_to_flax(state_dict: Mapping[str, np.ndarray]) -> Dict:
    """torchvision resnet50 weights -> ResNet50Features params (BN folded)."""
    def _np(t):
        return np.asarray(t.detach().cpu().numpy()) if hasattr(t, "detach") else np.asarray(t)

    def conv(prefix):
        return {"kernel": _np(state_dict[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}

    params: Dict = {"conv1": conv("conv1"),
                    "bn1": _fold_bn(state_dict, "bn1", _np)}
    for si, (blocks, _w) in enumerate(_RESNET50_STAGES):
        for bi in range(blocks):
            tv = f"layer{si + 1}.{bi}"
            p = f"layer{si + 1}_{bi}"
            for k in (1, 2, 3):
                params[f"{p}_c{k}"] = conv(f"{tv}.conv{k}")
                params[f"{p}_b{k}"] = _fold_bn(state_dict, f"{tv}.bn{k}", _np)
            if bi == 0:
                params[f"{p}_down"] = conv(f"{tv}.downsample.0")
                params[f"{p}_down_bn"] = _fold_bn(state_dict,
                                                  f"{tv}.downsample.1", _np)
    return {"params": params}


PERCEPTUAL_NETWORKS = {
    "vgg19": (lambda layers: VGG19Features(layers), torch_vgg19_to_flax),
    "vgg16": (lambda layers: VGG16Features(layers), torch_vgg16_to_flax),
    "alexnet": (lambda layers: AlexNetFeatures(layers), torch_alexnet_to_flax),
    "resnet50": (lambda layers: ResNet50Features(layers), torch_resnet50_to_flax),
}


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
        if network == "alexnet" and layers and layers[0].startswith("relu_1_"):
            layers = ("relu_1", "relu_2", "relu_3", "relu_4", "relu_5")
        elif network == "resnet50" and layers and layers[0].startswith("relu"):
            layers = ("layer_1", "layer_2", "layer_3", "layer_4")
        self.layers = list(layers)
        self.num_scales = num_scales
        self.use_style_loss = use_style_loss
        self.weight_style = weight_style_to_perceptual
        self.network = network
        # smallest input the deepest tap can survive: pooling/striding a
        # too-small map produces an EMPTY tensor whose mean is NaN (the torch
        # reference would error instead; we skip scales that are too small -
        # only reachable at tiny resolutions the reference never trains at).
        if network in ("vgg19", "vgg16"):
            cfg = _VGG19_CFG if network == "vgg19" else _VGG16_CFG
            taps = VGG19_TAPS if network == "vgg19" else VGG16_TAPS
            pools = 0
            deepest = max(taps[n] for n in self.layers)
            conv_idx = 0
            for v in cfg:
                if v == "M":
                    pools += 1
                else:
                    if conv_idx == deepest:
                        break
                    conv_idx += 1
            self._min_size = 2 ** pools
        else:
            self._min_size = 64 if network in ("alexnet", "resnet50") else 0
        if network == "l1":
            self.model = None
            self.params = None
        else:
            if network not in PERCEPTUAL_NETWORKS:
                raise ValueError(f"unknown perceptual network: {network} "
                                 f"(have {sorted(PERCEPTUAL_NETWORKS)} + 'l1')")
            self.model = PERCEPTUAL_NETWORKS[network][0](self.layers)
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
