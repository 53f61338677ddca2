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
# face.yaml uses vgg19 only; vgg16 / alexnet / inception_v3 / resnet50 /
# robust_resnet50 / vgg_face_dag complete the reference's full `network=`
# surface. The reference downloads pretrained weights at construction; here
# every trunk takes an imported state_dict (or runs random-feature).
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


def torch_robust_resnet50_to_flax(state_dict: Mapping[str, np.ndarray]) -> Dict:
    """Robust-ResNet50 checkpoint -> ResNet50Features params.

    The reference downloads ``ImageNet.pt`` and strips the ``module.model.``
    prefix before loading into a stock resnet50
    (perceptual.py:304-313 ``_robust_resnet50``); accepts either that raw
    ``{'model': {...}}`` layout or an already-flat resnet50 state_dict.
    """
    sd = state_dict
    if "model" in sd and hasattr(sd["model"], "items"):
        sd = sd["model"]
    flat = {}
    for k, v in sd.items():
        if k.startswith("module.model."):
            flat[k[len("module.model."):]] = v
        elif k.startswith("module.attacker."):
            continue  # the robustness lib also saves the attack wrapper
        else:
            flat[k] = v
    return torch_resnet50_to_flax(flat)


# --- Inception v3 (reference _inception_v3, perceptual.py:255-281) ----------
# torchvision's trunk wrapped in nn.Sequential, bypassing transform_input;
# taps: pool_1 (after the first maxpool), pool_2 (after the second),
# mixed_6e, pool_3 (global avg pool). BasicConv2d = conv(bias=False) +
# eval-mode BatchNorm(eps=1e-3) folded + relu.

INCEPTION_TAPS = ("pool_1", "pool_2", "mixed_6e", "pool_3")
_INCEPTION_TAP_ORDER = {name: i for i, name in enumerate(INCEPTION_TAPS)}


class _BasicConv(nn.Module):
    """conv(bias=False) + folded eval BN + relu (torchvision BasicConv2d)."""

    features: int
    kernel: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Sequence[Sequence[int]] = ((0, 0), (0, 0))
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Conv(self.features, tuple(self.kernel),
                    strides=tuple(self.strides),
                    padding=[tuple(p) for p in self.padding],
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = _FoldedBN(self.features, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


def _pool_avg3(x: Array) -> Array:
    """torch F.avg_pool2d(x, 3, stride=1, padding=1) (count_include_pad)."""
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=[(1, 1), (1, 1)])


class _InceptionA(nn.Module):
    pool_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d = self.dtype
        b1 = _BasicConv(64, (1, 1), dtype=d, name="branch1x1")(x)
        b5 = _BasicConv(48, (1, 1), dtype=d, name="branch5x5_1")(x)
        b5 = _BasicConv(64, (5, 5), padding=((2, 2), (2, 2)), dtype=d,
                        name="branch5x5_2")(b5)
        b3 = _BasicConv(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        b3 = _BasicConv(96, (3, 3), padding=((1, 1), (1, 1)), dtype=d,
                        name="branch3x3dbl_2")(b3)
        b3 = _BasicConv(96, (3, 3), padding=((1, 1), (1, 1)), dtype=d,
                        name="branch3x3dbl_3")(b3)
        bp = _BasicConv(self.pool_features, (1, 1), dtype=d,
                        name="branch_pool")(_pool_avg3(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class _InceptionB(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d = self.dtype
        b3 = _BasicConv(384, (3, 3), strides=(2, 2), dtype=d,
                        name="branch3x3")(x)
        bd = _BasicConv(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        bd = _BasicConv(96, (3, 3), padding=((1, 1), (1, 1)), dtype=d,
                        name="branch3x3dbl_2")(bd)
        bd = _BasicConv(96, (3, 3), strides=(2, 2), dtype=d,
                        name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class _InceptionC(nn.Module):
    channels_7x7: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d, c7 = self.dtype, self.channels_7x7
        p17 = ((0, 0), (3, 3))  # (1,7) kernel, padding (0,3)
        p71 = ((3, 3), (0, 0))  # (7,1) kernel, padding (3,0)
        b1 = _BasicConv(192, (1, 1), dtype=d, name="branch1x1")(x)
        b7 = _BasicConv(c7, (1, 1), dtype=d, name="branch7x7_1")(x)
        b7 = _BasicConv(c7, (1, 7), padding=p17, dtype=d, name="branch7x7_2")(b7)
        b7 = _BasicConv(192, (7, 1), padding=p71, dtype=d, name="branch7x7_3")(b7)
        bd = _BasicConv(c7, (1, 1), dtype=d, name="branch7x7dbl_1")(x)
        bd = _BasicConv(c7, (7, 1), padding=p71, dtype=d, name="branch7x7dbl_2")(bd)
        bd = _BasicConv(c7, (1, 7), padding=p17, dtype=d, name="branch7x7dbl_3")(bd)
        bd = _BasicConv(c7, (7, 1), padding=p71, dtype=d, name="branch7x7dbl_4")(bd)
        bd = _BasicConv(192, (1, 7), padding=p17, dtype=d, name="branch7x7dbl_5")(bd)
        bp = _BasicConv(192, (1, 1), dtype=d,
                        name="branch_pool")(_pool_avg3(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class _InceptionD(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d = self.dtype
        p17 = ((0, 0), (3, 3))
        p71 = ((3, 3), (0, 0))
        b3 = _BasicConv(192, (1, 1), dtype=d, name="branch3x3_1")(x)
        b3 = _BasicConv(320, (3, 3), strides=(2, 2), dtype=d,
                        name="branch3x3_2")(b3)
        b7 = _BasicConv(192, (1, 1), dtype=d, name="branch7x7x3_1")(x)
        b7 = _BasicConv(192, (1, 7), padding=p17, dtype=d, name="branch7x7x3_2")(b7)
        b7 = _BasicConv(192, (7, 1), padding=p71, dtype=d, name="branch7x7x3_3")(b7)
        b7 = _BasicConv(192, (3, 3), strides=(2, 2), dtype=d,
                        name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class _InceptionE(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d = self.dtype
        p13 = ((0, 0), (1, 1))
        p31 = ((1, 1), (0, 0))
        b1 = _BasicConv(320, (1, 1), dtype=d, name="branch1x1")(x)
        b3 = _BasicConv(384, (1, 1), dtype=d, name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            _BasicConv(384, (1, 3), padding=p13, dtype=d, name="branch3x3_2a")(b3),
            _BasicConv(384, (3, 1), padding=p31, dtype=d, name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = _BasicConv(448, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        bd = _BasicConv(384, (3, 3), padding=((1, 1), (1, 1)), dtype=d,
                        name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            _BasicConv(384, (1, 3), padding=p13, dtype=d, name="branch3x3dbl_3a")(bd),
            _BasicConv(384, (3, 1), padding=p31, dtype=d, name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        bp = _BasicConv(192, (1, 1), dtype=d,
                        name="branch_pool")(_pool_avg3(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """Inception-v3 trunk with the reference's four taps
    (_inception_v3, perceptual.py:255-281: pool_1/pool_2/mixed_6e/pool_3).

    Submodule names mirror torchvision attribute names so the importer maps
    keys 1:1 (BN folded, eps=1e-3).
    """

    layers: Sequence[str]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Dict[str, Array]:
        d = self.dtype
        deepest = max(_INCEPTION_TAP_ORDER[n] for n in self.layers)
        feats: Dict[str, Array] = {}

        x = _BasicConv(32, (3, 3), strides=(2, 2), dtype=d,
                       name="Conv2d_1a_3x3")(x)
        x = _BasicConv(32, (3, 3), dtype=d, name="Conv2d_2a_3x3")(x)
        x = _BasicConv(64, (3, 3), padding=((1, 1), (1, 1)), dtype=d,
                       name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        if "pool_1" in self.layers:
            feats["pool_1"] = x
        if deepest == 0:
            return feats

        x = _BasicConv(80, (1, 1), dtype=d, name="Conv2d_3b_1x1")(x)
        x = _BasicConv(192, (3, 3), dtype=d, name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        if "pool_2" in self.layers:
            feats["pool_2"] = x
        if deepest == 1:
            return feats

        x = _InceptionA(32, dtype=d, name="Mixed_5b")(x)
        x = _InceptionA(64, dtype=d, name="Mixed_5c")(x)
        x = _InceptionA(64, dtype=d, name="Mixed_5d")(x)
        x = _InceptionB(dtype=d, name="Mixed_6a")(x)
        x = _InceptionC(128, dtype=d, name="Mixed_6b")(x)
        x = _InceptionC(160, dtype=d, name="Mixed_6c")(x)
        x = _InceptionC(160, dtype=d, name="Mixed_6d")(x)
        x = _InceptionC(192, dtype=d, name="Mixed_6e")(x)
        if "mixed_6e" in self.layers:
            feats["mixed_6e"] = x
        if deepest == 2:
            return feats

        x = _InceptionD(dtype=d, name="Mixed_7a")(x)
        x = _InceptionE(dtype=d, name="Mixed_7b")(x)
        x = _InceptionE(dtype=d, name="Mixed_7c")(x)
        # AdaptiveAvgPool2d((1, 1)) == global mean (keepdims: torch keeps 1x1)
        feats["pool_3"] = jnp.mean(x, axis=(1, 2), keepdims=True)
        return feats


def torch_inception_v3_to_flax(state_dict: Mapping[str, np.ndarray]) -> Dict:
    """torchvision inception_v3 weights -> InceptionV3Features params.

    BN is folded eval-mode with torchvision BasicConv2d's eps=1e-3; the
    classifier head (``fc.*``) and training-only aux head (``AuxLogits.*``)
    are skipped, everything else must map (strict accounting).
    """
    def _np(t):
        return np.asarray(t.detach().cpu().numpy()) if hasattr(t, "detach") else np.asarray(t)

    params: Dict = {}
    consumed = set()

    def basic_conv(prefix):
        w = _np(state_dict[f"{prefix}.conv.weight"])
        out = {"conv": {"kernel": w.transpose(2, 3, 1, 0)},
               "bn": _fold_bn(state_dict, f"{prefix}.bn", _np, eps=1e-3)}
        consumed.add(f"{prefix}.conv.weight")
        for s in ("weight", "bias", "running_mean", "running_var"):
            consumed.add(f"{prefix}.bn.{s}")
        return out

    def nest(prefix, branches):
        return {b: basic_conv(f"{prefix}.{b}") for b in branches}

    for name in ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
                 "Conv2d_3b_1x1", "Conv2d_4a_3x3"):
        params[name] = basic_conv(name)
    a_branches = ("branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1",
                  "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool")
    for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        params[name] = nest(name, a_branches)
    params["Mixed_6a"] = nest("Mixed_6a", ("branch3x3", "branch3x3dbl_1",
                                           "branch3x3dbl_2", "branch3x3dbl_3"))
    c_branches = ("branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
                  "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                  "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool")
    for name in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        params[name] = nest(name, c_branches)
    params["Mixed_7a"] = nest("Mixed_7a", ("branch3x3_1", "branch3x3_2",
                                           "branch7x7x3_1", "branch7x7x3_2",
                                           "branch7x7x3_3", "branch7x7x3_4"))
    e_branches = ("branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
                  "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
                  "branch3x3dbl_3b", "branch_pool")
    for name in ("Mixed_7b", "Mixed_7c"):
        params[name] = nest(name, e_branches)

    leftovers = [k for k in state_dict
                 if k not in consumed
                 and not k.startswith(("fc.", "AuxLogits."))
                 and not k.endswith("num_batches_tracked")]
    if leftovers:
        raise ValueError(f"unmapped inception_v3 keys: {sorted(leftovers)[:8]}")
    return {"params": params}


# --- VGG-Face (reference _vgg_face_dag, perceptual.py:316-343) --------------
# vgg16 conv trunk (num_classes=2622) + avgpool/flatten/classifier taps:
# avgpool, fc6, relu_6, fc7, relu_7, fc8.

VGGFACE_TAPS = ("avgpool", "fc6", "relu_6", "fc7", "relu_7", "fc8")
_VGGFACE_TAP_ORDER = {name: i for i, name in enumerate(VGGFACE_TAPS)}
# vgg_face_dag state_dict conv names in _VGG16_CFG order
_VGGFACE_CONV_NAMES = ("conv1_1", "conv1_2", "conv2_1", "conv2_2",
                       "conv3_1", "conv3_2", "conv3_3",
                       "conv4_1", "conv4_2", "conv4_3",
                       "conv5_1", "conv5_2", "conv5_3")


def adaptive_avg_pool_2d(x: Array, out_hw: Sequence[int]) -> Array:
    """torch AdaptiveAvgPool2d on NHWC: output cell (i, j) averages rows
    [floor(i*H/oh), ceil((i+1)*H/oh)) - exact for any input size (the
    windows are static at trace time)."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    if h % oh == 0 and w % ow == 0:
        return nn.avg_pool(x, (h // oh, w // ow), strides=(h // oh, w // ow))
    rows = []
    for i in range(oh):
        h0, h1 = (i * h) // oh, -((-(i + 1) * h) // oh)
        cols = []
        for j in range(ow):
            w0, w1 = (j * w) // ow, -((-(j + 1) * w) // ow)
            cols.append(jnp.mean(x[:, h0:h1, w0:w1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)


class VGGFaceFeatures(nn.Module):
    """VGG-Face trunk: vgg16 convs + classifier, reference taps
    (_vgg_face_dag, perceptual.py:316-343). The flatten before fc6 follows
    torch's NCHW ``view`` (channel-major), so torch fc weights transpose
    straight in."""

    layers: Sequence[str]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Dict[str, Array]:
        deepest = max(_VGGFACE_TAP_ORDER[n] for n in self.layers)
        conv_idx = 0
        for v in _VGG16_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            x = nn.Conv(v, (3, 3), padding="SAME", dtype=self.dtype,
                        name=f"conv_{conv_idx}")(x)
            x = nn.relu(x)
            conv_idx += 1
        x = adaptive_avg_pool_2d(x, (7, 7))
        feats: Dict[str, Array] = {}
        if "avgpool" in self.layers:
            feats["avgpool"] = x
        if deepest == 0:
            return feats
        # torch flattens NCHW -> (B, C*7*7); match that element order
        b = x.shape[0]
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1)
        for fc, features in (("fc6", 4096), ("fc7", 4096), ("fc8", 2622)):
            x = nn.Dense(features, dtype=self.dtype, name=fc)(x)
            if fc in self.layers:
                feats[fc] = x
            if fc == "fc8" or deepest <= _VGGFACE_TAP_ORDER[fc]:
                return feats
            x = nn.relu(x)
            relu_name = f"relu_{fc[-1]}"
            if relu_name in self.layers:
                feats[relu_name] = x
            if deepest <= _VGGFACE_TAP_ORDER[relu_name]:
                return feats
        return feats


def torch_vgg_face_to_flax(state_dict: Mapping[str, np.ndarray]) -> Dict:
    """vgg_face_dag state_dict (``conv1_1.* .. fc8.*`` layout, the file the
    reference downloads at perceptual.py:318-321) -> VGGFaceFeatures params."""
    def _np(t):
        return np.asarray(t.detach().cpu().numpy()) if hasattr(t, "detach") else np.asarray(t)

    params: Dict = {}
    for conv_idx, name in enumerate(_VGGFACE_CONV_NAMES):
        w = _np(state_dict[f"{name}.weight"])
        params[f"conv_{conv_idx}"] = {"kernel": w.transpose(2, 3, 1, 0),
                                      "bias": _np(state_dict[f"{name}.bias"])}
    for fc in ("fc6", "fc7", "fc8"):
        w = _np(state_dict[f"{fc}.weight"])
        params[fc] = {"kernel": w.T, "bias": _np(state_dict[f"{fc}.bias"])}
    known = {f"{n}.{s}" for n in _VGGFACE_CONV_NAMES + ("fc6", "fc7", "fc8")
             for s in ("weight", "bias")}
    leftovers = sorted(set(state_dict) - known)
    if leftovers:
        raise ValueError(f"unmapped vgg_face keys: {leftovers[:8]}")
    return {"params": params}


PERCEPTUAL_NETWORKS = {
    "vgg19": (lambda layers: VGG19Features(layers), torch_vgg19_to_flax),
    "vgg16": (lambda layers: VGG16Features(layers), torch_vgg16_to_flax),
    "alexnet": (lambda layers: AlexNetFeatures(layers), torch_alexnet_to_flax),
    "inception_v3": (lambda layers: InceptionV3Features(layers),
                     torch_inception_v3_to_flax),
    "resnet50": (lambda layers: ResNet50Features(layers), torch_resnet50_to_flax),
    "robust_resnet50": (lambda layers: ResNet50Features(layers),
                        torch_robust_resnet50_to_flax),
    "vgg_face_dag": (lambda layers: VGGFaceFeatures(layers),
                     torch_vgg_face_to_flax),
}


def _instance_norm(feat: Array, eps: float = 1e-5) -> Array:
    """torch F.instance_norm (affine-free) on NHWC: per-sample, per-channel
    normalization over the spatial dims (reference perceptual.py:131-133)."""
    mean = jnp.mean(feat, axis=(1, 2), keepdims=True)
    var = jnp.var(feat, axis=(1, 2), keepdims=True)
    return (feat - mean) * jax.lax.rsqrt(var + eps)


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
                 rng: Optional[jax.Array] = None,
                 resize: bool = False,
                 weights: Optional[Sequence[float]] = None,
                 criterion: str = "l1",
                 instance_normalized: bool = False):
        # callers passing the vgg default taps get each trunk's own taps
        # (the reference makes the caller choose; our CLIs only expose vgg19)
        if layers and layers[0].startswith("relu_1_"):
            if network == "alexnet":
                layers = ("relu_1", "relu_2", "relu_3", "relu_4", "relu_5")
            elif network in ("resnet50", "robust_resnet50"):
                layers = ("layer_1", "layer_2", "layer_3", "layer_4")
            elif network == "inception_v3":
                layers = INCEPTION_TAPS
            elif network == "vgg_face_dag":
                layers = VGGFACE_TAPS
        self.layers = list(layers)
        self.num_scales = num_scales
        self.use_style_loss = use_style_loss
        self.weight_style = weight_style_to_perceptual
        self.network = network
        self.resize = resize  # bilinear to 224 first (perceptual.py:106-112)
        # reference surface (perceptual.py:41-55,120-143): per-layer weights
        # (default all 1.0 - the shipped face.yaml passes none), l1|l2
        # criterion, optional instance norm on the feature maps
        if weights is None:
            weights = [1.0] * len(self.layers)
        elif isinstance(weights, (int, float)):
            weights = [float(weights)]
        if len(weights) != len(self.layers):
            raise ValueError(
                f"number of weights ({len(weights)}) must equal number of "
                f"layers ({len(self.layers)})")
        self.weights = [float(w) for w in weights]
        if criterion in ("l2", "mse"):
            self._criterion = lambda a, b: jnp.mean(jnp.square(a - b))
        elif criterion == "l1":
            self._criterion = lambda a, b: jnp.mean(jnp.abs(a - b))
        else:
            raise ValueError(f"Criterion {criterion} is not recognized")
        self.instance_normalized = instance_normalized
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
        elif network in ("alexnet", "resnet50", "robust_resnet50"):
            self._min_size = 64
        elif network == "inception_v3":
            # VALID 3x3 convs + five stride-2 reductions: below ~75 px a map
            # goes empty before pool_3
            self._min_size = 75
        elif network == "vgg_face_dag":
            # the conv trunk downsamples /32 and fc6 needs a 7x7 map
            self._min_size = 224
        else:
            self._min_size = 0
        if network == "l1":
            self.model = None
            self.params = None
        else:
            if network not in PERCEPTUAL_NETWORKS:
                raise ValueError(f"unknown perceptual network: {network} "
                                 f"(have {sorted(PERCEPTUAL_NETWORKS)} + 'l1')")
            self.model = PERCEPTUAL_NETWORKS[network][0](self.layers)
            if vgg_params is None:
                init_size = max(self._min_size, 64)
                vgg_params = self.model.init(
                    rng if rng is not None else jax.random.PRNGKey(0),
                    jnp.zeros((1, init_size, init_size, 3)))
            self.params = vgg_params

    def __call__(self, inp: Array, target: Array,
                 mask: Optional[Array] = None) -> Array:
        if self.model is None:
            return jnp.mean(jnp.abs(inp - target))
        inp = apply_imagenet_normalization(inp)
        target = apply_imagenet_normalization(target)
        if self.resize:
            b, _, _, c = inp.shape
            inp = jax.image.resize(inp, (b, 224, 224, c), "bilinear")
            target = jax.image.resize(target, (b, 224, 224, c), "bilinear")
        loss = 0.0
        style_loss = 0.0
        for scale in range(self.num_scales):
            if min(inp.shape[1], inp.shape[2]) < self._min_size:
                break  # deepest tap would pool to an empty map (NaN)
            fi = self.model.apply(self.params, inp)
            ft = self.model.apply(self.params, target)
            for name, weight in zip(self.layers, self.weights):
                a = fi[name]
                b = jax.lax.stop_gradient(ft[name])
                if a.ndim == 4:  # spatial taps only (vgg_face fc taps are 2-D)
                    if self.instance_normalized:
                        a = _instance_norm(a)
                        b = _instance_norm(b)
                    if mask is not None:
                        # reference interpolates the mask to the feature size
                        # and multiplies both sides (perceptual.py:134-140)
                        m = jax.image.resize(
                            mask, (a.shape[0], a.shape[1], a.shape[2],
                                   mask.shape[-1]), "bilinear")
                        a = a * m
                        b = b * m
                loss = loss + weight * self._criterion(a, b)
                if self.use_style_loss and scale == 0 and fi[name].ndim == 4:
                    style_loss = style_loss + self._criterion(
                        _gram(fi[name]),
                        jax.lax.stop_gradient(_gram(ft[name])))
            if scale != self.num_scales - 1:
                b, h, w, c = inp.shape
                inp = jax.image.resize(inp, (b, h // 2, w // 2, c), "bilinear")
                target = jax.image.resize(target, (b, h // 2, w // 2, c), "bilinear")
        if self.use_style_loss:
            return loss + self.weight_style * style_loss
        return loss
