"""Temporal conv squasher / expander ops (L2).

Parity targets: the VQ-VAE encoder "squasher" and decoder "expander" stacks in
``/root/reference/code/models/stage1_BIWI.py:263-285, 328-353`` -
Conv1d(k=5, stride 1|2, padding 2, replicate padding) -> LeakyReLU(neg) ->
InstanceNorm1d [-> MaxPool1d(2)], and the mirrored
ConvTranspose1d / Conv1d + repeat_interleave(2) upsampling
(stage1_BIWI.py:376-393).

TPU design notes: everything runs in (B, L, C) layout (feature-minor, the
layout XLA prefers on TPU); convs are expressed with
``lax.conv_general_dilated`` over the time axis with channels as the
contraction so the MXU does the work. Replicate padding is an explicit edge
pad + VALID conv.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def _edge_pad_time(x: Array, pad: int) -> Array:
    """Replicate-pad along the time axis of a (B, L, C) tensor."""
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")


def conv1d_replicate(x: Array, w: Array, b: Optional[Array], stride: int, pad: int) -> Array:
    """Conv over time with replicate padding.

    x: (B, L, Cin); w: (K, Cin, Cout); b: (Cout,) or None.
    Matches ``nn.Conv1d(..., padding=pad, padding_mode='replicate')``.
    """
    x = _edge_pad_time(x, pad)
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if b is not None:
        out = out + b
    return out


def conv1d_transpose_torch(x: Array, w: Array, b: Optional[Array],
                           stride: int, pad: int, output_padding: int) -> Array:
    """ConvTranspose1d with torch semantics.

    x: (B, L, Cin); w: (K, Cout, Cin) stored flax-style (K, In=Cout? no:)
    here w is (K, Cin, Cout) of the *transposed* op, i.e. we implement the
    op directly as an input-dilated correlation with the flipped kernel:
    out_len = (L-1)*stride - 2*pad + K + output_padding.

    NOTE: torch only supports zero padding for ConvTranspose1d; the
    reference's ``padding_mode='replicate'`` argument is silently invalid
    there and unused in shipped configs (quant_factor=0), so zero padding is
    correct here.
    """
    k = w.shape[0]
    lo = k - 1 - pad
    hi = k - 1 - pad + output_padding
    w_flip = jnp.flip(w, axis=0)
    out = jax.lax.conv_general_dilated(
        x, w_flip,
        window_strides=(1,),
        padding=((lo, hi),),
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if b is not None:
        out = out + b
    return out


def instance_norm_1d(x: Array, eps: float = 1e-5,
                     scale: Optional[Array] = None, bias: Optional[Array] = None) -> Array:
    """InstanceNorm1d over the time axis of (B, L, C).

    torch normalizes each (sample, channel) over time with biased variance
    (nn.InstanceNorm1d default eps=1e-5, affine optional - stage1_BIWI.py:268).
    """
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=1, keepdims=True)
    out = (x - mean) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        out = out * scale
    if bias is not None:
        out = out + bias
    return out


def fill_pad_with_edge(x: Array, lengths: Array) -> Array:
    """Replace padded frames with each sequence's last valid frame.

    Makes a batched conv over padded sequences produce, at every *valid*
    position, exactly what the reference's per-sample replicate-padded conv
    produces (the k=5/pad=2 kernel only ever sees <=2 frames past the end,
    which replicate padding fills with the final frame).
    """
    b, l, _ = x.shape
    idx = jnp.minimum(jnp.arange(l)[None, :], lengths[:, None] - 1)
    return jnp.take_along_axis(x, idx[:, :, None], axis=1)


def masked_instance_norm_1d(x: Array, lengths: Array, eps: float = 1e-5,
                            scale: Optional[Array] = None,
                            bias: Optional[Array] = None) -> Array:
    """InstanceNorm1d over only the first ``lengths`` frames of each sample.

    Matches the reference encoding each sample's unpadded sequence alone;
    padded positions get garbage values and must be masked downstream.
    """
    b, l, c = x.shape
    m = (jnp.arange(l)[None, :] < lengths[:, None]).astype(x.dtype)[:, :, None]
    denom = jnp.maximum(lengths.astype(x.dtype), 1.0)[:, None, None]
    mean = jnp.sum(x * m, axis=1, keepdims=True) / denom
    var = jnp.sum(jnp.square(x - mean) * m, axis=1, keepdims=True) / denom
    out = (x - mean) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        out = out * scale
    if bias is not None:
        out = out + bias
    return out


def max_pool_time(x: Array, window: int = 2) -> Array:
    """MaxPool1d over time, stride = window, floor semantics (drop tail)."""
    b, l, c = x.shape
    l_out = l // window
    x = x[:, : l_out * window].reshape(b, l_out, window, c)
    return jnp.max(x, axis=2)


class _ConvINBlock(nn.Module):
    """One Conv1d(k=5, pad=2, replicate) -> LeakyReLU -> InstanceNorm block."""

    dim: int
    stride: int = 1
    neg: float = 0.2
    affine: bool = False
    max_pool: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, lengths: Optional[Array] = None) -> Array:
        w = self.param("kernel", nn.initializers.lecun_normal(), (5, x.shape[-1], self.dim))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        x = x.astype(self.dtype)
        if lengths is not None:
            x = fill_pad_with_edge(x, lengths)
        x = conv1d_replicate(x, w.astype(self.dtype), b.astype(self.dtype), self.stride, 2)
        x = nn.leaky_relu(x, negative_slope=self.neg)
        scale = shift = None
        if self.affine:
            scale = self.param("in_scale", nn.initializers.ones, (self.dim,)).astype(self.dtype)
            shift = self.param("in_bias", nn.initializers.zeros, (self.dim,)).astype(self.dtype)
        if lengths is not None:
            x = masked_instance_norm_1d(x, lengths, scale=scale, bias=shift)
        else:
            x = instance_norm_1d(x, scale=scale, bias=shift)
        if self.max_pool:
            x = max_pool_time(x, 2)
        return x


class ConvSquasher(nn.Module):
    """Encoder squasher stack (stage1_BIWI.py:263-286).

    quant_factor == 0: single stride-1 block (frame-rate codes, the shipped
    config). quant_factor > 0: one stride-2 block followed by
    (quant_factor - 1) stride-1 + MaxPool(2) blocks => 2^quant_factor
    temporal downsampling.
    """

    dim: int
    quant_factor: int = 0
    neg: float = 0.2
    affine: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, lengths: Optional[Array] = None) -> Array:
        if self.quant_factor == 0:
            return _ConvINBlock(self.dim, 1, self.neg, self.affine, dtype=self.dtype,
                                name="block_0")(x, lengths)
        assert lengths is None, "masked squash only supported for quant_factor=0"
        x = _ConvINBlock(self.dim, 2, self.neg, self.affine, dtype=self.dtype,
                         name="block_0")(x)
        for i in range(1, self.quant_factor):
            x = _ConvINBlock(self.dim, 1, self.neg, self.affine, max_pool=True,
                             dtype=self.dtype, name=f"block_{i}")(x)
        return x


class ConvExpander(nn.Module):
    """Decoder expander stack (stage1_BIWI.py:328-353, applied :382-385).

    quant_factor == 0: single stride-1 conv block. quant_factor > 0: one
    ConvTranspose(stride 2) block then (num_layers - 1) conv blocks, each
    followed by repeat_interleave(2) along time (the reference applies the
    repeat for every block index i > 0).
    """

    dim: int
    quant_factor: int = 0
    is_audio: bool = False
    neg: float = 0.2
    affine: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, lengths: Optional[Array] = None) -> Array:
        if self.quant_factor == 0:
            return _ConvINBlock(self.dim, 1, self.neg, self.affine, dtype=self.dtype,
                                name="block_0")(x, lengths)
        assert lengths is None, "masked expand only supported for quant_factor=0"
        # first: transposed conv upsample x2
        w = self.param("tconv_kernel", nn.initializers.lecun_normal(), (5, x.shape[-1], self.dim))
        b = self.param("tconv_bias", nn.initializers.zeros, (self.dim,))
        x = x.astype(self.dtype)
        x = conv1d_transpose_torch(x, w.astype(self.dtype), b.astype(self.dtype),
                                   stride=2, pad=2, output_padding=1)
        x = nn.leaky_relu(x, negative_slope=self.neg)
        if self.affine:
            scale = self.param("in_scale", nn.initializers.ones, (self.dim,))
            shift = self.param("in_bias", nn.initializers.zeros, (self.dim,))
            x = instance_norm_1d(x, scale=scale.astype(self.dtype), bias=shift.astype(self.dtype))
        else:
            x = instance_norm_1d(x)
        num_layers = self.quant_factor + 2 if self.is_audio else self.quant_factor
        for i in range(1, num_layers):
            x = _ConvINBlock(self.dim, 1, self.neg, self.affine, dtype=self.dtype,
                             name=f"block_{i}")(x)
            x = jnp.repeat(x, 2, axis=1)  # repeat_interleave(2, dim=time)
        return x
