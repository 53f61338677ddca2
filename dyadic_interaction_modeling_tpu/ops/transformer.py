"""Pre-norm transformer block library (L2).

Functional parity with ``/root/reference/code/models/lib/base_models.py``
(Norm :9, Residual :26, MLP :43, CrossModalAttention :62, Attention :110,
Transformer :149, LinearEmbedding :202), redesigned for TPU:

* batched einsum attention that XLA tiles onto the MXU; optionally a Pallas
  flash-attention kernel for long sequences (ops/pallas/attention.py),
* no tuple/mask-dict threading - masks are explicit arguments,
* dtype policy: params live in fp32, activations may run in bf16.

Reproduced quirks (bug-compatible by design, see SURVEY.md section 7):

* the attention scale is ``hidden_size ** -0.5`` - the FULL model width, not
  the per-head width (base_models.py:71,116 set ``self.scale = dim**-0.5``
  and apply it to per-head dots at :101,:136),
* gelu is the tanh approximation (utils/base_model_util.py:92-94), which is
  ``jax.nn.gelu(..., approximate=True)``,
* LayerNorm eps = 1e-5 (base_models.py:14).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import jax

Array = jax.Array

_NEG_INF = float("-inf")


def _flash_dispatch(kv_len: int) -> bool:
    """Fused Pallas attention for long sequences (1.7x at ViCo scale,
    measured fp32 D48 L1024 on v5e); see models/xtrans._use_flash."""
    import os

    if os.environ.get("DIM_TPU_FLASH", "1") == "0":
        return False
    if not (512 <= kv_len <= 1024):
        return False
    from .pallas.attention import flash_available

    return flash_available()


def _attend(q, k, v, scale, mask: Optional[Array], bias: Optional[Array]):
    """softmax(q k^T * scale + bias) v with optional boolean mask.

    q,k,v: (B, H, L, D). mask: broadcastable to (B, H, Lq, Lk); True = keep
    (reference masks with ``masked_fill(mask == 0, -inf)``,
    base_models.py:137-139). bias: additive (e.g. ALiBi), broadcastable.
    """
    dots = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32)
    dots = dots * scale
    if bias is not None:
        dots = dots + bias
    if mask is not None:
        dots = jnp.where(mask, dots, _NEG_INF)
    attn = jax.nn.softmax(dots, axis=-1)
    out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    return out


def split_heads(x: Array, heads: int) -> Array:
    b, n, d = x.shape
    return x.reshape(b, n, heads, d // heads).transpose(0, 2, 1, 3)


def merge_heads(x: Array) -> Array:
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)


class Attention(nn.Module):
    """Self-attention (base_models.py:110-146).

    Fused qkv projection without bias; output projection with bias. The
    softmax scale is ``dim ** -0.5`` with dim = full hidden size (quirk).
    """

    dim: int
    heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None) -> Array:
        qkv = nn.Dense(self.dim * 3, use_bias=False, dtype=self.dtype, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (split_heads(t, self.heads) for t in (q, k, v))
        scale = self.dim ** -0.5  # full-width scale, reference quirk
        key_mask = None
        if mask is not None and mask.ndim == 3 and mask.shape[1] == 1:
            key_mask = mask[:, 0]  # (B, Lk) padding mask
        if (mask is None or key_mask is not None) and _flash_dispatch(k.shape[2]):
            from .pallas.attention import flash_attention

            out = flash_attention(q, k, v, key_mask=key_mask, scale=scale)
            out = merge_heads(out)
            return nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)
        if mask is not None and mask.ndim == 2:  # (Lq, Lk) -> (1,1,Lq,Lk)
            mask = mask[None, None]
        elif mask is not None and mask.ndim == 3:  # (B, Lq, Lk)
            mask = mask[:, None]
        out = _attend(q, k, v, scale, mask, None)
        out = merge_heads(out)
        return nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)


class CrossModalAttention(nn.Module):
    """Q from modality a, K/V from modality b (base_models.py:62-107)."""

    dim: int
    heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_a: Array, x_b: Array, mask: Optional[Array] = None) -> Array:
        kv = nn.Dense(self.dim * 2, use_bias=False, dtype=self.dtype, name="to_kv")(x_b)
        q = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="to_q")(x_a)
        k, v = jnp.split(kv, 2, axis=-1)
        q, k, v = (split_heads(t, self.heads) for t in (q, k, v))
        scale = self.dim ** -0.5
        if mask is not None and mask.ndim == 2:
            mask = mask[None, None]
        elif mask is not None and mask.ndim == 3:
            mask = mask[:, None]
        out = _attend(q, k, v, scale, mask, None)
        out = merge_heads(out)
        return nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)


class MLP(nn.Module):
    """Linear -> tanh-gelu -> Linear (base_models.py:43-59)."""

    out_dim: int
    hidden_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="l1")(x)
        x = jax.nn.gelu(x, approximate=True)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="l2")(x)


class TransformerBlock(nn.Module):
    """Residual(Norm(Attention)) + Residual(Norm(MLP)) pre-norm pair."""

    dim: int
    heads: int
    intermediate: int
    cross_modal: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array] = None,
                 mask: Optional[Array] = None) -> Array:
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_attn")(x)
        if self.cross_modal:
            h = CrossModalAttention(self.dim, self.heads, dtype=self.dtype, name="attn")(
                context, h, mask)
        else:
            h = Attention(self.dim, self.heads, dtype=self.dtype, name="attn")(h, mask)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_mlp")(x)
        h = MLP(self.dim, self.intermediate, dtype=self.dtype, name="mlp")(h)
        return x + h


class Transformer(nn.Module):
    """Stack of pre-norm blocks (base_models.py:149-199).

    Matches the reference's vanilla configuration: ``num_hidden_layers``
    (attention, MLP) pairs, no final norm. For the cross-modal variant, the
    query modality ``context`` (reference ``x_a``) is fixed across layers and
    only the K/V stream is normed/updated, exactly like the reference's
    dict-threading path (base_models.py:17-20,34-36).
    """

    hidden_size: int
    num_hidden_layers: int
    num_attention_heads: int
    intermediate_size: int
    cross_modal: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array] = None,
                 mask: Optional[Array] = None) -> Array:
        for i in range(self.num_hidden_layers):
            x = TransformerBlock(
                self.hidden_size,
                self.num_attention_heads,
                self.intermediate_size,
                cross_modal=self.cross_modal,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, context=context, mask=mask)
        return x


class LinearEmbedding(nn.Module):
    """Single linear layer (base_models.py:202-210)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.Dense(self.dim, dtype=self.dtype, name="net")(x)


class AudioEmbedding(nn.Module):
    """Audio max-pool squasher + projection (base_models.py:213-246, 'v6').

    Input (B, C, L) like the reference: MaxPool1d(4) then ``quant_factor``
    MaxPool1d(2) stages over time, then a linear projection C -> dim.
    """

    size: int
    dim: int
    quant_factor: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from .convseq import max_pool_time

        h = jnp.transpose(x, (0, 2, 1))  # (B, L, C)
        h = max_pool_time(h, 4)
        for _ in range(max(self.quant_factor, 1)):
            h = max_pool_time(h, 2)
        h = nn.Dense(self.dim, dtype=self.dtype, name="proj")(h)
        return jnp.transpose(h, (0, 2, 1))


class CrossModalLayer(nn.Module):
    """FACT-style cross-modal layer (base_models.py:276-328): concat the two
    modality sequences, learned position embedding, transformer, layernorm,
    unbiased output projection."""

    in_dim: int
    out_dim: int
    sequence_length: int
    num_hidden_layers: int = 2
    num_attention_heads: int = 8
    intermediate_size: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, modal_a: Array, modal_b: Optional[Array] = None,
                 mask: Optional[Array] = None) -> Array:
        merged = modal_a
        if modal_b is not None:
            assert modal_a.shape[-1] == modal_b.shape[-1], (
                "modal_a/modal_b hidden sizes must match (base_models.py:317-320)")
            merged = jnp.concatenate([modal_a, modal_b], axis=1)
        pos = self.param("pos_embedding", nn.initializers.zeros,
                         (self.sequence_length, self.in_dim))
        merged = merged + pos[None, : merged.shape[1]].astype(merged.dtype)
        merged = Transformer(
            hidden_size=self.in_dim,
            num_hidden_layers=self.num_hidden_layers,
            num_attention_heads=self.num_attention_heads,
            intermediate_size=self.intermediate_size,
            dtype=self.dtype, name="transformer_layer")(merged, mask=mask)
        merged = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                              name="cross_norm_layer")(merged)
        return nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                        name="cross_output_layer")(merged)
