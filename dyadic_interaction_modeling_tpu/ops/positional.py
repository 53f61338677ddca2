"""Positional encodings and attention-bias masks (L2).

Parity targets:

* ``PositionalEncoding``       - base_models.py:258-273 (incl. its batch-axis quirk)
* ``PositionEmbedding``        - base_models.py:248-256 (learned, zero-init)
* ``PeriodicPositionalEncoding`` - models/utils.py:43-58
* ``init_biased_mask`` (ALiBi-style temporal bias + causal -inf) - models/utils.py:8-29
* ``enc_dec_mask`` (audio/motion alignment) - models/utils.py:32-40
* 2D sin-cos embeds - pos_embed.py:37-90
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def sinusoid_table(max_len: int, d_model: int, dtype=jnp.float32) -> Array:
    """Standard transformer sin/cos table, shape (max_len, d_model)."""
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * (-math.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return jnp.asarray(pe, dtype=dtype)


class PositionalEncoding(nn.Module):
    """Sinusoidal PE + dropout - bug-compatible with the reference.

    QUIRK (reproduced deliberately): the reference builds ``pe`` with shape
    (max_len, 1, d_model) and adds ``pe[:x.size(0)]`` to a *batch-first*
    input (base_models.py:271-272), so sample ``b`` in the batch receives the
    encoding for position ``b`` broadcast across every frame - the encoding
    varies with batch index, not time. All VQ-VAE checkpoints were trained
    with this behavior, so we reproduce it bit-for-bit. Set
    ``time_axis=True`` for the corrected per-frame encoding.
    """

    d_model: int
    dropout: float = 0.1
    max_len: int = 5000
    mode: str = "batch"  # 'batch' | 'single' | 'time'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True,
                 mode: Optional[str] = None) -> Array:
        """mode 'batch': reference quirk - sample b gets encoding of position b
        (matches the reference processing a batch of size B).
        mode 'single': every sample gets position-0 encoding - equivalent to
        the reference processing each sample alone (batch size 1), which is
        what its per-sample VQ-encode loops do (seq2seq_pretrain.py:185-199).
        mode 'time': the conventional per-frame encoding.
        """
        mode = mode or self.mode
        pe = sinusoid_table(self.max_len, self.d_model, self.dtype)
        if mode == "time":
            x = x + pe[None, : x.shape[1], :]
        elif mode == "single":
            x = x + pe[0][None, None, :]
        else:  # 'batch' - reference quirk: index by batch position
            x = x + pe[: x.shape[0], None, :]
        if self.dropout > 0.0 and not deterministic:
            x = nn.Dropout(rate=self.dropout)(x, deterministic=False)
        return x


class PositionEmbedding(nn.Module):
    """Learned position embedding, zero-initialised (base_models.py:248-256)."""

    seq_length: int
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        emb = self.param("pos_embedding", nn.initializers.zeros, (self.seq_length, self.dim))
        return x + emb.astype(x.dtype)


class PeriodicPositionalEncoding(nn.Module):
    """Sin/cos table of length ``period`` tiled to max_seq_len (models/utils.py:43-58)."""

    d_model: int
    period: int = 25
    max_seq_len: int = 600
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        pe = sinusoid_table(self.period, self.d_model, self.dtype)
        repeat = self.max_seq_len // self.period + 1
        pe = jnp.tile(pe, (repeat, 1))
        x = x + pe[None, : x.shape[1], :]
        if self.dropout > 0.0 and not deterministic:
            x = nn.Dropout(rate=self.dropout)(x, deterministic=False)
        return x


def _alibi_slopes(n_head: int) -> np.ndarray:
    """FaceFormer/ALiBi head slopes (models/utils.py:9-18)."""

    def power_of_2(n):
        start = 2 ** (-(2 ** -(math.log2(n) - 3)))
        return [start * (start ** i) for i in range(n)]

    if math.log2(n_head).is_integer():
        return np.asarray(power_of_2(n_head))
    closest = 2 ** math.floor(math.log2(n_head))
    base = power_of_2(closest)
    extra = _alibi_slopes(2 * closest)[0::2][: n_head - closest]
    return np.asarray(base + list(extra))


def init_biased_mask(n_head: int, max_seq_len: int, period: int) -> Array:
    """Causal mask with ALiBi-style period-quantised temporal bias.

    Returns (n_head, max_seq_len, max_seq_len): upper triangle is -inf,
    positions i>=j carry ``-slope_h * floor((i-j)/period)``
    (models/utils.py:8-29).
    """
    slopes = _alibi_slopes(n_head)
    i = np.arange(max_seq_len)[:, None]
    j = np.arange(max_seq_len)[None, :]
    dist = np.floor((i - j) / period)
    alibi = -dist * (i >= j)
    mask = np.where(j > i, -np.inf, 0.0)
    out = slopes[:, None, None] * alibi[None] + mask[None]
    return jnp.asarray(out, dtype=jnp.float32)


def enc_dec_mask(dataset: str, T: int, S: int) -> Array:
    """Alignment mask for decoder->audio cross attention (models/utils.py:32-40).

    Returns boolean (T, S); True = MASKED (reference returns mask==1 and the
    torch decoder treats True as disallowed). BIWI: motion frame i may attend
    audio frames 2i, 2i+1 only; vocaset: frame i <-> audio i.
    """
    i = np.arange(T)[:, None]
    j = np.arange(S)[None, :]
    if dataset == "BIWI":
        allowed = (j == 2 * i) | (j == 2 * i + 1)
    elif dataset == "vocaset":
        allowed = j == i
    else:
        raise ValueError(f"unknown dataset for enc_dec_mask: {dataset}")
    return jnp.asarray(~allowed)


def get_1d_sincos_pos_embed_from_grid(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """(pos_embed.py:64-82)"""
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000 ** omega
    out = np.einsum("m,d->md", pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int, cls_token: bool = False) -> np.ndarray:
    """2D sin-cos position embedding (pos_embed.py:37-61)."""
    grid_h = np.arange(grid_size, dtype=np.float64)
    grid_w = np.arange(grid_size, dtype=np.float64)
    grid = np.meshgrid(grid_w, grid_h)
    grid = np.stack(grid, axis=0).reshape([2, 1, grid_size, grid_size])
    emb_h = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[0])
    emb_w = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[1])
    pos_embed = np.concatenate([emb_h, emb_w], axis=1)
    if cls_token:
        pos_embed = np.concatenate([np.zeros([1, embed_dim]), pos_embed], axis=0)
    return pos_embed


def interpolate_pos_embed(pos_embed: np.ndarray, new_grid_size: int,
                          num_extra_tokens: int = 1) -> np.ndarray:
    """Bicubic-resize a 2D sin-cos/learned position table to a new grid size
    (pos_embed.py:92-111). pos_embed: (extra + g*g, dim)."""
    from scipy.ndimage import zoom

    dim = pos_embed.shape[-1]
    extra = pos_embed[:num_extra_tokens]
    grid = pos_embed[num_extra_tokens:]
    old = int(math.sqrt(grid.shape[0]))
    if old == new_grid_size:
        return pos_embed
    grid = grid.reshape(old, old, dim)
    factor = new_grid_size / old
    grid = zoom(grid, (factor, factor, 1), order=3)
    return np.concatenate([extra, grid.reshape(-1, dim)], axis=0)


def length_mask(lengths: Array, max_len: int) -> Array:
    """Boolean (B, max_len): True where position < length.

    Replaces the reference's per-row python loop building masks
    (x_engine_pt.py:31-33) with a vectorised comparison.
    """
    return jnp.arange(max_len)[None, :] < lengths[:, None]


def causal_mask(n: int) -> Array:
    """Lower-triangular boolean mask (True = attend), (n, n)."""
    return jnp.tril(jnp.ones((n, n), dtype=bool))
