"""x-transformers replacement stack (L2/L3).

The reference delegates every seq2seq model to lucidrains' ``x-transformers``
(``/root/reference/code/seq2seq_pretrain.py:10``, ``seq2seq.py:10``):
``ContinuousTransformerWrapper`` + ``Encoder``, ``TransformerWrapper`` +
``Decoder(cross_attend=True)`` + ``AutoregressiveWrapper``. This module is a
ground-up JAX rebuild of the *semantics* the reference relies on:

* pre-norm attention layers, dim_head=64, separate unbiased q/k/v/out
  projections, GELU feedforward (mult 4), final LayerNorm,
* learned absolute positional embeddings up to ``max_seq_len``,
* ``AutoregressiveWrapper`` training loss: inputs ``x[:, :-1]`` (with
  ignore_index positions replaced by pad_value), targets ``x[:, 1:]``,
  cross-entropy with ``ignore_index=-100``; optional ``mask_prob`` input
  corruption implemented as a self-attention key mask,
* ``generate``: per-token sampling with top-k filtering (top 10% of the
  vocabulary) and temperature 1.0 - matching x-transformers' defaults used
  by SLMFT eval (seq2seq_pretrain.py:450).

TPU redesign: generation is a jitted ``lax.scan`` over a preallocated
self-attention KV cache with cross-attention K/V computed once - one matmul
bundle per token instead of the reference's full re-forward per token
(x-transformers ``.generate`` python loop). Best-of-N sampling batches across
the sample axis (engine.pt_engine) instead of looping.
"""

from __future__ import annotations

import math

from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

NEG_INF = float("-inf")


def _use_flash(kv_len: int, dim_head: int) -> bool:
    """Dispatch to the Pallas fused attention when it wins: TPU backend,
    no-pad head dims, L large enough to matter, and within the q-tiled
    backward kernel's VMEM budget (L <= 2048 - covers the reference's
    enc_max_seq_len=2048, seq2seq_pretrain.py:118)."""
    import os

    if os.environ.get("DIM_TPU_FLASH", "1") == "0":
        return False
    # measured on v5e: at L=256 the fused kernel's fixed overhead loses to
    # XLA's dense path (245 vs 208 ms SLM step); at L>=512 it wins decisively
    # (the masked dense softmax degrades to seconds at L=1024).
    if dim_head not in (64, 128) or not (512 <= kv_len <= 2048):
        return False
    from ..ops.pallas.attention import flash_available

    return flash_available()


def _decode_kernel_mode() -> str:
    """``DIM_TPU_DECODE_KERNEL`` resolved ONCE per process (cached): the flag
    is read at trace time inside jitted code and the jit cache is not keyed
    on it, so toggling mid-process would silently keep the compiled dispatch.
    Set it before the first model use."""
    global _DECODE_KERNEL_MODE
    if _DECODE_KERNEL_MODE is None:
        import os

        _DECODE_KERNEL_MODE = os.environ.get("DIM_TPU_DECODE_KERNEL", "0")
    return _DECODE_KERNEL_MODE


_DECODE_KERNEL_MODE: Optional[str] = None


def reset_decode_kernel_mode() -> None:
    """Re-read DIM_TPU_DECODE_KERNEL on next use. Test hook: fresh jit
    closures retrace and pick up the new mode; already-compiled functions do
    NOT (their cache is not keyed on the flag)."""
    global _DECODE_KERNEL_MODE
    _DECODE_KERNEL_MODE = None


def _use_decode_kernel(kv_len: int, dim_head: int, which: str) -> bool:
    """Opt-in dispatch to the fused single-step decode-attention kernel
    (ops/pallas/decode.py). ``DIM_TPU_DECODE_KERNEL`` = ``1`` (both),
    ``self``, ``cross``, or unset/``0`` (off, the default).

    OFF by default: standalone the kernel matches XLA's step attention at the
    platform's measured ~360 GB/s bf16 streaming ceiling and reads only the
    live cache prefix, but inside the generation ``lax.scan`` the custom-call
    boundary on the scan-carried cache costs ~4x end-to-end (measured
    B=256/L=256; PERF.md round-2 decode notes). The production bandwidth fix
    is context sharing (``context_groups``) + chunked-prefix decode, both
    pure XLA."""
    mode = _decode_kernel_mode()
    if mode not in ("1", "self", "cross") or (
            mode in ("self", "cross") and mode != which):
        return False
    if dim_head not in (64, 128) or kv_len < 128:
        return False
    from ..ops.pallas.decode import decode_attention_available

    return decode_attention_available()


# ---------------------------------------------------------------------------
# layers
# ---------------------------------------------------------------------------


class XAttention(nn.Module):
    """x-transformers-style attention: per-head scale, no biases.

    ``kv_heads`` (grouped-query attention): K/V are projected and cached at
    ``kv_heads`` heads (< ``heads``); each KV head serves a contiguous group
    of ``heads // kv_heads`` query heads. ``None`` (default) = ``heads`` =
    the reference's multi-head layout, checkpoint-compatible. This is a
    TPU-native from-scratch knob like ``attn_dim_head``: the decode loop is
    ELEMENT-rate-limited on KV-cache reads (PERF.md int8 probe), and GQA
    divides exactly those elements by ``heads / kv_heads``.
    """

    dim: int
    heads: int = 8
    dim_head: int = 64
    causal: bool = False
    dtype: jnp.dtype = jnp.float32
    kv_heads: Optional[int] = None

    def setup(self):
        kvh = self.kv_heads or self.heads
        assert self.heads % kvh == 0, (self.heads, kvh)
        inner = self.heads * self.dim_head
        self.to_q = nn.Dense(inner, use_bias=False, dtype=self.dtype)
        self.to_k = nn.Dense(kvh * self.dim_head, use_bias=False, dtype=self.dtype)
        self.to_v = nn.Dense(kvh * self.dim_head, use_bias=False, dtype=self.dtype)
        self.to_out = nn.Dense(self.dim, use_bias=False, dtype=self.dtype)

    def _proj(self, x, name):
        return {"to_q": self.to_q, "to_k": self.to_k, "to_v": self.to_v}[name](x)

    @property
    def _kvh(self) -> int:
        return self.kv_heads or self.heads

    @property
    def _group(self) -> int:
        return self.heads // self._kvh

    def _split(self, x):
        b, n, _ = x.shape
        return x.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)

    def _split_kv(self, x):
        b, n, _ = x.shape
        return x.reshape(b, n, self._kvh, self.dim_head).transpose(0, 2, 1, 3)

    def _fold_q(self, q):
        """(B, H, N, D) -> (B, KVH, G*N, D): query head h = kv_head * G + g
        folds into G rows per kv head, so the grouped attention runs through
        the SAME 4-d einsums as multi-head (one batched GEMM per kv head).
        Row-dependent masks must be tiled (G, N)-major to match."""
        b, h, n, d = q.shape
        return q.reshape(b, self._kvh, self._group * n, d)

    def _unfold_o(self, o, n):
        """(B, KVH, G*N, D) -> (B, H, N, D) (inverse of ``_fold_q``)."""
        b, kvh, gn, d = o.shape
        return o.reshape(b, self.heads, n, d)

    def __call__(self, x: Array, context: Optional[Array] = None,
                 key_mask: Optional[Array] = None,
                 attn_mask: Optional[Array] = None) -> Array:
        """key_mask: (B, Lk) True=attend; attn_mask: (Lq, Lk) or (B, Lq, Lk)."""
        kv_src = x if context is None else context
        q = self._split(self._proj(x, "to_q"))
        k = self._split_kv(self._proj(kv_src, "to_k"))
        v = self._split_kv(self._proj(kv_src, "to_v"))
        scale = self.dim_head ** -0.5
        g = self._group
        if attn_mask is None and _use_flash(k.shape[2], self.dim_head):
            # fused Pallas attention: the XLA masked-softmax path degrades
            # badly at long L on this platform (measured 1646x at L=1024).
            # GQA broadcasts K/V to full heads here - the kernel is O(L^2)
            # compute-bound in training, where the linear-size repeat is noise
            # (the GQA win is the DECODE cache, which never takes this path).
            from ..ops.pallas.attention import flash_attention

            kf = jnp.repeat(k, g, axis=1) if g > 1 else k
            vf = jnp.repeat(v, g, axis=1) if g > 1 else v
            out = flash_attention(q, kf, vf, key_mask=key_mask,
                                  causal=self.causal, scale=scale)
            b, h, n, d = out.shape
            out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
            return self.to_out(out)
        nq = q.shape[2]
        dots = jnp.einsum("bhid,bhjd->bhij", self._fold_q(q), k,
                          preferred_element_type=jnp.float32) * scale
        lk = dots.shape[-1]
        # row-dependent masks tile (G, nq)-major to match _fold_q's row order
        if self.causal:
            causal = jnp.tril(jnp.ones((nq, lk), dtype=bool), lk - nq)
            dots = jnp.where(jnp.tile(causal, (g, 1))[None, None], dots, NEG_INF)
        if attn_mask is not None:
            if attn_mask.ndim == 2:
                attn_mask = jnp.tile(attn_mask, (g, 1))[None, None]
            elif attn_mask.ndim == 3:
                attn_mask = jnp.tile(attn_mask, (1, g, 1))[:, None]
            dots = jnp.where(attn_mask, dots, NEG_INF)
        if key_mask is not None:
            dots = jnp.where(key_mask[:, None, None, :], dots, NEG_INF)
        attn = jax.nn.softmax(dots, axis=-1)
        # fully-masked rows (padding queries) produce NaN-free zeros
        attn = jnp.where(jnp.isfinite(dots).any(axis=-1, keepdims=True), attn, 0.0)
        out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        out = self._unfold_o(out, nq)
        b, h, n, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        return self.to_out(out)

    # --- cached single-step path (generation) ---

    def cross_kv(self, context: Array) -> Tuple[Array, Array]:
        """Precompute cross-attention K/V once per generated sequence
        ((B, KVH, L, Dh) - ``kv_heads`` wide under GQA)."""
        k = self._split_kv(self._proj(context, "to_k"))
        v = self._split_kv(self._proj(context, "to_v"))
        return k, v

    def step_self(self, x_t: Array, cache_k: Array, cache_v: Array, t: Array
                  ) -> Tuple[Array, Array, Array]:
        """Single-token causal self-attention against a KV cache.

        x_t: (B, 1, dim); cache_k/v: (B, KVH, Lmax, Dh); t: scalar step index.
        Returns (out (B,1,dim), new_cache_k, new_cache_v).
        """
        q = self._split(self._proj(x_t, "to_q"))         # (B,H,1,Dh)
        k_t = self._split_kv(self._proj(x_t, "to_k"))
        v_t = self._split_kv(self._proj(x_t, "to_v"))
        cache_k = jax.lax.dynamic_update_slice(cache_k, k_t, (0, 0, t, 0))
        cache_v = jax.lax.dynamic_update_slice(cache_v, v_t, (0, 0, t, 0))
        scale = self.dim_head ** -0.5
        b, h, lmax, dh = cache_k.shape  # h = KVH under GQA
        q = self._fold_q(q)                              # (B,KVH,G,Dh) rows
        if _use_decode_kernel(lmax, self.dim_head, "self"):
            from ..ops.pallas.decode import decode_attention

            # block_k=64: the decode loop is HBM-bound and the kernel reads
            # only ceil((t+1)/block_k) blocks - finer blocks read less of the
            # cache (avg ~62% saved at L=256) at still-chunky DMA sizes
            o = decode_attention(q.reshape(b * h, self._group, dh),
                                 cache_k.reshape(b * h, lmax, dh),
                                 cache_v.reshape(b * h, lmax, dh),
                                 t, scale=scale, block_k=64)
            out = o.reshape(b, h, self._group, dh).astype(x_t.dtype)
        else:
            dots = jnp.einsum("bhid,bhjd->bhij", q, cache_k,
                              preferred_element_type=jnp.float32) * scale
            valid = jnp.arange(lmax)[None, None, None, :] <= t
            dots = jnp.where(valid, dots, NEG_INF)
            attn = jax.nn.softmax(dots, axis=-1)
            out = jnp.einsum("bhij,bhjd->bhid", attn.astype(cache_v.dtype),
                             cache_v,
                             preferred_element_type=jnp.float32).astype(x_t.dtype)
        out = self._unfold_o(out, 1)
        b, h, n, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        out = self.to_out(out)
        return out, cache_k, cache_v

    def extend_self(self, x_chunk: Array, cache_k: Array, cache_v: Array,
                    t: Array) -> Tuple[Array, Array, Array]:
        """Causal CHUNK extension against a KV cache (streaming prefill).

        x_chunk: (B, C, dim); cache_k/v: (B, H, Lmax, Dh); t: scalar count of
        positions already cached. Writes the chunk's K/V at [t, t+C) and
        returns the C queries' causal attention over cache[:t+C]. The chunk
        math is identical to running the full causal sequence through
        ``__call__`` and keeping rows [t, t+C) - exactness is what makes
        streaming sessions equal offline encoding (tests/test_streaming.py).
        """
        q = self._split(self._proj(x_chunk, "to_q"))     # (B,H,C,Dh)
        k_c = self._split_kv(self._proj(x_chunk, "to_k"))
        v_c = self._split_kv(self._proj(x_chunk, "to_v"))
        cache_k = jax.lax.dynamic_update_slice(cache_k, k_c, (0, 0, t, 0))
        cache_v = jax.lax.dynamic_update_slice(cache_v, v_c, (0, 0, t, 0))
        scale = self.dim_head ** -0.5
        lmax = cache_k.shape[2]
        nc = q.shape[2]
        dots = jnp.einsum("bhid,bhjd->bhij", self._fold_q(q), cache_k,
                          preferred_element_type=jnp.float32) * scale
        qpos = t + jnp.arange(nc)[:, None]               # (C, 1) absolute
        kpos = jnp.arange(lmax)[None, :]                 # (1, Lmax)
        causal = jnp.tile(kpos <= qpos, (self._group, 1))  # (G*C, Lmax)
        dots = jnp.where(causal[None, None], dots, NEG_INF)
        attn = jax.nn.softmax(dots, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn.astype(cache_v.dtype),
                         cache_v,
                         preferred_element_type=jnp.float32).astype(x_chunk.dtype)
        out = self._unfold_o(out, nc)
        b, h, n, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        return self.to_out(out), cache_k, cache_v

    def step_cross(self, x_t: Array, k: Array, v: Array,
                   key_mask: Optional[Array], groups: int = 1) -> Array:
        """Single-token cross-attention against precomputed context K/V.

        ``groups > 1``: best-of-N sampling shares one context across N
        samples - ``x_t`` has batch ``N * B0`` (sample-major, matching
        ``jnp.tile``) while ``k``/``v``/``key_mask`` carry only ``B0`` rows.
        The N per-context queries attend as N query rows over ONE K/V read,
        cutting cross-attention HBM traffic N-fold vs tiling K/V (the decode
        loop is cache-bandwidth bound, PERF.md). Numerics are identical to
        the tiled path.
        """
        q = self._split(self._proj(x_t, "to_q"))          # (N*B0, H, 1, Dh)
        scale = self.dim_head ** -0.5
        if groups > 1:
            nb, h, one, dh = q.shape
            b0 = nb // groups
            # (N*B0, H, 1, Dh) -> (B0, H, N, Dh): N query rows per context
            q = q.reshape(groups, b0, h, dh).transpose(1, 2, 0, 3)
        nq = q.shape[2]
        q = self._fold_q(q)  # (B0, KVH, G*N, Dh) - matches k/v's kv heads
        if _use_decode_kernel(k.shape[2], self.dim_head, "cross"):
            from ..ops.pallas.decode import decode_attention

            bb, h, lk, dh = k.shape
            mask_r = (None if key_mask is None
                      else jnp.repeat(key_mask, h, axis=0))
            o = decode_attention(q.reshape(bb * h, -1, dh),
                                 k.reshape(bb * h, lk, dh),
                                 v.reshape(bb * h, lk, dh),
                                 key_mask=mask_r, scale=scale)
            out = o.reshape(bb, h, -1, dh).astype(x_t.dtype)
        else:
            dots = jnp.einsum("bhid,bhjd->bhij", q, k,
                              preferred_element_type=jnp.float32) * scale
            if key_mask is not None:
                dots = jnp.where(key_mask[:, None, None, :], dots, NEG_INF)
            attn = jax.nn.softmax(dots, axis=-1)
            attn = jnp.where(jnp.isfinite(dots).any(axis=-1, keepdims=True),
                             attn, 0.0)
            out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v,
                             preferred_element_type=jnp.float32).astype(x_t.dtype)
        out = self._unfold_o(out, nq)
        if groups > 1:
            b0, h, n, d = out.shape
            # (B0, H, N, Dh) -> (N*B0, 1, H*Dh)
            out = out.transpose(2, 0, 1, 3).reshape(n * b0, 1, h * d)
        else:
            b, h, n, d = out.shape
            out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        return self.to_out(out)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.Dense(self.dim * self.mult, dtype=self.dtype, name="w1")(x)
        h = jax.nn.gelu(h, approximate=False)  # x-transformers uses exact GELU
        return nn.Dense(self.dim, dtype=self.dtype, name="w2")(h)


def _xt_norm(dtype, name):
    """x-transformers' custom LayerNorm is SCALE-ONLY: gamma is a parameter
    but beta is a zero BUFFER that never trains (1.30 layout, see
    utils/torch_import.py). A trainable bias here would drift from the
    reference during finetuning - caught by tests/test_train_parity_torch.py.
    """
    return nn.LayerNorm(dtype=dtype, use_bias=False, name=name)


class EncoderLayers(nn.Module):
    """Pre-norm (self-attn, ff) x depth + final norm (x-transformers Encoder)."""

    dim: int
    depth: int
    heads: int
    dim_head: int = 64
    dtype: jnp.dtype = jnp.float32
    kv_heads: Optional[int] = None

    def setup(self):
        # explicit names keep the param tree identical to the earlier
        # nn.compact layout (checkpoint/importer compatibility)
        self.norm_attn = [_xt_norm(self.dtype, f"norm_attn_{i}")
                          for i in range(self.depth)]
        self.attn = [XAttention(self.dim, self.heads, self.dim_head,
                                dtype=self.dtype, kv_heads=self.kv_heads,
                                name=f"attn_{i}")
                     for i in range(self.depth)]
        self.norms_ff = [_xt_norm(self.dtype, f"norm_ff_{i}")
                         for i in range(self.depth)]
        self.ffs = [FeedForward(self.dim, dtype=self.dtype, name=f"ff_{i}")
                    for i in range(self.depth)]
        self.final_norm = _xt_norm(self.dtype, "final_norm")

    def __call__(self, x: Array, key_mask: Optional[Array] = None,
                 attn_mask: Optional[Array] = None) -> Array:
        for i in range(self.depth):
            x = x + self.attn[i](self.norm_attn[i](x), key_mask=key_mask,
                                 attn_mask=attn_mask)
            x = x + self.ffs[i](self.norms_ff[i](x))
        return self.final_norm(x)

    # --- streaming support: causal chunk extension against KV caches ---

    def extend(self, x: Array, cache: Dict[str, Array], t: Array
               ) -> Tuple[Array, Dict[str, Array]]:
        """Process a (B, C, dim) chunk causally against per-layer KV caches
        (layout of ``init_decoder_cache``); equals rows [t, t+C) of a full
        causal ``__call__`` over the concatenated sequence."""
        new_cache = dict(cache)
        for i in range(self.depth):
            a, ck, cv = self.attn[i].extend_self(
                self.norm_attn[i](x), cache[f"k_{i}"], cache[f"v_{i}"], t)
            new_cache[f"k_{i}"] = ck
            new_cache[f"v_{i}"] = cv
            x = x + a
            x = x + self.ffs[i](self.norms_ff[i](x))
        return self.final_norm(x), new_cache


class DecoderLayers(nn.Module):
    """Pre-norm (causal self-attn, cross-attn, ff) x depth + final norm."""

    dim: int
    depth: int
    heads: int
    dim_head: int = 64
    cross_attend: bool = True
    dtype: jnp.dtype = jnp.float32
    kv_heads: Optional[int] = None

    def setup(self):
        self.norm_self = [_xt_norm(self.dtype, f"norm_self_{i}")
                          for i in range(self.depth)]
        self.self_attn = [XAttention(self.dim, self.heads, self.dim_head, causal=True,
                                     dtype=self.dtype, kv_heads=self.kv_heads,
                                     name=f"self_{i}")
                          for i in range(self.depth)]
        if self.cross_attend:
            self.norm_cross = [_xt_norm(self.dtype, f"norm_cross_{i}")
                               for i in range(self.depth)]
            self.cross_attn = [XAttention(self.dim, self.heads, self.dim_head,
                                          dtype=self.dtype,
                                          kv_heads=self.kv_heads,
                                          name=f"cross_{i}")
                               for i in range(self.depth)]
        self.norm_ff = [_xt_norm(self.dtype, f"norm_ff_{i}")
                        for i in range(self.depth)]
        self.ff = [FeedForward(self.dim, dtype=self.dtype, name=f"ff_{i}")
                   for i in range(self.depth)]
        self.final_norm = _xt_norm(self.dtype, "final_norm")

    def __call__(self, x: Array, context: Optional[Array] = None,
                 self_key_mask: Optional[Array] = None,
                 context_mask: Optional[Array] = None) -> Array:
        for i in range(self.depth):
            x = x + self.self_attn[i](self.norm_self[i](x), key_mask=self_key_mask)
            if self.cross_attend:
                x = x + self.cross_attn[i](self.norm_cross[i](x), context=context,
                                           key_mask=context_mask)
            x = x + self.ff[i](self.norm_ff[i](x))
        return self.final_norm(x)

    # --- generation support ---

    def cross_kv(self, context: Array) -> List[Tuple[Array, Array]]:
        assert self.cross_attend
        return [self.cross_attn[i].cross_kv(context) for i in range(self.depth)]

    def step(self, x_t: Array, cache: Dict[str, Array], t: Array,
             cross_kv: Optional[List[Tuple[Array, Array]]] = None,
             context_mask: Optional[Array] = None,
             cross_groups: int = 1) -> Tuple[Array, Dict[str, Array]]:
        new_cache = dict(cache)
        for i in range(self.depth):
            a, ck, cv = self.self_attn[i].step_self(
                self.norm_self[i](x_t), cache[f"k_{i}"], cache[f"v_{i}"], t)
            new_cache[f"k_{i}"] = ck
            new_cache[f"v_{i}"] = cv
            x_t = x_t + a
            if self.cross_attend:
                k, v = cross_kv[i]
                x_t = x_t + self.cross_attn[i].step_cross(
                    self.norm_cross[i](x_t), k, v, context_mask, cross_groups)
            x_t = x_t + self.ff[i](self.norm_ff[i](x_t))
        return self.final_norm(x_t), new_cache


def init_decoder_cache(batch: int, max_len: int, depth: int, heads: int,
                       dim_head: int = 64, dtype=jnp.float32,
                       kv_heads: Optional[int] = None) -> Dict[str, Array]:
    """Preallocated self-attention KV cache for DecoderLayers.step.
    Under GQA (``kv_heads`` set) the cache holds ``kv_heads`` heads."""
    shape = (batch, kv_heads or heads, max_len, dim_head)
    cache = {}
    for i in range(depth):
        cache[f"k_{i}"] = jnp.zeros(shape, dtype=dtype)
        cache[f"v_{i}"] = jnp.zeros(shape, dtype=dtype)
    return cache


# ---------------------------------------------------------------------------
# wrappers
# ---------------------------------------------------------------------------


class ContinuousTransformerWrapper(nn.Module):
    """Continuous-input encoder (x-transformers ContinuousTransformerWrapper).

    project_in -> + learned abs pos emb -> Encoder layers -> final norm
    [-> project_out unless return_embeddings].
    """

    dim: int
    dim_out: int
    max_seq_len: int
    depth: int
    heads: int
    dim_head: int = 64
    use_abs_pos_emb: bool = True
    dtype: jnp.dtype = jnp.float32
    kv_heads: Optional[int] = None

    def setup(self):
        self.project_in = nn.Dense(self.dim, dtype=self.dtype)
        if self.use_abs_pos_emb:
            self.pos_emb = self.param("pos_emb", nn.initializers.normal(0.02),
                                      (self.max_seq_len, self.dim))
        self.layers = EncoderLayers(self.dim, self.depth, self.heads,
                                    dim_head=self.dim_head, dtype=self.dtype,
                                    kv_heads=self.kv_heads)
        # lazily initialized on first call - absent from the param tree of
        # models that only use return_embeddings=True (as before)
        self.project_out = nn.Dense(self.dim_out, dtype=self.dtype)

    def __call__(self, x: Array, mask: Optional[Array] = None,
                 attn_mask: Optional[Array] = None,
                 prepend_embeds: Optional[Array] = None,
                 return_embeddings: bool = False) -> Array:
        h = self.project_in(x)
        if self.use_abs_pos_emb:
            h = h + self.pos_emb[None, : h.shape[1], :].astype(h.dtype)
        if prepend_embeds is not None:
            h = jnp.concatenate([prepend_embeds.astype(h.dtype), h], axis=1)
            if mask is not None:
                pre = jnp.ones((h.shape[0], prepend_embeds.shape[1]), dtype=bool)
                mask = jnp.concatenate([pre, mask], axis=1)
        h = self.layers(h, key_mask=mask, attn_mask=attn_mask)
        if return_embeddings:
            return h
        return self.project_out(h)

    def extend(self, x_chunk: Array, cache: Dict[str, Array], t: Array
               ) -> Tuple[Array, Dict[str, Array]]:
        """Streaming causal extension: encode a (B, C, dim_in) chunk whose
        first frame sits at absolute position ``t``, against per-layer KV
        caches. Returns embeddings (the ``return_embeddings=True`` path).
        Only valid for causally-used encoders (SLMFT's speaker/joint
        encoders run under a triangular attn_mask, seq2seq_pretrain.py:437)."""
        h = self.project_in(x_chunk)
        if self.use_abs_pos_emb:
            h = h + jax.lax.dynamic_slice_in_dim(
                self.pos_emb, t, x_chunk.shape[1], axis=0)[None].astype(h.dtype)
        return self.layers.extend(h, cache, t)


class TokenDecoder(nn.Module):
    """Token-input cross-attending decoder
    (TransformerWrapper + Decoder(cross_attend=True)).

    token embedding + learned abs pos emb -> Decoder layers -> to_logits.
    """

    num_tokens: int
    dim: int
    max_seq_len: int
    depth: int
    heads: int
    dim_head: int = 64
    use_abs_pos_emb: bool = True
    dtype: jnp.dtype = jnp.float32
    kv_heads: Optional[int] = None

    def setup(self):
        self.token_emb = nn.Embed(self.num_tokens, self.dim, dtype=self.dtype)
        if self.use_abs_pos_emb:
            self.pos_emb = self.param("pos_emb", nn.initializers.normal(0.02),
                                      (self.max_seq_len, self.dim))
        self.layers = DecoderLayers(self.dim, self.depth, self.heads,
                                    dim_head=self.dim_head, dtype=self.dtype,
                                    kv_heads=self.kv_heads)
        self.to_logits = nn.Dense(self.num_tokens, use_bias=False, dtype=self.dtype)

    def _embed(self, tokens: Array, offset=0) -> Array:
        emb = self.token_emb(tokens)
        if self.use_abs_pos_emb:
            emb = emb + jax.lax.dynamic_slice_in_dim(
                self.pos_emb, offset, tokens.shape[1], axis=0)[None].astype(emb.dtype)
        return emb

    def __call__(self, tokens: Array, context: Optional[Array] = None,
                 self_key_mask: Optional[Array] = None,
                 context_mask: Optional[Array] = None) -> Array:
        h = self._embed(tokens)
        h = self.layers(h, context=context, self_key_mask=self_key_mask,
                        context_mask=context_mask)
        return self.to_logits(h)

    # --- generation path (method=... targets) ---

    def cross_kv(self, context: Array):
        return self.layers.cross_kv(context)

    def decode_step(self, token: Array, cache, t: Array, cross_kv,
                    context_mask: Optional[Array] = None,
                    cross_groups: int = 1):
        h = self._embed(token, t)
        h, cache = self.layers.step(h, cache, t, cross_kv, context_mask,
                                    cross_groups)
        return self.to_logits(h)[:, 0], cache


# ---------------------------------------------------------------------------
# autoregressive wrapper semantics
# ---------------------------------------------------------------------------


def ar_inputs_targets(x: Array, ignore_index: int = -100, pad_value: int = 0
                      ) -> Tuple[Array, Array]:
    """Shifted teacher-forcing split (AutoregressiveWrapper.forward)."""
    inp, target = x[:, :-1], x[:, 1:]
    inp = jnp.where(inp == ignore_index, pad_value, inp)
    return inp, target


def ar_mask_prob_kv_mask(rng: jax.Array, batch: int, seq: int, mask_prob: float) -> Array:
    """AutoregressiveWrapper mask_prob input corruption as a self-attn key mask.

    Masks ``floor(seq * mask_prob)`` random input positions per row, never
    position 0 (x-transformers autoregressive_wrapper.py).
    Returns (B, seq) True = attend.
    """
    num_mask = min(int(seq * mask_prob), seq - 1)
    if num_mask <= 0:
        return jnp.ones((batch, seq), dtype=bool)
    rand = jax.random.normal(rng, (batch, seq))
    rand = rand.at[:, 0].set(NEG_INF)
    _, idx = jax.lax.top_k(rand, num_mask)
    mask = jnp.ones((batch, seq), dtype=bool)
    rows = jnp.repeat(jnp.arange(batch), num_mask)
    mask = mask.at[rows, idx.reshape(-1)].set(False)
    return mask


def ar_cross_entropy(logits: Array, targets: Array, ignore_index: int = -100) -> Array:
    """Token CE with ignore_index, mean over kept positions (torch semantics)."""
    v = logits.shape[-1]
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    safe = jnp.clip(targets, 0, v - 1)
    nll = -jnp.take_along_axis(lp, safe[..., None], axis=-1)[..., 0]
    keep = (targets != ignore_index).astype(jnp.float32)
    return jnp.sum(nll * keep) / jnp.maximum(jnp.sum(keep), 1.0)


def dropout_seq(rng: jax.Array, seq: Array, mask: Optional[Array],
                dropout: float) -> Tuple[Array, Array]:
    """Cross-attention token dropout (reference x_utils.py:32-62):
    keep a random (1 - dropout) fraction of context positions per row,
    gathering kept tokens to the front and shrinking the mask.

    Used when ``cross_attn_tokens_dropout > 0`` during training
    (seq2seq.py:63-64); the reference ships with 0.
    """
    b, n, _ = seq.shape
    if mask is None:
        mask = jnp.ones((b, n), dtype=bool)
    num_keep = max(1, int((1.0 - dropout) * n))
    logits = jax.random.uniform(rng, (b, n))
    # prefer valid positions: invalid get -inf priority
    logits = jnp.where(mask, logits, -jnp.inf)
    keep_idx = jax.lax.top_k(logits, num_keep)[1]  # (B, num_keep)
    batch_idx = jnp.arange(b)[:, None]
    new_seq = seq[batch_idx, keep_idx]
    new_mask = mask[batch_idx, keep_idx]
    return new_seq, new_mask


def top_k_filter(logits: Array, frac_num_tokens: float = 0.1) -> Array:
    """x-transformers ``top_k``: keep ceil(frac * vocab) best logits."""
    k = max(1, math.ceil(frac_num_tokens * logits.shape[-1]))
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


class ARStep(NamedTuple):
    tokens: Array
    cache: Any
    rng: jax.Array


def generate_tokens(
    decoder: TokenDecoder,
    params,
    prompt: Array,
    seq_len: int,
    context: Array,
    context_mask: Optional[Array],
    rng: jax.Array,
    temperature: float = 1.0,
    filter_frac: float = 0.1,
    greedy: bool = False,
    chunk: Optional[int] = None,
    context_groups: int = 1,
) -> Array:
    """KV-cached autoregressive sampling: returns (B, seq_len) generated tokens.

    Replaces x-transformers ``AutoregressiveWrapper.generate`` (full re-forward
    per token) with a jittable ``lax.scan``: cross K/V computed once, one
    cached decoder step per token. Sampling matches the reference defaults:
    top-k keep-10% filtering, temperature 1.0, categorical sampling.
    ``prompt`` is (B, P); the prompt is consumed through the same cache and is
    NOT included in the returned tokens (x-transformers returns out[:, t:]).

    ``chunk``: when set, the scan runs in segments whose self-attention KV
    cache is statically sliced to the smallest multiple of ``chunk`` covering
    the live prefix - step ``t`` then reads ~t cache entries instead of the
    full ``p + seq_len``, halving average self-cache HBM traffic (the decode
    loop is cache-bandwidth bound, PERF.md). The per-segment slice/write-back
    copies are one cache pass per segment vs ``chunk`` passes saved. Output
    is IDENTICAL to the unchunked path (same step math, same RNG stream).

    ``context_groups``: best-of-N sharing - ``prompt`` has batch ``N * B0``
    (sample-major, i.e. ``jnp.tile(x, (N, 1))`` order) while ``context`` /
    ``context_mask`` carry only the ``B0`` distinct rows; cross-attention
    K/V is computed and read once per context instead of once per sample
    (see XAttention.step_cross).
    """
    b, p = prompt.shape
    max_len = p + seq_len
    assert b % context_groups == 0, (b, context_groups)

    cross_kv = decoder.apply(params, context, method=TokenDecoder.cross_kv)
    cache = init_decoder_cache(b, max_len, decoder.depth, decoder.heads,
                               dim_head=decoder.dim_head, dtype=decoder.dtype,
                               kv_heads=decoder.kv_heads)

    def step_fn(token, cache, t):
        return decoder.apply(params, token, cache, t, cross_kv, context_mask,
                             context_groups,
                             method=TokenDecoder.decode_step)

    # consume the prompt
    logits = None
    for i in range(p):
        logits, cache = step_fn(prompt[:, i: i + 1], cache, jnp.asarray(i))

    def sample(logits, key):
        logits = logits.astype(jnp.float32)  # sample in fp32 even for bf16 models
        if greedy:
            return jnp.argmax(logits, axis=-1).astype(prompt.dtype)
        filt = top_k_filter(logits, filter_frac) / temperature
        return jax.random.categorical(key, filt, axis=-1).astype(prompt.dtype)

    def scan_body(carry, i):
        logits, cache, rng = carry
        rng, sub = jax.random.split(rng)
        tok = sample(logits, sub)
        new_logits, cache = step_fn(tok[:, None], cache, p + i)
        return (new_logits, cache, rng), tok

    if not chunk or chunk >= seq_len:
        (_, _, _), tokens = jax.lax.scan(
            scan_body, (logits, cache, rng), jnp.arange(seq_len))
        return tokens.T  # (B, seq_len)

    # --- chunked-prefix path ---
    def slice_cache(c, n):
        return jax.tree_util.tree_map(lambda x: x[:, :, :n], c)

    def merge_cache(full, seg):
        return jax.tree_util.tree_map(
            lambda f, s: jax.lax.dynamic_update_slice(f, s, (0, 0, 0, 0)),
            full, seg)

    # GEOMETRIC segment schedule (chunk, chunk, 2*chunk, 4*chunk, ...): each
    # segment is a distinct traced scan (static cache slice), so constant
    # sizing costs seq_len/chunk compiles - L=1024/chunk=32 meant 32. Doubling
    # caps it at O(log(seq_len/chunk)) while each step still reads <= 2x its
    # live prefix (~2/3 of the full-cache traffic vs ~1/2 for constant
    # chunks); measured ~neutral decode time, much cheaper first call.
    token_chunks = []
    start, size = 0, chunk
    while start < seq_len:
        s = min(size, seq_len - start)
        # segment writes cache positions [p+start, p+start+s); slice to the
        # next multiple of `chunk` covering them (static per segment)
        cache_len = min(max_len, -(-(p + start + s) // chunk) * chunk)
        seg = slice_cache(cache, cache_len)
        (logits, seg, rng), toks = jax.lax.scan(
            scan_body, (logits, seg, rng), jnp.arange(start, start + s))
        cache = merge_cache(cache, seg)
        token_chunks.append(toks)
        if start > 0:
            size *= 2
        start += s
    return jnp.concatenate(token_chunks, axis=0).T  # (B, seq_len)
