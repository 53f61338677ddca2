"""Streaming dyadic listener generation - a TPU-native serving session.

The reference has no online path: its eval scripts encode the FULL speaker
clip, then autoregressively decode the full listener response
(``/root/reference/code/x_engine_pt.py:232-277``). But SLMFT's speaker
encoders are CAUSAL (triangular attn_mask, seq2seq_pretrain.py:437), so
frame t's encoding never changes as later frames arrive - a live dyadic
session can interleave speaker-frame arrival with listener generation with
NO recomputation:

* speaker motion+audio chunks stream in -> causal KV-cached encoder
  extension (``ContinuousTransformerWrapper.extend``), one pass per chunk;
* the decoder's cross-attention K/V are per-position linear projections of
  the context, appended incrementally into preallocated caches;
* listener codes stream out through the same KV-cached decode step the
  offline generator uses - bounded per-token latency, no O(L) re-forward.

Exactness: feeding the whole clip then generating reproduces the offline
``xtrans.generate_tokens`` output token-for-token (tests/test_streaming.py).
Interleaved feeding restricts cross-attention to frames that have actually
arrived (``context_mask = arange < t_ctx``) - the causal-serving semantics
the offline protocol cannot express.

All shapes are static: chunk size, context capacity and token capacity are
fixed at session construction, so the session compiles exactly three
programs (feed / prompt / generate-n) regardless of stream length - plus a
fused feed+generate ``round`` program for the serving hot loop (one
dispatch per round instead of two; identical math, tests/test_streaming.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.slm import SLMFT
from ..models.xtrans import init_decoder_cache, top_k_filter


class StreamingListenerSession:
    """A live dyadic session around an SLMFT listener generator.

    Parameters
    ----------
    model, params: the SLMFT module and its trained variables.
    batch: number of parallel sessions (lockstep frame arrival).
    chunk: speaker frames per ``feed`` call (pad short final chunks and pass
        ``n_valid``).
    max_frames: context capacity (speaker frames).
    max_tokens: listener-token capacity (defaults to ``max_frames``).
    temperature / filter_frac / greedy: sampling controls matching
        ``xtrans.generate_tokens``.
    """

    def __init__(self, model: SLMFT, params, *, batch: int = 1,
                 chunk: int = 8, max_frames: int = 1024,
                 max_tokens: Optional[int] = None, rng: int = 0,
                 temperature: float = 1.0, filter_frac: float = 0.1,
                 greedy: bool = False):
        c = model.cfg
        self.model = model
        # Accept either the full flax variables dict or a bare params tree
        # (bench.py passed the latter in round 3 and crashed on the chip).
        if "params" not in params:
            params = {"params": params}
        self.params = params
        self.batch = batch
        self.chunk = chunk
        self.max_frames = max_frames
        self.max_tokens = max_tokens or max_frames
        self.greedy = greedy
        self.temperature = temperature
        self.filter_frac = filter_frac
        dt = model.dtype
        dh = getattr(c, "attn_dim_head", 64)
        kvh = getattr(c, "attn_kv_heads", 0) or None  # GQA cache width

        self._enc_s = init_decoder_cache(batch, max_frames, c.enc_depth,
                                         c.enc_heads, dim_head=dh, dtype=dt,
                                         kv_heads=kvh)
        self._enc_j = init_decoder_cache(batch, max_frames, c.enc_depth,
                                         c.enc_heads, dim_head=dh, dtype=dt,
                                         kv_heads=kvh)
        self._cross = {}
        for i in range(c.dec_depth):
            shape = (batch, kvh or c.dec_heads, max_frames, dh)
            self._cross[f"ck_{i}"] = jnp.zeros(shape, dtype=dt)
            self._cross[f"cv_{i}"] = jnp.zeros(shape, dtype=dt)
        self._dec = init_decoder_cache(batch, self.max_tokens, c.dec_depth,
                                       c.dec_heads, dim_head=dh, dtype=dt,
                                       kv_heads=kvh)
        self._t_ctx = jnp.zeros((), jnp.int32)
        self._t_dec = jnp.zeros((), jnp.int32)
        self._logits = None
        self._rng = jax.random.PRNGKey(rng)
        self._tokens: list[np.ndarray] = []
        self._dec_depth = c.dec_depth

        @partial(jax.jit, donate_argnums=(1, 2, 3))
        def _feed(params, enc_s, enc_j, cross, t_ctx, sp, au, n_valid):
            ctx, enc_s, enc_j = model.apply(
                params, sp, au, enc_s, enc_j, t_ctx,
                method=SLMFT.encode_context_chunk)
            kv = model.apply(params, ctx, method=SLMFT.stream_cross_kv)
            cross = dict(cross)
            for i, (k, v) in enumerate(kv):
                cross[f"ck_{i}"] = jax.lax.dynamic_update_slice(
                    cross[f"ck_{i}"], k, (0, 0, t_ctx, 0))
                cross[f"cv_{i}"] = jax.lax.dynamic_update_slice(
                    cross[f"cv_{i}"], v, (0, 0, t_ctx, 0))
            return enc_s, enc_j, cross, t_ctx + n_valid, ctx

        self._feed_fn = _feed

        def _sample(logits, key):
            logits = logits.astype(jnp.float32)
            if greedy:
                return jnp.argmax(logits, axis=-1).astype(jnp.int32)
            filt = top_k_filter(logits, filter_frac) / temperature
            return jax.random.categorical(key, filt, axis=-1).astype(jnp.int32)

        def _ctx_mask(t_ctx):
            return jnp.broadcast_to(
                jnp.arange(max_frames)[None, :] < t_ctx, (batch, max_frames))

        @partial(jax.jit, donate_argnums=(1,), static_argnums=(5,))
        def _prompt(params, dec, cross, t_ctx, t_dec, p, prompt):
            cross_kv = [(cross[f"ck_{i}"], cross[f"cv_{i}"])
                        for i in range(c.dec_depth)]
            mask = _ctx_mask(t_ctx)
            logits = None
            for i in range(p):
                logits, dec = model.apply(
                    params, prompt[:, i: i + 1], dec, t_dec + i, cross_kv,
                    mask, method=SLMFT.stream_decode_step)
            return dec, t_dec + p, logits

        self._prompt_fn = _prompt

        @partial(jax.jit, donate_argnums=(1,), static_argnums=(7,))
        def _generate(params, dec, cross, t_ctx, t_dec, logits, rng, n):
            cross_kv = [(cross[f"ck_{i}"], cross[f"cv_{i}"])
                        for i in range(c.dec_depth)]
            mask = _ctx_mask(t_ctx)

            def body(carry, _):
                logits, dec, rng, t = carry
                rng, sub = jax.random.split(rng)
                tok = _sample(logits, sub)
                new_logits, dec = model.apply(
                    params, tok[:, None], dec, t, cross_kv, mask,
                    method=SLMFT.stream_decode_step)
                return (new_logits, dec, rng, t + 1), tok

            (logits, dec, rng, t_dec), toks = jax.lax.scan(
                body, (logits, dec, rng, t_dec), None, length=n)
            return dec, t_dec, logits, rng, toks.T

        self._generate_fn = _generate

        @partial(jax.jit, donate_argnums=(1, 2, 3, 4), static_argnums=(10,))
        def _round(params, enc_s, enc_j, cross, dec, t_ctx, t_dec, logits,
                   rng, inputs, n):
            """feed + generate fused into ONE program: on a dispatch-latency
            -bound link the separate calls pay two host->device round trips
            per serving round for no compute benefit."""
            sp, au, n_valid = inputs
            ctx, enc_s, enc_j = model.apply(
                params, sp, au, enc_s, enc_j, t_ctx,
                method=SLMFT.encode_context_chunk)
            kv = model.apply(params, ctx, method=SLMFT.stream_cross_kv)
            cross = dict(cross)
            for i, (k, v) in enumerate(kv):
                cross[f"ck_{i}"] = jax.lax.dynamic_update_slice(
                    cross[f"ck_{i}"], k, (0, 0, t_ctx, 0))
                cross[f"cv_{i}"] = jax.lax.dynamic_update_slice(
                    cross[f"cv_{i}"], v, (0, 0, t_ctx, 0))
            t_ctx = t_ctx + n_valid
            cross_kv = [(cross[f"ck_{i}"], cross[f"cv_{i}"])
                        for i in range(c.dec_depth)]
            mask = _ctx_mask(t_ctx)

            def body(carry, _):
                logits, dec, rng, t = carry
                rng, sub = jax.random.split(rng)
                tok = _sample(logits, sub)
                new_logits, dec = model.apply(
                    params, tok[:, None], dec, t, cross_kv, mask,
                    method=SLMFT.stream_decode_step)
                return (new_logits, dec, rng, t + 1), tok

            (logits, dec, rng, t_dec), toks = jax.lax.scan(
                body, (logits, dec, rng, t_dec), None, length=n)
            return enc_s, enc_j, cross, dec, t_ctx, t_dec, logits, rng, toks.T

        self._round_fn = _round

    # ------------------------------------------------------------------

    @property
    def frames_fed(self) -> int:
        return int(self._t_ctx)

    @property
    def tokens_generated(self) -> int:
        return len(self._tokens) and int(
            np.concatenate(self._tokens, axis=1).shape[1])

    def feed(self, speaker_chunk, audio_chunk, n_valid: Optional[int] = None):
        """Stream in a (B, chunk, dim_in) speaker-motion chunk and its
        (B, chunk, dim_audio) audio features. ``n_valid < chunk`` marks a
        short final chunk (the tail positions are ignored and overwritten by
        any later feed). Returns the decoder-context chunk (diagnostics)."""
        sp = jnp.asarray(speaker_chunk, dtype=self.model.dtype)
        au = jnp.asarray(audio_chunk, dtype=self.model.dtype)
        if sp.shape[1] != self.chunk:
            raise ValueError(f"feed expects chunks of {self.chunk} frames, "
                             f"got {sp.shape[1]} (pad and pass n_valid)")
        if n_valid is None:
            n_valid = self.chunk
        if int(self._t_ctx) + self.chunk > self.max_frames:
            raise ValueError("context capacity exceeded; raise max_frames")
        self._enc_s, self._enc_j, self._cross, self._t_ctx, ctx = \
            self._feed_fn(self.params, self._enc_s, self._enc_j, self._cross,
                          self._t_ctx, sp, au, jnp.asarray(n_valid, jnp.int32))
        return ctx

    def start(self, prompt) -> None:
        """Consume the (B, P) prompt tokens (the reference seeds generation
        with the first listener code, seq2seq_pretrain.py:450). Requires at
        least one fed frame (the decoder cross-attends the context)."""
        if int(self._t_ctx) == 0:
            raise ValueError("feed at least one speaker chunk before start()")
        prompt = jnp.asarray(prompt, jnp.int32)
        self._dec, self._t_dec, self._logits = self._prompt_fn(
            self.params, self._dec, self._cross, self._t_ctx, self._t_dec,
            prompt.shape[1], prompt)

    def generate(self, n: int) -> np.ndarray:
        """Sample the next ``n`` listener codes (B, n) against the context
        fed so far. Distinct ``n`` values compile distinct programs - stick
        to one or two chunk sizes in production."""
        if self._logits is None:
            raise ValueError("call start(prompt) before generate()")
        if int(self._t_dec) + n > self.max_tokens:
            raise ValueError("token capacity exceeded; raise max_tokens")
        self._dec, self._t_dec, self._logits, self._rng, toks = \
            self._generate_fn(self.params, self._dec, self._cross,
                              self._t_ctx, self._t_dec, self._logits,
                              self._rng, n)
        toks = np.asarray(toks)
        self._tokens.append(toks)
        return toks

    def round(self, speaker_chunk, audio_chunk, n: Optional[int] = None,
              n_valid: Optional[int] = None) -> np.ndarray:
        """One serving round - feed a chunk AND sample ``n`` codes (default
        ``chunk``) in a SINGLE device program; token-for-token identical to
        ``feed(...)`` followed by ``generate(n)`` (same cache math, same rng
        threading), one host->device dispatch cheaper. Requires ``start()``
        (the prompt is a one-time program; a static branch here would double
        the compile)."""
        if self._logits is None:
            raise ValueError("call feed + start(prompt) before round()")
        n = self.chunk if n is None else n
        sp = jnp.asarray(speaker_chunk, dtype=self.model.dtype)
        au = jnp.asarray(audio_chunk, dtype=self.model.dtype)
        if sp.shape[1] != self.chunk:
            raise ValueError(f"round expects chunks of {self.chunk} frames, "
                             f"got {sp.shape[1]} (pad and pass n_valid)")
        if int(self._t_ctx) + self.chunk > self.max_frames:
            raise ValueError("context capacity exceeded; raise max_frames")
        if int(self._t_dec) + n > self.max_tokens:
            raise ValueError("token capacity exceeded; raise max_tokens")
        n_valid = self.chunk if n_valid is None else n_valid
        (self._enc_s, self._enc_j, self._cross, self._dec, self._t_ctx,
         self._t_dec, self._logits, self._rng, toks) = self._round_fn(
            self.params, self._enc_s, self._enc_j, self._cross, self._dec,
            self._t_ctx, self._t_dec, self._logits, self._rng,
            (sp, au, jnp.asarray(n_valid, jnp.int32)), n)
        toks = np.asarray(toks)
        self._tokens.append(toks)
        return toks

    def tokens(self) -> np.ndarray:
        """All generated listener codes so far, (B, T)."""
        if not self._tokens:
            return np.zeros((self.batch, 0), np.int32)
        return np.concatenate(self._tokens, axis=1)

    def motion(self, tokens=None) -> np.ndarray:
        """VQ-decode listener codes to motion frames (B, T, motion_dim).

        The VQ decoder is bidirectional over the code sequence (its
        transformer is unmasked, stage1_BIWI.py:320-393), so already-emitted
        frames can be refined as more codes arrive; production streams
        typically re-decode a trailing window. Decoded full-prefix here."""
        if tokens is None:
            tokens = self.tokens()
        return np.asarray(self.model.apply(
            self.params, jnp.asarray(tokens, jnp.int32),
            method=SLMFT.decode_tokens_to_motion))
