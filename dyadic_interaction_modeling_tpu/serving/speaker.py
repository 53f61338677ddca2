"""Streaming audio-driven talking-head session (BIWI speaker model).

The reference's speaker pipeline is offline-only: ``test_biwi.py`` loads
whole clips, builds the per-frame context (speaker embedding + HuBERT
audio, ``/root/reference/code/seq2seq_pretrain.py:699-704``) and decodes the
full EMOCA-code sequence autoregressively. But that context has NO temporal
mixing - each frame's row depends only on that frame's audio - so a LIVE
session is exact by construction: audio features stream in (pair with
``serving.StreamingAudioFrontend`` for raw waveforms), their cross-K/V
projections append incrementally, and EMOCA codes stream out through the
same KV-cached decode step the offline generator uses.

Exactness: feeding the whole clip then generating reproduces the offline
``generate_tokens`` output token-for-token, and partial context equals
truncated-offline (tests/test_speaker_streaming.py). Mesh/EMOCA decode of
the emitted codes goes through ``SpeakerSLMFT.stream_decode_emoca`` - its
BiLSTM head is bidirectional over the code prefix, so production streams
re-decode a trailing window (same caveat as the listener session's VQ
motion decode).

Static shapes throughout: exactly three compiled programs per session
(feed / prompt / generate-n) regardless of stream length.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.slm import SpeakerSLMFT
from ..models.xtrans import init_decoder_cache, top_k_filter


class StreamingSpeakerSession:
    """Live talking-head generation around a SpeakerSLMFT.

    Parameters
    ----------
    model, params: the SpeakerSLMFT module and its trained variables.
    batch: parallel sessions (lockstep frame arrival).
    chunk: audio frames per ``feed`` call.
    max_frames / max_tokens: context / EMOCA-token capacity.
    speaker_ids: (batch,) subject conditioning, fixed per session
        (None = the zero embedding, the reference's speaker_id=None path).
    temperature / filter_frac / greedy: sampling controls matching
        ``xtrans.generate_tokens``.
    """

    def __init__(self, model: SpeakerSLMFT, params, *, batch: int = 1,
                 chunk: int = 8, max_frames: int = 1024,
                 max_tokens: Optional[int] = None,
                 speaker_ids=None, rng: int = 0, temperature: float = 1.0,
                 filter_frac: float = 0.1, greedy: bool = False):
        c = model.cfg
        self.model = model
        self.params = params
        self.batch = batch
        self.chunk = chunk
        self.max_frames = max_frames
        self.max_tokens = max_tokens or max_frames
        dt = model.dtype
        self._sids = (None if speaker_ids is None
                      else jnp.asarray(speaker_ids, jnp.int32))

        dh = getattr(c, "attn_dim_head", 64)
        kvh = getattr(c, "attn_kv_heads", 0) or None  # GQA cache width
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

        @partial(jax.jit, donate_argnums=(1,))
        def _feed(params, cross, t_ctx, au, sids):
            ctx = model.apply(params, au, sids,
                              method=SpeakerSLMFT.stream_speaker_context)
            kv = model.apply(params, ctx, method=SpeakerSLMFT.stream_cross_kv)
            cross = dict(cross)
            for i, (k, v) in enumerate(kv):
                cross[f"ck_{i}"] = jax.lax.dynamic_update_slice(
                    cross[f"ck_{i}"], k, (0, 0, t_ctx, 0))
                cross[f"cv_{i}"] = jax.lax.dynamic_update_slice(
                    cross[f"cv_{i}"], v, (0, 0, t_ctx, 0))
            return cross

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

        def _cross_kv(cross):
            return [(cross[f"ck_{i}"], cross[f"cv_{i}"])
                    for i in range(c.dec_depth)]

        @partial(jax.jit, donate_argnums=(1,), static_argnums=(5,))
        def _prompt(params, dec, cross, t_ctx, t_dec, p, prompt):
            kv, mask = _cross_kv(cross), _ctx_mask(t_ctx)
            logits = None
            for i in range(p):
                logits, dec = model.apply(
                    params, prompt[:, i: i + 1], dec, t_dec + i, kv, mask,
                    method=SpeakerSLMFT.stream_decode_step)
            return dec, t_dec + p, logits

        self._prompt_fn = _prompt

        @partial(jax.jit, donate_argnums=(1,), static_argnums=(7,))
        def _generate(params, dec, cross, t_ctx, t_dec, logits, rng, n):
            kv, mask = _cross_kv(cross), _ctx_mask(t_ctx)

            def body(carry, _):
                logits, dec, rng, t = carry
                rng, sub = jax.random.split(rng)
                tok = _sample(logits, sub)
                new_logits, dec = model.apply(
                    params, tok[:, None], dec, t, kv, mask,
                    method=SpeakerSLMFT.stream_decode_step)
                return (new_logits, dec, rng, t + 1), tok

            (logits, dec, rng, t_dec), toks = jax.lax.scan(
                body, (logits, dec, rng, t_dec), None, length=n)
            return dec, t_dec, logits, rng, toks.T

        self._generate_fn = _generate

    # ------------------------------------------------------------------

    @property
    def frames_fed(self) -> int:
        return int(self._t_ctx)

    def feed(self, audio_chunk, n_valid: Optional[int] = None):
        """Stream in a (B, chunk, dim_audio) audio-feature chunk (from the
        offline extractor or ``StreamingAudioFrontend``)."""
        au = jnp.asarray(audio_chunk, dtype=self.model.dtype)
        if au.shape[1] != self.chunk:
            raise ValueError(f"feed expects chunks of {self.chunk} frames, "
                             f"got {au.shape[1]} (pad and pass n_valid)")
        if n_valid is None:
            n_valid = self.chunk
        if int(self._t_ctx) + self.chunk > self.max_frames:
            raise ValueError("context capacity exceeded; raise max_frames")
        self._cross = self._feed_fn(self.params, self._cross, self._t_ctx,
                                    au, self._sids)
        self._t_ctx = self._t_ctx + jnp.asarray(n_valid, jnp.int32)

    def start(self, prompt) -> None:
        """Consume the (B, P) EMOCA-code prompt (the reference seeds with
        the first frame's code, test path seq2seq_pretrain z_s_emoca[:, :1];
        use ``SpeakerSLMFT.tokenize_emoca_frames`` to build one live)."""
        if int(self._t_ctx) == 0:
            raise ValueError("feed at least one audio chunk before start()")
        prompt = jnp.asarray(prompt, jnp.int32)
        self._dec, self._t_dec, self._logits = self._prompt_fn(
            self.params, self._dec, self._cross, self._t_ctx, self._t_dec,
            prompt.shape[1], prompt)

    def generate(self, n: int) -> np.ndarray:
        """Sample the next ``n`` EMOCA codes (B, n) against the audio fed
        so far."""
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

    def tokens(self) -> np.ndarray:
        if not self._tokens:
            return np.zeros((self.batch, 0), np.int32)
        return np.concatenate(self._tokens, axis=1)

    def mesh(self, template, tokens=None):
        """Decode codes to ((B, T, vertice_dim) mesh, (B, T, 56) EMOCA)."""
        if tokens is None:
            tokens = self.tokens()
        mesh, emoca = self.model.apply(
            self.params, jnp.asarray(tokens, jnp.int32),
            jnp.asarray(template, self.model.dtype),
            method=SpeakerSLMFT.stream_decode_emoca)
        return np.asarray(mesh), np.asarray(emoca)
