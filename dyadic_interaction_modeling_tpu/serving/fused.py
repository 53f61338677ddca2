"""Single-dispatch live avatar rounds: the whole pipeline in ONE program.

``StreamingAvatarPipeline`` (serving/avatar.py) runs the live listener
avatar as four device programs per round - feed, generate, masked VQ
decode, render - with host numpy smoothing/windowing between them.  That is
the right shape for composability, but on a dispatch-latency-bound link
every extra program costs a full host->device round trip, and the masked VQ
decode downloads its full (B, capacity, C) coefficient buffer every round
just so the host can slice out one chunk.

``FusedAvatarPipeline`` is the serving fast path: ONE jitted program per
round carries the ENTIRE chain

    feed chunk -> generate chunk codes -> masked VQ decode -> streaming
    smoothing -> semantic windowing -> FaceGenerator render -> uint8 frames

with every piece of pipeline state (encoder/decoder/cross KV caches, the
code buffer, the raw and smoothed coefficient ring buffers, the sampling
RNG) resident on the device and donated between rounds.  Per round the host
uploads one speaker chunk and downloads one uint8 frame block - nothing
else crosses the link, and ``pipeline_depth=1`` (default) double-buffers
that one download behind the next round's compute.

Exactness. The fused program reproduces ``StreamingAvatarPipeline``'s
emissions frame for frame (tests/test_fused_avatar.py) by processing each
stage in chunk-aligned blocks at a fixed round lag:

* codes: identical sampler/rng threading as ``StreamingListenerSession``
  (round 1 actually RUNS through a session - see below), so token streams
  match bit for bit;
* raw coefficients: frame ``t`` decodes from the masked prefix
  ``H(t) = g*ceil((t+la+1)/g)`` like ``StreamingCoeffDecoder``; requiring
  ``lookahead % chunk == 0`` (the serving config uses lookahead = chunk)
  makes every frame of a block share one horizon, so block ``j`` =
  ``[c(j-1), cj)`` is one slice of the round-``j + la/c`` decode;
* smoothing: the reference window-10 moving average with the zero/copy
  edge quirk (postprocess2emoca.py:24), computed in f32 on device (the
  host twin accumulates in f64; interior frames agree to ~1e-6);
* windows: radius-r coefficient windows clamped at 0 exactly like
  ``semantic_window``.

Stage lags (rounds, chunk c): raw ``la/c``, smoothing ``+ceil((w - w//2 -
1)/c)``, window+render ``+ceil(r/c)`` - with the defaults (c=8, la=8, w=10,
r=13) frames render 4 rounds after their speaker chunk fed, 5 with the
double-buffered download: ~1.3 s of pipeline latency at 30 fps, traded for
a round cost low enough to hold 30 fps in the first place.  Early rounds
write their clamped-offset blocks with garbage; every such block is
overwritten by the first VALID round before anything reads it, and ``out``
masks pre-validity emissions to empty.

``flush()`` finalizes the tail (the last ``lookahead + smoothing + radius``
frames plus any in-flight download) by downloading the device buffers once
and running the EXACT host-side operators of serving/avatar.py seeded with
the fused counters - so a fused stream ends with precisely the offline
batch semantics, like the composable pipeline.

Round 1 runs through a plain ``StreamingListenerSession`` (feed + prompt +
generate), whose compiled programs are shared with the composable pipeline;
the fused program then takes ownership of the session's caches.  This keeps
the one-time prompt consumption out of the steady-state program (a static
branch would compile a second full variant for one round).

Reference: this replaces the offline generate -> postprocess2emoca ->
PIRender chain (/root/reference/code/test_s2s_pretrain.py,
postprocess2emoca.py:7-29, Pirender/inference_newmodel.py:339-405) as the
live serving path; the reference has no online equivalent.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.slm import SLMFT
from ..models.xtrans import top_k_filter
from .avatar import (
    StreamingCoeffDecoder,
    StreamingRenderer,
    StreamingSemanticWindower,
    StreamingSmoother,
    listener_decode_fn,
)
from .streaming import StreamingListenerSession


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


class FusedAvatarPipeline:
    """One-dispatch-per-round live listener avatar (see module docstring).

    Parameters mirror ``StreamingAvatarPipeline`` where they overlap;
    ``renderer`` is required (a no-render fused round would just be the
    session).  ``pipeline_depth=1`` double-buffers the frame download.
    """

    def __init__(self, model: SLMFT, params, *, renderer, render_params,
                 source_images, batch: int = 1, chunk: int = 8,
                 max_frames: int = 1024, max_tokens: Optional[int] = None,
                 rng: int = 0, temperature: float = 1.0,
                 filter_frac: float = 0.1, greedy: bool = False,
                 prompt=None, vq_lookahead: int = 8, smooth_window: int = 10,
                 edge_mode: str = "zero", semantic_radius: int = 13,
                 render_outputs=("fake_image",), render_uint8: bool = True,
                 pipeline_depth: int = 1):
        if vq_lookahead <= 0 or vq_lookahead % chunk:
            raise ValueError(
                "the fused round needs lookahead to be a positive multiple "
                "of the chunk so every frame of a block shares one decode "
                "horizon (use StreamingAvatarPipeline otherwise)")
        if smooth_window % 2 or edge_mode not in ("zero", "copy"):
            raise ValueError("smoothing params must match "
                             "postprocess.smooth_logits_matrix (even window,"
                             " zero/copy edges)")
        self.model = model
        self.renderer = renderer
        self.render_params = render_params
        self.chunk = chunk
        self.batch = batch
        self.lookahead = vq_lookahead
        self.smooth_window = smooth_window
        self.edge_mode = edge_mode
        self.radius = semantic_radius
        self.render_outputs = tuple(render_outputs)
        self.render_uint8 = render_uint8
        self.pipeline_depth = pipeline_depth
        self._coeff_dim = model.vq_cfg.in_dim

        # stage lags in ROUNDS (chunk-aligned blocks; module docstring)
        smooth_lag = smooth_window - smooth_window // 2 - 1
        self.d_raw = vq_lookahead // chunk
        self.d_sm = self.d_raw + _ceil_div(smooth_lag, chunk)
        self.d_win = self.d_sm + _ceil_div(semantic_radius, chunk)

        # round 1 runs through a session; the fused program inherits its
        # caches/counters/rng afterwards (shared compiled programs)
        self.session = StreamingListenerSession(
            model, params, batch=batch, chunk=chunk, max_frames=max_frames,
            max_tokens=max_tokens, rng=rng, temperature=temperature,
            filter_frac=filter_frac, greedy=greedy)
        self.params = self.session.params
        self.prompt = (np.zeros((batch, 1), np.int32) if prompt is None
                       else np.asarray(prompt, np.int32))
        self.k = 0                       # rounds completed
        self._state = None               # built on first push
        self._inflight: List[Dict] = []  # device round outputs
        self._flushed = False

        src = jnp.asarray(source_images)
        if src.ndim != 4 or src.shape[0] != batch:
            raise ValueError(
                f"source_images must be (batch={batch}, H, W, C) - one "
                f"source face per avatar stream - got {src.shape}")
        self._src_tile = jnp.tile(src[:, None], (1, chunk, 1, 1, 1)).reshape(
            batch * chunk, *src.shape[1:])
        self._src_hw = src.shape[1:]

        cap_tok = self.session.max_tokens
        c, w, r, lo = chunk, smooth_window, semantic_radius, smooth_window // 2
        cdim = self._coeff_dim
        d_raw, d_sm, d_win = self.d_raw, self.d_sm, self.d_win
        outputs, as_uint8 = self.render_outputs, render_uint8

        def _sample(logits, key):
            logits = logits.astype(jnp.float32)
            if greedy:
                return jnp.argmax(logits, axis=-1).astype(jnp.int32)
            filt = top_k_filter(logits, filter_frac) / temperature
            return jax.random.categorical(key, filt, axis=-1).astype(jnp.int32)

        @partial(jax.jit, donate_argnums=(2,))
        def _round(params, r_params, state, sp, au, src_tile):
            (enc_s, enc_j, cross, dec, t_ctx, t_dec, logits, rng, tokens,
             raw, smoothed, k) = state
            k = k + 1

            # ---- feed: causal encoder extension + cross-KV append --------
            ctx, enc_s, enc_j = model.apply(
                params, sp, au, enc_s, enc_j, t_ctx,
                method=SLMFT.encode_context_chunk)
            kv = model.apply(params, ctx, method=SLMFT.stream_cross_kv)
            cross = dict(cross)
            for i, (kk, vv) in enumerate(kv):
                cross[f"ck_{i}"] = jax.lax.dynamic_update_slice(
                    cross[f"ck_{i}"], kk, (0, 0, t_ctx, 0))
                cross[f"cv_{i}"] = jax.lax.dynamic_update_slice(
                    cross[f"cv_{i}"], vv, (0, 0, t_ctx, 0))
            t_ctx = t_ctx + c

            # ---- generate c codes (identical threading to the session) ---
            cross_kv = [(cross[f"ck_{i}"], cross[f"cv_{i}"])
                        for i in range(model.cfg.dec_depth)]
            ctx_mask = jnp.broadcast_to(
                jnp.arange(cross_kv[0][0].shape[2])[None, :] < t_ctx,
                (batch, cross_kv[0][0].shape[2]))

            def body(carry, _):
                logits, dec, rng, t = carry
                rng, sub = jax.random.split(rng)
                tok = _sample(logits, sub)
                new_logits, dec = model.apply(
                    params, tok[:, None], dec, t, cross_kv, ctx_mask,
                    method=SLMFT.stream_decode_step)
                return (new_logits, dec, rng, t + 1), tok

            (logits, dec, rng, t_dec), toks = jax.lax.scan(
                body, (logits, dec, rng, t_dec), None, length=c)
            tok_block = toks.T                      # (B, c)
            tokens = jax.lax.dynamic_update_slice(
                tokens, tok_block, (0, (k - 1) * c))

            # ---- masked VQ decode of the prefix; raw block j = k - d_raw -
            coeffs = model.apply(params, tokens,
                                 lengths=jnp.full((batch,), k * c, jnp.int32),
                                 method=SLMFT.decode_tokens_to_motion)
            off_raw = jnp.maximum(0, (k - d_raw - 1) * c)
            raw = jax.lax.dynamic_update_slice(
                raw, jax.lax.dynamic_slice(
                    coeffs.astype(jnp.float32), (0, off_raw, 0),
                    (batch, c, cdim)),
                (0, off_raw, 0))

            # ---- smoothing block j = k - d_sm (w-tap moving average with
            # the reference's zero/copy edge quirk) ------------------------
            off_sm = jnp.maximum(0, (k - d_sm - 1) * c)
            t_sm = off_sm + jnp.arange(c)                     # (c,)
            gather = jnp.clip(t_sm[:, None]
                              + jnp.arange(w)[None, :] - lo, 0, None)
            sm_in = jnp.take(raw, gather.reshape(-1), axis=1).reshape(
                batch, c, w, cdim)
            sm = jnp.mean(sm_in, axis=2)
            edge = (jnp.zeros_like(sm) if edge_mode == "zero" else
                    jnp.take(raw, t_sm, axis=1))
            sm = jnp.where((t_sm < lo)[None, :, None], edge, sm)
            smoothed = jax.lax.dynamic_update_slice(smoothed, sm,
                                                    (0, off_sm, 0))

            # ---- semantic windows + render, block j = k - d_win ----------
            off_win = jnp.maximum(0, (k - d_win - 1) * c)
            t_win = off_win + jnp.arange(c)
            wg = jnp.clip(t_win[:, None] + jnp.arange(-r, r + 1)[None, :],
                          0, None)
            wins = jnp.take(smoothed, wg.reshape(-1), axis=1).reshape(
                batch, c, 2 * r + 1, cdim)
            sems = jnp.swapaxes(wins, 2, 3).reshape(          # (B*c, C, 2r+1)
                batch * c, cdim, 2 * r + 1)
            rout = renderer.apply({"params": r_params}, src_tile, sems)
            frames = {}
            for key in outputs:
                x = rout[key]
                if as_uint8:
                    x = ((jnp.clip(x, -1.0, 1.0) + 1.0) * 127.5
                         ).astype(jnp.uint8)
                frames[key] = x.reshape(batch, c, *x.shape[1:])

            state = (enc_s, enc_j, cross, dec, t_ctx, t_dec, logits, rng,
                     tokens, raw, smoothed, k)
            return state, tok_block, frames

        self._round_fn = _round
        self._cap_tok = cap_tok

    # ------------------------------------------------------------------

    @property
    def frames_fed(self) -> int:
        return self.k * self.chunk

    @property
    def latency_frames(self) -> int:
        """Worst-case added latency beyond the chunk cadence: frame t
        renders ``d_win`` rounds (+1 if double-buffered) after its chunk."""
        return (self.d_win + (1 if self.pipeline_depth else 0)) * self.chunk

    def _adopt_session_state(self):
        s = self.session
        cdim, cap, b = self._coeff_dim, s.max_frames, self.batch
        tokens = jnp.zeros((b, self._cap_tok), jnp.int32)
        tokens = jax.lax.dynamic_update_slice(
            tokens, jnp.asarray(s.tokens()), (0, 0))
        self._state = (s._enc_s, s._enc_j, s._cross, s._dec, s._t_ctx,
                       s._t_dec, s._logits, s._rng, tokens,
                       jnp.zeros((b, cap, cdim), jnp.float32),
                       jnp.zeros((b, cap, cdim), jnp.float32),
                       jnp.asarray(self.k, jnp.int32))
        # the fused program owns (and will donate) these buffers now
        s._enc_s = s._enc_j = s._cross = s._dec = s._logits = None

    def _empty_out(self) -> Dict[str, np.ndarray]:
        h, wd, ch = self._src_hw
        dt = np.uint8 if self.render_uint8 else np.float32
        out = {"tokens": np.zeros((self.batch, 0), np.int32)}
        for key in self.render_outputs:
            out[key] = np.zeros((self.batch, 0, h, wd, ch), dt)
        return out

    def push(self, speaker_chunk, audio_chunk) -> Dict[str, np.ndarray]:
        """Feed one full (B, chunk, ...) speaker chunk; returns newly
        final tokens and rendered frames (both possibly empty in the first
        ``d_win + pipeline_depth`` rounds). Short final chunks: stop pushing
        and ``flush()`` - the fused fast path trades ragged-tail handling
        for the single-program round."""
        if self._flushed:
            raise ValueError("pipeline already flushed")
        if (self.k + 1) * self.chunk > self.session.max_frames:
            raise ValueError("context capacity exceeded; raise max_frames")
        if (self.k + 1) * self.chunk + self.prompt.shape[1] > self._cap_tok:
            raise ValueError("token capacity exceeded; raise max_tokens")
        if self.k == 0:
            # round 1 through the session: feed + prompt + first chunk
            self.session.feed(speaker_chunk, audio_chunk)
            self.session.start(self.prompt)
            toks = self.session.generate(self.chunk)
            self.k = 1
            self._adopt_session_state()
            out = self._empty_out()
            out["tokens"] = toks
            return out
        sp = jnp.asarray(speaker_chunk, self.model.dtype)
        au = jnp.asarray(audio_chunk, self.model.dtype)
        self.k += 1
        self._state, tok_block, frames = self._round_fn(
            self.params, self.render_params, self._state, sp, au,
            self._src_tile)
        self._inflight.append(
            {"k": self.k, "tokens": tok_block, "frames": frames})
        return self._drain(final=False)

    def _drain(self, final: bool) -> Dict[str, np.ndarray]:
        keep = 0 if final else self.pipeline_depth
        out = self._empty_out()
        toks, frames = [out["tokens"]], {key: [out[key]]
                                         for key in self.render_outputs}
        while len(self._inflight) > keep:
            item = self._inflight.pop(0)
            toks.append(np.asarray(item["tokens"]))
            if item["k"] > self.d_win:     # pre-validity renders are garbage
                for key in self.render_outputs:
                    frames[key].append(np.asarray(item["frames"][key]))
        out["tokens"] = np.concatenate(toks, axis=1)
        for key in self.render_outputs:
            out[key] = np.concatenate(frames[key], axis=1)
        return out

    def flush(self) -> Dict[str, np.ndarray]:
        """Drain in-flight rounds, then finalize the tail with the exact
        host-side operators of the composable pipeline, seeded from the
        device buffers (module docstring)."""
        if self._flushed:
            raise ValueError("pipeline already flushed")
        self._flushed = True
        head = self._drain(final=True)
        if self.k == 0:
            return head
        c, k = self.chunk, self.k
        (tokens, raw, smoothed) = (np.asarray(self._state[8]),
                                   np.asarray(self._state[9]),
                                   np.asarray(self._state[10]))
        n_raw = c * max(0, k - self.d_raw)
        n_sm = c * max(0, k - self.d_sm)
        n_win = c * max(0, k - self.d_win)

        dec = StreamingCoeffDecoder(
            listener_decode_fn(self.model, self.params), batch=self.batch,
            capacity=self._cap_tok, lookahead=self.lookahead,
            granularity=c, coeff_dim=self._coeff_dim)
        dec._tokens = tokens[:, : k * c]
        dec._emitted = n_raw
        raw_tail = dec.flush()

        sm = StreamingSmoother(self.smooth_window, self.edge_mode)
        sm._frames = [raw[:, t].astype(np.float64) for t in range(n_raw)]
        sm._emitted = n_sm
        sm_out = np.concatenate([sm.push(raw_tail), sm.flush()], axis=-2)

        wd = StreamingSemanticWindower(self.radius)
        wd._frames = [smoothed[:, t] for t in range(n_sm)]
        wd._emitted = n_win
        windows = wd.push(sm_out) + wd.flush()

        rd = StreamingRenderer(
            self.renderer, self.render_params,
            np.asarray(self._src_tile[:: self.chunk]),
            frames_per_call=c, outputs=self.render_outputs,
            as_uint8=self.render_uint8)
        tail = rd.push(windows)
        tail = {key: np.concatenate([tail[key], rd.flush()[key]], axis=1)
                for key in self.render_outputs}
        out = {"tokens": head["tokens"]}
        for key in self.render_outputs:
            out[key] = np.concatenate([head[key], tail[key]], axis=1)
        return out
