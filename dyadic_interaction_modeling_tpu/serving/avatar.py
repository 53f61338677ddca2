"""End-to-end live avatar serving: audio/motion in -> rendered frames out.

The reference runs its listener pipeline as three OFFLINE batch scripts over
saved files: generate codes (``/root/reference/code/test_s2s_pretrain.py``),
smooth + export EMOCA coefficient dirs
(``/root/reference/code/postprocess2emoca.py:7-29,81-105``), then render
with PIRender (``/root/reference/code/Pirender/inference_newmodel.py``).
This module runs the SAME math incrementally with bounded per-frame latency,
composing streaming operators around a ``StreamingListenerSession``:

1. ``StreamingCoeffDecoder`` turns listener codes into EMOCA coefficient
   frames.  The VQ motion decoder is bidirectional over the code sequence
   (stage1_BIWI.py:320-393), so frame ``t`` FINALIZES once ``lookahead``
   future frames' codes exist, decoded from the masked prefix
   ``codes[:, : t+la+1]`` - one fixed-capacity jitted program serves every
   prefix length (no recompiles).  The masked decode is the
   per-sample-equivalent semantics, i.e. what the reference's B=1 eval loop
   computes (x_engine_pt.py decodes clips individually).
2. ``StreamingSmoother`` - streaming twin of
   ``postprocess.smooth_logits_matrix`` (window-10 moving average with the
   reference's zero-edge quirk): frame ``t`` finalizes once frame
   ``t + window - window//2 - 1`` exists; bit-identical to the offline
   function for every stream length and push granularity.
3. ``StreamingSemanticWindower`` - streaming twin of
   ``render.data.semantic_window`` (radius-13 coefficient windows, clamped
   at clip boundaries exactly like vox_dataset.py's obtain_seq_index).
4. ``StreamingRenderer`` - an optional fixed-batch PIRender stage (one
   jitted FaceGenerator program) turning finalized windows into frames.

Every operator's emissions depend only on the stream CONTENT, never on how
the host sliced its pushes, and concatenated emissions equal the offline
batch functions exactly (tests/test_avatar.py).  End-to-end added latency is
``lookahead + (window - window//2 - 1) + radius`` frames (defaults
8 + 4 + 13 = 25 frames = 0.83 s at 30 fps) on top of the session's chunk
cadence - a true live avatar, which the reference's offline scripts cannot
express.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.slm import SLMFT
from .streaming import StreamingListenerSession


class StreamingSmoother:
    """Streaming twin of ``postprocess.smooth_logits_matrix``.

    Emits each frame's smoothed value as soon as it is final:

    * frames ``[0, window//2)`` are edge frames (zero or copy, per
      ``edge_mode``) - final immediately;
    * frame ``t >= window//2`` takes the centered moving average
      ``mean(x[t - w//2 : t + w - w//2])`` - final once frame
      ``t + w - w//2 - 1`` has arrived;
    * remaining tail frames are edge frames - final at ``flush()`` (only
      then is the clip length known).

    For every total length T (including T < window, the reference's
    all-edges case) and every push granularity, the concatenated emissions
    equal ``smooth_logits_matrix(x, window, edge_mode)`` - edge frames
    bit-identically, interior frames to float64 round-off (the offline
    np.convolve scales before summing; tests pin 1e-12).  Only even windows
    are supported: the reference formula (postprocess2emoca.py:24) is
    shape-inconsistent for odd windows and is only ever used with 10.
    """

    def __init__(self, window: int = 10, edge_mode: str = "zero"):
        if window % 2 != 0:
            raise ValueError("smoothing window must be even (reference uses 10)")
        if edge_mode not in ("zero", "copy"):
            raise ValueError(f"unknown edge_mode {edge_mode!r}")
        self.window = window
        self.edge_mode = edge_mode
        self._frames: List[np.ndarray] = []   # raw frames, each (..., C)
        self._emitted = 0

    @property
    def latency_frames(self) -> int:
        return self.window - self.window // 2 - 1

    def push(self, frames: np.ndarray) -> np.ndarray:
        """frames (..., n, C); returns newly finalized frames (..., m, C)."""
        frames = np.asarray(frames, dtype=np.float64)
        for k in range(frames.shape[-2]):
            self._frames.append(frames[..., k, :])
        return self._drain(final=False)

    def flush(self) -> np.ndarray:
        """Finalize the tail (edge frames) once the stream has ended."""
        return self._drain(final=True)

    def _edge_value(self, i: int) -> np.ndarray:
        raw = self._frames[i]
        return np.zeros_like(raw) if self.edge_mode == "zero" else raw.copy()

    def _empty(self) -> np.ndarray:
        if self._frames:
            s = self._frames[0].shape
            return np.zeros(s[:-1] + (0, s[-1]), np.float64)
        return np.zeros((0, 0), np.float64)

    def _drain(self, final: bool) -> np.ndarray:
        w, lo = self.window, self.window // 2
        t = len(self._frames)
        out = []
        while self._emitted < t:
            i = self._emitted
            if i < lo:
                out.append(self._edge_value(i))
            elif i + (w - lo - 1) <= t - 1:
                stack = np.stack(self._frames[i - lo: i - lo + w], axis=-2)
                out.append(stack.mean(axis=-2))
            elif final:
                out.append(self._edge_value(i))
            else:
                break
            self._emitted += 1
        return np.stack(out, axis=-2) if out else self._empty()


class StreamingSemanticWindower:
    """Streaming twin of ``render.data.semantic_window``: frame ``t``'s
    (..., C, 2r+1) coefficient window finalizes once frame ``t + radius``
    exists (lower indices clamp at 0 as frames arrive; upper clamping only
    matters for the tail, which finalizes at ``flush()`` with the true clip
    length).  Emissions equal the offline function on the full clip."""

    def __init__(self, radius: int = 13):
        self.radius = radius
        self._frames: List[np.ndarray] = []   # each (..., C)
        self._emitted = 0

    @property
    def latency_frames(self) -> int:
        return self.radius

    def push(self, frames: np.ndarray) -> List[np.ndarray]:
        frames = np.asarray(frames, dtype=np.float32)
        for k in range(frames.shape[-2]):
            self._frames.append(frames[..., k, :])
        return self._drain(final=False)

    def flush(self) -> List[np.ndarray]:
        return self._drain(final=True)

    def _drain(self, final: bool) -> List[np.ndarray]:
        t = len(self._frames)
        out = []
        while self._emitted < t:
            i = self._emitted
            if not final and i + self.radius > t - 1:
                break
            idx = [min(max(j, 0), t - 1)
                   for j in range(i - self.radius, i + self.radius + 1)]
            window = np.stack([self._frames[j] for j in idx], axis=-2)
            out.append(np.swapaxes(window, -1, -2).astype(np.float32))
            self._emitted += 1
        return out


class StreamingCoeffDecoder:
    """Streaming code -> coefficient-frame decode with bounded lookahead.

    The VQ motion decoder attends bidirectionally over the code sequence, so
    a live stream must pick a finalization horizon: frame ``t`` is emitted
    once its horizon ``H(t) = round_up(t + la + 1, granularity)`` frames of
    codes exist, decoded from the masked prefix ``codes[:, : H(t) * fq]`` -
    EXACTLY that prefix, whatever the push slicing, so emissions are
    reproducible.  ``granularity`` trades latency for device calls: with
    ``granularity=1`` every frame gets its own prefix (one decode per
    frame); with ``granularity=chunk`` a whole chunk of frames shares one
    horizon (ONE decode per chunk, up to ``granularity - 1`` extra frames of
    latency).  ``lookahead=None`` defers everything to ``flush()``, where
    frames are decoded from the full final sequence (the offline clip
    decode); flush also clamps surviving horizons to the true clip length.

    ``decode_fn(tokens (B, capacity*fq), n_tokens (B,)) -> (B, capacity, C)``
    abstracts the model so listener (fq=1) and speaker (fq=8) heads both
    plug in; see ``listener_decode_fn``.  Pass ``coeff_dim`` (the decoded
    coefficient dimension C) so pre-decode empty emissions have the real
    trailing dim and concatenate cleanly with later pushes; without it the
    first empty emissions use a placeholder dim of 1 and must be filtered
    out before concatenation.
    """

    def __init__(self, decode_fn, *, batch: int, capacity: int,
                 lookahead: Optional[int] = 8, granularity: int = 1,
                 tokens_per_frame: int = 1, coeff_dim: Optional[int] = None):
        self.decode_fn = decode_fn
        self.batch = batch
        self.capacity = capacity
        self.lookahead = lookahead
        self.granularity = granularity
        self.fq = tokens_per_frame
        self._tokens = np.zeros((batch, 0), np.int32)
        self._emitted = 0
        self._coeff_dim = coeff_dim or 1

    @property
    def latency_frames(self) -> int:
        """Worst-case finalization lag behind the code stream."""
        if self.lookahead is None:
            return 0
        return self.lookahead + self.granularity - 1

    @property
    def frames_available(self) -> int:
        return self._tokens.shape[1] // self.fq

    def push(self, tokens: np.ndarray) -> np.ndarray:
        """tokens (B, n*fq) newly generated codes; returns newly finalized
        coefficient frames (B, m, C)."""
        tokens = np.asarray(tokens, np.int32)
        # validate BEFORE mutating: an overflowing push must leave the
        # decoder state intact so the caller can catch and flush
        if self._tokens.shape[1] + tokens.shape[1] > self.capacity * self.fq:
            raise ValueError("token capacity exceeded; raise capacity")
        self._tokens = np.concatenate([self._tokens, tokens], axis=1)
        if self.lookahead is None:
            return self._empty()
        # frame t finalizes once H(t) = round_up(t+la+1, g) frames exist
        g, a = self.granularity, self.frames_available
        return self._decode_upto(g * (a // g) - self.lookahead, final=False)

    def flush(self) -> np.ndarray:
        """Finalize the tail from the full final sequence (== the offline
        decode of the whole code stream for those frames)."""
        return self._decode_upto(self.frames_available, final=True)

    def _horizon(self, t: int) -> int:
        g = self.granularity
        return g * -(-(t + self.lookahead + 1) // g)

    def _decode_upto(self, hi: int, final: bool) -> np.ndarray:
        if hi <= self._emitted:
            return self._empty()
        total = self.frames_available
        out, cached_n, coeffs = [], None, None
        for t in range(self._emitted, hi):
            n_ctx = total if (final or self.lookahead is None) else \
                self._horizon(t)
            if n_ctx != cached_n:
                coeffs = self._decode_prefix(n_ctx)
                cached_n = n_ctx
            out.append(coeffs[:, t: t + 1])
        self._emitted = hi
        res = np.concatenate(out, axis=1)
        self._coeff_dim = res.shape[-1]
        return res

    def _decode_prefix(self, n_frames: int) -> np.ndarray:
        pad = self.capacity * self.fq - self._tokens.shape[1]
        toks = np.pad(self._tokens, ((0, 0), (0, pad)))
        n_tok = np.full((self.batch,), n_frames * self.fq, np.int32)
        return np.asarray(self.decode_fn(jnp.asarray(toks),
                                         jnp.asarray(n_tok)))

    def _empty(self) -> np.ndarray:
        return np.zeros((self.batch, 0, self._coeff_dim), np.float32)


def listener_decode_fn(model: SLMFT, params):
    """Fixed-capacity masked listener-VQ decode (jitted once per model).

    The jitted closure is memoized ON the model instance (a fresh jit
    closure per pipeline would recompile the masked VQ decode each time -
    tens of seconds to minutes on this platform) so the cache entry and its
    compiled executables are garbage-collected with the model, instead of
    pinning every model ever used in a module-level dict."""
    _decode = getattr(model, "_dim_tpu_decode_jit", None)
    if _decode is None:
        @jax.jit
        def _decode(params, toks, n_tok):
            return model.apply(params, toks, lengths=n_tok,
                               method=SLMFT.decode_tokens_to_motion)

        # flax Modules are frozen dataclasses; bypass for a private memo attr
        object.__setattr__(model, "_dim_tpu_decode_jit", _decode)
    return lambda toks, n_tok: _decode(params, toks, n_tok)


class StreamingRenderer:
    """Fixed-batch PIRender stage: buffers finalized (B, C, 2r+1) windows
    and renders ``frames_per_call`` of them at a time through ONE jitted
    FaceGenerator program (B * frames_per_call images per call); ``flush``
    pads the final partial call and discards the padding.

    ``outputs`` selects which generator images leave the device (production
    streams want ``("fake_image",)`` - warp is a diagnostic) and
    ``as_uint8`` converts to display bytes ON DEVICE with the PNG-export
    formula ``(clip(x,-1,1)+1)*127.5`` (render/inference.py): together they
    cut device->host traffic 8x, which dominates the serving round on any
    bandwidth-constrained link.

    ``pipeline_depth=1`` double-buffers the OUTPUT transfer: ``push``
    dispatches this round's render and materializes the PREVIOUS round's
    frames, so the device->host copy of round ``t`` overlaps the device
    compute of round ``t+1`` instead of serializing after it (jax dispatch
    is async; only ``np.asarray`` blocks). Costs ``frames_per_call`` frames
    of extra latency; the total emitted stream is unchanged (``flush``
    drains the buffer). Worth it whenever the link is slow relative to the
    render - which is every round on the axon tunnel (~20 MB/s: the 8-frame
    uint8 block alone is ~75 ms) and still a win on PCIe at high fps."""

    def __init__(self, model, params, source_images: np.ndarray, *,
                 frames_per_call: int = 8,
                 outputs=("fake_image", "warp_image"), as_uint8: bool = False,
                 pipeline_depth: int = 0):
        self.model = model
        self.params = params
        self.batch = source_images.shape[0]
        self.frames_per_call = frames_per_call
        self.outputs = tuple(outputs)
        self.as_uint8 = as_uint8
        self.pipeline_depth = pipeline_depth
        self._inflight: List[tuple] = []   # (device result dict, n_valid)
        self._src = jnp.asarray(source_images)          # (B, H, W, 3)
        # the source tile is identical every round: build it once instead of
        # dispatching a per-round device-side tile (saves one tunnel call)
        r = frames_per_call
        self._imgs = jnp.tile(self._src[:, None], (1, r, 1, 1, 1)).reshape(
            self.batch * r, *self._src.shape[1:])
        self._pending: List[np.ndarray] = []            # each (B, C, W)

        @jax.jit
        def _render(params, imgs, sems):
            out = model.apply({"params": params}, imgs, sems)
            res = {}
            for k in self.outputs:
                x = out[k]
                if as_uint8:
                    x = ((jnp.clip(x, -1.0, 1.0) + 1.0) * 127.5
                         ).astype(jnp.uint8)
                res[k] = x
            return res

        self._render_fn = _render

    def push(self, windows: List[np.ndarray]) -> Dict[str, np.ndarray]:
        self._pending.extend(windows)
        return self._drain(final=False)

    def flush(self) -> Dict[str, np.ndarray]:
        return self._drain(final=True)

    def _drain(self, final: bool) -> Dict[str, np.ndarray]:
        acc: Dict[str, List[np.ndarray]] = {k: [] for k in self.outputs}
        r = self.frames_per_call
        while len(self._pending) >= r or (final and self._pending):
            block, self._pending = self._pending[:r], self._pending[r:]
            n_valid = len(block)
            block = block + [block[-1]] * (r - n_valid)   # flush padding
            sems = jnp.asarray(np.stack(block, axis=1).reshape(
                self.batch * r, *block[0].shape[1:]))
            # async dispatch: res holds device arrays, nothing blocks yet
            self._inflight.append(
                (self._render_fn(self.params, self._imgs, sems), n_valid))
        keep = 0 if final else self.pipeline_depth
        while len(self._inflight) > keep:
            res, n_valid = self._inflight.pop(0)
            for k in self.outputs:
                x = np.asarray(res[k]).reshape(
                    self.batch, r, *res[k].shape[1:])
                acc[k].append(x[:, :n_valid])
        if not acc[self.outputs[0]]:
            _, h, w, c = self._src.shape
            dt = np.uint8 if self.as_uint8 else np.float32
            return {k: np.zeros((self.batch, 0, h, w, c), dt)
                    for k in self.outputs}
        return {k: np.concatenate(v, axis=1) for k, v in acc.items()}


class StreamingAvatarPipeline:
    """The full live listener avatar: speaker motion+audio chunks in,
    rendered listener video frames out.

    Parameters
    ----------
    session: a fresh ``StreamingListenerSession`` (its batch/chunk set the
        pipeline cadence; one listener code is generated per fed frame).
    prompt: (B, P) seed listener codes (the reference seeds with the first
        GT listener code, seq2seq_pretrain.py:450; zeros are the cold-start
        choice).  Consumed on the first ``push``.
    vq_lookahead: frames of future code context before a coefficient frame
        finalizes (None = only at flush, exactly the offline decode).
    vq_granularity: horizon rounding of the coefficient decode (see
        ``StreamingCoeffDecoder``); set to the session chunk for one decode
        call per chunk instead of one per frame.
    smooth_window / edge_mode: ``postprocess.smooth_logits_matrix`` params.
    semantic_radius: PIRender coefficient-window radius.
    renderer / render_params / source_images: optional FaceGenerator stage;
        omit to stream smoothed coefficient windows only.
    """

    def __init__(self, session: StreamingListenerSession, *, prompt=None,
                 vq_lookahead: Optional[int] = 8, vq_granularity: int = 1,
                 smooth_window: int = 10, edge_mode: str = "zero",
                 semantic_radius: int = 13, renderer=None,
                 render_params=None, source_images=None,
                 render_frames_per_call: int = 8,
                 render_outputs=("fake_image", "warp_image"),
                 render_uint8: bool = False, render_pipeline_depth: int = 0):
        self.session = session
        b = session.batch
        self.prompt = (np.zeros((b, 1), np.int32) if prompt is None
                       else np.asarray(prompt, np.int32))
        self._started = False
        self.decoder = StreamingCoeffDecoder(
            listener_decode_fn(session.model, session.params),
            batch=b, capacity=session.max_tokens, lookahead=vq_lookahead,
            granularity=vq_granularity,
            coeff_dim=session.model.vq_cfg.in_dim)
        self.smoother = StreamingSmoother(smooth_window, edge_mode)
        self.windower = StreamingSemanticWindower(semantic_radius)
        self.renderer = None
        if renderer is not None:
            src = np.asarray(source_images)
            if src.ndim != 4 or src.shape[0] != b:
                raise ValueError(
                    f"source_images must be (batch={b}, H, W, C) - one "
                    f"source face per session stream - got {src.shape}")
            self.renderer = StreamingRenderer(
                renderer, render_params, src,
                frames_per_call=render_frames_per_call,
                outputs=render_outputs, as_uint8=render_uint8,
                pipeline_depth=render_pipeline_depth)

    @property
    def latency_frames(self) -> int:
        """Added pipeline latency beyond the session's chunk cadence."""
        render_lag = (0 if self.renderer is None else
                      self.renderer.pipeline_depth
                      * self.renderer.frames_per_call)
        return (self.decoder.latency_frames + self.smoother.latency_frames
                + self.windower.latency_frames + render_lag)

    def push(self, speaker_chunk, audio_chunk,
             n_valid: Optional[int] = None) -> Dict[str, np.ndarray]:
        """Feed one speaker chunk, generate that many listener codes, run
        every downstream stage as far as finalization allows.  Returns the
        newly finalized artifacts of each stage (possibly empty): tokens
        (B, n), coeffs (B, m, C), smoothed (B, m', C), windows (list of
        (B, C, 2r+1)), fake_image/warp_image (B, m'', H, W, 3)."""
        self.session.feed(speaker_chunk, audio_chunk, n_valid=n_valid)
        if not self._started:
            self.session.start(self.prompt)
            self._started = True
        n = self.session.chunk if n_valid is None else n_valid
        tokens = self.session.generate(n)
        out = {"tokens": np.asarray(tokens)}
        out["coeffs"] = self.decoder.push(tokens)
        out["smoothed"] = self.smoother.push(out["coeffs"])
        out["windows"] = self.windower.push(out["smoothed"])
        if self.renderer is not None:
            out.update(self.renderer.push(out["windows"]))
        return out

    def flush(self) -> Dict[str, np.ndarray]:
        """Finalize every stage's tail once the stream has ended."""
        out = {"tokens": np.zeros((self.session.batch, 0), np.int32)}
        out["coeffs"] = self.decoder.flush()
        sm_head = self.smoother.push(out["coeffs"])
        out["smoothed"] = np.concatenate([sm_head, self.smoother.flush()],
                                         axis=-2)
        out["windows"] = (self.windower.push(out["smoothed"])
                          + self.windower.flush())
        if self.renderer is not None:
            head = self.renderer.push(out["windows"])
            tail = self.renderer.flush()
            for k in self.renderer.outputs:
                out[k] = np.concatenate([head[k], tail[k]], axis=1)
        return out
