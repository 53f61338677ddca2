"""Streaming audio front-end: raw 16 kHz waveform -> per-frame features.

The serving sessions (``streaming.py`` / ``pool.py``) consume 768-d audio
features per motion frame. Offline, those come from the HuBERT/wav2vec2
trunk over the WHOLE clip followed by linear interpolation to the motion
frame count (the reference's pipeline,
``/root/reference/code/dataset/biwi.py:83-113``). A live session does not
have the whole clip - and the trunk's transformer is bidirectional, so
exact streaming is impossible in principle. The standard serving answer is
TRAILING-WINDOW extraction, which this module implements with TPU-friendly
static shapes:

* a host-side ring buffer accumulates raw samples per session;
* features for motion-frame chunk ``k`` (frames ``[k*chunk, (k+1)*chunk)``)
  are computed once the stream reaches the chunk's end boundary plus
  ``lookahead`` frames of future audio (lookahead/fps seconds of added
  latency buys the interior frames real right-context);
* ONE jitted trunk program: the window is always exactly
  ``window_frames`` motion-frames of samples (left-padded with zeros while
  the stream is younger than the window - the same zero-padding convention
  HF applies to batched short clips), so no recompiles ever happen;
* the trunk output over the window is linearly interpolated
  (align_corners, the reference's ``F.interpolate`` semantics) to
  ``window_frames`` and the chunk's rows are emitted.

Determinism contract (pinned in tests/test_serving_audio.py): emissions for
chunk ``k`` depend only on the sample stream content, never on how the host
sliced its ``push`` calls. And when ``window_frames`` covers the whole
stream, emissions equal the offline prefix extraction exactly.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.wav2vec2 import Wav2Vec2Model, linear_interpolation


class StreamingAudioFrontend:
    """Turns a raw waveform stream into motion-frame-aligned features.

    Parameters
    ----------
    model, params: the (HuBERT/wav2vec2) trunk and its variables.
    fps: motion frame rate (30 for ViCo, 25 for BIWI).
    chunk: motion frames emitted per step (match the session's feed chunk).
    window_frames: trailing context size in motion frames (e.g. 60 = 2 s
        at 30 fps). Must be >= chunk + lookahead.
    lookahead: future-context frames required before a chunk is emitted
        (adds lookahead/fps seconds of latency; 0 = none).
    sample_rate: audio rate (the trunk expects 16 kHz).
    batch: lockstep sessions (one waveform each, shared boundaries).
    """

    def __init__(self, model: Wav2Vec2Model, params, *, fps: int = 30,
                 chunk: int = 8, window_frames: int = 60, lookahead: int = 2,
                 sample_rate: int = 16000, batch: int = 1):
        if window_frames < chunk + lookahead:
            raise ValueError("window_frames must cover chunk + lookahead")
        self.model = model
        self.params = params
        self.fps = fps
        self.chunk = chunk
        self.window_frames = window_frames
        self.lookahead = lookahead
        self.sample_rate = sample_rate
        self.batch = batch
        self.window_samples = self._boundary(window_frames)
        self._buf = np.zeros((batch, 0), np.float32)
        self._dropped = 0     # absolute sample index of _buf[:, 0]
        self._next_chunk = 0  # next chunk index to emit

        @partial(jax.jit, static_argnums=(2,))
        def _extract(params, window, n_frames):
            feats = model.apply(params, window, "none")  # (B, Tw, 768)
            return linear_interpolation(feats, 1, 1, output_len=n_frames)

        self._extract = _extract

    def _boundary(self, frame: int) -> int:
        """Sample index of a motion-frame boundary (frame / fps seconds)."""
        return int(round(frame * self.sample_rate / self.fps))

    @property
    def frames_emitted(self) -> int:
        return self._next_chunk * self.chunk

    def push(self, samples) -> Optional[np.ndarray]:
        """Append (batch, n) raw samples; returns (batch, m*chunk, 768)
        features for every newly-complete chunk (m >= 0; None if none)."""
        samples = np.atleast_2d(np.asarray(samples, np.float32))
        if samples.shape[0] != self.batch:
            raise ValueError(f"expected {self.batch} waveform rows")
        self._buf = np.concatenate([self._buf, samples], axis=1)
        out: List[np.ndarray] = []
        while True:
            chunk_feats = self._try_emit()
            if chunk_feats is None:
                break
            out.append(chunk_feats)
        if not out:
            return None
        return np.concatenate(out, axis=1)

    def _try_emit(self) -> Optional[np.ndarray]:
        k = self._next_chunk
        end_abs = self._boundary((k + 1) * self.chunk + self.lookahead)
        if self._dropped + self._buf.shape[1] < end_abs:
            return None
        start_abs = end_abs - self.window_samples
        # the drop policy below never discards samples a future window needs
        assert self._dropped <= max(0, start_abs)
        window = self._buf[:, max(0, start_abs) - self._dropped:
                           end_abs - self._dropped]
        if window.shape[1] < self.window_samples:  # young stream: left-pad
            pad = self.window_samples - window.shape[1]
            window = np.concatenate(
                [np.zeros((self.batch, pad), np.float32), window], axis=1)
        feats = self._extract(self.params, jnp.asarray(window),
                              self.window_frames)
        # the window's last row is frame end_frame-1; slice the chunk's rows
        lo = self.window_frames - self.lookahead - self.chunk
        hi = self.window_frames - self.lookahead
        self._next_chunk += 1
        # bounded memory: drop samples the NEXT window can no longer reach
        next_start = max(0, self._boundary(
            (k + 2) * self.chunk + self.lookahead) - self.window_samples)
        if next_start > self._dropped:
            self._buf = self._buf[:, next_start - self._dropped:]
            self._dropped = next_start
        return np.asarray(feats[:, lo:hi])
