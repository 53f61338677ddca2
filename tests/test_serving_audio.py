"""Streaming audio front-end: determinism + offline-prefix equality.

serving/audio.py turns raw waveforms into motion-frame features for the
live sessions. The trunk is bidirectional (exact streaming is impossible -
the reference extracts offline over whole clips, biwi.py:83-113), so the
contract is: trailing-window extraction whose emissions (a) never depend on
push granularity and (b) equal the offline prefix extraction exactly when
the window covers the whole stream.
"""

import numpy as np

import jax
import jax.numpy as jnp

from dyadic_interaction_modeling_tpu.models.wav2vec2 import (
    W2VConfig,
    Wav2Vec2Model,
    linear_interpolation,
)
from dyadic_interaction_modeling_tpu.serving.audio import StreamingAudioFrontend


def _tiny_trunk():
    cfg = W2VConfig(conv_dim=(16, 16), conv_kernel=(10, 3),
                    conv_stride=(5, 2), hidden_size=24, num_hidden_layers=1,
                    num_attention_heads=2, intermediate_size=32,
                    num_conv_pos_embeddings=16,
                    num_conv_pos_embedding_groups=4)
    model = Wav2Vec2Model(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 800)), "none")
    return model, params


def test_push_granularity_invariance():
    model, params = _tiny_trunk()
    rng = np.random.RandomState(0)
    wave = rng.randn(1, 16000).astype(np.float32) * 0.1

    def run(pieces):
        fe = StreamingAudioFrontend(model, params, fps=30, chunk=4,
                                    window_frames=8, lookahead=1)
        outs = []
        at = 0
        for n in pieces:
            got = fe.push(wave[:, at: at + n])
            if got is not None:
                outs.append(got)
            at += n
        assert at == wave.shape[1]
        return np.concatenate(outs, axis=1), fe.frames_emitted

    whole, n1 = run([16000])
    piecewise, n2 = run([7, 533, 1001, 2459, 4000, 8000])
    assert n1 == n2 > 0
    np.testing.assert_array_equal(whole, piecewise)


def test_covering_window_equals_offline_prefix():
    """With the window spanning the whole stream (no padding, no truncation),
    a chunk's features must equal the reference-style offline extraction of
    the same prefix: trunk over all samples -> align_corners interpolation
    to the frame count -> the chunk's rows."""
    model, params = _tiny_trunk()
    rng = np.random.RandomState(1)
    fps, chunk, frames = 30, 4, 12
    n_samples = int(round(frames * 16000 / fps))
    wave = rng.randn(1, n_samples).astype(np.float32) * 0.1

    fe = StreamingAudioFrontend(model, params, fps=fps, chunk=chunk,
                                window_frames=frames, lookahead=0)
    feats = fe.push(wave)
    assert feats.shape == (1, frames, 24)

    offline = model.apply(params, jnp.asarray(wave), "none")
    offline = linear_interpolation(offline, 1, 1, output_len=frames)
    # the LAST chunk's window is exactly the full prefix
    np.testing.assert_allclose(np.asarray(feats[:, 8:12]),
                               np.asarray(offline[:, 8:12]),
                               rtol=1e-5, atol=1e-6)


def test_latency_and_bounded_buffer():
    model, params = _tiny_trunk()
    fe = StreamingAudioFrontend(model, params, fps=30, chunk=4,
                                window_frames=8, lookahead=2)
    rng = np.random.RandomState(2)
    # needs (chunk + lookahead)/fps seconds before the first emission
    need = int(round(6 * 16000 / 30))
    assert fe.push(rng.randn(1, need - 10).astype(np.float32)) is None
    first = fe.push(rng.randn(1, 10).astype(np.float32))
    assert first.shape == (1, 4, 24)
    for _ in range(20):
        fe.push(rng.randn(1, 4000).astype(np.float32))
    # ring buffer never grows past one window + one chunk of slack
    assert fe._buf.shape[1] <= fe.window_samples + int(round(
        fe.chunk * 16000 / 30)) + 2


def test_batched_streams():
    model, params = _tiny_trunk()
    fe = StreamingAudioFrontend(model, params, fps=25, chunk=2,
                                window_frames=6, lookahead=1, batch=3)
    rng = np.random.RandomState(3)
    out = fe.push(rng.randn(3, 16000).astype(np.float32))
    assert out is not None and out.shape[0] == 3 and out.shape[2] == 24
    assert fe.frames_emitted == out.shape[1]
