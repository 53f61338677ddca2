"""FusedAvatarPipeline == StreamingAvatarPipeline, stream for stream.

The fused serving fast path (serving/fused.py) runs feed + generate +
masked VQ decode + smoothing + windowing + render as ONE jitted program per
round with device-resident state.  These tests pin its contract against the
composable pipeline (serving/avatar.py), which is itself pinned against the
reference's offline chain (tests/test_avatar.py):

* token streams match BIT FOR BIT (identical sampler/rng threading);
* rendered frame streams match to f32 tolerance (the fused smoother
  accumulates in f32 on device, the host twin in f64);
* early rounds emit empty frames until the first valid block
  (``d_win + pipeline_depth`` rounds), and ``flush()`` completes the tail
  with exactly the composable pipeline's emissions;
* config guards: lookahead must be a positive chunk multiple, capacity
  overflows and double-flush raise.
"""

import numpy as np
import pytest

from dyadic_interaction_modeling_tpu.serving import (
    FusedAvatarPipeline,
    StreamingAvatarPipeline,
    StreamingListenerSession,
)
from tests.test_avatar import _tiny_renderer, _tiny_slmft


def _run_host(model, params, renderer, r_params, src, v_s, v_a, *, chunk,
              rounds, rng=7, **kw):
    sess = StreamingListenerSession(
        model, params, batch=v_s.shape[0], chunk=chunk,
        max_frames=chunk * rounds, max_tokens=chunk * rounds + 1, rng=rng)
    pipe = StreamingAvatarPipeline(
        sess, vq_lookahead=kw.get("vq_lookahead", chunk),
        vq_granularity=chunk, smooth_window=kw.get("smooth_window", 4),
        edge_mode=kw.get("edge_mode", "zero"),
        semantic_radius=kw.get("semantic_radius", 6),
        renderer=renderer, render_params=r_params, source_images=src,
        render_frames_per_call=chunk, render_outputs=("fake_image",),
        render_uint8=kw.get("render_uint8", False))
    outs = [pipe.push(v_s[:, t: t + chunk], v_a[:, t: t + chunk])
            for t in range(0, chunk * rounds, chunk)]
    outs.append(pipe.flush())
    toks = np.concatenate([o["tokens"] for o in outs], axis=1)
    fake = np.concatenate([o["fake_image"] for o in outs
                           if "fake_image" in o and o["fake_image"].shape[1]],
                          axis=1)
    return toks, fake


def _run_fused(model, params, renderer, r_params, src, v_s, v_a, *, chunk,
               rounds, rng=7, pipeline_depth=1, **kw):
    pipe = FusedAvatarPipeline(
        model, params, renderer=renderer, render_params=r_params,
        source_images=src, batch=v_s.shape[0], chunk=chunk,
        max_frames=chunk * rounds, max_tokens=chunk * rounds + 1, rng=rng,
        vq_lookahead=kw.get("vq_lookahead", chunk),
        smooth_window=kw.get("smooth_window", 4),
        edge_mode=kw.get("edge_mode", "zero"),
        semantic_radius=kw.get("semantic_radius", 6),
        render_outputs=("fake_image",),
        render_uint8=kw.get("render_uint8", False),
        pipeline_depth=pipeline_depth)
    outs = [pipe.push(v_s[:, t: t + chunk], v_a[:, t: t + chunk])
            for t in range(0, chunk * rounds, chunk)]
    outs.append(pipe.flush())
    toks = np.concatenate([o["tokens"] for o in outs], axis=1)
    fake = np.concatenate([o["fake_image"] for o in outs
                           if o["fake_image"].shape[1]], axis=1)
    return pipe, outs, toks, fake


@pytest.mark.slow
def test_fused_matches_composable_pipeline():
    chunk, rounds = 4, 8
    t_total = chunk * rounds
    model, params, v_s, v_a = _tiny_slmft(b=1, l=t_total)
    renderer, r_params, src = _tiny_renderer(batch=1, radius=6)

    h_toks, h_fake = _run_host(model, params, renderer, r_params, src,
                               v_s, v_a, chunk=chunk, rounds=rounds)
    pipe, outs, f_toks, f_fake = _run_fused(
        model, params, renderer, r_params, src, v_s, v_a,
        chunk=chunk, rounds=rounds)

    # identical sampler threading -> bit-identical codes
    np.testing.assert_array_equal(f_toks, h_toks)
    assert f_fake.shape == h_fake.shape == (1, t_total, 32, 32, 3)
    # f32 device smoothing vs f64 host smoothing
    np.testing.assert_allclose(f_fake, h_fake, rtol=0, atol=5e-5)

    # lag bookkeeping: with d_win = 1 + 1 + 2 = 4 and pipeline_depth=1 the
    # first frames materialize on round 6; each steady round emits a chunk
    assert pipe.d_raw == 1 and pipe.d_sm == 2 and pipe.d_win == 4
    assert pipe.latency_frames == (4 + 1) * chunk
    for i in range(5):
        assert outs[i]["fake_image"].shape[1] == 0
    assert outs[5]["fake_image"].shape[1] == chunk
    assert outs[rounds]["fake_image"].shape[1] == \
        t_total - (rounds - 5) * chunk


@pytest.mark.slow
def test_fused_copy_edges_uint8_and_unbuffered():
    chunk, rounds = 4, 7
    model, params, v_s, v_a = _tiny_slmft(b=2, l=chunk * rounds)
    renderer, r_params, src = _tiny_renderer(batch=2, res=16, radius=6)
    kw = dict(smooth_window=6, edge_mode="copy", semantic_radius=6,
              render_uint8=True)

    h_toks, h_fake = _run_host(model, params, renderer, r_params, src,
                               v_s, v_a, chunk=chunk, rounds=rounds, **kw)
    _, _, f_toks, f_fake = _run_fused(
        model, params, renderer, r_params, src, v_s, v_a, chunk=chunk,
        rounds=rounds, pipeline_depth=0, **kw)

    np.testing.assert_array_equal(f_toks, h_toks)
    assert f_fake.dtype == np.uint8 and f_fake.shape == h_fake.shape
    # uint8 quantization of an f32-vs-f64 smoothing delta: <=1 level
    assert np.abs(f_fake.astype(int) - h_fake.astype(int)).max() <= 1


def test_fused_guards():
    model, params, v_s, v_a = _tiny_slmft(b=1, l=8)
    renderer, r_params, src = _tiny_renderer(batch=1, res=16, radius=6)

    with pytest.raises(ValueError, match="multiple"):
        FusedAvatarPipeline(model, params, renderer=renderer,
                            render_params=r_params, source_images=src,
                            chunk=4, vq_lookahead=6, max_frames=16)
    with pytest.raises(ValueError, match="even window"):
        FusedAvatarPipeline(model, params, renderer=renderer,
                            render_params=r_params, source_images=src,
                            chunk=4, vq_lookahead=4, smooth_window=5,
                            max_frames=16)
    # one source face per stream: a (1, H, W, C) source with batch=2 must
    # fail loudly, not crash in a reshape (found by the round-5 multi-avatar
    # sweep) - and the same guard on the composable pipeline
    with pytest.raises(ValueError, match="one source face per"):
        FusedAvatarPipeline(model, params, renderer=renderer,
                            render_params=r_params, source_images=src,
                            batch=2, chunk=4, vq_lookahead=4, max_frames=16)
    with pytest.raises(ValueError, match="one source face per"):
        sess = StreamingListenerSession(model, params, batch=2, chunk=4,
                                        max_frames=16)
        StreamingAvatarPipeline(sess, renderer=renderer,
                                render_params=r_params, source_images=src,
                                semantic_radius=6)

    pipe = FusedAvatarPipeline(model, params, renderer=renderer,
                               render_params=r_params, source_images=src,
                               chunk=4, vq_lookahead=4, max_frames=8,
                               max_tokens=16, semantic_radius=6)
    pipe.push(v_s[:, :4], v_a[:, :4])
    pipe.push(v_s[:, 4:8], v_a[:, 4:8])
    with pytest.raises(ValueError, match="context capacity"):
        pipe.push(v_s[:, :4], v_a[:, :4])
    pipe.flush()
    with pytest.raises(ValueError, match="flushed"):
        pipe.flush()
    with pytest.raises(ValueError, match="flushed"):
        pipe.push(v_s[:, :4], v_a[:, :4])
