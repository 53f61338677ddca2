"""End-to-end streaming avatar pipeline: exactness vs the offline chain.

The reference pipeline is three offline batch scripts (test_s2s_pretrain.py
-> postprocess2emoca.py -> Pirender/inference_newmodel.py); serving/avatar.py
runs the same math incrementally.  These tests pin each operator's contract:

* StreamingSmoother == postprocess.smooth_logits_matrix for every length
  (incl. T < window) / edge mode / push slicing;
* StreamingSemanticWindower == render.data.semantic_window per frame;
* StreamingCoeffDecoder: fixed-capacity masked decode == unpadded prefix
  decode; emissions are push-granularity invariant; lookahead horizon is
  exactly ``codes[: t+la+1]``;
* the full pipeline (session -> decode -> smooth -> window -> render)
  reproduces the offline chain on the generated codes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dyadic_interaction_modeling_tpu import config as C
from dyadic_interaction_modeling_tpu.models.slm import SLMFT
from dyadic_interaction_modeling_tpu.postprocess import smooth_logits_matrix
from dyadic_interaction_modeling_tpu.render.data import semantic_window
from dyadic_interaction_modeling_tpu.render.generator import FaceGenerator
from dyadic_interaction_modeling_tpu.serving import (
    StreamingAvatarPipeline,
    StreamingCoeffDecoder,
    StreamingListenerSession,
    StreamingSemanticWindower,
    StreamingSmoother,
)
from dyadic_interaction_modeling_tpu.serving.avatar import listener_decode_fn


def _random_slices(rng, total):
    cuts, t = [], 0
    while t < total:
        n = int(rng.integers(1, 5))
        n = min(n, total - t)
        cuts.append(n)
        t += n
    return cuts


def test_streaming_smoother_matches_offline():
    rng = np.random.default_rng(0)
    for t_total in (3, 7, 10, 11, 23):
        for window in (4, 10):
            for edge_mode in ("zero", "copy"):
                x = rng.normal(size=(t_total, 3))
                offline = smooth_logits_matrix(x, window, edge_mode)
                sm = StreamingSmoother(window, edge_mode)
                parts, t = [], 0
                for n in _random_slices(rng, t_total):
                    parts.append(sm.push(x[t: t + n]))
                    t += n
                parts.append(sm.flush())
                streamed = np.concatenate(
                    [p for p in parts if p.shape[-2]], axis=-2)
                np.testing.assert_allclose(
                    streamed, offline, rtol=0, atol=1e-12,
                    err_msg=f"T={t_total} w={window} {edge_mode}")


def test_streaming_smoother_batched_and_guards():
    x = np.random.default_rng(1).normal(size=(2, 14, 5))
    sm = StreamingSmoother(4, "zero")
    out = np.concatenate([sm.push(x), sm.flush()], axis=-2)
    assert out.shape == (2, 14, 5)
    for b in range(2):
        np.testing.assert_allclose(out[b], smooth_logits_matrix(x[b], 4),
                                   rtol=0, atol=1e-12)
    for bad in (dict(window=5), dict(edge_mode="wrap")):
        try:
            StreamingSmoother(**bad)
            raise AssertionError(f"{bad} must raise")
        except ValueError:
            pass


def test_streaming_windower_matches_offline():
    rng = np.random.default_rng(2)
    coeffs = rng.normal(size=(17, 5)).astype(np.float32)
    for radius in (2, 6):
        wd = StreamingSemanticWindower(radius)
        windows, t = [], 0
        for n in _random_slices(rng, 17):
            windows += wd.push(coeffs[None, t: t + n])
            t += n
        windows += wd.flush()
        assert len(windows) == 17
        for i, w in enumerate(windows):
            assert w.shape == (1, 5, 2 * radius + 1)
            np.testing.assert_array_equal(
                w[0], semantic_window(coeffs, i, radius), err_msg=f"i={i}")


def _tiny_slmft(b=2, l=12, din=56, daud=16):
    slm_cfg = C.slm_defaults()
    slm_cfg.update(dict(dim=32, dim_audio=16, enc_depth=2, enc_heads=2,
                        dec_depth=2, dec_heads=2, enc_max_seq_len=64,
                        dec_max_seq_len=64, num_tokens=24))
    vq_cfg = C.vq_listener_defaults()
    vq_cfg.update(dict(hidden_size=32, num_hidden_layers=1,
                       num_attention_heads=2, intermediate_size=64,
                       zquant_dim=16, n_embed=24))
    model = SLMFT(slm_cfg, vq_cfg)
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    v_s = jax.random.normal(ks[0], (b, l, din))
    v_l = jax.random.normal(ks[1], (b, l, din))
    v_a = jax.random.normal(ks[2], (b, l, daud))
    mask = jnp.ones((b, l), dtype=bool)
    params = model.init(ks[3], v_s, v_l, v_a, mask, jax.random.PRNGKey(2))
    return model, params, v_s, v_a


def _offline_prefix_decode(model, params, tokens, n_ctx):
    """Unpadded masked decode of codes[:, :n_ctx] - the decoder contract's
    reference value (per-sample-equivalent semantics, like the reference's
    B=1 eval loop)."""
    toks = jnp.asarray(tokens[:, :n_ctx], jnp.int32)
    lengths = jnp.full((tokens.shape[0],), n_ctx, jnp.int32)
    return np.asarray(model.apply(params, toks, lengths=lengths,
                                  method=SLMFT.decode_tokens_to_motion))


def test_coeff_decoder_horizon_and_push_invariance():
    model, params, _, _ = _tiny_slmft()
    rng = np.random.default_rng(3)
    tokens = rng.integers(0, 24, size=(2, 12)).astype(np.int32)
    la = 3

    def run(slices):
        dec = StreamingCoeffDecoder(listener_decode_fn(model, params),
                                    batch=2, capacity=16, lookahead=la)
        parts, t = [], 0
        for n in slices:
            parts.append(dec.push(tokens[:, t: t + n]))
            t += n
        parts.append(dec.flush())
        return np.concatenate([p for p in parts if p.shape[1]], axis=1)

    a = run([4, 4, 4])
    b = run([1, 6, 2, 3])
    # push-granularity invariance is exact (same fp ops on same prefixes)
    np.testing.assert_array_equal(a, b)
    assert a.shape[1] == 12

    # horizon contract: frame t comes from codes[:, : min(t+la+1, T)]
    for t in (0, 5, 8, 11):
        off = _offline_prefix_decode(model, params, tokens,
                                     min(t + la + 1, 12))
        np.testing.assert_allclose(a[:, t], off[:, t], rtol=2e-4, atol=2e-5,
                                   err_msg=f"t={t}")

    # chunk-granular horizons: one decode per granularity-block, frame t
    # decoded from codes[:, : round_up(t+la+1, g)] (clamped to T at flush)
    g, la_g = 4, 1
    dec = StreamingCoeffDecoder(listener_decode_fn(model, params),
                                batch=2, capacity=16, lookahead=la_g,
                                granularity=g)
    assert dec.latency_frames == la_g + g - 1
    parts = [dec.push(tokens[:, :7]), dec.push(tokens[:, 7:]), dec.flush()]
    coarse = np.concatenate([p for p in parts if p.shape[1]], axis=1)
    assert parts[0].shape[1] == 3          # H(t)<=4 for t<3 (A//g*g - la = 3)
    assert coarse.shape[1] == 12
    for t in (0, 3, 6, 11):
        h = min(g * -(-(t + la_g + 1) // g), 12)
        if t >= 12 - la_g or h > 12:
            h = 12                          # flush clamps to the clip length
        off = _offline_prefix_decode(model, params, tokens, h)
        np.testing.assert_allclose(coarse[:, t], off[:, t], rtol=2e-4,
                                   atol=2e-5, err_msg=f"g=4 t={t}")

    # lookahead=None: nothing until flush, then the full offline decode
    dec = StreamingCoeffDecoder(listener_decode_fn(model, params),
                                batch=2, capacity=16, lookahead=None)
    assert dec.push(tokens).shape[1] == 0
    final = dec.flush()
    off = _offline_prefix_decode(model, params, tokens, 12)
    np.testing.assert_allclose(final, off, rtol=2e-4, atol=2e-5)

    # capacity guard
    try:
        dec.push(np.zeros((2, 8), np.int32))
        raise AssertionError("capacity overflow must raise")
    except ValueError:
        pass


def _tiny_renderer(batch, coeff_dim=56, res=32, radius=6):
    model = FaceGenerator(flame_coeff_nc=coeff_dim, coeff_nc=24,
                          descriptor_nc=32, mapping_layers=1)
    img = jax.random.uniform(jax.random.PRNGKey(5), (batch, res, res, 3),
                             minval=-1, maxval=1)
    sems = jnp.zeros((batch, coeff_dim, 2 * radius + 1))
    variables = model.init(jax.random.PRNGKey(6), img, sems)
    return model, variables["params"], np.asarray(img)


@pytest.mark.slow
def test_avatar_pipeline_matches_offline_chain():
    model, params, v_s, v_a = _tiny_slmft(b=1)
    radius, window = 6, 4
    renderer, r_params, src = _tiny_renderer(batch=1, radius=radius)

    sess = StreamingListenerSession(model, params, batch=1, chunk=4,
                                    max_frames=16, max_tokens=16, greedy=True)
    pipe = StreamingAvatarPipeline(sess, vq_lookahead=None,
                                   smooth_window=window, edge_mode="zero",
                                   semantic_radius=radius,
                                   renderer=renderer, render_params=r_params,
                                   source_images=src,
                                   render_frames_per_call=4)
    assert pipe.latency_frames == 0 + (window - window // 2 - 1) + radius

    outs = [pipe.push(v_s[:, t: t + 4], v_a[:, t: t + 4])
            for t in range(0, 12, 4)]
    outs.append(pipe.flush())

    tokens = np.concatenate([o["tokens"] for o in outs], axis=1)
    np.testing.assert_array_equal(tokens, sess.tokens())
    coeffs = np.concatenate([o["coeffs"] for o in outs if o["coeffs"].shape[1]],
                            axis=1)
    smoothed = np.concatenate(
        [o["smoothed"] for o in outs if o["smoothed"].shape[-2]], axis=-2)
    windows = sum((o["windows"] for o in outs), [])
    fake = np.concatenate([o["fake_image"] for o in outs if "fake_image" in o],
                          axis=1)

    t_total = 12
    assert coeffs.shape == (1, t_total, 56)
    assert smoothed.shape == (1, t_total, 56)
    assert len(windows) == t_total
    assert fake.shape[:2] == (1, t_total)

    # stage 1: coeffs == offline full-clip decode (lookahead=None contract)
    off_coeffs = _offline_prefix_decode(model, params, tokens, t_total)
    np.testing.assert_allclose(coeffs, off_coeffs, rtol=2e-4, atol=2e-5)

    # stage 2: smoothing == the reference's postprocess on those coeffs
    np.testing.assert_allclose(smoothed[0],
                               smooth_logits_matrix(coeffs[0], window),
                               rtol=0, atol=1e-12)

    # stage 3: windows == offline semantic windows of the smoothed stream
    for i, w in enumerate(windows):
        np.testing.assert_allclose(
            w[0], semantic_window(smoothed[0], i, radius), rtol=0, atol=1e-6)

    # stage 4: rendered frames == one offline batched render of all windows
    all_sems = jnp.asarray(np.concatenate(windows, axis=0))
    imgs = jnp.tile(jnp.asarray(src), (t_total, 1, 1, 1))
    off = renderer.apply({"params": r_params}, imgs, all_sems)
    np.testing.assert_allclose(fake[0], np.asarray(off["fake_image"]),
                               rtol=1e-4, atol=1e-4)


def test_streaming_renderer_uint8_serving_outputs():
    """The serving render config (fake only, uint8 on device) equals the
    float path through the PNG-export conversion (render/inference.py)."""
    from dyadic_interaction_modeling_tpu.serving import StreamingRenderer

    radius = 6
    model, params, src = _tiny_renderer(batch=1, res=16, radius=radius)
    rng = np.random.default_rng(7)
    windows = [rng.normal(size=(1, 56, 2 * radius + 1)).astype(np.float32)
               for _ in range(5)]

    rf = StreamingRenderer(model, params, src, frames_per_call=2)
    out_f = {k: np.concatenate([a[k], b[k]], axis=1) for a, b in
             [(rf.push(windows), rf.flush())] for k in rf.outputs}
    ru = StreamingRenderer(model, params, src, frames_per_call=2,
                           outputs=("fake_image",), as_uint8=True)
    head = ru.push(windows)
    tail = ru.flush()
    out_u = np.concatenate([head["fake_image"], tail["fake_image"]], axis=1)
    assert "warp_image" not in head and out_u.dtype == np.uint8
    assert out_u.shape == out_f["fake_image"].shape
    expect = ((np.clip(out_f["fake_image"], -1, 1) + 1) * 127.5
              ).astype(np.uint8)
    # on-device vs host rounding can differ by 1 LSB at exact .5 boundaries
    diff = np.abs(out_u.astype(np.int16) - expect.astype(np.int16))
    assert diff.max() <= 1


def test_streaming_renderer_pipelined_output():
    """pipeline_depth=1 double-buffers the output transfer: per-push
    emissions lag one render call behind, the concatenated stream
    (pushes + flush) is IDENTICAL to the unpipelined renderer."""
    from dyadic_interaction_modeling_tpu.serving import StreamingRenderer

    radius = 6
    model, params, src = _tiny_renderer(batch=1, res=16, radius=radius)
    rng = np.random.default_rng(11)
    windows = [rng.normal(size=(1, 56, 2 * radius + 1)).astype(np.float32)
               for _ in range(7)]

    r0 = StreamingRenderer(model, params, src, frames_per_call=2,
                           outputs=("fake_image",))
    r1 = StreamingRenderer(model, params, src, frames_per_call=2,
                           outputs=("fake_image",), pipeline_depth=1)
    outs0, outs1 = [], []
    for w in windows:
        outs0.append(r0.push([w])["fake_image"])
        outs1.append(r1.push([w])["fake_image"])
    outs0.append(r0.flush()["fake_image"])
    outs1.append(r1.flush()["fake_image"])
    # the pipelined stream lags exactly one frames_per_call block: after 4
    # windows the plain renderer emitted 2 blocks, the pipelined one 1
    assert sum(o.shape[1] for o in outs0[:4]) == 4
    assert sum(o.shape[1] for o in outs1[:4]) == 2
    np.testing.assert_array_equal(np.concatenate(outs0, axis=1),
                                  np.concatenate(outs1, axis=1))


def test_avatar_pipeline_bounded_lookahead_counts():
    model, params, v_s, v_a = _tiny_slmft(b=2)
    sess = StreamingListenerSession(model, params, batch=2, chunk=4,
                                    max_frames=16, max_tokens=16, greedy=True)
    pipe = StreamingAvatarPipeline(sess, vq_lookahead=2, smooth_window=4,
                                   semantic_radius=6)
    assert pipe.latency_frames == 2 + 1 + 6
    counts = []
    for t in range(0, 12, 4):
        out = pipe.push(v_s[:, t: t + 4], v_a[:, t: t + 4])
        counts.append((out["coeffs"].shape[1], out["smoothed"].shape[-2],
                       len(out["windows"])))
    # monotone availability: coeffs lag tokens by la, smoothing by 1 more,
    # windows by radius more
    assert counts[0][0] == 2              # 4 tokens - la(2)
    assert counts[0][1] == 2              # edge frames (< window//2) emit now
    assert counts[0][2] == 0              # radius 6 not yet covered
    fin = pipe.flush()
    total_c = sum(c[0] for c in counts) + fin["coeffs"].shape[1]
    total_s = sum(c[1] for c in counts) + fin["smoothed"].shape[-2]
    total_w = sum(c[2] for c in counts) + len(fin["windows"])
    assert total_c == total_s == total_w == 12
