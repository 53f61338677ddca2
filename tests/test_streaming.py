"""Streaming serving session: exactness vs the offline eval protocol.

The reference has no online path (its eval encodes the full clip then decodes,
``/root/reference/code/x_engine_pt.py:232-277``); the serving layer exploits
SLMFT's causal speaker encoders (seq2seq_pretrain.py:437) to stream. These
tests pin the exactness contract from serving/streaming.py:

* chunked causal encoder extension == one full offline pass;
* a session fed the whole clip reproduces ``generate_tokens`` token-for-token
  (greedy AND sampled, same RNG chain, across multiple ``generate`` calls);
* partial context == offline generation on the truncated clip (causality);
* short final chunks (``n_valid``) don't contaminate the caches.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dyadic_interaction_modeling_tpu import config as C
from dyadic_interaction_modeling_tpu.models.slm import SLMFT
from dyadic_interaction_modeling_tpu.models.xtrans import (
    ContinuousTransformerWrapper,
    TokenDecoder,
    generate_tokens,
    init_decoder_cache,
)
from dyadic_interaction_modeling_tpu.serving import StreamingListenerSession


def _tiny_cfgs():
    slm_cfg = C.slm_defaults()
    slm_cfg.update(dict(dim=32, dim_audio=16, enc_depth=2, enc_heads=2,
                        dec_depth=2, dec_heads=2, enc_max_seq_len=64,
                        dec_max_seq_len=64, num_tokens=24))
    vq_cfg = C.vq_listener_defaults()
    vq_cfg.update(dict(hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
                       intermediate_size=64, zquant_dim=16, n_embed=24))
    return slm_cfg, vq_cfg


def _slmft_and_inputs(b=2, l=12, din=56, daud=16):
    slm_cfg, vq_cfg = _tiny_cfgs()
    model = SLMFT(slm_cfg, vq_cfg)
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    v_s = jax.random.normal(ks[0], (b, l, din))
    v_l = jax.random.normal(ks[1], (b, l, din))
    v_a = jax.random.normal(ks[2], (b, l, daud))
    mask = jnp.ones((b, l), dtype=bool)
    params = model.init(ks[3], v_s, v_l, v_a, mask, jax.random.PRNGKey(2))
    return model, params, v_s, v_l, v_a, mask


def test_encoder_extend_matches_offline_causal():
    enc = ContinuousTransformerWrapper(dim=32, dim_out=32, max_seq_len=64,
                                       depth=2, heads=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 56))
    params = enc.init(jax.random.PRNGKey(1), x)
    attn_mask = jnp.tril(jnp.ones((12, 12), dtype=bool))
    full = enc.apply(params, x, attn_mask=attn_mask, return_embeddings=True)

    cache = init_decoder_cache(2, 16, 2, 2)
    outs = []
    for t in range(0, 12, 4):
        o, cache = enc.apply(params, x[:, t: t + 4], cache, jnp.asarray(t),
                             method=ContinuousTransformerWrapper.extend)
        outs.append(o)
    streamed = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(streamed), np.asarray(full),
                               rtol=1e-5, atol=1e-5)


def test_session_matches_offline_generation_greedy_and_sampled():
    model, params, v_s, v_l, v_a, mask = _slmft_and_inputs()
    slm_cfg = model.cfg
    ctx, prompt = model.apply(params, v_s, v_l, v_a, mask,
                              method=SLMFT.encode_context)
    dec = TokenDecoder(num_tokens=slm_cfg.num_tokens,
                       dim=slm_cfg.dim + slm_cfg.dim_audio,
                       max_seq_len=slm_cfg.dec_max_seq_len,
                       depth=slm_cfg.dec_depth, heads=slm_cfg.dec_heads,
                       use_abs_pos_emb=False)
    dec_params = {"params": params["params"]["decoder_joint"]}

    for greedy in (True, False):
        key = jax.random.PRNGKey(7)
        offline = np.asarray(generate_tokens(
            dec, dec_params, prompt, 11, ctx, mask, key, greedy=greedy))

        sess = StreamingListenerSession(model, params, batch=2, chunk=4,
                                        max_frames=16, max_tokens=16,
                                        greedy=greedy)
        sess._rng = key
        for t in range(0, 12, 4):
            sess.feed(v_s[:, t: t + 4], v_a[:, t: t + 4])
        assert sess.frames_fed == 12
        sess.start(np.asarray(prompt))
        # split across two calls: the RNG/cache chain must carry over
        sess.generate(5)
        sess.generate(6)
        streamed = sess.tokens()
        np.testing.assert_array_equal(streamed, offline), f"greedy={greedy}"

    # motion decode shape sanity
    motion = sess.motion()
    assert motion.shape == (2, 11, 56)


def test_partial_context_equals_truncated_offline():
    """Tokens generated after feeding only t1 frames must equal offline
    generation on the clip truncated to t1 frames (encoder causality +
    the session's arrival mask)."""
    model, params, v_s, v_l, v_a, mask = _slmft_and_inputs()
    slm_cfg = model.cfg
    t1 = 8
    ctx, prompt = model.apply(params, v_s[:, :t1], v_l[:, :t1], v_a[:, :t1],
                              mask[:, :t1], method=SLMFT.encode_context)
    dec = TokenDecoder(num_tokens=slm_cfg.num_tokens,
                       dim=slm_cfg.dim + slm_cfg.dim_audio,
                       max_seq_len=slm_cfg.dec_max_seq_len,
                       depth=slm_cfg.dec_depth, heads=slm_cfg.dec_heads,
                       use_abs_pos_emb=False)
    dec_params = {"params": params["params"]["decoder_joint"]}
    offline = np.asarray(generate_tokens(
        dec, dec_params, prompt, 6, ctx, mask[:, :t1], jax.random.PRNGKey(7),
        greedy=True))

    sess = StreamingListenerSession(model, params, batch=2, chunk=4,
                                    max_frames=16, max_tokens=16, greedy=True)
    sess.feed(v_s[:, 0:4], v_a[:, 0:4])
    sess.feed(v_s[:, 4:8], v_a[:, 4:8])
    sess.start(np.asarray(prompt))
    streamed = sess.generate(6)
    np.testing.assert_array_equal(streamed, offline)

    # later frames can still arrive after generation started
    sess.feed(v_s[:, 8:12], v_a[:, 8:12])
    more = sess.generate(3)
    assert more.shape == (2, 3)


def test_short_final_chunk_n_valid():
    """A padded final chunk with n_valid<chunk must not contaminate the
    context: result equals offline on the n_valid-truncated clip."""
    model, params, v_s, v_l, v_a, mask = _slmft_and_inputs()
    slm_cfg = model.cfg
    t1 = 6  # 4 + 2: second chunk only half valid
    ctx, prompt = model.apply(params, v_s[:, :t1], v_l[:, :t1], v_a[:, :t1],
                              mask[:, :t1], method=SLMFT.encode_context)
    dec = TokenDecoder(num_tokens=slm_cfg.num_tokens,
                       dim=slm_cfg.dim + slm_cfg.dim_audio,
                       max_seq_len=slm_cfg.dec_max_seq_len,
                       depth=slm_cfg.dec_depth, heads=slm_cfg.dec_heads,
                       use_abs_pos_emb=False)
    dec_params = {"params": params["params"]["decoder_joint"]}
    offline = np.asarray(generate_tokens(
        dec, dec_params, prompt, 5, ctx, mask[:, :t1], jax.random.PRNGKey(7),
        greedy=True))

    sess = StreamingListenerSession(model, params, batch=2, chunk=4,
                                    max_frames=16, max_tokens=16, greedy=True)
    sess.feed(v_s[:, 0:4], v_a[:, 0:4])
    # garbage in the padded tail must be ignored
    junk = jnp.full_like(v_s[:, 4:8], 13.0).at[:, :2].set(v_s[:, 4:6])
    junk_a = jnp.full_like(v_a[:, 4:8], -7.0).at[:, :2].set(v_a[:, 4:6])
    sess.feed(junk, junk_a, n_valid=2)
    assert sess.frames_fed == 6
    sess.start(np.asarray(prompt))
    streamed = sess.generate(5)
    np.testing.assert_array_equal(streamed, offline)


def test_session_guards():
    model, params, v_s, _, v_a, _ = _slmft_and_inputs()
    sess = StreamingListenerSession(model, params, batch=2, chunk=4,
                                    max_frames=8, max_tokens=4, greedy=True)
    try:
        sess.start(np.zeros((2, 1), np.int32))
        raise AssertionError("start() before feed() must raise")
    except ValueError:
        pass
    sess.feed(v_s[:, :4], v_a[:, :4])
    try:
        sess.feed(v_s[:, :3], v_a[:, :3])
        raise AssertionError("wrong chunk size must raise")
    except ValueError:
        pass
    sess.feed(v_s[:, 4:8], v_a[:, 4:8])
    try:
        sess.feed(v_s[:, :4], v_a[:, :4])
        raise AssertionError("capacity overflow must raise")
    except ValueError:
        pass
    sess.start(np.zeros((2, 1), np.int32))
    sess.generate(3)
    try:
        sess.generate(2)
        raise AssertionError("token capacity overflow must raise")
    except ValueError:
        pass


def test_fused_round_equals_feed_then_generate():
    """session.round() (ONE program: feed + generate) is token-for-token
    identical to feed(...) then generate(n) - same cache math, same rng
    threading - for full and short (n_valid) chunks."""
    model, params, v_s, _, v_a, _ = _slmft_and_inputs(l=16)
    prompt = np.zeros((2, 1), np.int32)

    def run(fused):
        sess = StreamingListenerSession(model, params, batch=2, chunk=4,
                                        max_frames=16, max_tokens=20, rng=9)
        sess.feed(v_s[:, :4], v_a[:, :4])
        sess.start(prompt)
        sess.generate(4)
        for t in (4, 8):
            if fused:
                sess.round(v_s[:, t: t + 4], v_a[:, t: t + 4])
            else:
                sess.feed(v_s[:, t: t + 4], v_a[:, t: t + 4])
                sess.generate(4)
        # short final chunk
        pad = jnp.concatenate([v_s[:, 12:14], v_s[:, 12:14]], axis=1)
        pau = jnp.concatenate([v_a[:, 12:14], v_a[:, 12:14]], axis=1)
        if fused:
            sess.round(pad, pau, n=2, n_valid=2)
        else:
            sess.feed(pad, pau, n_valid=2)
            sess.generate(2)
        assert sess.frames_fed == 14
        return sess.tokens()

    np.testing.assert_array_equal(run(fused=True), run(fused=False))

    # guards: round() before start(), and capacity checks
    sess = StreamingListenerSession(model, params, batch=2, chunk=4,
                                    max_frames=8, max_tokens=6)
    try:
        sess.round(v_s[:, :4], v_a[:, :4])
        raise AssertionError("round() before start() must raise")
    except ValueError:
        pass
    sess.feed(v_s[:, :4], v_a[:, :4])
    sess.start(prompt)
    sess.round(v_s[:, 4:8], v_a[:, 4:8])
    try:
        sess.round(v_s[:, :4], v_a[:, :4])
        raise AssertionError("context capacity overflow must raise")
    except ValueError:
        pass
