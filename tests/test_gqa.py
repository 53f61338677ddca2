"""Grouped-query attention (``kv_heads`` / ``attn_kv_heads``) correctness.

GQA is a TPU-native serving knob (no reference counterpart): the decode loop
is ELEMENT-rate-limited on KV-cache reads (PERF.md int8 probe), so projecting
and caching K/V at ``kv_heads < heads`` divides exactly those elements by the
group factor. Default (``kv_heads=None`` / ``attn_kv_heads=0``) keeps the
reference's multi-head layout and param tree byte-identical.

Pinned here:
* the grouped dense path == explicit repeat-KV multi-head attention (all
  mask variants), i.e. GQA's only approximation is the SHARED K/V projection,
  never the attention math;
* every cached/streaming decode path (step_self, extend_self, step_cross
  with best-of-N context sharing, chunked-prefix generate) stays exact under
  GQA;
* SLMFT end-to-end: the engine generator and the streaming session agree
  token-for-token at ``attn_kv_heads=1`` + a non-default ``attn_dim_head``
  (also the regression for the engine decoders ignoring ``attn_dim_head``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dyadic_interaction_modeling_tpu import config as C
from dyadic_interaction_modeling_tpu.models.slm import SLMFT
from dyadic_interaction_modeling_tpu.models.xtrans import (
    ContinuousTransformerWrapper,
    TokenDecoder,
    XAttention,
    generate_tokens,
    init_decoder_cache,
)


B, L, DIM, H, DH, V = 2, 7, 16, 4, 8, 12


def _manual_attention(x, p, kvh, causal=True, key_mask=None, attn_mask=None):
    """Reference computation: repeat the kvh-wide K/V to full heads and run
    plain multi-head attention on the SAME projection weights."""
    q = (x @ p["to_q"]["kernel"]).reshape(B, L, H, DH).transpose(0, 2, 1, 3)
    k = (x @ p["to_k"]["kernel"]).reshape(B, L, kvh, DH).transpose(0, 2, 1, 3)
    v = (x @ p["to_v"]["kernel"]).reshape(B, L, kvh, DH).transpose(0, 2, 1, 3)
    k = jnp.repeat(k, H // kvh, axis=1)
    v = jnp.repeat(v, H // kvh, axis=1)
    dots = jnp.einsum("bhid,bhjd->bhij", q, k) * DH ** -0.5
    if causal:
        cm = jnp.tril(jnp.ones((L, L), bool))
        dots = jnp.where(cm[None, None], dots, -jnp.inf)
    if attn_mask is not None:
        dots = jnp.where(attn_mask[:, None], dots, -jnp.inf)
    if key_mask is not None:
        dots = jnp.where(key_mask[:, None, None, :], dots, -jnp.inf)
    attn = jax.nn.softmax(dots, -1)
    attn = jnp.where(jnp.isfinite(dots).any(-1, keepdims=True), attn, 0.0)
    o = jnp.einsum("bhij,bhjd->bhid", attn, v)
    o = o.transpose(0, 2, 1, 3).reshape(B, L, H * DH)
    return o @ p["to_out"]["kernel"]


@pytest.mark.parametrize("kvh", [1, 2])
def test_gqa_call_matches_repeated_kv(kvh):
    x = jax.random.normal(jax.random.PRNGKey(0), (B, L, DIM))
    att = XAttention(DIM, heads=H, dim_head=DH, causal=True, kv_heads=kvh)
    params = att.init(jax.random.PRNGKey(1), x)
    p = params["params"]
    assert p["to_k"]["kernel"].shape == (DIM, kvh * DH)
    assert p["to_q"]["kernel"].shape == (DIM, H * DH)

    out = att.apply(params, x)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_manual_attention(x, p, kvh)),
                               atol=1e-6)

    km = jnp.array([[1, 1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 1, 0]], bool)
    am = (jax.random.bernoulli(jax.random.PRNGKey(3), 0.8, (B, L, L))
          | jnp.eye(L, dtype=bool)[None])
    out_m = att.apply(params, x, key_mask=km, attn_mask=am)
    exp_m = _manual_attention(x, p, kvh, key_mask=km, attn_mask=am)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(exp_m), atol=1e-6)


def test_gqa_default_param_tree_unchanged():
    """kv_heads=None keeps the multi-head projection widths (checkpoint
    compatibility with every existing importer/exporter)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (B, L, DIM))
    att = XAttention(DIM, heads=H, dim_head=DH)
    p = att.init(jax.random.PRNGKey(1), x)["params"]
    assert p["to_k"]["kernel"].shape == (DIM, H * DH)
    assert p["to_v"]["kernel"].shape == (DIM, H * DH)


def test_gqa_cached_decode_matches_full():
    kvh = 2
    dec = TokenDecoder(num_tokens=V, dim=DIM, max_seq_len=32, depth=2,
                       heads=H, dim_head=DH, kv_heads=kvh)
    ctx = jax.random.normal(jax.random.PRNGKey(5), (B, 9, DIM))
    toks = jax.random.randint(jax.random.PRNGKey(6), (B, L), 0, V)
    dp = dec.init(jax.random.PRNGKey(7), toks, context=ctx)
    full = dec.apply(dp, toks, context=ctx)
    cache = init_decoder_cache(B, L, 2, H, dim_head=DH, kv_heads=kvh)
    assert cache["k_0"].shape == (B, kvh, L, DH)
    ckv = dec.apply(dp, ctx, method=TokenDecoder.cross_kv)
    for t in range(L):
        lg, cache = dec.apply(dp, toks[:, t: t + 1], cache, jnp.asarray(t),
                              ckv, None, method=TokenDecoder.decode_step)
        np.testing.assert_allclose(np.asarray(lg), np.asarray(full[:, t]),
                                   atol=1e-5)


def test_gqa_extend_matches_full_causal():
    kvh = 1
    enc = ContinuousTransformerWrapper(dim=DIM, dim_out=DIM, max_seq_len=32,
                                       depth=2, heads=H, dim_head=DH,
                                       kv_heads=kvh)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 8, 10))
    ep = enc.init(jax.random.PRNGKey(1), x)
    causal = jnp.tril(jnp.ones((8, 8), bool))
    full = enc.apply(ep, x, attn_mask=causal, return_embeddings=True)
    cache = init_decoder_cache(B, 8, 2, H, dim_head=DH, kv_heads=kvh)
    outs, t = [], 0
    for c in (3, 2, 3):
        o, cache = enc.apply(ep, x[:, t: t + c], cache, jnp.asarray(t),
                             method=ContinuousTransformerWrapper.extend)
        outs.append(o)
        t += c
    np.testing.assert_allclose(np.asarray(jnp.concatenate(outs, 1)),
                               np.asarray(full), atol=1e-5)


def test_gqa_grouped_generation_matches_tiled_and_chunked():
    """Best-of-N context sharing (step_cross groups) and the chunked-prefix
    decode must stay token-identical under GQA."""
    kvh = 2
    dec = TokenDecoder(num_tokens=V, dim=DIM, max_seq_len=64, depth=2,
                       heads=H, dim_head=DH, kv_heads=kvh)
    ctx = jax.random.normal(jax.random.PRNGKey(5), (B, 9, DIM))
    dp = dec.init(jax.random.PRNGKey(7), jnp.zeros((B, 3), jnp.int32),
                  context=ctx)
    n = 3
    prompt = jnp.tile(jnp.arange(B)[:, None] % V, (n, 1)).astype(jnp.int32)
    cm = jnp.array([[1] * 9, [1] * 6 + [0] * 3], bool)
    key = jax.random.PRNGKey(9)
    shared = generate_tokens(dec, dp, prompt, 5, ctx, cm, key,
                             context_groups=n)
    tiled = generate_tokens(dec, dp, prompt, 5, jnp.tile(ctx, (n, 1, 1)),
                            jnp.tile(cm, (n, 1)), key, context_groups=1)
    np.testing.assert_array_equal(np.asarray(shared), np.asarray(tiled))
    chunked = generate_tokens(dec, dp, prompt, 5, ctx, cm, key,
                              context_groups=n, chunk=2)
    np.testing.assert_array_equal(np.asarray(shared), np.asarray(chunked))


def _tiny_cfgs(attn_dim_head=16, attn_kv_heads=1):
    slm_cfg = C.slm_defaults()
    slm_cfg.update(dict(dim=32, dim_audio=16, enc_depth=2, enc_heads=2,
                        dec_depth=2, dec_heads=2, enc_max_seq_len=64,
                        dec_max_seq_len=64, num_tokens=24,
                        attn_dim_head=attn_dim_head,
                        attn_kv_heads=attn_kv_heads))
    vq_cfg = C.vq_listener_defaults()
    vq_cfg.update(dict(hidden_size=32, num_hidden_layers=1,
                       num_attention_heads=2, intermediate_size=64,
                       zquant_dim=16, n_embed=24))
    return slm_cfg, vq_cfg


def test_slmft_gqa_engine_and_streaming_agree():
    """End-to-end at attn_kv_heads=1 + attn_dim_head=16 (non-default): the
    engine's best-of-N generator runs (regression: the engine decoders used
    to hard-code dim_head=64 and crashed on any attn_dim_head override) and
    the streaming session reproduces offline generation token-for-token."""
    from dyadic_interaction_modeling_tpu.engine.pt_engine import (
        make_slmft_generator)
    from dyadic_interaction_modeling_tpu.serving import (
        StreamingListenerSession)

    slm_cfg, vq_cfg = _tiny_cfgs()
    model = SLMFT(slm_cfg, vq_cfg)
    b, l = 2, 12
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    v_s = jax.random.normal(ks[0], (b, l, 56))
    v_l = jax.random.normal(ks[1], (b, l, 56))
    v_a = jax.random.normal(ks[2], (b, l, 16))
    mask = jnp.ones((b, l), dtype=bool)
    params = model.init(ks[3], v_s, v_l, v_a, mask, jax.random.PRNGKey(2))

    # GQA actually shrinks the cached KV projections
    dec_p = params["params"]["decoder_joint"]["layers"]["self_0"]
    assert dec_p["to_k"]["kernel"].shape[-1] == 16   # 1 kv head x dim_head 16
    assert dec_p["to_q"]["kernel"].shape[-1] == 32   # 2 heads x dim_head 16

    gen = make_slmft_generator(model, slm_cfg, max_len=l)
    cands = gen(params["params"], (v_s, v_l, v_a, mask),
                jax.random.PRNGKey(3), 3)
    assert cands.shape == (b, 3, l - 1, 56)
    assert np.isfinite(np.asarray(cands)).all()

    # streaming session == offline generate_tokens (greedy)
    ctx, prompt = model.apply(params, v_s, v_l, v_a, mask,
                              method=SLMFT.encode_context)
    dec = TokenDecoder(num_tokens=slm_cfg.num_tokens,
                       dim=slm_cfg.dim + slm_cfg.dim_audio,
                       max_seq_len=slm_cfg.dec_max_seq_len,
                       depth=slm_cfg.dec_depth, heads=slm_cfg.dec_heads,
                       dim_head=slm_cfg.attn_dim_head,
                       kv_heads=slm_cfg.attn_kv_heads or None,
                       use_abs_pos_emb=False)
    offline = np.asarray(generate_tokens(
        dec, {"params": params["params"]["decoder_joint"]}, prompt, 11, ctx,
        mask, jax.random.PRNGKey(7), greedy=True))

    sess = StreamingListenerSession(model, params, batch=2, chunk=4,
                                    max_frames=16, max_tokens=16, greedy=True)
    assert sess._cross["ck_0"].shape[1] == 1  # kv_heads-wide cross buffer
    for t in range(0, l, 4):
        sess.feed(v_s[:, t: t + 4], v_a[:, t: t + 4])
    sess.start(np.asarray(prompt))
    streamed = sess.generate(11)
    np.testing.assert_array_equal(streamed, offline)


def test_pool_slot_matches_solo_session_under_gqa():
    """The continuous-batching pool allocates kv_heads-wide caches and a
    slot's stream stays exactly a solo GQA session's."""
    from dyadic_interaction_modeling_tpu.serving import (
        StreamingListenerSession, StreamingSessionPool)

    slm_cfg, vq_cfg = _tiny_cfgs()
    model = SLMFT(slm_cfg, vq_cfg)
    b, l = 1, 8
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    v_s = jax.random.normal(ks[0], (b, l, 56))
    v_l = jax.random.normal(ks[1], (b, l, 56))
    v_a = jax.random.normal(ks[2], (b, l, 16))
    mask = jnp.ones((b, l), dtype=bool)
    params = model.init(ks[3], v_s, v_l, v_a, mask, jax.random.PRNGKey(2))
    prompt = np.zeros((1, 1), np.int32)

    pool = StreamingSessionPool(model, params, capacity=2, chunk=4,
                                max_frames=16, max_tokens=16, greedy=True)
    assert pool._cross["ck_0"].shape[1] == 1  # GQA-narrow pool buffers
    s = pool.join(seed=5)
    pool.feed([s], np.asarray(v_s[:, :4]), np.asarray(v_a[:, :4]))
    pool.feed([s], np.asarray(v_s[:, 4:]), np.asarray(v_a[:, 4:]))
    pool.start([s], prompt)
    pool.generate([s], 6)
    got = pool.tokens(s)

    solo = StreamingListenerSession(model, params, batch=1, chunk=4,
                                    max_frames=16, max_tokens=16, rng=5,
                                    greedy=True)
    solo.feed(np.asarray(v_s[:, :4]), np.asarray(v_a[:, :4]))
    solo.feed(np.asarray(v_s[:, 4:]), np.asarray(v_a[:, 4:]))
    solo.start(prompt)
    solo.generate(6)
    np.testing.assert_array_equal(got, solo.tokens()[0])


def test_speaker_session_gqa_matches_offline():
    """StreamingSpeakerSession allocates kv_heads-wide caches and matches
    offline generate_tokens under GQA (speaker decoder keeps pos emb)."""
    from dyadic_interaction_modeling_tpu.models.slm import SpeakerSLMFT
    from dyadic_interaction_modeling_tpu.serving import (
        StreamingSpeakerSession)

    slm_cfg, vq_cfg = _tiny_cfgs()
    vdim = 120
    model = SpeakerSLMFT(slm_cfg, vq_cfg, vertice_dim=vdim)
    b, l = 2, 8
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    verts = jax.random.normal(ks[0], (b, l, vdim))
    emoca = jax.random.normal(ks[1], (b, l, 56))
    audio = jax.random.normal(ks[2], (b, l, 16))
    template = jax.random.normal(ks[3], (b, vdim))
    mask = jnp.ones((b, l), dtype=bool)
    sids = jnp.array([3, 7])
    params = model.init(ks[4], verts, emoca, audio, mask, template, sids)

    ctx, prompt = model.apply(params, verts, emoca, audio, mask, template,
                              sids, method=SpeakerSLMFT.encode_context)
    dec = TokenDecoder(num_tokens=slm_cfg.num_tokens,
                       dim=slm_cfg.dim + slm_cfg.dim_audio,
                       max_seq_len=slm_cfg.dec_max_seq_len,
                       depth=slm_cfg.dec_depth, heads=slm_cfg.dec_heads,
                       dim_head=slm_cfg.attn_dim_head,
                       kv_heads=slm_cfg.attn_kv_heads or None,
                       use_abs_pos_emb=True)
    offline = np.asarray(generate_tokens(
        dec, {"params": params["params"]["decoder_joint"]}, prompt, 7, ctx,
        mask, jax.random.PRNGKey(7), greedy=True))

    sess = StreamingSpeakerSession(model, params, batch=b, chunk=4,
                                   max_frames=16, max_tokens=16, greedy=True,
                                   speaker_ids=sids)
    assert sess._cross["ck_0"].shape[1] == 1
    for t in range(0, l, 4):
        sess.feed(np.asarray(audio[:, t: t + 4]))
    sess.start(np.asarray(prompt))
    sess.generate(7)
    np.testing.assert_array_equal(sess.tokens(), offline)
