"""Streaming speaker (talking-head) session: exactness vs the offline path.

The reference's speaker eval is offline-only (test_biwi.py); the serving
session exploits that the speaker context is PER-FRAME (speaker embedding +
audio, seq2seq_pretrain.py:699-704) to stream exactly. These tests pin:

* a session fed the whole clip reproduces offline ``generate_tokens``
  token-for-token (greedy AND sampled RNG chain, split generate calls);
* partial context == offline on the truncated clip;
* the None-speaker path, mesh decode, and the session guards.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dyadic_interaction_modeling_tpu.models.slm import SpeakerSLMFT
from dyadic_interaction_modeling_tpu.models.xtrans import (
    TokenDecoder,
    generate_tokens,
)
from dyadic_interaction_modeling_tpu.serving import StreamingSpeakerSession
from tests.test_streaming import _tiny_cfgs


def _speaker_and_inputs(b=2, l=12, vdim=120):
    slm_cfg, vq_cfg = _tiny_cfgs()
    model = SpeakerSLMFT(slm_cfg, vq_cfg, vertice_dim=vdim)
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    verts = jax.random.normal(ks[0], (b, l, vdim))
    emoca = jax.random.normal(ks[1], (b, l, 56))
    audio = jax.random.normal(ks[2], (b, l, 16))
    template = jax.random.normal(ks[3], (b, vdim))
    mask = jnp.ones((b, l), dtype=bool)
    sids = jnp.array([3, 7][:b])
    params = model.init(ks[4], verts, emoca, audio, mask, template, sids)
    return model, params, verts, emoca, audio, template, mask, sids


def _offline(model, params, verts, emoca, audio, template, mask, sids,
             n, key, greedy):
    slm_cfg = model.cfg
    ctx, prompt = model.apply(params, verts, emoca, audio, mask, template,
                              sids, method=SpeakerSLMFT.encode_context)
    dec = TokenDecoder(num_tokens=slm_cfg.num_tokens,
                       dim=slm_cfg.dim + slm_cfg.dim_audio,
                       max_seq_len=slm_cfg.dec_max_seq_len,
                       depth=slm_cfg.dec_depth, heads=slm_cfg.dec_heads,
                       use_abs_pos_emb=True)  # speaker decoder keeps pos emb
    dec_params = {"params": params["params"]["decoder_joint"]}
    toks = generate_tokens(dec, dec_params, prompt, n, ctx, mask, key,
                           greedy=greedy)
    return np.asarray(toks), np.asarray(prompt)


@pytest.mark.parametrize("greedy", [True, False])
def test_session_matches_offline_generation(greedy):
    model, params, verts, emoca, audio, template, mask, sids = \
        _speaker_and_inputs()
    key = jax.random.PRNGKey(7)
    offline, prompt = _offline(model, params, verts, emoca, audio, template,
                               mask, sids, 11, key, greedy)

    sess = StreamingSpeakerSession(model, params, batch=2, chunk=4,
                                   max_frames=16, max_tokens=16,
                                   speaker_ids=sids, greedy=greedy)
    sess._rng = key
    for t in range(0, 12, 4):
        sess.feed(np.asarray(audio[:, t: t + 4]))
    assert sess.frames_fed == 12
    sess.start(prompt)
    sess.generate(5)            # RNG/cache chain must carry across calls
    sess.generate(6)
    np.testing.assert_array_equal(sess.tokens(), offline)

    mesh, emoca_out = sess.mesh(np.asarray(template))
    assert mesh.shape == (2, 11, 120) and emoca_out.shape == (2, 11, 56)
    assert np.isfinite(mesh).all()


def test_partial_context_equals_truncated_offline():
    model, params, verts, emoca, audio, template, mask, sids = \
        _speaker_and_inputs()
    t1 = 8
    offline, prompt = _offline(
        model, params, verts[:, :t1], emoca[:, :t1], audio[:, :t1], template,
        mask[:, :t1], sids, 6, jax.random.PRNGKey(7), True)

    sess = StreamingSpeakerSession(model, params, batch=2, chunk=4,
                                   max_frames=16, max_tokens=16,
                                   speaker_ids=sids, greedy=True)
    sess.feed(np.asarray(audio[:, 0:4]))
    sess.feed(np.asarray(audio[:, 4:8]))
    sess.start(prompt)
    np.testing.assert_array_equal(sess.generate(6), offline)

    # audio keeps arriving after generation started
    sess.feed(np.asarray(audio[:, 8:12]))
    assert sess.generate(3).shape == (2, 3)


def test_no_speaker_conditioning_and_guards():
    model, params, verts, emoca, audio, template, mask, _ = \
        _speaker_and_inputs()
    # speaker_ids=None == the reference's zero-embedding path
    offline, prompt = _offline(model, params, verts, emoca, audio, template,
                               mask, None, 5, jax.random.PRNGKey(3), True)
    sess = StreamingSpeakerSession(model, params, batch=2, chunk=4,
                                   max_frames=16, max_tokens=8, greedy=True)
    with pytest.raises(ValueError):
        sess.start(np.zeros((2, 1), np.int32))       # start before feed
    for t in range(0, 12, 4):
        sess.feed(np.asarray(audio[:, t: t + 4]))
    with pytest.raises(ValueError):
        sess.feed(np.asarray(audio[:, :3]))          # wrong chunk size
    sess.start(prompt)
    np.testing.assert_array_equal(sess.generate(5), offline)
    sess.feed(np.asarray(audio[:, :4]))              # fills to capacity (16)
    with pytest.raises(ValueError):
        sess.feed(np.asarray(audio[:, :4]))          # context capacity
    with pytest.raises(ValueError):
        sess.generate(3)                             # token capacity (8)

    # prompt helper: frame codes in vocab range
    codes = model.apply(params, emoca[:, :2],
                        method=SpeakerSLMFT.tokenize_emoca_frames)
    assert (np.asarray(codes) >= 0).all()
    assert (np.asarray(codes) < model.cfg.num_tokens).all()
