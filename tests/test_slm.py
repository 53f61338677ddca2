import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dyadic_interaction_modeling_tpu import config as C
from dyadic_interaction_modeling_tpu.models.slm import (
    SLM,
    SLMFT,
    SpeakerSLMFT,
    EmocaConverter,
    random_masking_unstructured,
    info_nce,
)
from dyadic_interaction_modeling_tpu.models.vq_vae import VQAutoEncoder
from dyadic_interaction_modeling_tpu.models.xtrans import generate_tokens, TokenDecoder


def _tiny_cfgs():
    slm_cfg = C.slm_defaults()
    slm_cfg.update(dict(dim=32, dim_audio=16, enc_depth=1, enc_heads=2,
                        dec_depth=1, dec_heads=2, enc_max_seq_len=64,
                        dec_max_seq_len=64, num_tokens=24))
    vq_cfg = C.vq_listener_defaults()
    vq_cfg.update(dict(hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
                       intermediate_size=64, zquant_dim=16, n_embed=24))
    return slm_cfg, vq_cfg


def _batch(key, b=2, l=12, din=56, daud=16):
    ks = jax.random.split(key, 3)
    v_s = jax.random.normal(ks[0], (b, l, din))
    v_l = jax.random.normal(ks[1], (b, l, din))
    v_a = jax.random.normal(ks[2], (b, l, daud))
    mask = jnp.zeros((b, l), dtype=bool).at[0, :l].set(True).at[1, :7].set(True)
    return v_s, v_l, v_a, mask


def test_random_masking_exact_counts():
    mask = jnp.zeros((3, 20), dtype=bool).at[0, :20].set(True)\
        .at[1, :10].set(True).at[2, :5].set(True)
    m = random_masking_unstructured(jax.random.PRNGKey(0), mask, 0.15)
    m = np.asarray(m)
    assert m[0].sum() == int(20 * 0.15)
    assert m[1].sum() == int(10 * 0.15)
    assert m[2].sum() == int(5 * 0.15)
    # masked positions only within valid region
    assert not m[1, 10:].any() and not m[2, 5:].any()


def test_info_nce_basics():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 10, 8))
    mask = jnp.ones((4, 10), dtype=bool)
    nce, acc = info_nce(x, x, mask)  # identical reps -> diag dominant
    assert float(acc) == 1.0
    assert float(nce) >= 0.0


def test_forward_vq_vectorized_equals_per_sample_loop():
    """Batched masked encode must reproduce the reference's per-sample loop."""
    slm_cfg, vq_cfg = _tiny_cfgs()
    model = SLM(slm_cfg, vq_cfg)
    v_s, v_l, v_a, mask = _batch(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), v_s, v_l, v_a, mask,
                        jax.random.PRNGKey(2))
    z_s, z_l = model.apply(params, v_s, v_l, mask, method=SLM.forward_vq)

    # per-sample loop (what the reference does): encode each unpadded seq alone
    vq = VQAutoEncoder(vq_cfg, variant="BIWI")
    vq_params_s = {"params": params["params"]["speaker_vq"]}
    vq_params_l = {"params": params["params"]["listener_vq"]}
    lens = np.asarray(mask.sum(axis=1))
    for i in range(v_s.shape[0]):
        li = int(lens[i])
        enc_s = vq.apply(vq_params_s, v_s[i: i + 1, :li], method=VQAutoEncoder.encode)
        enc_l = vq.apply(vq_params_l, v_l[i: i + 1, :li], method=VQAutoEncoder.encode)
        np.testing.assert_array_equal(np.asarray(z_s[i, :li]), np.asarray(enc_s.indices[0]))
        np.testing.assert_array_equal(np.asarray(z_l[i, :li]), np.asarray(enc_l.indices[0]))
    # padding values (seq2seq_pretrain.py:192-195)
    assert (np.asarray(z_s[1, 7:]) == 0).all()
    assert (np.asarray(z_l[1, 7:]) == -100).all()


def test_slm_forward_smoke():
    slm_cfg, vq_cfg = _tiny_cfgs()
    model = SLM(slm_cfg, vq_cfg)
    v_s, v_l, v_a, mask = _batch(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), v_s, v_l, v_a, mask,
                        jax.random.PRNGKey(2))
    out = model.apply(params, v_s, v_l, v_a, mask, jax.random.PRNGKey(3))
    assert np.isfinite(float(out.total_loss))
    for k in ("l_ce_s", "l_ce_l", "l_cont_s", "l_cont_l", "nce", "c_acc"):
        assert k in out.logs and np.isfinite(float(out.logs[k]))


def test_slmft_train_and_generate():
    slm_cfg, vq_cfg = _tiny_cfgs()
    model = SLMFT(slm_cfg, vq_cfg)
    v_s, v_l, v_a, mask = _batch(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), v_s, v_l, v_a, mask,
                        jax.random.PRNGKey(2))
    out = model.apply(params, v_s, v_l, v_a, mask, jax.random.PRNGKey(3))
    assert np.isfinite(float(out.total_loss))
    assert out.pred.shape == (2, 11, 56)  # L-1 decoded frames

    # generation path: context -> KV-cached sampling -> motion decode
    ctx, prompt = model.apply(params, v_s, v_l, v_a, mask,
                              method=SLMFT.encode_context)
    assert ctx.shape == (2, 12, 32 + 16)
    dec = TokenDecoder(num_tokens=slm_cfg.num_tokens, dim=slm_cfg.dim + slm_cfg.dim_audio,
                       max_seq_len=slm_cfg.dec_max_seq_len, depth=slm_cfg.dec_depth,
                       heads=slm_cfg.dec_heads, use_abs_pos_emb=False)
    dec_params = {"params": params["params"]["decoder_joint"]}
    tokens = generate_tokens(dec, dec_params, prompt, v_s.shape[1] - 1, ctx, mask,
                             jax.random.PRNGKey(4))
    assert tokens.shape == (2, 11)
    assert (np.asarray(tokens) >= 0).all() and (np.asarray(tokens) < 24).all()
    motion = model.apply(params, tokens, method=SLMFT.decode_tokens_to_motion)
    assert motion.shape == (2, 11, 56)


def test_speaker_slmft_forward():
    slm_cfg, vq_cfg = _tiny_cfgs()
    vdim = 300  # stand-in for 70110 to keep the test light
    model = SpeakerSLMFT(slm_cfg, vq_cfg, vertice_dim=vdim)
    b, l = 2, 10
    verts = jax.random.normal(jax.random.PRNGKey(0), (b, l, vdim))
    emoca = jax.random.normal(jax.random.PRNGKey(1), (b, l, 56))
    audio = jax.random.normal(jax.random.PRNGKey(2), (b, l, 16))
    template = jax.random.normal(jax.random.PRNGKey(3), (b, vdim))
    mask = jnp.ones((b, l), dtype=bool)
    sids = jnp.array([3, 7])
    params = model.init(jax.random.PRNGKey(4), verts, emoca, audio, mask,
                        template, sids)
    out = model.apply(params, verts, emoca, audio, mask, template, sids)
    assert np.isfinite(float(out.total_loss))
    assert out.pred.shape == (b, l - 1, 56)


def test_emoca_converter_forward():
    _, vq_cfg = _tiny_cfgs()
    model = EmocaConverter(vq_cfg, vertice_dim=120)
    emoca = jax.random.normal(jax.random.PRNGKey(0), (2, 9, 56))
    template = jax.random.normal(jax.random.PRNGKey(1), (2, 120))
    params = model.init(jax.random.PRNGKey(2), template, emoca)
    out = model.apply(params, template, emoca)
    assert out.shape == (2, 9, 120)
    assert np.isfinite(np.asarray(out)).all()


def test_speaker_generator_batched_best_of_n():
    from dyadic_interaction_modeling_tpu.engine.pt_engine import (
        make_speaker_generator,
        select_best_by_l2,
    )

    slm_cfg, vq_cfg = _tiny_cfgs()
    slm_cfg.dim_audio = 16
    vdim = 300
    model = SpeakerSLMFT(slm_cfg, vq_cfg, vertice_dim=vdim)
    b, l = 2, 10
    verts = jax.random.normal(jax.random.PRNGKey(0), (b, l, vdim))
    emoca = jax.random.normal(jax.random.PRNGKey(1), (b, l, 56))
    audio = jax.random.normal(jax.random.PRNGKey(2), (b, l, 16))
    template = jax.random.normal(jax.random.PRNGKey(3), (b, vdim))
    mask = jnp.ones((b, l), dtype=bool)
    sids = jnp.array([3, 7])
    params = model.init(jax.random.PRNGKey(4), verts, emoca, audio, mask,
                        template, sids)["params"]
    gen = make_speaker_generator(model, slm_cfg, l)
    cands = np.asarray(gen(params, (verts, emoca, audio, mask, template, sids),
                           jax.random.PRNGKey(5), 3))
    assert cands.shape == (b, 3, l - 1, 56)
    assert np.isfinite(cands).all()
    best = select_best_by_l2(cands[0], np.asarray(emoca)[0, 1:])
    assert best.shape == (l - 1, 56)
