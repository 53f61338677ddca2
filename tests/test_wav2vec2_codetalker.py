import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dyadic_interaction_modeling_tpu import config as C
from dyadic_interaction_modeling_tpu.models.wav2vec2 import (
    W2VConfig,
    Wav2Vec2Model,
    compute_mask_indices,
    hf_wav2vec2_to_flax,
    linear_interpolation,
    processor_normalize,
)


def test_processor_normalize_matches_hf_feature_extractor():
    """The reference normalizes raw audio through Wav2Vec2Processor before
    the conv extractor (data_loader.py:257,269); for wav2vec2-base-960h that
    is do_normalize=True per-utterance zero-mean/unit-var. Parity vs the HF
    extractor constructed locally (no download)."""
    tf = pytest.importorskip("transformers")
    fe = tf.Wav2Vec2FeatureExtractor(feature_size=1, sampling_rate=16000,
                                     do_normalize=True,
                                     return_attention_mask=False)
    rng = np.random.default_rng(0)
    for n in (400, 12345):
        x = (rng.standard_normal(n) * 0.3 + 0.05).astype(np.float32)
        ref = np.squeeze(fe(x, sampling_rate=16000).input_values)
        ours = processor_normalize(x)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
        assert abs(float(ours.mean())) < 1e-5
        assert abs(float(ours.std()) - 1.0) < 1e-3


def _tiny_w2v():
    return W2VConfig(conv_dim=(32, 32), conv_kernel=(10, 3), conv_stride=(5, 2),
                     hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
                     intermediate_size=64, num_conv_pos_embeddings=16,
                     num_conv_pos_embedding_groups=4)


def test_linear_interpolation_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.RandomState(0).randn(2, 50, 8).astype(np.float32)
    ours = np.asarray(linear_interpolation(jnp.asarray(x), 50, 30))
    ref = torch.nn.functional.interpolate(
        torch.tensor(x).transpose(1, 2), size=30, align_corners=True,
        mode="linear").transpose(1, 2).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_wav2vec2_shapes_and_alignment():
    cfg = _tiny_w2v()
    model = Wav2Vec2Model(cfg)
    audio = jax.random.normal(jax.random.PRNGKey(0), (2, 1600))
    params = model.init(jax.random.PRNGKey(1), audio)
    out = model.apply(params, audio, "BIWI")
    assert out.shape[0] == 2 and out.shape[2] == 32
    assert out.shape[1] % 2 == 0  # BIWI trims to even
    out2 = model.apply(params, audio, "BIWI", frame_num=20)
    assert out2.shape[1] <= 40


def test_compute_mask_indices():
    rng = np.random.default_rng(0)
    m = compute_mask_indices(rng, (4, 100), 0.2, 10, min_masks=2)
    assert m.shape == (4, 100)
    assert m.sum(axis=1).min() >= 10  # at least min_masks spans
    assert (m.sum(axis=1) == m.sum(axis=1)[0]).all()  # equalized across rows


@pytest.mark.parametrize("feat_norm", ["group"])
def test_hf_parity(feat_norm):
    """Randomly-initialised HF Wav2Vec2Model vs ours with imported weights."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.Wav2Vec2Config(
        conv_dim=(32, 32), conv_kernel=(10, 3), conv_stride=(5, 2),
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, feat_extract_norm=feat_norm,
        do_stable_layer_norm=False, conv_bias=False)
    torch.manual_seed(0)
    hf = transformers.Wav2Vec2Model(hf_cfg).eval()

    cfg = W2VConfig.from_hf(hf_cfg)
    model = Wav2Vec2Model(cfg)
    params = hf_wav2vec2_to_flax(hf.state_dict(), cfg)

    audio = torch.randn(2, 1600)
    with torch.no_grad():
        ref = hf(audio).last_hidden_state.numpy()
    # our forward without dataset alignment: run pieces to mirror plain HF
    aj = jnp.asarray(audio.numpy())
    feats = model.apply(params, aj, method=Wav2Vec2Model.extract_features)
    h = model.apply(params, feats,
                    method=lambda m, f: m.encode(m.fp_proj(m.fp_norm(f))))
    np.testing.assert_allclose(np.asarray(h), ref, rtol=5e-4, atol=5e-4)


def test_codetalker_forward_and_predict():
    from dyadic_interaction_modeling_tpu.models.codetalker import CodeTalker

    cfg = C.codetalker_defaults()
    cfg.update(dict(hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
                    intermediate_size=64, zquant_dim=16, n_embed=24,
                    feature_dim=32, vertice_dim=90, n_head=2, num_layers=1,
                    in_dim=90, period=5))
    model = CodeTalker(cfg, w2v_cfg=_tiny_w2v(), dtype=jnp.float32)
    b = 1
    audio = jax.random.normal(jax.random.PRNGKey(0), (b, 3200))
    template = jax.random.normal(jax.random.PRNGKey(1), (b, 90)) * 0.01
    one_hot = jnp.eye(6)[:1]
    # BIWI: audio 3200 samples -> ~10 conv frames -> 5 motion frames
    vertice = jax.random.normal(jax.random.PRNGKey(2), (b, 5, 90)) * 0.01

    params = model.init(jax.random.PRNGKey(3), audio, template, vertice, one_hot)
    loss, (l_motion, l_reg) = model.apply(params, audio, template, vertice, one_hot)
    assert np.isfinite(float(loss))
    # zero-init feat_map => initial reg loss vs frozen-codebook features
    assert float(l_motion) >= 0 and float(l_reg) >= 0

    out = model.apply(params, audio, template, one_hot, method=CodeTalker.predict)
    assert out.shape[0] == b and out.shape[2] == 90
    assert np.isfinite(np.asarray(out)).all()
