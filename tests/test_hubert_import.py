"""HuBERT checkpoint-import validation (VERDICT round-1 item 8).

The BIWI pipeline's on-the-fly s3prl extraction loads
``torch.load(ckpt)['Upstream']`` and prefixes keys with ``upstream.``
(``/root/reference/code/dataset/biwi.py:85-89``) - a fairseq HubertModel
layout wrapped as ``model.``. These tests build synthetic state_dicts in that
EXACT layout (and the HF HubertModel layout) from one shared weight set and
assert: every key maps (no silent drops beyond the documented pretrain
heads), both layouts import to identical params, the forward runs, and an
unknown key is rejected loudly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dyadic_interaction_modeling_tpu.models.hubert import (
    HUBERT_DROP_KEYS,
    HubertModel,
    hf_hubert_to_flax,
    hubert_base_config,
    normalize_hubert_keys,
)


def _tiny_cfg():
    from dyadic_interaction_modeling_tpu.models.wav2vec2 import W2VConfig

    return W2VConfig(conv_dim=(32, 32), conv_kernel=(10, 3), conv_stride=(5, 2),
                     hidden_size=48, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=96,
                     num_conv_pos_embeddings=16,
                     num_conv_pos_embedding_groups=2)


def _shared_weights(cfg, rng):
    """One weight set, keyed by the HF names."""
    w = {}
    in_c = 1
    for i, (c, k) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel)):
        w[f"feature_extractor.conv_layers.{i}.conv.weight"] = \
            rng.randn(c, in_c, k).astype(np.float32) * 0.1
        in_c = c
    w["feature_extractor.conv_layers.0.layer_norm.weight"] = \
        np.ones(cfg.conv_dim[0], np.float32)
    w["feature_extractor.conv_layers.0.layer_norm.bias"] = \
        np.zeros(cfg.conv_dim[0], np.float32)
    w["feature_projection.layer_norm.weight"] = np.ones(cfg.conv_dim[-1], np.float32)
    w["feature_projection.layer_norm.bias"] = np.zeros(cfg.conv_dim[-1], np.float32)
    w["feature_projection.projection.weight"] = \
        rng.randn(cfg.hidden_size, cfg.conv_dim[-1]).astype(np.float32) * 0.1
    w["feature_projection.projection.bias"] = np.zeros(cfg.hidden_size, np.float32)
    w["masked_spec_embed"] = rng.randn(cfg.hidden_size).astype(np.float32) * 0.1
    g = cfg.num_conv_pos_embedding_groups
    w["encoder.pos_conv_embed.conv.weight_v"] = rng.randn(
        cfg.hidden_size, cfg.hidden_size // g,
        cfg.num_conv_pos_embeddings).astype(np.float32) * 0.1
    w["encoder.pos_conv_embed.conv.weight_g"] = np.ones(
        (1, 1, cfg.num_conv_pos_embeddings), np.float32)
    w["encoder.pos_conv_embed.conv.bias"] = np.zeros(cfg.hidden_size, np.float32)
    w["encoder.layer_norm.weight"] = np.ones(cfg.hidden_size, np.float32)
    w["encoder.layer_norm.bias"] = np.zeros(cfg.hidden_size, np.float32)
    for i in range(cfg.num_hidden_layers):
        b = f"encoder.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            w[f"{b}.attention.{proj}.weight"] = \
                rng.randn(cfg.hidden_size, cfg.hidden_size).astype(np.float32) * 0.1
            w[f"{b}.attention.{proj}.bias"] = np.zeros(cfg.hidden_size, np.float32)
        for ln in ("layer_norm", "final_layer_norm"):
            w[f"{b}.{ln}.weight"] = np.ones(cfg.hidden_size, np.float32)
            w[f"{b}.{ln}.bias"] = np.zeros(cfg.hidden_size, np.float32)
        w[f"{b}.feed_forward.intermediate_dense.weight"] = \
            rng.randn(cfg.intermediate_size, cfg.hidden_size).astype(np.float32) * 0.1
        w[f"{b}.feed_forward.intermediate_dense.bias"] = \
            np.zeros(cfg.intermediate_size, np.float32)
        w[f"{b}.feed_forward.output_dense.weight"] = \
            rng.randn(cfg.hidden_size, cfg.intermediate_size).astype(np.float32) * 0.1
        w[f"{b}.feed_forward.output_dense.bias"] = np.zeros(cfg.hidden_size, np.float32)
    return w


def _to_fairseq_s3prl(w, cfg, rng):
    """Re-key the shared weights into the s3prl-IEMOCAP ckpt layout
    (fairseq HubertModel under upstream.model.)."""
    import re

    out = {}
    for k, v in w.items():
        k = re.sub(r"^feature_extractor\.conv_layers\.(\d+)\.conv\.",
                   r"feature_extractor.conv_layers.\1.0.", k)
        k = k.replace("feature_extractor.conv_layers.0.layer_norm.",
                      "feature_extractor.conv_layers.0.2.")
        k = k.replace("feature_projection.layer_norm.", "layer_norm.")
        k = k.replace("feature_projection.projection.", "post_extract_proj.")
        if k == "masked_spec_embed":
            k = "mask_emb"
        k = k.replace("encoder.pos_conv_embed.conv.", "encoder.pos_conv.0.")
        k = re.sub(r"^(encoder\.layers\.\d+)\.attention\.", r"\1.self_attn.", k)
        k = re.sub(r"^(encoder\.layers\.\d+)\.layer_norm\.",
                   r"\1.self_attn_layer_norm.", k)
        k = re.sub(r"^(encoder\.layers\.\d+)\.feed_forward\.intermediate_dense\.",
                   r"\1.fc1.", k)
        k = re.sub(r"^(encoder\.layers\.\d+)\.feed_forward\.output_dense\.",
                   r"\1.fc2.", k)
        out[f"upstream.model.{k}"] = v
    # fairseq pretrain-only heads present in real ckpts - must be dropped
    out["upstream.model.label_embs_concat"] = rng.randn(4, 8).astype(np.float32)
    out["upstream.model.final_proj.weight"] = rng.randn(8, cfg.hidden_size).astype(np.float32)
    out["upstream.model.final_proj.bias"] = np.zeros(8, np.float32)
    return out


def test_hubert_import_both_layouts_identical():
    cfg = _tiny_cfg()
    rng = np.random.RandomState(0)
    hf_sd = _shared_weights(cfg, rng)
    fs_sd = _to_fairseq_s3prl(hf_sd, cfg, rng)

    p_hf = hf_hubert_to_flax(hf_sd, cfg)
    p_fs = hf_hubert_to_flax(fs_sd, cfg)
    a = jax.tree_util.tree_leaves_with_path(p_hf)
    b = dict(jax.tree_util.tree_leaves_with_path(p_fs))
    assert len(a) == len(b)
    for path, x in a:
        np.testing.assert_array_equal(np.asarray(x), np.asarray(b[path]),
                                      err_msg=jax.tree_util.keystr(path))

    # forward runs on a waveform
    model = HubertModel(cfg)
    wav = jnp.asarray(rng.randn(1, 800).astype(np.float32))
    feats = model.apply(p_fs, wav, "none")
    assert feats.shape[-1] == cfg.hidden_size
    assert np.isfinite(np.asarray(feats)).all()


def test_hubert_import_accounts_for_every_key():
    cfg = _tiny_cfg()
    rng = np.random.RandomState(1)
    fs_sd = _to_fairseq_s3prl(_shared_weights(cfg, rng), cfg, rng)
    normalized, dropped = normalize_hubert_keys(fs_sd)
    # drops are exactly the documented pretrain heads
    assert sorted(dropped) == sorted(
        f"upstream.model.{d}" for d in HUBERT_DROP_KEYS)
    assert len(normalized) + len(dropped) == len(fs_sd)


def test_hubert_import_rejects_unknown_keys():
    cfg = _tiny_cfg()
    rng = np.random.RandomState(2)
    sd = _shared_weights(cfg, rng)
    sd["encoder.layers.0.attention.rotary_emb.inv_freq"] = np.zeros(4, np.float32)
    with pytest.raises(KeyError):
        hf_hubert_to_flax(sd, cfg)


def test_hubert_base_config_is_wav2vec2_base():
    cfg = hubert_base_config()
    assert cfg.hidden_size == 768 and cfg.num_hidden_layers == 12
