"""Flax-param export: our param pytrees -> reference-layout torch state_dicts.

Inverse of ``utils/torch_import.py``: a TPU-trained model can be handed back
to the reference's PyTorch eval scripts, which consume ``.pt`` state_dicts
(``/root/reference/code/test_s2s_pretrain.py:43-47``), or to the PyTorch
PIRender pipeline. Round-trip identity (``import(export(p)) == p``) and
load-into-the-actual-reference-modules forward parity are pinned by
``tests/test_torch_export.py``.

Layout notes (mirror of the import-side documentation):

* VQ models target ``models/stage1_BIWI.py`` module naming exactly and load
  with ``strict=True``.
* The SLM family's transformer stack targets the x-transformers==1.30.16
  layout. Its custom LayerNorm saves ``gamma`` (param) + ``beta`` (zeros
  buffer); we emit both, and the reference's legacy renames on load
  (finetune_s2s_pretrain.py:50-57) plus ``strict=False`` accept either
  spelling.
* Leaves absent from the flax tree (e.g. an encoder's never-used
  ``project_out``) are simply omitted - the reference loads with
  ``strict=False`` (test_s2s_pretrain.py:46).

All values are numpy arrays; call ``to_torch_state_dict`` for tensors.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def to_torch_state_dict(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    import torch

    return {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _dense(sd, prefix, node, bias=True):
    sd[f"{prefix}.weight"] = _np(node["kernel"]).T
    if bias:
        sd[f"{prefix}.bias"] = _np(node["bias"])


def _layernorm(sd, prefix, node):
    sd[f"{prefix}.weight"] = _np(node["scale"])
    sd[f"{prefix}.bias"] = _np(node["bias"])


def _conv1d(sd, prefix, node):
    # flax (k, in, out) -> torch Conv1d (out, in, k)
    sd[f"{prefix}.weight"] = _np(node["kernel"]).transpose(2, 1, 0)
    sd[f"{prefix}.bias"] = _np(node["bias"])


def _ref_transformer(sd, prefix, node, num_layers):
    """Inverse of torch_import._ref_transformer (base_models.py:182-188)."""
    for j in range(num_layers):
        a, m = 2 * j, 2 * j + 1
        blk = node[f"block_{j}"]
        _layernorm(sd, f"{prefix}.net.{a}.fn.norm", blk["norm_attn"])
        _dense(sd, f"{prefix}.net.{a}.fn.fn.to_qkv", blk["attn"]["to_qkv"], bias=False)
        _dense(sd, f"{prefix}.net.{a}.fn.fn.to_out", blk["attn"]["to_out"])
        _layernorm(sd, f"{prefix}.net.{m}.fn.norm", blk["norm_mlp"])
        _dense(sd, f"{prefix}.net.{m}.fn.fn.l1", blk["mlp"]["l1"])
        _dense(sd, f"{prefix}.net.{m}.fn.fn.l2", blk["mlp"]["l2"])


def _squasher(sd, prefix, node, quant_factor, affine):
    for i in range(max(quant_factor, 1)):
        blk = node[f"block_{i}"]
        _conv1d(sd, f"{prefix}.{i}.0", blk)
        if affine:
            sd[f"{prefix}.{i}.2.weight"] = _np(blk["in_scale"])
            sd[f"{prefix}.{i}.2.bias"] = _np(blk["in_bias"])


def _expander(sd, prefix, node, quant_factor, is_audio, affine):
    if quant_factor == 0:
        blk = node["block_0"]
        _conv1d(sd, f"{prefix}.0.0", blk)
        if affine:
            sd[f"{prefix}.0.2.weight"] = _np(blk["in_scale"])
            sd[f"{prefix}.0.2.bias"] = _np(blk["in_bias"])
        return
    # our (k, in, out) -> torch ConvTranspose1d (in, out, k)
    sd[f"{prefix}.0.0.weight"] = _np(node["tconv_kernel"]).transpose(1, 2, 0)
    sd[f"{prefix}.0.0.bias"] = _np(node["tconv_bias"])
    num_layers = quant_factor + 2 if is_audio else quant_factor
    for i in range(1, num_layers):
        _conv1d(sd, f"{prefix}.{i}.0", node[f"block_{i}"])


def _vq_encoder(sd, node, cfg, prefix="encoder", post=True):
    _dense(sd, f"{prefix}.vertice_mapping.0", node["vertice_mapping"])
    _squasher(sd, f"{prefix}.squasher", node["squasher"],
              cfg.quant_factor, cfg.INaffine)
    _dense(sd, f"{prefix}.encoder_linear_embedding.net",
           node["encoder_linear_embedding"]["net"])
    _ref_transformer(sd, f"{prefix}.encoder_transformer",
                     node["encoder_transformer"], cfg.num_hidden_layers)
    if post:
        _dense(sd, f"{prefix}.encoder_linear_embedding_post.net",
               node["encoder_linear_embedding_post"]["net"])


def _vq_decoder(sd, node, cfg, prefix="decoder", pre=True, out_bias=False,
                is_audio=False):
    if pre:
        _dense(sd, f"{prefix}.decoder_linear_embedding_pre.net",
               node["decoder_linear_embedding_pre"]["net"])
    _expander(sd, f"{prefix}.expander", node["expander"],
              cfg.quant_factor, is_audio, cfg.INaffine)
    _dense(sd, f"{prefix}.decoder_linear_embedding.net",
           node["decoder_linear_embedding"]["net"])
    _ref_transformer(sd, f"{prefix}.decoder_transformer",
                     node["decoder_transformer"], cfg.num_hidden_layers)
    _dense(sd, f"{prefix}.vertice_map_reverse",
           node["vertice_map_reverse"], bias=out_bias)


def _unwrap(params) -> Mapping:
    return params["params"] if "params" in params and isinstance(
        params.get("params"), Mapping) else params


def _pe_buffer(d_model: int, max_len: int = 5000) -> np.ndarray:
    """The reference PositionalEncoding's deterministic ``pe`` BUFFER
    (base_models.py:258-269, shape (max_len, 1, d_model)) - present in
    state_dicts because torch saves buffers; needed for strict=True loads."""
    from ..ops.positional import sinusoid_table

    return _np(sinusoid_table(max_len, d_model)).astype(np.float32)[:, None, :]


def flax_vq_to_torch(params, cfg, variant: str = "BIWI") -> Dict[str, np.ndarray]:
    """models.vq_vae.VQAutoEncoder params -> stage1_BIWI.VQAutoEncoder
    state_dict (loads with strict=True).

    Sub-VQ trees inside the SLM family can be PARTIAL (flax materializes only
    the submodules the forward touches, e.g. SLMFT's speaker_vq has no
    decoder); absent subtrees are skipped - the SLM-family consumers load
    with strict=False.
    """
    p = _unwrap(params)
    sd: Dict[str, np.ndarray] = {}
    biwi = variant == "BIWI"
    if "encoder" in p:
        _vq_encoder(sd, p["encoder"], cfg, post=biwi)
        sd["encoder.encoder_pos_embedding.pe"] = _pe_buffer(cfg.hidden_size)
    if "decoder" in p:
        _vq_decoder(sd, p["decoder"], cfg, pre=biwi, out_bias=not biwi)
        sd["decoder.decoder_pos_embedding.pe"] = _pe_buffer(cfg.hidden_size)
    if "quantize" in p:
        sd["quantize.embedding.weight"] = _np(p["quantize"]["embedding"])
    return sd


def flax_vq_speaker_to_torch(params, cfg) -> Dict[str, np.ndarray]:
    """models.vq_vae.VQSpeakerAutoEncoder params -> reference state_dict."""
    p = _unwrap(params)
    sd: Dict[str, np.ndarray] = {}
    _vq_encoder(sd, p["encoder"], cfg, post=True)
    sd["encoder.encoder_pos_embedding.pe"] = _pe_buffer(cfg.hidden_size)
    for dec in ("decoder_v", "decoder_a"):
        _vq_decoder(sd, p[dec], cfg, prefix=dec, pre=True)
        sd[f"{dec}.decoder_pos_embedding.pe"] = _pe_buffer(cfg.hidden_size)
    sd["quantize.embedding.weight"] = _np(p["quantize"]["embedding"])
    return sd


# --- x-transformers (1.30 layout; see torch_import.py key notes) ---


def _xt_attn(sd, prefix, node):
    for nm in ("to_q", "to_k", "to_v", "to_out"):
        _dense(sd, f"{prefix}.{nm}", node[nm], bias=False)


def _xt_ff(sd, prefix, node):
    _dense(sd, f"{prefix}.ff.0.0", node["w1"])
    _dense(sd, f"{prefix}.ff.3", node["w2"])


def _xt_norm(sd, prefix, node):
    """1.30 custom LayerNorm: gamma param + beta zeros buffer."""
    w = _np(node["scale"])
    sd[f"{prefix}.gamma"] = w
    sd[f"{prefix}.beta"] = np.zeros_like(w)


def _xt_encoder_layers(sd, prefix, node, depth):
    for i in range(depth):
        a, f = 2 * i, 2 * i + 1
        _xt_norm(sd, f"{prefix}.layers.{a}.0.0", node[f"norm_attn_{i}"])
        _xt_attn(sd, f"{prefix}.layers.{a}.1", node[f"attn_{i}"])
        _xt_norm(sd, f"{prefix}.layers.{f}.0.0", node[f"norm_ff_{i}"])
        _xt_ff(sd, f"{prefix}.layers.{f}.1", node[f"ff_{i}"])
    _xt_norm(sd, f"{prefix}.final_norm", node["final_norm"])


def _xt_decoder_layers(sd, prefix, node, depth):
    for i in range(depth):
        s, c, f = 3 * i, 3 * i + 1, 3 * i + 2
        _xt_norm(sd, f"{prefix}.layers.{s}.0.0", node[f"norm_self_{i}"])
        _xt_attn(sd, f"{prefix}.layers.{s}.1", node[f"self_{i}"])
        _xt_norm(sd, f"{prefix}.layers.{c}.0.0", node[f"norm_cross_{i}"])
        _xt_attn(sd, f"{prefix}.layers.{c}.1", node[f"cross_{i}"])
        _xt_norm(sd, f"{prefix}.layers.{f}.0.0", node[f"norm_ff_{i}"])
        _xt_ff(sd, f"{prefix}.layers.{f}.1", node[f"ff_{i}"])
    _xt_norm(sd, f"{prefix}.final_norm", node["final_norm"])


def _xt_continuous(sd, prefix, node, depth, dim):
    _dense(sd, f"{prefix}.project_in", node["project_in"])
    if "pos_emb" in node:
        # import folds the forward's dim**-0.5 scale into the table; undo it
        sd[f"{prefix}.pos_emb.emb.weight"] = _np(node["pos_emb"]) * dim ** 0.5
    _xt_encoder_layers(sd, f"{prefix}.attn_layers", node["layers"], depth)
    if "project_out" in node:
        _dense(sd, f"{prefix}.project_out", node["project_out"])


def _xt_token_decoder(sd, prefix, node, depth, dim):
    sd[f"{prefix}.token_emb.emb.weight"] = _np(node["token_emb"]["embedding"])
    if "pos_emb" in node:
        sd[f"{prefix}.pos_emb.emb.weight"] = _np(node["pos_emb"]) * dim ** 0.5
    _xt_decoder_layers(sd, f"{prefix}.attn_layers", node["layers"], depth)
    _dense(sd, f"{prefix}.to_logits", node["to_logits"], bias=False)


def _lstm(sd, prefix, node):
    for k, v in node.items():
        sd[f"{prefix}.{k}"] = _np(v)


def _mesh_head(sd, prefix, node):
    _dense(sd, f"{prefix}.0", node["l1"])
    _dense(sd, f"{prefix}.2", node["l2"])


def _converter_heads(sd, p):
    # flax materializes only forward-touched submodules; skip absent ones
    if "vertice_mapping" in p:
        _dense(sd, "vertice_mapping.0", p["vertice_mapping"])
    if "squasher" in p:
        _conv1d(sd, "squasher.0.0", p["squasher"]["block_0"])
    for nm in ("vertice_map_reverse_lstm", "vertice_map_reverse_lstm_2"):
        if nm in p:
            _lstm(sd, nm, p[nm])
    for nm in ("vertice_map_reverse", "vertice_map_reverse2"):
        if nm in p:
            _mesh_head(sd, nm, p[nm])


def flax_slm_to_torch(params, cfg, vq_cfg, variant: str = "slmft"
                      ) -> Dict[str, np.ndarray]:
    """SLM / SLMFT / SpeakerSLMFT / EmocaConverter params -> reference-layout
    state_dict (the shapes saved by train_s2s_pretrain.py:62-64 /
    finetune_s2s_pretrain.py:140-143, without the DataParallel prefix -
    the reference strips/renames on load either way)."""
    p = _unwrap(params)
    sd: Dict[str, np.ndarray] = {}

    for vq in ("speaker_vq", "listener_vq"):
        if vq in p:
            for k, v in flax_vq_to_torch(p[vq], vq_cfg).items():
                sd[f"{vq}.{k}"] = v

    if variant == "converter":
        _converter_heads(sd, p)
        return sd

    for nm in ("patch_embed_s", "patch_embed_l",
               "patch_embed_dec_s", "patch_embed_dec_l"):
        if nm in p:
            sd[nm] = _np(p[nm])
    for ln in ("norm_s", "norm_l", "norm"):
        if ln in p:
            _layernorm(sd, ln, p[ln])

    for enc in ("encoder_s", "encoder_l", "encoder_joint"):
        if enc in p:
            _xt_continuous(sd, enc, p[enc], cfg.enc_depth, cfg.dim)

    if "decoder_joint" in p:
        _xt_token_decoder(sd, "decoder_joint.net", p["decoder_joint"],
                          cfg.dec_depth, cfg.dim + cfg.dim_audio)

    if variant == "speaker_slmft":
        _converter_heads(sd, p)
        sd["speaker_embed.weight"] = _np(p["speaker_embed"]["embedding"])
        sd["W"] = _np(p["W"])

    return sd


def flax_listener_generator_to_torch(params, cfg, vq_cfg_speaker,
                                     vq_cfg_listener) -> Dict[str, np.ndarray]:
    """ListenerGenerator params -> seq2seq.py:138-236 state_dict layout."""
    p = _unwrap(params)
    sd: Dict[str, np.ndarray] = {}
    for vq, vq_cfg in (("speaker_vq", vq_cfg_speaker),
                       ("listener_vq", vq_cfg_listener)):
        if vq in p:
            for k, v in flax_vq_to_torch(p[vq], vq_cfg).items():
                sd[f"{vq}.{k}"] = v
    gen = p["generator"]
    _xt_continuous(sd, "generator.encoder", gen["encoder"], cfg.enc_depth, cfg.dim)
    _xt_token_decoder(sd, "generator.decoder.net", gen["decoder"],
                      cfg.dec_depth, cfg.dim)
    for emb in ("speaker_embeddings", "listener_embeddings"):
        if emb in p:
            sd[f"{emb}.weight"] = _np(p[emb]["embedding"])
    for fc in ("fc_speaker", "fc_listener"):
        if fc in p:
            _dense(sd, fc, p[fc])
    return sd


def save_state_dict(sd: Mapping[str, np.ndarray], path: str) -> None:
    """Write a ``.pt`` file the reference's ``torch.load`` consumes."""
    import torch

    torch.save(to_torch_state_dict(sd), path)
