"""PyTorch-checkpoint import: reference state_dicts -> flax param pytrees.

The reference saves ``{'state_dict': weights}`` via ``save_checkpoint``
(``/root/reference/code/base/baseTrainer.py:26-42``). This module maps those
keys onto our flax module trees so reference-trained VQ-VAE / SLM weights run
on TPU unchanged, which is how metric parity is validated (BASELINE.md).

Also handles the legacy gamma/beta -> weight/bias renames the reference
performs on load (finetune_s2s_pretrain.py:50-57).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import numpy as np


def _t(x) -> np.ndarray:
    """torch tensor -> numpy array (works on plain numpy too).

    Always copies: ``tensor.numpy()`` is a view over torch storage, and
    ``jnp.asarray`` can zero-copy alias numpy buffers on CPU - an imported
    param tree must not mutate when the source torch model trains in place.
    """
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.array(x)


def normalize_legacy_keys(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """gamma->weight / beta->bias renames (finetune_s2s_pretrain.py:50-57)."""
    out = {}
    for k, v in state_dict.items():
        k = k.replace("module.", "")
        if k.endswith(".gamma"):
            k = k[: -len(".gamma")] + ".weight"
        elif k.endswith(".beta"):
            k = k[: -len(".beta")] + ".bias"
        out[k] = v
    return out


def _set(tree: Dict, path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _dense(tree, flax_path, sd, torch_prefix, bias=True):
    _set(tree, f"{flax_path}/kernel", _t(sd[f"{torch_prefix}.weight"]).T)
    if bias:
        _set(tree, f"{flax_path}/bias", _t(sd[f"{torch_prefix}.bias"]))


def _layernorm(tree, flax_path, sd, torch_prefix):
    _set(tree, f"{flax_path}/scale", _t(sd[f"{torch_prefix}.weight"]))
    _set(tree, f"{flax_path}/bias", _t(sd[f"{torch_prefix}.bias"]))


def _conv1d(tree, flax_path, sd, torch_prefix):
    # torch Conv1d weight (out, in, k) -> flax (k, in, out)
    _set(tree, f"{flax_path}/kernel", _t(sd[f"{torch_prefix}.weight"]).transpose(2, 1, 0))
    _set(tree, f"{flax_path}/bias", _t(sd[f"{torch_prefix}.bias"]))


def _convtranspose1d(tree, flax_path_kernel, flax_path_bias, sd, torch_prefix):
    # torch ConvTranspose1d weight (in, out, k) -> our (k, in, out)
    _set(tree, flax_path_kernel, _t(sd[f"{torch_prefix}.weight"]).transpose(2, 0, 1))
    _set(tree, flax_path_bias, _t(sd[f"{torch_prefix}.bias"]))


def _ref_transformer(tree, flax_prefix, sd, torch_prefix, num_layers, affine_in=False):
    """Reference base_models.Transformer: Sequential of 2*num_layers Residual(Norm(fn)).

    Even indices hold Attention, odd hold MLP (base_models.py:182-188).
    """
    for j in range(num_layers):
        a, m = 2 * j, 2 * j + 1
        blk = f"{flax_prefix}/block_{j}"
        _layernorm(tree, f"{blk}/norm_attn", sd, f"{torch_prefix}.net.{a}.fn.norm")
        _dense(tree, f"{blk}/attn/to_qkv", sd, f"{torch_prefix}.net.{a}.fn.fn.to_qkv", bias=False)
        _dense(tree, f"{blk}/attn/to_out", sd, f"{torch_prefix}.net.{a}.fn.fn.to_out")
        _layernorm(tree, f"{blk}/norm_mlp", sd, f"{torch_prefix}.net.{m}.fn.norm")
        _dense(tree, f"{blk}/mlp/l1", sd, f"{torch_prefix}.net.{m}.fn.fn.l1")
        _dense(tree, f"{blk}/mlp/l2", sd, f"{torch_prefix}.net.{m}.fn.fn.l2")


def _squasher(tree, flax_prefix, sd, torch_prefix, quant_factor, affine):
    n_blocks = max(quant_factor, 1)
    for i in range(n_blocks):
        _conv1d(tree, f"{flax_prefix}/block_{i}", sd, f"{torch_prefix}.{i}.0")
        if affine:
            _set(tree, f"{flax_prefix}/block_{i}/in_scale", _t(sd[f"{torch_prefix}.{i}.2.weight"]))
            _set(tree, f"{flax_prefix}/block_{i}/in_bias", _t(sd[f"{torch_prefix}.{i}.2.bias"]))


def _expander(tree, flax_prefix, sd, torch_prefix, quant_factor, is_audio, affine):
    if quant_factor == 0:
        _conv1d(tree, f"{flax_prefix}/block_0", sd, f"{torch_prefix}.0.0")
        if affine:
            _set(tree, f"{flax_prefix}/block_0/in_scale", _t(sd[f"{torch_prefix}.0.2.weight"]))
            _set(tree, f"{flax_prefix}/block_0/in_bias", _t(sd[f"{torch_prefix}.0.2.bias"]))
        return
    _convtranspose1d(tree, f"{flax_prefix}/tconv_kernel", f"{flax_prefix}/tconv_bias",
                     sd, f"{torch_prefix}.0.0")
    num_layers = quant_factor + 2 if is_audio else quant_factor
    for i in range(1, num_layers):
        _conv1d(tree, f"{flax_prefix}/block_{i}", sd, f"{torch_prefix}.{i}.0")


def _vq_encoder(tree, sd, cfg, prefix="encoder", flax_prefix="encoder", post=True):
    _dense(tree, f"{flax_prefix}/vertice_mapping", sd, f"{prefix}.vertice_mapping.0")
    _squasher(tree, f"{flax_prefix}/squasher", sd, f"{prefix}.squasher",
              cfg.quant_factor, cfg.INaffine)
    _dense(tree, f"{flax_prefix}/encoder_linear_embedding/net", sd,
           f"{prefix}.encoder_linear_embedding.net")
    _ref_transformer(tree, f"{flax_prefix}/encoder_transformer", sd,
                     f"{prefix}.encoder_transformer", cfg.num_hidden_layers)
    if post:
        _dense(tree, f"{flax_prefix}/encoder_linear_embedding_post/net", sd,
               f"{prefix}.encoder_linear_embedding_post.net")


def _vq_decoder(tree, sd, cfg, prefix="decoder", flax_prefix="decoder",
                pre=True, out_bias=False, is_audio=False):
    if pre:
        _dense(tree, f"{flax_prefix}/decoder_linear_embedding_pre/net", sd,
               f"{prefix}.decoder_linear_embedding_pre.net")
    _expander(tree, f"{flax_prefix}/expander", sd, f"{prefix}.expander",
              cfg.quant_factor, is_audio, cfg.INaffine)
    _dense(tree, f"{flax_prefix}/decoder_linear_embedding/net", sd,
           f"{prefix}.decoder_linear_embedding.net")
    _ref_transformer(tree, f"{flax_prefix}/decoder_transformer", sd,
                     f"{prefix}.decoder_transformer", cfg.num_hidden_layers)
    _dense(tree, f"{flax_prefix}/vertice_map_reverse", sd,
           f"{prefix}.vertice_map_reverse", bias=out_bias)


def torch_vq_to_flax(state_dict: Mapping[str, Any], cfg, variant: str = "BIWI") -> Dict:
    """Reference VQAutoEncoder state_dict -> flax params for models.vq_vae.VQAutoEncoder.

    Tolerates PARTIAL dicts (a TPU-side export of e.g. SLMFT's speaker_vq has
    no decoder because flax never materialized one); reference checkpoints
    are always complete, and template filtering downstream still errors on
    genuinely missing coverage.
    """
    sd = normalize_legacy_keys(state_dict)
    tree: Dict = {}
    biwi = variant == "BIWI"
    if "encoder.vertice_mapping.0.weight" in sd:
        _vq_encoder(tree, sd, cfg, post=biwi)
    if "decoder.decoder_linear_embedding.net.weight" in sd:
        _vq_decoder(tree, sd, cfg, pre=biwi, out_bias=not biwi)
    if "quantize.embedding.weight" in sd:
        _set(tree, "quantize/embedding", _t(sd["quantize.embedding.weight"]))
    return {"params": tree}


def torch_vq_speaker_to_flax(state_dict: Mapping[str, Any], cfg) -> Dict:
    """Reference VQSpeakerAutoEncoder state_dict -> flax params."""
    sd = normalize_legacy_keys(state_dict)
    tree: Dict = {}
    _vq_encoder(tree, sd, cfg, post=True)
    _vq_decoder(tree, sd, cfg, prefix="decoder_v", flax_prefix="decoder_v",
                pre=True, out_bias=False)
    _vq_decoder(tree, sd, cfg, prefix="decoder_a", flax_prefix="decoder_a",
                pre=True, out_bias=False)
    _set(tree, "quantize/embedding", _t(sd["quantize.embedding.weight"]))
    return {"params": tree}


# ---------------------------------------------------------------------------
# x-transformers (lucidrains, ==1.30.16 per the reference requirements.txt)
# checkpoint import for the SLM family. State-dict layout assumptions,
# written from the 1.30 source (the wheel is not in this image, so the
# layout is additionally pinned by tests/test_xtrans_import.py, which
# rebuilds the same architecture in plain torch with these exact key names
# and asserts forward parity after import):
#
# ContinuousTransformerWrapper:
#   project_in.{weight,bias}        Linear(dim_in, dim)
#   pos_emb.emb.weight              AbsolutePositionalEmbedding - NOTE: the
#                                   forward multiplies by dim**-0.5; we fold
#                                   that scale into the imported table
#   attn_layers.layers.{j}.0.0.*    pre-branch LayerNorm (gamma/beta in the
#                                   x-transformers custom LayerNorm; the
#                                   reference renames them to weight/bias on
#                                   load - normalize_legacy_keys handles both)
#   attn_layers.layers.{j}.1.*      the block (Attention or FeedForward)
#   attn_layers.final_norm.*        final LayerNorm (older versions: .norm)
#   project_out.{weight,bias}       Linear(dim, dim_out) - present in the
#                                   state_dict but unused when the model only
#                                   calls return_embeddings=True
# Encoder layer order: (attn, ff) per depth -> indices 2i, 2i+1.
# Decoder(cross_attend=True): (attn, cross, ff) -> indices 3i, 3i+1, 3i+2.
# Attention: to_q/to_k/to_v/to_out, all Linear bias=False.
# FeedForward: ff.0.0 (Linear in), ff.3 (Linear out); 1=post-act LN
# (Identity), 2=Dropout.
# TransformerWrapper (wrapped by AutoregressiveWrapper -> keys under .net):
#   token_emb.emb.weight, [pos_emb.emb.weight], attn_layers.*,
#   to_logits.weight (bias=False).
# ---------------------------------------------------------------------------


def _xt_attn(tree, flax_prefix, sd, prefix):
    for nm in ("to_q", "to_k", "to_v", "to_out"):
        _dense(tree, f"{flax_prefix}/{nm}", sd, f"{prefix}.{nm}", bias=False)


def _xt_ff(tree, flax_prefix, sd, prefix):
    _dense(tree, f"{flax_prefix}/w1", sd, f"{prefix}.ff.0.0")
    _dense(tree, f"{flax_prefix}/w2", sd, f"{prefix}.ff.3")


def _xt_norm(tree, flax_path, sd, torch_prefix):
    """The x-transformers LayerNorm is SCALE-ONLY: beta is a zeros BUFFER
    that never trains, so our flax modules have no bias leaf (use_bias=False
    in models/xtrans._xt_norm). A beta in the state_dict is validated to be
    zero and dropped."""
    w = _t(sd[f"{torch_prefix}.weight"])
    _set(tree, f"{flax_path}/scale", w)
    b = sd.get(f"{torch_prefix}.bias")
    if b is not None and np.abs(_t(b)).max() > 0:
        raise ValueError(
            f"{torch_prefix}.bias (x-transformers beta buffer) is nonzero - "
            "the checkpoint was not produced by the supported 1.30 layout")


def _xt_final_norm_prefix(sd, prefix):
    for cand in (f"{prefix}.final_norm", f"{prefix}.norm"):
        if f"{cand}.weight" in sd:
            return cand
    raise KeyError(f"no final norm under {prefix} (tried .final_norm, .norm)")


def _xt_encoder_layers(tree, flax_prefix, sd, prefix, depth):
    for i in range(depth):
        a, f = 2 * i, 2 * i + 1
        _xt_norm(tree, f"{flax_prefix}/norm_attn_{i}", sd, f"{prefix}.layers.{a}.0.0")
        _xt_attn(tree, f"{flax_prefix}/attn_{i}", sd, f"{prefix}.layers.{a}.1")
        _xt_norm(tree, f"{flax_prefix}/norm_ff_{i}", sd, f"{prefix}.layers.{f}.0.0")
        _xt_ff(tree, f"{flax_prefix}/ff_{i}", sd, f"{prefix}.layers.{f}.1")
    _xt_norm(tree, f"{flax_prefix}/final_norm", sd, _xt_final_norm_prefix(sd, prefix))


def _xt_decoder_layers(tree, flax_prefix, sd, prefix, depth):
    for i in range(depth):
        s, c, f = 3 * i, 3 * i + 1, 3 * i + 2
        _xt_norm(tree, f"{flax_prefix}/norm_self_{i}", sd, f"{prefix}.layers.{s}.0.0")
        _xt_attn(tree, f"{flax_prefix}/self_{i}", sd, f"{prefix}.layers.{s}.1")
        _xt_norm(tree, f"{flax_prefix}/norm_cross_{i}", sd, f"{prefix}.layers.{c}.0.0")
        _xt_attn(tree, f"{flax_prefix}/cross_{i}", sd, f"{prefix}.layers.{c}.1")
        _xt_norm(tree, f"{flax_prefix}/norm_ff_{i}", sd, f"{prefix}.layers.{f}.0.0")
        _xt_ff(tree, f"{flax_prefix}/ff_{i}", sd, f"{prefix}.layers.{f}.1")
    _xt_norm(tree, f"{flax_prefix}/final_norm", sd, _xt_final_norm_prefix(sd, prefix))


def _xt_continuous(tree, flax_prefix, sd, prefix, depth, dim):
    """ContinuousTransformerWrapper -> models.xtrans.ContinuousTransformerWrapper."""
    _dense(tree, f"{flax_prefix}/project_in", sd, f"{prefix}.project_in")
    pk = f"{prefix}.pos_emb.emb.weight"
    if pk in sd:
        _set(tree, f"{flax_prefix}/pos_emb", _t(sd[pk]) * dim ** -0.5)
    _xt_encoder_layers(tree, f"{flax_prefix}/layers", sd,
                       f"{prefix}.attn_layers", depth)
    if f"{prefix}.project_out.weight" in sd:
        _dense(tree, f"{flax_prefix}/project_out", sd, f"{prefix}.project_out")


def _xt_token_decoder(tree, flax_prefix, sd, prefix, depth, dim):
    """AutoregressiveWrapper(TransformerWrapper) -> models.xtrans.TokenDecoder.

    ``prefix`` must include the AutoregressiveWrapper's ``.net``.
    """
    _set(tree, f"{flax_prefix}/token_emb/embedding",
         _t(sd[f"{prefix}.token_emb.emb.weight"]))
    pk = f"{prefix}.pos_emb.emb.weight"
    if pk in sd:
        _set(tree, f"{flax_prefix}/pos_emb", _t(sd[pk]) * dim ** -0.5)
    _xt_decoder_layers(tree, f"{flax_prefix}/layers", sd,
                       f"{prefix}.attn_layers", depth)
    _dense(tree, f"{flax_prefix}/to_logits", sd, f"{prefix}.to_logits", bias=False)


def _plain_layernorm(tree, flax_path, sd, torch_prefix):
    _set(tree, f"{flax_path}/scale", _t(sd[f"{torch_prefix}.weight"]))
    _set(tree, f"{flax_path}/bias", _t(sd[f"{torch_prefix}.bias"]))


def _lstm(tree, flax_prefix, sd, torch_prefix):
    """torch nn.LSTM -> ops.rnn.LSTM (parameter names match 1:1)."""
    for k in sd:
        if k.startswith(torch_prefix + "."):
            _set(tree, f"{flax_prefix}/{k[len(torch_prefix) + 1:]}", _t(sd[k]))


def _mesh_head(tree, flax_prefix, sd, torch_prefix):
    """Sequential(Linear, LeakyReLU, Linear) -> models.slm.MeshHead (l1/l2)."""
    _dense(tree, f"{flax_prefix}/l1", sd, f"{torch_prefix}.0")
    _dense(tree, f"{flax_prefix}/l2", sd, f"{torch_prefix}.2")


def _converter_heads(tree, sd):
    """The EmocaConverter head stack shared by SpeakerSLMFT
    (seq2seq_pretrain.py:563-573, 784-824). Each head is optional so partial
    TPU-side exports round-trip (template filtering still enforces coverage)."""
    if "vertice_mapping.0.weight" in sd:
        _dense(tree, "vertice_mapping", sd, "vertice_mapping.0")
    if "squasher.0.0.weight" in sd:
        _conv1d(tree, "squasher/block_0", sd, "squasher.0.0")
    for nm in ("vertice_map_reverse_lstm", "vertice_map_reverse_lstm_2"):
        if f"{nm}.weight_ih_l0" in sd:
            _lstm(tree, nm, sd, nm)
    for nm in ("vertice_map_reverse", "vertice_map_reverse2"):
        if f"{nm}.0.weight" in sd:
            _mesh_head(tree, nm, sd, nm)


def _sub_state_dict(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    return {k[len(prefix) + 1:]: v for k, v in sd.items()
            if k.startswith(prefix + ".")}


def torch_slm_to_flax(state_dict: Mapping[str, Any], cfg, vq_cfg,
                      variant: str = "slmft",
                      params_template: Optional[Dict] = None) -> Dict:
    """Reference SLM / SLMFT / SpeakerSLMFT state_dict -> flax params.

    Handles the checkpoints saved by ``train_s2s_pretrain.py:62-64`` /
    ``finetune_s2s_pretrain.py:140-143`` (``best_model_candor_pretrain*.pt``,
    ``best_vico_causal.pt``, ``best_model_biwi_finetune*.pt``), including the
    gamma/beta legacy renames (finetune_s2s_pretrain.py:50-57) and the
    DataParallel ``module.`` prefix.

    When ``params_template`` (the model's init params, WITHOUT the top
    "params" wrapper) is given, the result is filtered to the template's
    structure — the reference state_dict contains submodules our forward
    never touches (SLMFT's encoder_l / norm_l / norm, the speaker VQ
    decoder) — and verified to cover it exactly.
    """
    sd = normalize_legacy_keys(state_dict)
    tree: Dict = {}

    vq_names = ("speaker_vq", "listener_vq")
    if variant == "converter":
        vq_names = ("speaker_vq",)
    for vq in vq_names:
        sub = _sub_state_dict(sd, vq)
        if sub:
            tree[vq] = torch_vq_to_flax(sub, vq_cfg, variant="BIWI")["params"]

    if variant == "converter":
        _converter_heads(tree, sd)
        return _finish(tree, params_template)

    for nm in ("patch_embed_s", "patch_embed_l",
               "patch_embed_dec_s", "patch_embed_dec_l"):
        _set(tree, nm, _t(sd[nm]))
    for ln, torch_nm in (("norm_s", "norm_s"), ("norm_l", "norm_l"),
                         ("norm", "norm")):
        if f"{torch_nm}.weight" in sd:
            _plain_layernorm(tree, ln, sd, torch_nm)

    for enc in ("encoder_s", "encoder_l", "encoder_joint"):
        if f"{enc}.project_in.weight" in sd:
            _xt_continuous(tree, enc, sd, enc, cfg.enc_depth, cfg.dim)

    _xt_token_decoder(tree, "decoder_joint", sd, "decoder_joint.net",
                      cfg.dec_depth, cfg.dim + cfg.dim_audio)

    if variant == "speaker_slmft":
        _converter_heads(tree, sd)
        _set(tree, "speaker_embed/embedding", _t(sd["speaker_embed.weight"]))
        _set(tree, "W", _t(sd["W"]))

    return _finish(tree, params_template)


def _leaf_paths(tree: Mapping, prefix: str = "") -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, Mapping):
            out.update(_leaf_paths(v, p))
        else:
            out[p] = v
    return out


def _finish(tree: Dict, params_template: Optional[Dict]) -> Dict:
    if params_template is None:
        return {"params": tree}
    if "params" in params_template and len(params_template) == 1:
        params_template = params_template["params"]
    built = _leaf_paths(tree)
    want = _leaf_paths(params_template)
    missing = sorted(set(want) - set(built))
    if missing:
        raise KeyError(f"state_dict did not cover {len(missing)} params, "
                       f"e.g. {missing[:8]}")
    out: Dict = {}
    for path, ref in want.items():
        v = built[path]
        if tuple(np.shape(v)) != tuple(np.shape(ref)):
            raise ValueError(f"shape mismatch at {path}: "
                             f"checkpoint {np.shape(v)} vs model {np.shape(ref)}")
        _set(out, path, np.asarray(v, dtype=np.asarray(ref).dtype))
    return {"params": out}


def torch_listener_generator_to_flax(state_dict: Mapping[str, Any], cfg,
                                     vq_cfg_speaker, vq_cfg_listener,
                                     params_template: Optional[Dict] = None
                                     ) -> Dict:
    """Reference ListenerGenerator (seq2seq.py:138-236) state_dict -> flax.

    Layout: speaker_vq./listener_vq. (VQ), generator.encoder.
    (ContinuousTransformerWrapper), generator.decoder.net.
    (AutoregressiveWrapper(TransformerWrapper)), id embeddings + fc heads.
    """
    sd = normalize_legacy_keys(state_dict)
    tree: Dict = {}
    for vq, vq_cfg in (("speaker_vq", vq_cfg_speaker),
                       ("listener_vq", vq_cfg_listener)):
        sub = _sub_state_dict(sd, vq)
        if sub:
            tree[vq] = torch_vq_to_flax(sub, vq_cfg, variant="BIWI")["params"]
    _xt_continuous(tree, "generator/encoder", sd, "generator.encoder",
                   cfg.enc_depth, cfg.dim)
    _xt_token_decoder(tree, "generator/decoder", sd, "generator.decoder.net",
                      cfg.dec_depth, cfg.dim)
    for emb in ("speaker_embeddings", "listener_embeddings"):
        if f"{emb}.weight" in sd:
            _set(tree, f"{emb}/embedding", _t(sd[f"{emb}.weight"]))
    for fc in ("fc_speaker", "fc_listener"):
        if f"{fc}.weight" in sd:
            _dense(tree, fc, sd, fc)
    return _finish(tree, params_template)
