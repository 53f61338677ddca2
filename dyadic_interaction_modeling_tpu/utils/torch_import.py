"""PyTorch-checkpoint import: reference state_dicts -> flax param pytrees.

The reference saves ``{'state_dict': weights}`` via ``save_checkpoint``
(``/root/reference/code/base/baseTrainer.py:26-42``). This module maps those
keys onto our flax module trees so reference-trained VQ-VAE / SLM weights run
on TPU unchanged, which is how metric parity is validated (BASELINE.md).

Also handles the legacy gamma/beta -> weight/bias renames the reference
performs on load (finetune_s2s_pretrain.py:50-57).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _t(x) -> np.ndarray:
    """torch tensor -> numpy array (works on plain numpy too)."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


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
    """Reference VQAutoEncoder state_dict -> flax params for models.vq_vae.VQAutoEncoder."""
    sd = normalize_legacy_keys(state_dict)
    tree: Dict = {}
    biwi = variant == "BIWI"
    _vq_encoder(tree, sd, cfg, post=biwi)
    _vq_decoder(tree, sd, cfg, pre=biwi, out_bias=not biwi)
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
