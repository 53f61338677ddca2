"""Shared CLI plumbing (reference: base/utilities.get_parser, utilities.py:11-21)."""

from __future__ import annotations

import argparse
from typing import Optional, Sequence

from ..config import CfgNode, load_cfg_from_cfg_file, merge_cfg_from_list
from ..utils.compilation_cache import enable_persistent_cache
from ..utils.logging import get_logger


def get_parser(description: str = " ", default_config: Optional[str] = None
               ) -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument("--config", type=str, default=default_config,
                        help="config file")
    parser.add_argument("--synthetic", action="store_true",
                        help="run on synthetic data (smoke test / demo)")
    parser.add_argument("--epochs", type=int, default=None,
                        help="override epoch count")
    parser.add_argument("--save-path", type=str, default=None)
    parser.add_argument("--weight", type=str, default=None,
                        help="checkpoint to load")
    parser.add_argument("--prefetch", type=int, default=0,
                        help="background-thread batch prefetch depth "
                             "(data.loader.PrefetchLoader; 0 = off)")
    parser.add_argument("--mesh", type=str, default=None,
                        help="multi-device training layout: 'auto' (DP over "
                             "all devices), 'data=N', 'data=N,model=K' "
                             "(DP x tensor parallel), 'fsdp[=N]' "
                             "(params+moments sharded). Math-preserving; "
                             "see parallel.MeshPlan")
    parser.add_argument("opts", help="KEY VALUE overrides", default=None,
                        nargs=argparse.REMAINDER)
    return parser


def load_config(args, defaults_fn) -> CfgNode:
    cfg = load_cfg_from_cfg_file(args.config) if args.config else defaults_fn()
    base = defaults_fn()
    for k, v in base.items():  # fill any keys the YAML doesn't provide
        cfg.setdefault(k, v)
    if args.opts:
        cfg = merge_cfg_from_list(cfg, args.opts)
    if args.epochs is not None:
        cfg.epochs = args.epochs
    return cfg


def setup(args=None):
    import os

    plat = os.environ.get("DIM_TPU_PLATFORM")
    if plat:  # the axon plugin ignores JAX_PLATFORMS; force via config
        import jax

        jax.config.update("jax_platforms", plat)
    enable_persistent_cache()
    return get_logger()


def vq_cfg_for(slm_cfg, synthetic: bool = False) -> CfgNode:
    """VQ config consistent with an SLM config: the decoder predicts VQ code
    indices, so n_embed must equal num_tokens. With --synthetic, the VQ is
    shrunk proportionally to the (possibly tiny) SLM dims for smoke runs."""
    from ..config import vq_listener_defaults

    vq = vq_listener_defaults()
    vq.n_embed = slm_cfg.num_tokens
    if synthetic and slm_cfg.dim < 128:
        vq.update(dict(hidden_size=max(32, slm_cfg.dim),
                       num_hidden_layers=1, num_attention_heads=2,
                       intermediate_size=2 * max(32, slm_cfg.dim),
                       zquant_dim=32))
    return vq


def load_torch_slm_params(path: str, params_template, slm_cfg, vq_cfg,
                          variant: str = "slmft"):
    """Load a reference-format SLM-family ``.pt`` (torch state_dict, e.g.
    ``best_vico_causal.pt`` / ``best_model_candor_pretrain*.pt`` /
    ``best_model_biwi_finetune*.pt``) into flax params.

    Handles ``{'state_dict': ...}`` wrappers, the DataParallel ``module.``
    prefix and gamma/beta legacy renames (finetune_s2s_pretrain.py:50-57).
    """
    import torch

    from ..utils.torch_import import torch_slm_to_flax

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return torch_slm_to_flax(sd, slm_cfg, vq_cfg, variant=variant,
                             params_template=params_template)["params"]
