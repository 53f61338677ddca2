"""Model registry (L3).

Parity target: ``get_model`` in ``/root/reference/code/models/__init__.py``:
dispatches on ``cfg.arch`` to the stage-1 VQ-VAEs / stage-2 CodeTalker.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import CfgNode
from .vq_vae import VQAutoEncoder, VQSpeakerAutoEncoder, TransformerEncoder, TransformerDecoder

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def get_model(cfg: CfgNode):
    """Build the flax module named by ``cfg.arch``."""
    dtype = _DTYPES[cfg.get_or("dtype", "float32")]
    arch = cfg.arch
    if arch == "stage1_BIWI":
        return VQAutoEncoder(cfg, variant="BIWI", dtype=dtype)
    if arch == "stage1_vocaset":
        return VQAutoEncoder(cfg, variant="vocaset", dtype=dtype)
    if arch in ("stage1_speaker_BIWI", "stage1_BIWI_speaker"):
        return VQSpeakerAutoEncoder(cfg, dtype=dtype)
    if arch == "stage2":
        from .codetalker import CodeTalker

        return CodeTalker(cfg, dtype=dtype)
    raise ValueError(f"unknown arch: {arch}")


__all__ = [
    "get_model",
    "VQAutoEncoder",
    "VQSpeakerAutoEncoder",
    "TransformerEncoder",
    "TransformerDecoder",
]
