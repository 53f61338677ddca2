"""Checkpointing (L0): orbax save/load with the reference's semantics.

Parity targets (``/root/reference/code/base/baseTrainer.py:26-60``):

* ``save_checkpoint`` - strips frozen ``autoencoder.*`` keys for stage-2
  models (:35-38); here ``drop_prefixes`` generalises that,
* ``load_state_dict`` with partial-load / legacy key renames
  (finetune_s2s_pretrain.py:50-57 - handled by utils.torch_import for torch
  files; orbax trees restore structurally),
* best-val gating lives in the entry scripts (train_vq.py:165-170), mirrored
  by ``CheckpointManager(best_mode=...)``.

Also: ``load_torch_checkpoint`` reads the reference's ``model.pth.tar``
(a torch pickle with ``{'state_dict': ...}``) so reference-trained weights
can be imported without torch GPU.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Iterable, Optional

import jax
import numpy as np


def _strip(tree: Dict, prefixes: Iterable[str]) -> Dict:
    return {k: v for k, v in tree.items()
            if not any(k.startswith(p) for p in prefixes)}


def save_checkpoint(params: Any, save_dir: str, step: int = 0,
                    drop_prefixes: Iterable[str] = (),
                    extra: Optional[Dict] = None) -> str:
    """Save a param pytree with orbax; returns the checkpoint path."""
    import orbax.checkpoint as ocp

    save_dir = os.path.abspath(save_dir)
    os.makedirs(save_dir, exist_ok=True)
    if drop_prefixes:
        params = dict(params)
        for p in list(drop_prefixes):
            params.pop(p.rstrip("/"), None)
    ckptr = ocp.StandardCheckpointer()
    path = os.path.join(save_dir, f"step_{step}")
    payload = {"params": params}
    if extra:
        payload.update(extra)
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str, target: Optional[Any] = None) -> Dict:
    """Restore an orbax checkpoint (optionally into a target structure)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        return ckptr.restore(os.path.abspath(path), target=target)
    return ckptr.restore(os.path.abspath(path))


def partial_load(params: Dict, loaded: Dict, allow_missing: bool = True) -> Dict:
    """Graft ``loaded`` subtrees into ``params`` by top-level key.

    Mirrors the reference loading pretrained VQ weights into SLM submodules
    (seq2seq_pretrain.py:92-93): keys present in both are replaced, others
    keep their fresh initialisation.
    """
    out = dict(params)
    for k, v in loaded.items():
        if k in out:
            out[k] = v
        elif not allow_missing:
            raise KeyError(f"checkpoint key {k} not in params")
    return out


def graft_subtree(params: Dict, path: str, subtree: Any) -> Dict:
    """Replace params[path0][path1]... with ``subtree`` ('/'-separated path)."""
    parts = path.split("/")

    def _rec(node, i):
        node = dict(node)
        if i == len(parts) - 1:
            node[parts[i]] = subtree
        else:
            node[parts[i]] = _rec(node[parts[i]], i + 1)
        return node

    return _rec(params, 0)


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a reference ``model.pth.tar`` into {key: np.ndarray}.

    Uses torch (CPU build is available in this environment) purely as a
    pickle reader; returns plain numpy so the rest of the stack is
    torch-free.
    """
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload.get("state_dict", payload)
    return {k: np.asarray(v.detach().cpu().numpy()) if hasattr(v, "detach") else np.asarray(v)
            for k, v in sd.items()}


class BestCheckpointKeeper:
    """Best-val checkpoint gating (train_vq.py:165-170 semantics)."""

    def __init__(self, save_dir: str, mode: str = "min"):
        self.save_dir = save_dir
        self.mode = mode
        self.best: Optional[float] = None

    def update(self, metric: float, params: Any, step: int,
               drop_prefixes: Iterable[str] = ()) -> bool:
        better = (self.best is None
                  or (self.mode == "min" and metric < self.best)
                  or (self.mode == "max" and metric > self.best))
        if better:
            self.best = metric
            save_checkpoint(params, self.save_dir, step=step,
                            drop_prefixes=drop_prefixes)
        return better
