"""CLI-facing mesh plans: ``--mesh SPEC`` -> sharded training.

The reference trains multi-GPU via DDP/``mp.spawn`` (train_vq.py:42-102) or
``nn.DataParallel`` (train_s2s_pretrain.py:42); the TPU equivalent is ONE
process driving a ``jax.sharding.Mesh`` - XLA inserts the gradient
all-reduce (DP), the Megatron TP collectives, or the FSDP
all-gather/reduce-scatter over ICI. ``MeshPlan`` packages the layouts that
``__graft_entry__.dryrun_multichip`` and tests/test_multichip_slmft.py
equivalence-test, so every training CLI can run them with a flag:

* ``--mesh auto``              data-parallel over all visible devices
* ``--mesh data=8``            data-parallel, explicit axis size
* ``--mesh data=4,model=2``    DP x Megatron tensor parallelism
  (``tp_param_spec`` rules; adam moments inherit the param shardings)
* ``--mesh fsdp`` / ``fsdp=8`` ZeRO-3-style: params + moments sharded over
  the data axis (``fsdp_param_spec``), gathered per use

All layouts are math-preserving: the sharded step produces the same
parameters as the single-device step (tests/test_multichip_slmft.py,
tests/test_e2e_pipeline.py).
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Iterator, Optional

import jax
import numpy as np

from .mesh import (
    fsdp_param_shardings,
    make_mesh,
    replicate,
    shard_batch,
    tp_param_shardings,
)


@dataclasses.dataclass
class MeshPlan:
    mesh: object  # jax.sharding.Mesh
    layout: str  # "dp" | "tp" | "fsdp"
    model_par: int = 1

    @property
    def data_par(self) -> int:
        return self.mesh.shape["data"]

    @classmethod
    def parse(cls, spec: Optional[str]) -> Optional["MeshPlan"]:
        """Parse a ``--mesh`` spec; None/'' -> None (single-device)."""
        if not spec:
            return None
        s = spec.strip().lower()
        n_dev = len(jax.devices())
        if s == "auto":
            return cls(make_mesh(("data",), shape=(n_dev,)), "dp")
        if s.startswith("fsdp"):
            n = int(s.split("=", 1)[1]) if "=" in s else n_dev
            _check_devices(n, n_dev, spec)
            return cls(make_mesh(("data",), shape=(n,),
                                 devices=jax.devices()[:n]), "fsdp")
        kv = {}
        for part in s.split(","):
            if "=" not in part:
                raise ValueError(
                    f"bad --mesh spec {spec!r}: expected 'auto', 'fsdp[=N]', "
                    f"'data=N' or 'data=N,model=K'")
            k, v = part.split("=", 1)
            kv[k.strip()] = int(v)
        data = kv.pop("data", None)
        model = kv.pop("model", 1)
        if data is None or kv:
            raise ValueError(
                f"bad --mesh spec {spec!r}: expected 'auto', 'fsdp[=N]', "
                f"'data=N' or 'data=N,model=K'")
        _check_devices(data * model, n_dev, spec)
        devs = jax.devices()[: data * model]
        if model > 1:
            # model innermost: TP collectives ride ICI neighbours
            return cls(make_mesh(("data", "model"), shape=(data, model),
                                 devices=devs), "tp", model)
        return cls(make_mesh(("data",), shape=(data,), devices=devs), "dp")

    def describe(self) -> str:
        ax = " x ".join(f"{k}={v}" for k, v in self.mesh.shape.items())
        return f"{self.layout} mesh ({ax})"

    # --- placement ---

    def shard_state(self, state):
        """Place a TrainState per the layout.

        DP replicates params+moments. TP/FSDP shard the params and
        RE-INITIALIZE the optimizer under jit so the moments inherit the
        param shardings (the CLIs call this on a freshly created state;
        moments are zeros either way)."""
        if self.layout == "dp":
            return state.replace(
                params=replicate(self.mesh, state.params),
                opt_state=replicate(self.mesh, state.opt_state))
        if self.layout == "tp":
            shardings = tp_param_shardings(self.mesh, state.params,
                                           self.model_par)
        else:
            shardings = fsdp_param_shardings(self.mesh, state.params)
        sparams = jax.tree_util.tree_map(jax.device_put, state.params,
                                         shardings)
        return state.replace(params=sparams,
                             opt_state=jax.jit(state.tx.init)(sparams))

    # --- batch feeding ---

    def shard_train_batch(self, batch):
        leaves = jax.tree_util.tree_leaves(batch)
        b = leaves[0].shape[0] if leaves else 0
        if b % self.data_par:
            raise ValueError(
                f"batch size {b} is not divisible by the data axis "
                f"({self.data_par}); pick --batch-size as a multiple")
        return shard_batch(self.mesh, batch)

    def batches(self, it: Iterable) -> Iterator:
        """Wrap a batch iterable so every batch lands data-sharded."""
        for batch in it:
            yield self.shard_train_batch(batch)


def _check_devices(needed: int, have: int, spec: str) -> None:
    if needed > have:
        raise ValueError(
            f"--mesh {spec!r} needs {needed} devices but only {have} are "
            f"visible (for CPU testing set "
            f"XLA_FLAGS=--xla_force_host_platform_device_count=N and force "
            f"the cpu platform before jax initializes)")
