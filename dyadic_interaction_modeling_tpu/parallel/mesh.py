"""Device mesh + sharding helpers (replaces the reference's NCCL DDP stack).

The reference's entire parallelism story is data parallelism over NCCL:
``mp.spawn`` + ``dist.init_process_group('nccl')`` + DDP gradient all-reduce
(``/root/reference/code/train_vq.py:42-102``), ``nn.DataParallel``
single-process scatter/gather (``train_s2s_pretrain.py:42``), and
rank helpers (``code/Pirender/util/distributed.py:6-88``).

TPU-native equivalent: one ``jax.sharding.Mesh`` with a ``data`` axis
(extensible with a ``model`` axis for tensor parallelism of the wide decoder);
batches are sharded with ``NamedSharding(P('data'))``, parameters replicated,
and the gradient all-reduce happens INSIDE the jitted step as an XLA
collective over ICI - there is no user-visible communication code. Multi-host
setup is ``jax.distributed.initialize()`` (no rendezvous URL needed: the TPU
runtime coordinates), and ``is_master`` is ``jax.process_index() == 0``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host init (call once per host BEFORE any device use).

    Replaces ``dist.init_process_group`` (train_vq.py:61). On TPU pods the
    runtime self-coordinates (no arguments needed); explicit arguments are
    for CPU/GPU process groups - exercised by
    tests/test_distributed_multiprocess.py (2-process Gloo psum).

    NOTE: must not query ``jax.process_count()`` before initializing - that
    would initialize the local backend first and make
    ``jax.distributed.initialize`` fail.
    """
    if coordinator_address is None:
        return  # single host, or a TPU pod runtime that self-initializes
    try:
        from jax._src import distributed as _dist

        if getattr(_dist.global_state, "client", None) is not None:
            return  # already initialized
    except ImportError:  # private module moved; fall through to try/except
        pass
    try:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)
    except RuntimeError as e:
        if "already" not in str(e):
            raise


def is_master() -> bool:
    return jax.process_index() == 0


def make_mesh(axes: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    """Build a mesh over all (or given) devices.

    Default: 1-D ``data`` mesh over every addressable device. Pass
    ``axes=('data','model'), shape=(n, m)`` for a 2-D DP x TP layout -
    keep ``model`` innermost so tensor-parallel collectives ride ICI
    neighbours.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = [len(devices)] + [1] * (len(axes) - 1)
    devices = devices.reshape(shape)
    return Mesh(devices, axis_names=tuple(axes))


def data_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """NamedSharding that splits dim 0 (batch) over the data axis."""
    spec = [None] * ndim
    spec[0] = axis
    return NamedSharding(mesh, P(*spec))


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place every array in a pytree with its batch dim sharded."""

    def _put(x):
        return jax.device_put(x, data_sharding(mesh, np.ndim(x), axis))

    return jax.tree_util.tree_map(_put, batch)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (parameters / optimizer state) on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


# Megatron-style pairing: column-parallel kernels shard their OUTPUT dim,
# the matching row-parallel kernels shard their INPUT (contraction) dim, so
# the activation between them stays sharded on 'model' and the only
# collective is one all-reduce after the row matmul (inserted by GSPMD).
# Round 2 sharded only ff/logits outputs, leaving attention + the w2
# contraction replicated - GSPMD bounced layouts mid-layer ("Involuntary full
# rematerialization" warnings in MULTICHIP_r02.json).
_TP_COLUMN = ("to_q/", "to_k/", "to_v/", "w1/", "to_logits/")
_TP_ROW = ("to_out/", "w2/")


def tp_param_spec(path, leaf, model_axis_size: int, min_width: int = 64) -> P:
    """Tensor-parallel sharding rule for the SLM-family transformer stacks
    (models/xtrans.py): attention q/k/v + ff up + logits column-parallel,
    attention out + ff down row-parallel; everything else replicated.
    """
    names = "/".join(str(getattr(p, "key", "")) for p in path)
    if leaf.ndim != 2:
        return P()
    if (any(s in names for s in _TP_COLUMN)
            and leaf.shape[-1] % model_axis_size == 0
            and leaf.shape[-1] >= min_width):
        return P(None, "model")
    if (any(s in names for s in _TP_ROW)
            and leaf.shape[0] % model_axis_size == 0
            and leaf.shape[0] >= min_width):
        return P("model", None)
    return P()


def tp_param_shardings(mesh: Mesh, params, model_axis_size: int):
    """NamedShardings for a params pytree under ``tp_param_spec``."""
    return jax.tree_util.tree_map_with_path(
        lambda p, x: NamedSharding(mesh, tp_param_spec(p, x, model_axis_size)),
        params)


def fsdp_param_spec(leaf, data_axis_size: int, axis: str = "data",
                    min_size: int = 16384) -> P:
    """ZeRO-3 / FSDP-style parameter sharding rule.

    Shards each sufficiently large parameter over the DATA axis on its
    largest evenly-divisible dimension; small tensors stay replicated (an
    all-gather of a tiny tensor costs more than it saves). With the batch
    sharded over the same axis, GSPMD all-gathers each parameter at its use
    sites in the forward/backward and reduce-scatters its gradient -
    per-device parameter/optimizer/gradient memory drops ~axis-fold for the
    sharded tensors. The reference has no equivalent (DDP replicates
    everything); this extends the mesh story beyond its DP ceiling for
    models that outgrow one chip's HBM.
    """
    if leaf.size < min_size:
        return P()
    # Prefer dim 0: for flax Dense kernels (in, out) that is the CONTRACTION
    # dim, so the use-site matmul consumes the shard and the activation comes
    # out batch-sharded only. Sharding the OUTPUT dim instead propagates a
    # feature-dim sharding into the attention head reshapes and GSPMD falls
    # back to involuntary rematerialization (seen in the 8-way dryrun).
    dims = [0] + sorted((d for d in range(1, leaf.ndim)),
                        key=lambda d: leaf.shape[d], reverse=True)
    for d in dims:
        if leaf.shape[d] % data_axis_size == 0:
            spec = [None] * leaf.ndim
            spec[d] = axis
            return P(*spec)
    return P()


def fsdp_param_shardings(mesh: Mesh, params, axis: str = "data",
                         min_size: int = 16384):
    """NamedShardings for a params pytree under ``fsdp_param_spec``.

    Shard the optimizer state to match by re-initialising it under jit with
    the sharded params as input - GSPMD propagates the sharding to the adam
    moments: ``jax.jit(tx.init)(sharded_params)``.
    """
    n = mesh.shape[axis]
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, fsdp_param_spec(x, n, axis, min_size)),
        params)
