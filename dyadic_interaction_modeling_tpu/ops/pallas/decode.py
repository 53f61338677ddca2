"""Fused single-step decode attention (the KV-cache-bandwidth hot loop).

The SLMFT/ListenerGenerator AR decode (models/xtrans.py ``decode_step``) is
HBM-bound on reading the self-attention KV cache and the cross-attention
context K/V every generated token (PERF.md: cross ~712 ms + self ~401 ms of
the 1075 ms 255-step scan at B=256 bf16, both well under the v5e roofline on
the XLA path). This kernel streams K/V through VMEM at DMA-friendly block
sizes and, for the causal self-attention case, reads ONLY the live prefix of
the cache:

* grid = (row blocks, kv blocks); rows are independent (batch x heads), kv
  blocks accumulate into an online-softmax VMEM scratch (the TPU grid is a
  sequential loop per core, so scratch persists across the kv dimension),
* the current step ``t`` is a scalar-prefetch argument; kv blocks past the
  live prefix are CLAMPED to the last valid block in the index_map - the
  pipeline never refetches a repeated block, so HBM traffic is
  ``ceil((t+1)/BK)`` blocks instead of ``Lmax/BK`` - and their compute is
  skipped with ``pl.when``,
* ``nq`` query rows share each cache row: best-of-N sampling attends N
  sampled queries against ONE context read (models/xtrans.py
  ``step_cross(groups=N)``), turning the kv-block matmul from a GEMV into a
  real MXU tile.

Replaces the per-token attention of x-transformers ``.generate``
(/root/reference/code/seq2seq_pretrain.py:450) - the reference re-runs a
full forward per token; here one fused read of the live prefix per step.

Dispatch: ``decode_attention_available()`` + ``DIM_TPU_DECODE_KERNEL=0`` to
disable (mirrors the flash-attention gating in models/xtrans.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG = -1e30


def decode_attention_available() -> bool:
    import os

    if os.environ.get("DIM_TPU_DECODE_KERNEL", "1") == "0":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend probing
        return False


def _kernel(t_ref, q_ref, k_ref, v_ref, mask_ref, o_ref,
            acc_ref, m_ref, l_ref, *, scale, bk, rows, has_mask):
    from jax.experimental import pallas as pl

    j = pl.program_id(1)
    num_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG)
        l_ref[...] = jnp.zeros_like(l_ref)

    n_valid = (t_ref[0] // bk) + 1  # blocks with at least one live key
    nq = q_ref.shape[1]
    dp = q_ref.shape[2]
    rq = rows * nq      # query rows in the fused matmul
    rk = rows * bk      # key columns in the fused matmul

    @pl.when(j < n_valid)
    def _compute():
        # Block-diagonal batching: each cache row's keys occupy their own
        # BK-column stripe of ONE (RQ, R*BK) score matrix, so the whole block
        # is two MXU matmuls instead of `rows` serialized GEMVs (which are
        # issue-latency bound). Off-diagonal stripes are masked to NEG before
        # the softmax, so their probabilities are exactly 0 and contribute
        # nothing to the P @ V matmul - the extra MXU work is free, the loop
        # is HBM-bound.
        q2 = q_ref[...].reshape(rq, dp).astype(jnp.float32)
        k2 = k_ref[...].reshape(rk, dp).astype(jnp.float32)
        s = jax.lax.dot_general(q2, k2, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        qrow = jax.lax.broadcasted_iota(jnp.int32, (rq, rk), 0)
        kcol = jax.lax.broadcasted_iota(jnp.int32, (rq, rk), 1)
        keep = (kcol // bk) == (qrow // nq)          # block-diagonal stripes
        col = j * bk + kcol % bk                     # global key position
        keep = keep & (col <= t_ref[0])  # prefix bound + zero-padded tail
        if has_mask:
            mask_flat = mask_ref[...].reshape(1, rk)
            keep = keep & (mask_flat != 0)           # row-matched on-diagonal
        s = jnp.where(keep, s, NEG)
        m_prev = m_ref[...].reshape(rq, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)                       # (RQ, R*BK)
        # fully-masked rows must produce 0 (matching the dense path's NaN
        # guard), not uniform weights over the masked keys
        p = jnp.where(keep, p, 0.0)
        l_new = (l_ref[...].reshape(rq, 1) * alpha
                 + jnp.sum(p, axis=1, keepdims=True))
        v2 = v_ref[...].reshape(rk, dp).astype(jnp.float32)
        pv = jax.lax.dot_general(p, v2, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_ref[...] = (acc_ref[...].reshape(rq, dp) * alpha
                        + pv).reshape(rows, nq, dp)
        m_ref[...] = m_new.reshape(rows, nq, 1)
        l_ref[...] = l_new.reshape(rows, nq, 1)

    @pl.when(j == num_j - 1)
    def _finalize():
        o_ref[...] = (acc_ref[...] / jnp.maximum(l_ref[...], 1e-30)
                      ).astype(o_ref.dtype)


def _pad_axis(x, m, axis):
    pad = -x.shape[axis] % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("scale", "block_k", "rows",
                                             "interpret"))
def decode_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    t: Optional[jax.Array] = None,
    key_mask: Optional[jax.Array] = None,
    *,
    scale: float,
    block_k: int = 128,
    rows: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Single-step attention of ``nq`` queries per row against a KV cache.

    q: (BH, NQ, D); k, v: (BH, L, D); t: scalar int32 - attend only to
    positions ``<= t`` (causal decode; ``None`` attends to all L);
    key_mask: (BH, L) padding mask (True/nonzero = attend). Returns
    (BH, NQ, D) in q's dtype. Rows are (batch x heads) flattened.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, nq, d = q.shape
    l = k.shape[1]
    bounded = t is not None
    has_mask = key_mask is not None

    qp = _pad_axis(_pad_axis(q, 128, 2), rows, 0)
    kp = _pad_axis(_pad_axis(_pad_axis(k, 128, 2), block_k, 1), rows, 0)
    vp = _pad_axis(_pad_axis(_pad_axis(v, 128, 2), block_k, 1), rows, 0)
    bhp, lp, dp = kp.shape[0], kp.shape[1], kp.shape[2]
    num_j = lp // block_k

    if has_mask:
        # int32: Mosaic cannot sublane-broadcast int8 loads (same convention
        # as ops/pallas/attention.py)
        maskp = _pad_axis(_pad_axis(key_mask.astype(jnp.int32), block_k, 1),
                          rows, 0)
    else:
        # 1-wide dummy so the kernel arity is static
        maskp = jnp.ones((bhp, 1), dtype=jnp.int32)

    # unbounded (cross) attention is expressed as t = L-1: the kernel's
    # `col <= t` test then only excludes the zero-padded tail keys
    t_arr = jnp.full((1,), t if bounded else l - 1, dtype=jnp.int32)

    def kv_index(i, j, t_ref):
        # clamp dead blocks to the last live one: the pipeline skips the
        # refetch for a repeated block index, so no HBM traffic is spent
        jj = jnp.minimum(j, t_ref[0] // block_k)
        return (i, jj, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bhp // rows, num_j),
        in_specs=[
            pl.BlockSpec((rows, nq, dp), lambda i, j, t_ref: (i, 0, 0)),
            pl.BlockSpec((rows, block_k, dp), kv_index),
            pl.BlockSpec((rows, block_k, dp), kv_index),
            pl.BlockSpec((rows, block_k if has_mask else 1),
                         (lambda i, j, t_ref: (i, jnp.minimum(
                             j, t_ref[0] // block_k))) if has_mask
                         else (lambda i, j, t_ref: (i, 0))),
        ],
        out_specs=pl.BlockSpec((rows, nq, dp), lambda i, j, t_ref: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((rows, nq, dp), jnp.float32),   # acc
            pltpu.VMEM((rows, nq, 1), jnp.float32),    # running max
            pltpu.VMEM((rows, nq, 1), jnp.float32),    # running denom
        ],
    )

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, bk=block_k, rows=rows,
                          has_mask=has_mask),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bhp, nq, dp), q.dtype),
        interpret=interpret,
    )(t_arr, qp, kp, vp, maskp)
    return out[:bh, :, :d]
