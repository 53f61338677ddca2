"""Fused attention kernels (SURVEY.md section 7.2: "blockwise Pallas
attention ... an optimization").

Forward: grid over (batch*heads, query tiles); per step the query tile and
the FULL key/value rows live in VMEM, scores are one MXU matmul, masking /
softmax run on the VPU, and the (L, L) score matrix never reaches HBM. The
log-sum-exp is saved for the backward pass.

Backward (custom VJP): grid over (batch*heads, query tiles). Each step
recomputes its TQ-row slice of the probability matrix from the saved LSE
(never materializing (L, L)), writes its dq tile, and ACCUMULATES dk/dv into
a full-rows fp32 output block that stays resident in VMEM across the
sequential query-tile loop (the TPU grid is a sequential loop per core, so
revisiting the same output block is the standard accumulation pattern).
VMEM high-water at L=2048, D=128: k+v (2 MB) + dk+dv accumulators (2 MB) +
three TQ x L f32 score buffers (3 MB) + tiles < 9 MB of the ~16 MB budget -
covering the reference's enc_max_seq_len=2048 (seq2seq_pretrain.py:118,
reached as the 2 x 1024-frame concat in SLM's joint encoder).

Supports: causal masking, per-row key masks (padding), arbitrary softmax
scale. Head dims are zero-padded to a multiple of 128 lanes; sequence
lengths to the query-tile size (padded keys are masked, padded query rows
produce garbage that callers mask out downstream, matching the dense path).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG = -1e30
TQ = 128  # query tile


def _pad_to(x, m, axis):
    pad = -x.shape[axis] % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, *, scale, causal):
    from jax.experimental import pallas as pl

    q = q_ref[0]                       # (TQ, Dp)
    k = k_ref[0]                       # (Lp, Dp)
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    keep = mask_ref[0, 0][None, :] != 0
    if causal:
        row = pl.program_id(1) * TQ + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        keep = keep & (col <= row)
    s = jnp.where(keep, s, NEG)
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=1, keepdims=True)
    o = jax.lax.dot_general(e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(jnp.maximum(l, 1e-30))


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref, mask_ref,
                dq_ref, dk_ref, dv_ref, *, scale, causal):
    """One TQ-row query tile; dk/dv accumulate across the (sequential)
    query-tile grid dimension into a VMEM-resident full-rows block."""
    from jax.experimental import pallas as pl

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    q = q_ref[0].astype(jnp.float32)       # (TQ, Dp)
    k = k_ref[0].astype(jnp.float32)       # (Lkp, Dp)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)     # (TQ, Dp)
    o = o_ref[0].astype(jnp.float32)
    lse = lse_ref[0]                       # (TQ, 1)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    keep = mask_ref[0, 0][None, :] != 0
    if causal:
        row = j * TQ + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        keep = keep & (col <= row)
    s = jnp.where(keep, s, NEG)
    p = jnp.exp(s - lse)                   # (TQ, Lkp) prob slice
    dv_ref[0] += jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    delta = jnp.sum(do * o, axis=1, keepdims=True)
    ds = p * (dp - delta) * scale
    dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] += jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)


def _fwd(q, k, v, key_mask, scale, causal):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, lq, d = q.shape
    lk = k.shape[1]
    qp = _pad_to(_pad_to(q, 128, 2), TQ, 1)
    kp = _pad_to(_pad_to(k, 128, 2), TQ, 1)
    vp = _pad_to(_pad_to(v, 128, 2), TQ, 1)
    lqp, dp_ = qp.shape[1], qp.shape[2]
    lkp = kp.shape[1]
    maskp = _pad_to(key_mask.astype(jnp.int32), TQ, 1)[:, None, :]  # (BH, 1, Lkp)

    grid = (bh, lqp // TQ)
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, causal=causal),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TQ, dp_), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lkp, dp_), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lkp, dp_), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lkp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, TQ, dp_), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TQ, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, lqp, dp_), q.dtype),
            jax.ShapeDtypeStruct((bh, lqp, 1), jnp.float32),
        ),
    )(qp, kp, vp, maskp)
    return o[:, :lq, :d], lse[:, :lq, 0]


def _bwd(q, k, v, o, do, lse, key_mask, scale, causal):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, lq, d = q.shape
    lk = k.shape[1]
    qp = _pad_to(_pad_to(q, 128, 2), TQ, 1)
    kp = _pad_to(_pad_to(k, 128, 2), TQ, 1)
    vp = _pad_to(_pad_to(v, 128, 2), TQ, 1)
    op = _pad_to(_pad_to(o, 128, 2), TQ, 1)
    dop = _pad_to(_pad_to(do, 128, 2), TQ, 1)
    lqp, dp_ = qp.shape[1], qp.shape[2]
    lkp = kp.shape[1]
    # padded query rows carry lse=0 but zero q/do/o, so their p row (all
    # ones over valid keys) contributes nothing to dv/dk and their dq is
    # sliced off below.
    lsep = jnp.pad(lse, ((0, 0), (0, lqp - lq)), constant_values=0.0)[:, :, None]
    maskp = _pad_to(key_mask.astype(jnp.int32), TQ, 1)[:, None, :]

    qtile = pl.BlockSpec((1, TQ, dp_), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
    fullk = pl.BlockSpec((1, lkp, dp_), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, causal=causal),
        grid=(bh, lqp // TQ),
        in_specs=[qtile, fullk, fullk, qtile, qtile,
                  pl.BlockSpec((1, TQ, 1), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, lkp), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(qtile, fullk, fullk),
        out_shape=(
            jax.ShapeDtypeStruct((bh, lqp, dp_), q.dtype),
            # fp32 accumulators (cast to input dtype by the VJP wrapper)
            jax.ShapeDtypeStruct((bh, lkp, dp_), jnp.float32),
            jax.ShapeDtypeStruct((bh, lkp, dp_), jnp.float32),
        ),
    )(qp, kp, vp, dop, op, lsep, maskp)
    return dq[:, :lq, :d], dk[:, :lk, :d], dv[:, :lk, :d]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash(q, k, v, key_mask, scale, causal):
    return _fwd(q, k, v, key_mask, scale, causal)[0]


def _flash_fwd(q, k, v, key_mask, scale, causal):
    o, lse = _fwd(q, k, v, key_mask, scale, causal)
    return o, (q, k, v, o, lse, key_mask)


def _flash_bwd(scale, causal, res, g):
    q, k, v, o, lse, key_mask = res
    dq, dk, dv = _bwd(q, k, v, o, g, lse, key_mask, scale, causal)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q, k, v, *, key_mask=None, causal: bool = False,
                    scale: Optional[float] = None):
    """Fused softmax(q k^T * scale) v.

    q: (B, H, Lq, D); k, v: (B, H, Lk, D); key_mask: (B, Lk) bool, True=attend.
    Returns (B, H, Lq, D). Differentiable (custom Pallas VJP); backward
    requires Lq == Lk (self-attention); the q-tiled backward covers
    L <= ~2048 at D <= 128 within the 16 MB VMEM budget.
    """
    b, h, lq, d = q.shape
    lk = k.shape[2]
    scale = d ** -0.5 if scale is None else scale
    if key_mask is None:
        key_mask = jnp.ones((b, lk), dtype=bool)
    km = jnp.repeat(key_mask, h, axis=0)  # (B*H, Lk)
    out = _flash(q.reshape(b * h, lq, d), k.reshape(b * h, lk, d),
                 v.reshape(b * h, lk, d), km, scale, causal)
    return out.reshape(b, h, lq, d)


def flash_available() -> bool:
    try:
        import jax.experimental.pallas  # noqa: F401

        return jax.default_backend() == "tpu"
    except Exception:
        return False
