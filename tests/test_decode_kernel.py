"""decode_attention Pallas kernel vs dense reference (interpret mode on CPU).

Device-side (compiled) coverage lives in tests/test_tpu_only.py; here the
kernel runs through the Pallas interpreter so the math - online softmax over
kv blocks, prefix bounding via the scalar-prefetched step index, key masking,
multi-query (grouped best-of-N) rows, and padding removal - is checked on
the CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dyadic_interaction_modeling_tpu.ops.pallas.decode import decode_attention


def dense_reference(q, k, v, t=None, key_mask=None, *, scale):
    """Plain masked attention, fp32, with the XLA path's NaN guard."""
    s = jnp.einsum("rnd,rld->rnl", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    l = k.shape[1]
    keep = jnp.ones((1, 1, l), dtype=bool)
    if t is not None:
        keep = keep & (jnp.arange(l)[None, None, :] <= t)
    if key_mask is not None:
        keep = keep & key_mask[:, None, :]
    s = jnp.where(keep, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where(jnp.isfinite(s).any(axis=-1, keepdims=True), p, 0.0)
    return jnp.einsum("rnl,rld->rnd", p, v.astype(jnp.float32))


def _mk(bh, l, d, nq=1, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (bh, nq, d))
    k = jax.random.normal(ks[1], (bh, l, d))
    v = jax.random.normal(ks[2], (bh, l, d))
    return q, k, v


@pytest.mark.parametrize("t", [0, 1, 63, 64, 127, 200, 255])
def test_bounded_prefix_matches_dense(t):
    q, k, v = _mk(8, 256, 64)
    out = decode_attention(q, k, v, jnp.int32(t), scale=0.125, interpret=True)
    ref = dense_reference(q, k, v, t=t, scale=0.125)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_unbounded_with_key_mask_matches_dense():
    q, k, v = _mk(16, 200, 64, seed=1)  # L=200: exercises kv-block padding
    mask = jax.random.bernoulli(jax.random.PRNGKey(3), 0.7, (16, 200))
    mask = mask.at[:, 0].set(True)  # no fully-masked rows here
    out = decode_attention(q, k, v, key_mask=mask, scale=0.2, interpret=True)
    ref = dense_reference(q, k, v, key_mask=mask, scale=0.2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fully_masked_row_returns_zero():
    q, k, v = _mk(8, 128, 64, seed=2)
    mask = jnp.ones((8, 128), dtype=bool).at[3].set(False)
    out = decode_attention(q, k, v, key_mask=mask, scale=0.1, interpret=True)
    ref = dense_reference(q, k, v, key_mask=mask, scale=0.1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    assert np.abs(np.asarray(out)[3]).max() == 0.0


@pytest.mark.parametrize("nq", [2, 10])
def test_multi_query_rows(nq):
    """Grouped best-of-N: NQ sampled queries share one cache row."""
    q, k, v = _mk(12, 192, 64, nq=nq, seed=4)
    mask = jax.random.bernoulli(jax.random.PRNGKey(5), 0.8, (12, 192))
    mask = mask.at[:, 0].set(True)
    out = decode_attention(q, k, v, key_mask=mask, scale=0.125, interpret=True)
    ref = dense_reference(q, k, v, key_mask=mask, scale=0.125)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_row_padding_and_bounded_plus_mask():
    """BH not a multiple of the row block; t and key_mask combined."""
    q, k, v = _mk(5, 96, 48, seed=6)  # D=48 exercises lane padding too
    mask = jnp.ones((5, 96), dtype=bool).at[:, 40:].set(False)
    out = decode_attention(q, k, v, jnp.int32(70), key_mask=mask,
                           scale=0.15, interpret=True)
    ref = dense_reference(q, k, v, t=70, key_mask=mask, scale=0.15)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_bf16_inputs():
    q, k, v = _mk(8, 128, 64, seed=7)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    out = decode_attention(qb, kb, vb, jnp.int32(100), scale=0.125,
                           interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = dense_reference(qb.astype(jnp.float32), kb.astype(jnp.float32),
                          vb.astype(jnp.float32), t=100, scale=0.125)
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(ref), rtol=2e-2, atol=2e-2)
