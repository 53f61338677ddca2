"""Pallas flash attention vs dense XLA reference (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dyadic_interaction_modeling_tpu.ops.pallas.attention as FA


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    """Run pallas kernels in interpreter mode on CPU."""
    from jax.experimental import pallas as pl

    real_call = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return real_call(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp_call)
    yield


def dense_reference(q, k, v, key_mask=None, causal=False, scale=None):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    scale = d ** -0.5 if scale is None else scale
    s = jnp.einsum("bhid,bhjd->bhij", q, k).astype(jnp.float32) * scale
    if key_mask is not None:
        s = jnp.where(key_mask[:, None, None, :], s, -1e30)
    if causal:
        cm = jnp.tril(jnp.ones((lq, lk), bool))
        s = jnp.where(cm[None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", p.astype(v.dtype), v)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("shape", [(2, 4, 64, 64), (1, 2, 100, 48)])
def test_flash_forward_matches_dense(causal, shape):
    b, h, l, d = shape
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], shape)
    k = jax.random.normal(ks[1], shape)
    v = jax.random.normal(ks[2], shape)
    key_mask = jnp.ones((b, l), bool).at[0, l // 2:].set(False)
    out = FA.flash_attention(q, k, v, key_mask=key_mask, causal=causal)
    ref = dense_reference(q, k, v, key_mask=key_mask, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_gradients_match_dense():
    b, h, l, d = 1, 2, 64, 64
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (b, h, l, d))
    k = jax.random.normal(ks[1], (b, h, l, d))
    v = jax.random.normal(ks[2], (b, h, l, d))
    key_mask = jnp.ones((b, l), bool).at[0, 50:].set(False)

    def loss_flash(q, k, v):
        o = FA.flash_attention(q, k, v, key_mask=key_mask, causal=True)
        # only valid positions contribute (padded query rows are undefined)
        return jnp.sum(jnp.square(o[:, :, :50]))

    def loss_dense(q, k, v):
        o = dense_reference(q, k, v, key_mask=key_mask, causal=True)
        return jnp.sum(jnp.square(o[:, :, :50]))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-4)


def test_flash_gradients_match_dense_multitile():
    """Multiple query tiles (L > TQ=128) exercise the tiled backward's
    dk/dv accumulation across grid steps."""
    b, h, l, d = 1, 1, 320, 64  # 3 query tiles after padding to 384
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks[0], (b, h, l, d))
    k = jax.random.normal(ks[1], (b, h, l, d))
    v = jax.random.normal(ks[2], (b, h, l, d))
    key_mask = jnp.ones((b, l), bool).at[0, 300:].set(False)

    def loss_flash(q, k, v):
        o = FA.flash_attention(q, k, v, key_mask=key_mask, causal=True)
        return jnp.sum(jnp.square(o[:, :, :300]))

    def loss_dense(q, k, v):
        o = dense_reference(q, k, v, key_mask=key_mask, causal=True)
        return jnp.sum(jnp.square(o[:, :, :300]))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-4)
