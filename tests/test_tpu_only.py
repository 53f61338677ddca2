"""Device-side kernel checks - run only when a TPU backend is attached.

The pytest conftest forces the CPU platform, so these are skipped in the
default suite; run directly on hardware with:
    DIM_TPU_RUN_DEVICE_TESTS=1 python -m pytest tests/test_tpu_only.py --no-header
(without the conftest's platform override taking effect, e.g. via
``python -m pytest -p no:cacheprovider`` from an environment where
JAX_PLATFORMS is honored, or by importing and calling ``run_all()``).
"""

import os

import numpy as np
import pytest


def _on_tpu() -> bool:
    import jax

    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not (_on_tpu() and os.environ.get(
    "DIM_TPU_RUN_DEVICE_TESTS")), reason="requires a TPU backend (opt-in)")


def test_flash_attention_matches_dense_on_device():
    import jax
    import jax.numpy as jnp

    from dyadic_interaction_modeling_tpu.ops.pallas.attention import flash_attention

    B, H, L, D = 2, 4, 512, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, L, D))
    k = jax.random.normal(ks[1], (B, H, L, D))
    v = jax.random.normal(ks[2], (B, H, L, D))
    km = jnp.ones((B, L), bool).at[0, 400:].set(False)
    out = flash_attention(q, k, v, key_mask=km, causal=True)
    s = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32) * D ** -0.5
    s = jnp.where(km[:, None, None, :], s, -1e30)
    s = jnp.where(jnp.tril(jnp.ones((L, L), bool))[None, None], s, -1e30)
    ref = jnp.einsum("bhij,bhjd->bhid", jax.nn.softmax(s, -1).astype(v.dtype), v)
    np.testing.assert_allclose(np.asarray(out[:, :, :400]),
                               np.asarray(ref[:, :, :400]), rtol=2e-2, atol=2e-2)


def test_pallas_vq_matches_xla_on_device():
    import jax

    from dyadic_interaction_modeling_tpu.ops.pallas.vq import pallas_nearest_code
    from dyadic_interaction_modeling_tpu.ops.quantizer import nearest_code

    z = jax.random.normal(jax.random.PRNGKey(0), (2048, 128)) * 0.3
    cb = jax.random.normal(jax.random.PRNGKey(1), (512, 128)) * 0.3
    os.environ["DIM_TPU_USE_PALLAS"] = "0"
    ref = np.asarray(nearest_code(z, cb))
    got = np.asarray(pallas_nearest_code(z, cb))
    assert (ref == got).mean() > 0.999


def test_flash_backward_L2048_on_device():
    """Gradients at the reference's enc_max_seq_len=2048
    (seq2seq_pretrain.py:118) - the q-tiled backward's target length."""
    import jax
    import jax.numpy as jnp

    from dyadic_interaction_modeling_tpu.ops.pallas.attention import flash_attention

    B, H, L, D = 1, 2, 2048, 64
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], (B, H, L, D))
    k = jax.random.normal(ks[1], (B, H, L, D))
    v = jax.random.normal(ks[2], (B, H, L, D))
    km = jnp.ones((B, L), bool).at[0, 1900:].set(False)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, key_mask=km, causal=True)
        return jnp.sum(jnp.square(o[:, :, :1900]))

    def loss_dense(q, k, v):
        s = jnp.einsum("bhid,bhjd->bhij", q, k,
                       preferred_element_type=jnp.float32) * D ** -0.5
        s = jnp.where(km[:, None, None, :], s, -1e30)
        s = jnp.where(jnp.tril(jnp.ones((L, L), bool))[None, None], s, -1e30)
        o = jnp.einsum("bhij,bhjd->bhid", jax.nn.softmax(s, -1).astype(v.dtype), v)
        return jnp.sum(jnp.square(o[:, :, :1900]))

    gf = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    gd = jax.jit(jax.grad(loss_dense, argnums=(0, 1, 2)))(q, k, v)
    for name, a, b in zip("qkv", gf, gd):
        # device matmuls accumulate bf16 on the dense path; compare loosely
        na, nb = np.asarray(jnp.sum(jnp.abs(a - b))), np.asarray(jnp.sum(jnp.abs(b)))
        assert na / max(float(nb), 1e-9) < 2e-2, (name, float(na), float(nb))


def test_decode_attention_kernel_on_device():
    """Compiled decode_attention (ops/pallas/decode.py) vs the dense step
    math on the chip: prefix-bounded self case, masked multi-query cross
    case, and the full production generate path kernel-on vs kernel-off."""
    import jax
    import jax.numpy as jnp

    from dyadic_interaction_modeling_tpu.ops.pallas.decode import decode_attention
    from tests.test_decode_kernel import dense_reference

    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (24, 1, 64), jnp.bfloat16)
    k = jax.random.normal(ks[1], (24, 256, 64), jnp.bfloat16)
    v = jax.random.normal(ks[2], (24, 256, 64), jnp.bfloat16)
    for t in (0, 97, 255):
        out = decode_attention(q, k, v, jnp.int32(t), scale=0.125, block_k=64)
        ref = dense_reference(q, k, v, t=t, scale=0.125)
        np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                                   np.asarray(ref), rtol=2e-2, atol=2e-2)
    q10 = jax.random.normal(ks[0], (24, 10, 64), jnp.bfloat16)
    mask = jax.random.bernoulli(jax.random.PRNGKey(5), 0.8, (24, 256))
    mask = mask.at[:, 0].set(True)
    out = decode_attention(q10, k, v, key_mask=mask, scale=0.125)
    ref = dense_reference(q10, k, v, key_mask=mask, scale=0.125)
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_decode_step_kernel_on_equals_off_on_device():
    """Teacher-forced decode_step logits must match with the decode kernel
    enabled and disabled (models/xtrans.py dispatch) - stepwise comparison,
    so a single numerical near-tie cannot cascade like free-running greedy."""
    import jax
    import jax.numpy as jnp

    from dyadic_interaction_modeling_tpu.models.xtrans import (
        TokenDecoder,
        init_decoder_cache,
    )

    dec = TokenDecoder(num_tokens=64, dim=128, max_seq_len=160, depth=2,
                       heads=2)
    ctx = jax.random.normal(jax.random.PRNGKey(0), (2, 150, 128))
    toks = jax.random.randint(jax.random.PRNGKey(3), (2, 40), 0, 64)
    params = dec.init(jax.random.PRNGKey(1), toks[:, :1], ctx)
    mask = jnp.ones((2, 150), dtype=bool).at[1, 100:].set(False)

    def run():
        cross_kv = dec.apply(params, ctx, method=TokenDecoder.cross_kv)
        cache = init_decoder_cache(2, 160, dec.depth, dec.heads)
        outs = []
        step = jax.jit(lambda tok, cache, t: dec.apply(
            params, tok, cache, t, cross_kv, mask,
            method=TokenDecoder.decode_step))
        for t in range(40):
            logits, cache = step(toks[:, t: t + 1], cache, jnp.int32(t))
            outs.append(logits)
        return np.asarray(jnp.stack(outs))

    from dyadic_interaction_modeling_tpu.models.xtrans import (
        reset_decode_kernel_mode,
    )

    os.environ["DIM_TPU_DECODE_KERNEL"] = "0"
    reset_decode_kernel_mode()
    off = run()
    os.environ["DIM_TPU_DECODE_KERNEL"] = "1"
    reset_decode_kernel_mode()
    on = run()
    os.environ.pop("DIM_TPU_DECODE_KERNEL", None)
    reset_decode_kernel_mode()
    np.testing.assert_allclose(on, off, rtol=2e-2, atol=2e-2)


def run_all():
    """Manual device-test entry (bypasses pytest/conftest)."""
    os.environ["DIM_TPU_RUN_DEVICE_TESTS"] = "1"
    test_flash_attention_matches_dense_on_device()
    test_pallas_vq_matches_xla_on_device()
    test_flash_backward_L2048_on_device()
    test_decode_attention_kernel_on_device()
    test_decode_step_kernel_on_equals_off_on_device()
    print("device tests OK")
