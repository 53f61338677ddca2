import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dyadic_interaction_modeling_tpu.ops import (
    ConvExpander,
    ConvSquasher,
    PositionalEncoding,
    PeriodicPositionalEncoding,
    Transformer,
    VectorQuantizer,
    enc_dec_mask,
    init_biased_mask,
    instance_norm_1d,
    vq_quantize,
)
from dyadic_interaction_modeling_tpu.ops.positional import length_mask, causal_mask
from dyadic_interaction_modeling_tpu.ops.transformer import Attention, MLP


def test_attention_shapes_and_mask():
    attn = Attention(dim=64, heads=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 64))
    params = attn.init(jax.random.PRNGKey(1), x)
    y = attn.apply(params, x)
    assert y.shape == (2, 10, 64)
    # causal mask: output at t must not depend on inputs > t
    m = causal_mask(10)
    y_masked = attn.apply(params, x, m)
    x2 = x.at[:, 5:].set(0.0)
    y2 = attn.apply(params, x2, m)
    np.testing.assert_allclose(np.asarray(y_masked[:, :5]), np.asarray(y2[:, :5]),
                               rtol=1e-5, atol=1e-5)


def test_transformer_stack():
    tr = Transformer(hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
                     intermediate_size=128)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 7, 64))
    params = tr.init(jax.random.PRNGKey(1), x)
    y = tr.apply(params, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_positional_encoding_batch_axis_quirk():
    """The reference adds PE indexed by *batch position* (base_models.py:271)."""
    pe = PositionalEncoding(d_model=8, dropout=0.0)
    x = jnp.zeros((3, 5, 8))
    y = pe.apply({}, x)
    # every frame within a sample is identical
    np.testing.assert_allclose(np.asarray(y[:, 0]), np.asarray(y[:, 4]))
    # but samples differ (batch index 1 gets sin(1 * w) etc.)
    assert not np.allclose(np.asarray(y[0]), np.asarray(y[1]))
    # sample 0 gets position-0 encoding: sin(0)=0, cos(0)=1
    np.testing.assert_allclose(np.asarray(y[0, 0, 0::2]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(y[0, 0, 1::2]), 1.0, atol=1e-7)


def test_periodic_positional_encoding_tiles():
    ppe = PeriodicPositionalEncoding(d_model=8, period=4, max_seq_len=16, dropout=0.0)
    x = jnp.zeros((1, 12, 8))
    y = ppe.apply({}, x)
    np.testing.assert_allclose(np.asarray(y[0, 0]), np.asarray(y[0, 4]), atol=1e-7)
    np.testing.assert_allclose(np.asarray(y[0, 1]), np.asarray(y[0, 9]), atol=1e-7)


def test_instance_norm_zero_mean_unit_var():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 50, 4)) * 3 + 1
    y = instance_norm_1d(x)
    np.testing.assert_allclose(np.asarray(jnp.mean(y, axis=1)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.var(y, axis=1)), 1.0, atol=1e-3)


def test_conv_squash_expand_shapes():
    for qf in (0, 1, 2):
        sq = ConvSquasher(dim=16, quant_factor=qf)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 16))
        p = sq.init(jax.random.PRNGKey(1), x)
        y = sq.apply(p, x)
        assert y.shape == (2, 32 // (2 ** qf), 16), (qf, y.shape)
        ex = ConvExpander(dim=16, quant_factor=qf)
        pe = ex.init(jax.random.PRNGKey(2), y)
        z = ex.apply(pe, y)
        assert z.shape == (2, 32, 16), (qf, z.shape)


def test_vq_quantize_semantics():
    key = jax.random.PRNGKey(0)
    codebook = jax.random.normal(key, (512, 128))
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 9, 128))
    res = vq_quantize(z, codebook, beta=0.25)
    assert res.z_q.shape == (2, 128, 9)  # B, C, L reference layout
    assert res.indices.shape == (2, 9)
    # quantized vectors are actual codebook rows
    z_q_blc = np.asarray(jnp.transpose(res.z_q, (0, 2, 1)))
    cb = np.asarray(codebook)
    for b in range(2):
        for t in range(9):
            np.testing.assert_allclose(z_q_blc[b, t], cb[res.indices[b, t]],
                                       rtol=1e-6, atol=1e-6)
    # chosen codes are (within fp32 noise) the nearest codes
    d = ((np.asarray(z, np.float64)[:, :, None, :] - cb[None, None].astype(np.float64)) ** 2).sum(-1)
    chosen = np.take_along_axis(d, np.asarray(res.indices)[..., None], axis=-1)[..., 0]
    np.testing.assert_allclose(chosen, d.min(-1), rtol=1e-4, atol=1e-4)
    assert float(res.perplexity) > 1.0


def test_vq_straight_through_gradient():
    codebook = jax.random.normal(jax.random.PRNGKey(0), (16, 8))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 8))

    def f(z):
        res = vq_quantize(z, codebook)
        return jnp.sum(res.z_q)

    g = jax.grad(f)(z)
    # straight-through: d(z_q)/dz == identity => grad of sum is all ones
    np.testing.assert_allclose(np.asarray(g), 1.0, atol=1e-6)


def test_vq_module_init_range():
    vq = VectorQuantizer(n_e=512, e_dim=128)
    params = vq.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 128)))
    emb = np.asarray(params["params"]["embedding"])
    assert emb.min() >= -1.0 / 512 - 1e-6 and emb.max() <= 1.0 / 512 + 1e-6


def test_biased_mask_against_reference_semantics():
    m = np.asarray(init_biased_mask(n_head=4, max_seq_len=12, period=3))
    assert m.shape == (4, 12, 12)
    assert np.isneginf(m[0, 0, 1])  # future masked
    assert m[0, 5, 5] == 0.0  # zero bias on diagonal
    # bias grows with (quantised) distance into the past
    assert m[0, 11, 0] < m[0, 11, 9] <= 0.0


def test_enc_dec_mask():
    m = np.asarray(enc_dec_mask("BIWI", 4, 8))
    for i in range(4):
        assert not m[i, 2 * i] and not m[i, 2 * i + 1]
    assert m.sum() == 4 * 8 - 8
    mv = np.asarray(enc_dec_mask("vocaset", 4, 4))
    assert (~mv).sum() == 4


def test_length_mask():
    m = np.asarray(length_mask(jnp.array([2, 5]), 6))
    assert m[0].tolist() == [True, True, False, False, False, False]
    assert m[1].tolist() == [True] * 5 + [False]


def test_audio_embedding_and_crossmodal_layer():
    from dyadic_interaction_modeling_tpu.ops.transformer import AudioEmbedding, CrossModalLayer

    ae = AudioEmbedding(size=16, dim=8, quant_factor=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 64))  # (B, C, L)
    p = ae.init(jax.random.PRNGKey(1), x)
    y = ae.apply(p, x)
    assert y.shape == (2, 8, 8)  # L: 64 /4 /2 = 8; C -> dim

    cm = CrossModalLayer(in_dim=16, out_dim=5, sequence_length=32)
    a = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 16))
    b = jax.random.normal(jax.random.PRNGKey(3), (2, 6, 16))
    p = cm.init(jax.random.PRNGKey(4), a, b)
    out = cm.apply(p, a, b)
    assert out.shape == (2, 12, 5)


def test_interpolate_pos_embed():
    from dyadic_interaction_modeling_tpu.ops.positional import (
        get_2d_sincos_pos_embed,
        interpolate_pos_embed,
    )

    pe = get_2d_sincos_pos_embed(16, 4, cls_token=True)  # (1+16, 16)
    out = interpolate_pos_embed(pe, 8)
    assert out.shape == (1 + 64, 16)
    np.testing.assert_allclose(out[0], pe[0])  # cls token untouched
