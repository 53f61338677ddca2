import jax
import jax.numpy as jnp
import numpy as np

from dyadic_interaction_modeling_tpu import config as C
from dyadic_interaction_modeling_tpu.models.listener_generator import (
    ContinuousSeq2Seq,
    ListenerGenerator,
    Seq2SeqTransformer,
    SimpleLSTM,
)
from dyadic_interaction_modeling_tpu.models.xtrans import TokenDecoder, generate_tokens


def _cfgs():
    cfg = C.listener_generator_defaults()
    cfg.update(dict(dim=32, enc_depth=1, enc_heads=2, enc_max_seq_len=64,
                    dec_num_tokens=24, dec_depth=1, dec_heads=2,
                    dec_max_seq_len=64, num_identities=10, id_embed_dim=8))
    vq = C.vq_listener_defaults()
    vq.update(dict(hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
                   intermediate_size=64, zquant_dim=16, n_embed=24))
    return cfg, vq


def test_seq2seq_transformer_with_listener_ids():
    cfg, _ = _cfgs()
    model = Seq2SeqTransformer(cfg, dim_in=16)
    src = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 16))
    tgt = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0, 24)
    mask = jnp.ones((2, 10), dtype=bool)
    lid = jax.random.normal(jax.random.PRNGKey(2), (2, 32))
    params = model.init(jax.random.PRNGKey(3), src, tgt, mask, lid)
    loss, logits = model.apply(params, src, tgt, mask, lid)
    assert np.isfinite(float(loss))
    # leading id token sliced back off (seq2seq.py:67-68)
    assert logits.shape == (2, 9, 24)
    loss2, logits2 = model.apply(params, src, tgt, mask)
    assert logits2.shape == (2, 9, 24)


def test_continuous_seq2seq():
    cfg, _ = _cfgs()
    model = ContinuousSeq2Seq(cfg, out_dim=56)
    src = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 824))
    tgt = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 56))
    mask = jnp.ones((2, 12), dtype=bool).at[1, 8:].set(False)
    params = model.init(jax.random.PRNGKey(2), src, tgt, mask)
    loss = model.apply(params, src, tgt, mask)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_listener_generator_forward_and_generate():
    cfg, vq = _cfgs()
    model = ListenerGenerator(cfg, vq, vq)
    b, l = 2, 12
    v_speaker = jax.random.normal(jax.random.PRNGKey(0), (b, l, 56))
    v_listener = jax.random.normal(jax.random.PRNGKey(1), (b, l, 56))
    mask = jnp.ones((b, l), dtype=bool).at[1, 9:].set(False)
    sp_ids = jnp.array([1, 2])
    li_ids = jnp.array([3, 4])
    params = model.init(jax.random.PRNGKey(2), v_speaker, v_listener, mask,
                        sp_ids, li_ids)
    out = model.apply(params, v_speaker, v_listener, mask, sp_ids, li_ids)
    assert np.isfinite(float(out.loss))
    assert out.pred_cont_seq.shape == (b, l - 1, 56)

    out_noids = model.apply(params, v_speaker, v_listener, mask)
    assert np.isfinite(float(out_noids.loss))

    # generate path
    enc, prompt = model.apply(params, v_speaker, v_listener, mask,
                              method=ListenerGenerator.encode_context)
    dec = TokenDecoder(num_tokens=cfg.dec_num_tokens, dim=cfg.dim,
                       max_seq_len=cfg.dec_max_seq_len, depth=cfg.dec_depth,
                       heads=cfg.dec_heads)
    toks = generate_tokens(dec, {"params": params["params"]["generator"]["decoder"]},
                           prompt, l - 1, enc, mask, jax.random.PRNGKey(5))
    motion = model.apply(params, toks, method=ListenerGenerator.decode_tokens_to_motion)
    assert motion.shape == (b, l - 1, 56)


def test_simple_lstm():
    model = SimpleLSTM()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 824))
    y = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 56))
    params = model.init(jax.random.PRNGKey(2), x, y)
    loss, out = model.apply(params, x, y)
    assert out.shape == (2, 10, 56)
    assert np.isfinite(float(loss))
