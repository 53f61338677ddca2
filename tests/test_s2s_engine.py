import pytest
import jax
import jax.numpy as jnp
import numpy as np

from dyadic_interaction_modeling_tpu import config as C
from dyadic_interaction_modeling_tpu.engine.s2s_engine import (
    evaluate_epoch,
    make_lg_train_step,
    train_epoch,
)
from dyadic_interaction_modeling_tpu.engine.train_state import create_train_state
from dyadic_interaction_modeling_tpu.models.listener_generator import ListenerGenerator


@pytest.mark.slow
def test_lg_train_and_eval_with_perplexity():
    cfg = C.listener_generator_defaults()
    cfg.update(dict(dim=32, enc_depth=1, enc_heads=2, enc_max_seq_len=64,
                    dec_num_tokens=24, dec_depth=1, dec_heads=2,
                    dec_max_seq_len=64, num_identities=10, id_embed_dim=8))
    vq = C.vq_listener_defaults()
    vq.update(dict(hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
                   intermediate_size=64, zquant_dim=16, n_embed=24))
    model = ListenerGenerator(cfg, vq, vq)
    b, l = 2, 16
    src = jax.random.normal(jax.random.PRNGKey(0), (b, l, 56))
    tgt = jax.random.normal(jax.random.PRNGKey(1), (b, l, 56))
    mask = jnp.ones((b, l), dtype=bool)
    sp = jnp.zeros((b,), jnp.int32)
    li = jnp.zeros((b,), jnp.int32)
    params = model.init(jax.random.PRNGKey(2), src, tgt, mask)["params"]
    state = create_train_state(model, params, 1e-4)
    step = make_lg_train_step(model)
    batches = [(src, tgt, mask, sp, li)] * 3
    state, loss = train_epoch(state, batches, step)
    assert np.isfinite(loss)
    out = evaluate_epoch(state.params, model, batches)
    assert np.isfinite(out["loss"])
    assert out["perplexity"] > 1.0  # untrained: near-uniform over 24 tokens
