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


def test_continuous_engine_trains_and_evaluates():
    """train_continuous_epoch / evaluate_continuous_epoch twins
    (x_engine.py:38-62, 89-105 - the reference's dormant continuous branch)."""
    from dyadic_interaction_modeling_tpu.engine.s2s_engine import (
        evaluate_continuous_epoch,
        make_continuous_train_step,
        train_continuous_epoch,
    )
    from dyadic_interaction_modeling_tpu.models.listener_generator import (
        ContinuousSeq2Seq,
    )

    cfg = C.listener_generator_defaults()
    cfg.update(dict(dim=32, enc_depth=1, enc_heads=2, dec_depth=1,
                    dec_heads=2, enc_max_seq_len=64))
    model = ContinuousSeq2Seq(cfg)
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(2, 16, 56).astype(np.float32))
    tgt = jnp.asarray(np.cumsum(rng.randn(2, 16, 56), axis=1).astype(np.float32) * 0.1)
    mask = jnp.ones((2, 16), dtype=bool).at[1, 12:].set(False)
    params = model.init(jax.random.PRNGKey(0), src, tgt, mask)["params"]
    state = create_train_state(model, {"params": params}, 1e-3)
    step = make_continuous_train_step(model)

    first = evaluate_continuous_epoch(state.params, model, [(src, tgt, mask)])
    for _ in range(3):
        state, _ = train_continuous_epoch(
            state, [(src, tgt, mask)] * 10, step, print_freq=1000)
    last = evaluate_continuous_epoch(state.params, model, [(src, tgt, mask)])
    assert last < first * 0.7, (first, last)


def test_train_s2s_cli_continuous_branch(tmp_path):
    from dyadic_interaction_modeling_tpu.cli import train_s2s

    state, keeper = train_s2s.main([
        "--synthetic", "--batch-size", "4", "--epochs", "2",
        "--continuous", "--save-path", str(tmp_path / "cont"),
        "dim", "32", "enc_depth", "1", "enc_heads", "2", "dec_depth", "1",
        "dec_heads", "2", "dec_num_tokens", "24",
    ])
    assert keeper.best is not None and np.isfinite(keeper.best)
