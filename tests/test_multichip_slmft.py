"""Sharded SLMFT training equivalence on the virtual 8-device CPU mesh.

The driver's multichip check runs one SLMFT optimizer step over a
(data=4, model=2) mesh with the ``tp_param_spec`` rules. This test holds that
path to the same standard as the VQ DP test (tests/test_e2e_pipeline.py):
the sharded step must produce the SAME parameters as the single-device step,
for both pure DP (8, 1) and DP x TP (4, 2) layouts — XLA/GSPMD inserts the
gradient all-reduce and the tensor-parallel collectives; the math must not
change.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from dyadic_interaction_modeling_tpu import config as C
from dyadic_interaction_modeling_tpu.engine.train_state import create_train_state
from dyadic_interaction_modeling_tpu.models.slm import SLMFT, SLMFT_FROZEN_SUBSTRINGS
from dyadic_interaction_modeling_tpu.parallel import (
    make_mesh,
    shard_batch,
    tp_param_shardings,
    tp_param_spec,
)


def _tiny_model():
    slm_cfg = C.slm_defaults()
    slm_cfg.update(dict(dim=64, dim_audio=32, enc_depth=2, enc_heads=2,
                        dec_depth=2, dec_heads=2, enc_max_seq_len=64,
                        dec_max_seq_len=64, num_tokens=64))
    vq_cfg = C.vq_listener_defaults()
    vq_cfg.update(dict(hidden_size=64, num_hidden_layers=2,
                       num_attention_heads=2, intermediate_size=128,
                       zquant_dim=32, n_embed=64))
    model = SLMFT(slm_cfg, vq_cfg)
    b, l = 8, 32
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    batch = (jax.random.normal(ks[0], (b, l, slm_cfg.dim_in)),
             jax.random.normal(ks[1], (b, l, slm_cfg.dim_in)),
             jax.random.normal(ks[2], (b, l, slm_cfg.dim_audio)),
             jnp.ones((b, l), dtype=bool))
    return model, batch


def _train_step(model):
    @jax.jit
    def step(state, batch, rng):
        def loss_fn(p):
            out = model.apply({"params": p}, *batch, rng)
            return out.total_loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    return step


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
def test_sharded_slmft_step_matches_single_device(mesh_shape):
    model, batch = _tiny_model()
    rng = jax.random.PRNGKey(1)
    params = model.init(jax.random.PRNGKey(2), *batch, rng)
    step = _train_step(model)

    state1 = create_train_state(model, params, learning_rate=1e-3,
                                frozen_substrings=SLMFT_FROZEN_SUBSTRINGS)
    state1, loss1 = step(state1, batch, rng)
    state1, loss1 = step(state1, batch, rng)

    mesh = make_mesh(("data", "model"), shape=mesh_shape)
    model_par = mesh_shape[1]
    state2 = create_train_state(model, params, learning_rate=1e-3,
                                frozen_substrings=SLMFT_FROZEN_SUBSTRINGS)
    shardings = tp_param_shardings(mesh, state2.params, model_par)
    state2 = state2.replace(
        params=jax.tree_util.tree_map(jax.device_put, state2.params, shardings),
        opt_state=jax.device_put(state2.opt_state, NamedSharding(mesh, P())))
    sbatch = shard_batch(mesh, batch)
    state2, loss2 = step(state2, sbatch, rng)
    state2, loss2 = step(state2, sbatch, rng)

    assert abs(float(loss1) - float(loss2)) < 1e-5
    flat1 = jax.tree_util.tree_leaves_with_path(state1.params)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(state2.params))
    for path, x in flat1:
        y = flat2[path]
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=5e-4, atol=1e-4,
                                   err_msg=jax.tree_util.keystr(path))


def test_fsdp_sharded_slmft_step_matches_single_device():
    """ZeRO-3-style layout: params AND adam moments sharded over the data
    axis (fsdp_param_spec), batch data-sharded - the step must reproduce the
    single-device parameters exactly like the DP/TP layouts do. GSPMD
    inserts the per-use all-gathers and the gradient reduce-scatters."""
    from dyadic_interaction_modeling_tpu.parallel import fsdp_param_shardings

    model, batch = _tiny_model()
    rng = jax.random.PRNGKey(1)
    params = model.init(jax.random.PRNGKey(2), *batch, rng)
    step = _train_step(model)

    state1 = create_train_state(model, params, learning_rate=1e-3,
                                frozen_substrings=SLMFT_FROZEN_SUBSTRINGS)
    state1, loss1 = step(state1, batch, rng)
    state1, loss1 = step(state1, batch, rng)

    mesh = make_mesh(("data",), shape=(8,))
    state2 = create_train_state(model, params, learning_rate=1e-3,
                                frozen_substrings=SLMFT_FROZEN_SUBSTRINGS)
    shardings = fsdp_param_shardings(mesh, state2.params, min_size=256)
    sharded = [s.spec for s in jax.tree_util.tree_leaves(
        shardings, is_leaf=lambda s: isinstance(s, NamedSharding))
        if s.spec != P()]
    assert len(sharded) >= 8, "FSDP rule matched almost nothing"
    sparams = jax.tree_util.tree_map(jax.device_put, state2.params, shardings)
    # adam moments inherit the param sharding via GSPMD propagation
    opt_state = jax.jit(state2.tx.init)(sparams)
    state2 = state2.replace(params=sparams, opt_state=opt_state)
    sbatch = shard_batch(mesh, batch)
    state2, loss2 = step(state2, sbatch, rng)
    state2, loss2 = step(state2, sbatch, rng)

    assert abs(float(loss1) - float(loss2)) < 1e-5
    flat1 = jax.tree_util.tree_leaves_with_path(state1.params)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(state2.params))
    for path, x in flat1:
        np.testing.assert_allclose(np.asarray(x), np.asarray(flat2[path]),
                                   rtol=5e-4, atol=1e-4,
                                   err_msg=jax.tree_util.keystr(path))


def test_tp_rules_actually_shard_something():
    """Guard against the TP spec silently matching nothing (a rename in the
    decoder would turn the 'TP' test into a pure-DP test)."""
    model, batch = _tiny_model()
    params = model.init(jax.random.PRNGKey(2), *batch, jax.random.PRNGKey(1))
    specs = jax.tree_util.tree_map_with_path(
        lambda p, x: tp_param_spec(p, x, 2), params)
    sharded = [s for s in jax.tree_util.tree_leaves(
        specs, is_leaf=lambda s: isinstance(s, P)) if s == P(None, "model")]
    assert len(sharded) >= 4  # decoder ff w1/w2 per layer + to_logits
