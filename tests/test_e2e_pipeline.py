"""End-to-end pipeline: VQ training -> code grafting -> SLMFT finetuning ->
best-of-N eval -> metrics, all at tiny dims on synthetic data, plus
data-parallel equivalence on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from dyadic_interaction_modeling_tpu import config as C
from dyadic_interaction_modeling_tpu.data.loader import (
    PaddedBatchLoader,
    slm_batch_from_collated,
)
from dyadic_interaction_modeling_tpu.data.synthetic import synthetic_vico_dataset
from dyadic_interaction_modeling_tpu.engine.pt_engine import (
    evaluate_test_epoch,
    make_slm_train_step,
    make_slmft_generator,
)
from dyadic_interaction_modeling_tpu.engine.train_state import create_train_state
from dyadic_interaction_modeling_tpu.engine.vq_engine import make_vq_train_step
from dyadic_interaction_modeling_tpu.metrics.reporting import print_metrics
from dyadic_interaction_modeling_tpu.models import get_model
from dyadic_interaction_modeling_tpu.models.slm import SLMFT, SLMFT_FROZEN_SUBSTRINGS
from dyadic_interaction_modeling_tpu.utils.checkpoint import graft_subtree


def _cfgs():
    vq = C.vq_listener_defaults()
    vq.update(dict(hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
                   intermediate_size=64, zquant_dim=16, n_embed=32))
    slm = C.slm_defaults()
    slm.update(dict(dim=32, enc_depth=1, enc_heads=2, dec_depth=1, dec_heads=2,
                    num_tokens=32))
    return vq, slm


def test_full_pipeline_vq_to_eval():
    vq_cfg, slm_cfg = _cfgs()
    ds = synthetic_vico_dataset(n_clips=8, min_len=28, max_len=32, seed=0)
    loader = PaddedBatchLoader(ds, batch_size=8, shuffle=False)
    collated = next(iter(loader))
    src_v, tgt, src_a, mask = (jnp.asarray(x) for x in slm_batch_from_collated(collated))

    # 1) train the listener VQ on listener motion
    vq_model = get_model(vq_cfg)
    vq_params = vq_model.init(jax.random.PRNGKey(0), tgt)
    vq_state = create_train_state(vq_model, vq_params, 1e-3)
    vq_step = make_vq_train_step(vq_model)
    first_rec = None
    for i in range(80):
        vq_state, m = vq_step(vq_state, tgt)
        if first_rec is None:
            first_rec = float(m["rec_loss"])
    assert float(m["rec_loss"]) < first_rec * 0.5

    # 2) graft the trained VQ into SLMFT (both tokenizers)
    model = SLMFT(slm_cfg, vq_cfg)
    rng = jax.random.PRNGKey(1)
    params = model.init(jax.random.PRNGKey(2), src_v, tgt, src_a, mask, rng)["params"]
    params = graft_subtree(params, "speaker_vq", vq_state.params)
    params = graft_subtree(params, "listener_vq", vq_state.params)

    # 3) finetune with frozen VQs
    state = create_train_state(model, params, 3e-4,
                               frozen_substrings=SLMFT_FROZEN_SUBSTRINGS)
    step = make_slm_train_step(model)
    first_ce = None
    batch = (src_v, tgt, src_a, mask)
    for i in range(60):
        rng, sub = jax.random.split(rng)
        state, logs = step(state, batch, sub)
        if first_ce is None:
            first_ce = float(logs["l_ce_l"])
    assert float(logs["l_ce_l"]) < first_ce, (first_ce, float(logs["l_ce_l"]))
    # frozen VQ stayed put
    np.testing.assert_array_equal(
        np.asarray(state.params["listener_vq"]["quantize"]["embedding"]),
        np.asarray(vq_state.params["quantize"]["embedding"]))

    # 4) best-of-3 sampled eval -> full metric battery
    gen = make_slmft_generator(model, slm_cfg, max_len=int(src_v.shape[1]))
    y_true, y_pred, xs, _ = evaluate_test_epoch(
        state.params, model, gen, [(src_v, tgt, src_a, mask)],
        jax.random.PRNGKey(9), beam_size=3)
    metrics = print_metrics(y_true, y_pred, xs, verbose=False)
    for k in ("fid_pose", "fid_exp", "var_pose", "sts_exp"):
        assert np.isfinite(metrics[k]), k


def test_data_parallel_step_matches_single_device():
    """A jitted VQ train step over a sharded batch must produce the same
    params as the unsharded step (XLA inserts the gradient all-reduce)."""
    from dyadic_interaction_modeling_tpu.parallel import make_mesh, shard_batch, replicate

    vq_cfg, _ = _cfgs()
    model = get_model(vq_cfg)
    batch = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 56))
    params = model.init(jax.random.PRNGKey(1), batch)
    step = make_vq_train_step(model)

    state1 = create_train_state(model, params, 1e-3)
    state1, m1 = step(state1, batch)
    state1, m1 = step(state1, batch)

    mesh = make_mesh(("data",))
    assert mesh.devices.size == 8
    state2 = create_train_state(model, params, 1e-3)
    state2 = state2.replace(params=replicate(mesh, state2.params),
                            opt_state=replicate(mesh, state2.opt_state))
    sharded = shard_batch(mesh, batch)
    state2, m2 = step(state2, sharded)
    state2, m2 = step(state2, sharded)

    assert float(m1["loss"]) == np.float32(float(m2["loss"])) or \
        abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
    a = jax.tree_util.tree_leaves(state1.params)
    b = jax.tree_util.tree_leaves(state2.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=2e-5, atol=2e-6)
