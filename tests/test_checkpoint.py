import numpy as np

import jax
import jax.numpy as jnp

from dyadic_interaction_modeling_tpu.utils.checkpoint import (
    BestCheckpointKeeper,
    graft_subtree,
    load_checkpoint,
    partial_load,
    save_checkpoint,
)


def _tree(seed=0):
    k = jax.random.PRNGKey(seed)
    return {
        "encoder": {"w": jax.random.normal(k, (8, 16)), "b": jnp.zeros(16)},
        "decoder": {"w": jax.random.normal(jax.random.fold_in(k, 1), (16, 8))},
        "quantize": {"embedding": jax.random.normal(jax.random.fold_in(k, 2), (32, 4))},
    }


def test_orbax_roundtrip(tmp_path):
    params = _tree()
    path = save_checkpoint(params, str(tmp_path / "ck"), step=3)
    restored = load_checkpoint(path)["params"]
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_drop_prefixes_mirrors_stage2_stripping(tmp_path):
    """baseTrainer.save_checkpoint strips autoencoder.* keys for stage 2."""
    params = dict(_tree())
    params["autoencoder"] = {"w": jnp.ones(3)}
    path = save_checkpoint(params, str(tmp_path / "ck"), step=0,
                           drop_prefixes=("autoencoder",))
    restored = load_checkpoint(path)["params"]
    assert "autoencoder" not in restored
    assert "encoder" in restored


def test_partial_load_and_graft():
    params = _tree(0)
    loaded = {"encoder": _tree(1)["encoder"]}
    merged = partial_load(params, loaded)
    np.testing.assert_array_equal(np.asarray(merged["encoder"]["w"]),
                                  np.asarray(loaded["encoder"]["w"]))
    np.testing.assert_array_equal(np.asarray(merged["decoder"]["w"]),
                                  np.asarray(params["decoder"]["w"]))
    grafted = graft_subtree(params, "quantize/embedding", jnp.zeros((32, 4)))
    assert float(jnp.sum(jnp.abs(grafted["quantize"]["embedding"]))) == 0.0


def test_best_checkpoint_keeper(tmp_path):
    keeper = BestCheckpointKeeper(str(tmp_path / "best"))
    p = _tree()
    assert keeper.update(1.0, p, 0)
    assert not keeper.update(2.0, p, 1)  # worse: not saved
    assert keeper.update(0.5, p, 2)
    assert keeper.best == 0.5
