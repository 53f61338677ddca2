"""--mesh CLI wiring: MeshPlan parsing + sharded training from the CLIs.

The reference's multi-device story is DDP/mp.spawn (train_vq.py:42-102) and
nn.DataParallel (train_s2s_pretrain.py:42). Ours is `--mesh SPEC` on the
training CLIs (parallel.plan.MeshPlan) over the jax.sharding mesh; the
layouts themselves are equivalence-tested in tests/test_multichip_slmft.py /
test_e2e_pipeline.py - here we pin the spec grammar and that the CLIs
actually train under each layout (runs on the 8-device CPU mesh conftest
provisions).
"""

import numpy as np
import pytest

from dyadic_interaction_modeling_tpu.parallel import MeshPlan


def test_mesh_plan_parse():
    assert MeshPlan.parse(None) is None
    assert MeshPlan.parse("") is None

    p = MeshPlan.parse("auto")
    assert p.layout == "dp" and p.data_par == 8

    p = MeshPlan.parse("data=4")
    assert p.layout == "dp" and p.data_par == 4 and p.model_par == 1

    p = MeshPlan.parse("data=4,model=2")
    assert p.layout == "tp" and p.data_par == 4 and p.model_par == 2
    assert "model" in p.mesh.shape and p.mesh.shape["model"] == 2

    p = MeshPlan.parse("fsdp")
    assert p.layout == "fsdp" and p.data_par == 8
    assert MeshPlan.parse("fsdp=4").data_par == 4

    for bad in ("nonsense", "data", "model=2", "data=4,weird=2"):
        with pytest.raises(ValueError):
            MeshPlan.parse(bad)
    with pytest.raises(ValueError, match="devices"):
        MeshPlan.parse("data=64")


def test_mesh_plan_batch_divisibility_error():
    plan = MeshPlan.parse("data=8")
    with pytest.raises(ValueError, match="divisible"):
        plan.shard_train_batch((np.zeros((3, 4, 2), np.float32),))
    out = plan.shard_train_batch((np.zeros((8, 4, 2), np.float32),))
    assert out[0].shape == (8, 4, 2)


@pytest.mark.parametrize("mesh_spec", ["data=8", "data=4,model=2", "fsdp"])
def test_cli_train_vq_mesh_smoke(tmp_path, mesh_spec):
    """train_vq must train under every --mesh layout and reach the same
    loss as the single-device run (same seed, same synthetic data)."""
    from dyadic_interaction_modeling_tpu.cli import train_vq

    overrides = [
        "hidden_size", "32", "num_hidden_layers", "1",
        "num_attention_heads", "2", "intermediate_size", "64",
        "zquant_dim", "16", "n_embed", "24",
        "batch_size", "8", "batch_size_val", "4",
    ]
    _, keeper_ref = train_vq.main(
        ["--synthetic", "--epochs", "1",
         "--save-path", str(tmp_path / "single")] + overrides)
    _, keeper_mesh = train_vq.main(
        ["--synthetic", "--epochs", "1",
         "--save-path", str(tmp_path / "mesh"),
         "--mesh", mesh_spec] + overrides)
    assert np.isfinite(keeper_mesh.best)
    np.testing.assert_allclose(keeper_mesh.best, keeper_ref.best,
                               rtol=2e-4, atol=1e-5)


@pytest.mark.slow
def test_cli_train_s2s_pretrain_mesh_smoke(tmp_path):
    from dyadic_interaction_modeling_tpu.cli import train_s2s_pretrain

    save = str(tmp_path / "slm_mesh")
    _, keeper = train_s2s_pretrain.main([
        "--synthetic", "--batch-size", "8", "--epochs", "1",
        "--mesh", "data=8", "--save-path", save,
        "dim", "32", "enc_depth", "1", "enc_heads", "2", "dec_depth", "1",
        "dec_heads", "2", "num_tokens", "24",
    ])
    assert keeper.best is not None and np.isfinite(keeper.best)


def test_cli_render_train_mesh_dp_smoke(tmp_path):
    """PIRender training under --mesh (the reference trains it DDP)."""
    from dyadic_interaction_modeling_tpu.cli import render_train

    trainer = render_train.main([
        "--synthetic", "--save-path", str(tmp_path), "--perceptual", "l1",
        "--steps-per-epoch", "2", "--max-epochs", "1", "--batch-size", "4",
        "--resolution", "32", "--mesh", "data=4"])
    assert trainer.iteration == 2
    with pytest.raises(ValueError, match="data-parallel"):
        from dyadic_interaction_modeling_tpu.parallel import MeshPlan as MP
        trainer.shard_with(MP.parse("fsdp"))
