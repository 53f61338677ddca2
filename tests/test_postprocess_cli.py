import os
import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE_ROOT, has_reference

from dyadic_interaction_modeling_tpu.postprocess import (
    export_emoca_dirs,
    merge_biwi_to_emoca,
    smooth_logits_matrix,
)


def test_smooth_logits_matrix_matches_reference_semantics():
    rng = np.random.RandomState(0)
    x = rng.randn(40, 56)
    out = smooth_logits_matrix(x.copy(), 10)
    # boundary quirk: first w/2 rows stay zero
    np.testing.assert_array_equal(out[:5], 0.0)
    np.testing.assert_array_equal(out[37:], 0.0)
    # interior: centered window-10 average
    np.testing.assert_allclose(out[5, 0], x[0:10, 0].mean(), rtol=1e-12)
    np.testing.assert_allclose(out[20, 3], x[15:25, 3].mean(), rtol=1e-12)


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
def test_smooth_parity_vs_reference():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import importlib.util

    # postprocess2emoca imports pickle5/pandas at module import; extract just
    # the function by executing its source up to the metadata section.
    src = open(os.path.join(REFERENCE_ROOT, "postprocess2emoca.py")).read()
    func_src = src[src.index("def smooth_logits_matrix"):src.index("metadata_path")]
    ns = {"np": np}
    exec(func_src, ns)  # noqa: S102 - reference code, read-only analysis
    ref_fn = ns["smooth_logits_matrix"]

    rng = np.random.RandomState(1)
    x = rng.randn(33, 56)
    ours = smooth_logits_matrix(x.copy(), 10)
    theirs = ref_fn(x.copy(), 10)
    np.testing.assert_allclose(ours, theirs, rtol=1e-10, atol=1e-12)


def test_export_emoca_dirs(tmp_path):
    coeffs = np.random.RandomState(0).randn(15, 56)
    clip_dir = export_emoca_dirs(str(tmp_path), "clip1", coeffs, smooth_window=10)
    assert os.path.isdir(clip_dir)
    pose = np.load(os.path.join(clip_dir, "00007", "pose.npy"))
    exp = np.load(os.path.join(clip_dir, "00007", "exp.npy"))
    assert pose.shape == (6,) and exp.shape == (50,)


def test_merge_biwi_to_emoca(tmp_path):
    coeffs = np.random.RandomState(0).randn(20, 56)
    gt = {f"frame_{i:03d}": {"cam": np.ones(3) * i, "shape": np.zeros(100)}
          for i in range(1, 21)}
    clip_dir = merge_biwi_to_emoca(str(tmp_path), "F2_01", coeffs, gt)
    cam = np.load(os.path.join(clip_dir, "frame_010", "cam.npy"))
    np.testing.assert_allclose(cam, 10.0)
    exp = np.load(os.path.join(clip_dir, "frame_010", "exp.npy"))
    assert exp.shape == (50,)


def _assert_observability_artifacts(save_dir, want_tags):
    """The training CLIs mirror the reference's tensorboard surface
    (train_vq.py:68,147-149,230-233): scalars.jsonl + hparams.json always,
    event files when torch.utils.tensorboard imports."""
    import glob
    import json

    jsonl = os.path.join(save_dir, "scalars.jsonl")
    assert os.path.isfile(jsonl), "scalars.jsonl missing"
    tags = {json.loads(line)["tag"] for line in open(jsonl)}
    missing = set(want_tags) - tags
    assert not missing, f"missing scalar tags: {missing} (have {tags})"
    assert os.path.isfile(os.path.join(save_dir, "hparams.json"))
    try:
        import torch.utils.tensorboard  # noqa: F401

        assert glob.glob(os.path.join(save_dir, "events.out.tfevents.*"))
    except ImportError:
        pass


def test_cli_train_vq_synthetic_smoke(tmp_path):
    from dyadic_interaction_modeling_tpu.cli import train_vq

    save = str(tmp_path / "vq")
    state, keeper = train_vq.main([
        "--synthetic", "--epochs", "1", "--save-path", save,
        "hidden_size", "32", "num_hidden_layers", "1", "num_attention_heads", "2",
        "intermediate_size", "64", "zquant_dim", "16", "n_embed", "24",
        "batch_size", "4", "batch_size_val", "4",
    ])
    assert keeper.best is not None and np.isfinite(keeper.best)
    _assert_observability_artifacts(save, [
        "train/rec_loss", "train/quant_loss", "train/perplexity",
        "val/rec_loss", "val/quant_loss", "val/perplexity"])


@pytest.mark.slow
def test_cli_train_s2s_pretrain_synthetic_smoke(tmp_path):
    from dyadic_interaction_modeling_tpu.cli import train_s2s_pretrain

    save = str(tmp_path / "slm")
    # --vq-token-cache also covers the donation-safe tokenization snapshot
    state, keeper = train_s2s_pretrain.main([
        "--synthetic", "--batch-size", "8", "--epochs", "2",
        "--vq-token-cache", "--save-path", save,
        "dim", "32", "enc_depth", "1", "enc_heads", "2", "dec_depth", "1",
        "dec_heads", "2", "num_tokens", "24",
    ])
    assert keeper.best is not None and np.isfinite(keeper.best)
    _assert_observability_artifacts(save, [
        "val/l_ce_l", "val/loss", "learning_rate"])


def test_cli_train_stage2_synthetic_smoke():
    from dyadic_interaction_modeling_tpu.cli import train_stage2

    state, keeper = train_stage2.main([
        "--synthetic", "--epochs", "1", "--w2v-layers", "1",
        "--save-path", "/tmp/test_stage2_ckpt",
        "hidden_size", "32", "num_hidden_layers", "1", "num_attention_heads", "2",
        "intermediate_size", "64", "zquant_dim", "16", "n_embed", "24",
        "feature_dim", "32", "vertice_dim", "300", "in_dim", "300",
        "n_head", "2", "num_layers", "1", "period", "5",
    ])
    assert keeper.best is not None and np.isfinite(keeper.best)
    # frozen: wav2vec2 conv extractor stays at init
    import jax

    leaves = jax.tree_util.tree_leaves(
        state.params["audio_encoder"]["feature_extractor"])
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_cli_test_biwi_synthetic_smoke():
    from dyadic_interaction_modeling_tpu.cli import test_biwi

    y_true, y_pred, names = test_biwi.main([
        "--synthetic", "--out-dir", "/tmp/test_biwi_out", "--vertice-dim", "300",
        "dim", "32", "enc_depth", "1", "enc_heads", "2", "dec_depth", "1",
        "dec_heads", "2", "num_tokens", "24", "dim_audio", "768",
    ])
    assert len(y_true) == len(y_pred) == 4
    import os

    assert len(os.listdir("/tmp/test_biwi_out/pred")) == 4


def test_cli_train_s2s_and_test_s2s_synthetic_smoke(tmp_path):
    from dyadic_interaction_modeling_tpu.cli import train_s2s

    save = str(tmp_path / "s2s")
    state, keeper = train_s2s.main([
        "--synthetic", "--batch-size", "4", "--epochs", "1",
        "--save-path", save,
        "dim", "32", "enc_depth", "1", "enc_heads", "2", "dec_depth", "1",
        "dec_heads", "2", "dec_num_tokens", "24",
    ])
    assert keeper.best is not None and np.isfinite(keeper.best)
    _assert_observability_artifacts(save, [
        "train/loss", "val/loss", "learning_rate"])


def test_cli_train_converter_synthetic_smoke():
    from dyadic_interaction_modeling_tpu.cli import train_converter

    state, keeper = train_converter.main([
        "--synthetic", "--epochs", "1", "--vertice-dim", "300",
        "--save-path", "/tmp/test_conv_ckpt",
        "hidden_size", "32", "num_hidden_layers", "1", "num_attention_heads", "2",
        "intermediate_size", "64", "zquant_dim", "16", "n_embed", "24",
    ])
    assert keeper.best is not None and np.isfinite(keeper.best)


def test_cli_test_s2s_synthetic_smoke():
    from dyadic_interaction_modeling_tpu.cli import test_s2s

    test_s2s.main([
        "--synthetic", "--batch-size", "4",
        "dim", "32", "enc_depth", "1", "enc_heads", "2", "dec_depth", "1",
        "dec_heads", "2", "dec_num_tokens", "24",
    ])


@pytest.mark.slow
def test_cli_finetune_s2s_pretrain_synthetic_smoke(tmp_path):
    """SLMFT finetune CLI end to end with --vq-token-cache (2 epochs: the
    cache path + donation-safe snapshot) + observability artifacts."""
    from dyadic_interaction_modeling_tpu.cli import finetune_s2s_pretrain

    save = str(tmp_path / "ft")
    state, keeper = finetune_s2s_pretrain.main([
        "--synthetic", "--batch-size", "4", "--epochs", "2",
        "--vq-token-cache", "--save-path", save,
        "dim", "32", "enc_depth", "1", "enc_heads", "2", "dec_depth", "1",
        "dec_heads", "2", "num_tokens", "24",
    ])
    assert keeper.best is not None and np.isfinite(keeper.best)
    _assert_observability_artifacts(save, [
        "val/fid_pose", "val/fid_exp", "learning_rate"])
