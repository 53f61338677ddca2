"""--synthetic smoke tests for the preprocessing + render CLI entry points
(VERDICT round-1 item 6: every reference ``python <script>`` invocation needs
a runnable ``python -m ...`` twin).

Reference scripts mirrored: preprocessing.py, vico_preprocessing.py,
vico_preprocessing_l2l.py, elp_preprocessing.py, l2l_preprocessing_l2l.py,
preprocess_deception.py, voca_preprocessing.py, Pirender/train.py,
Pirender/inference_newmodel.py, Pirender/intuitive_control.py.
"""

import os
import pickle

import numpy as np
import pytest

from dyadic_interaction_modeling_tpu.cli import preprocess as PPCLI


def _ns(**kw):
    import argparse

    return argparse.Namespace(**kw)


def test_preprocess_candor(tmp_path):
    n = PPCLI.main(["candor", "--synthetic", "--out", str(tmp_path)])
    assert n == 2
    spk = sorted(os.listdir(tmp_path / "speaker"))
    assert spk
    with open(tmp_path / "speaker" / spk[0], "rb") as f:
        feats = pickle.load(f)
    assert feats["video"].shape[-1] == 56 and feats["audio"].shape[-1] == 768


def test_preprocess_render_prep(tmp_path):
    """prepare_vox_lmdb equivalent: video + coeff matrix -> clip dirs that
    the renderer's load_clip_dirs consumes (round-trip asserted in-CLI)."""
    out = PPCLI.main(["render-prep", "--synthetic", "--resolution", "32",
                      "--out", str(tmp_path)])
    assert out == str(tmp_path)
    import numpy as np

    assert sorted(os.listdir(tmp_path / "clipA" / "frames"))[0] == "00000.png"
    pose = np.load(tmp_path / "clipA" / "coeffs" / "00000" / "pose.npy")
    exp = np.load(tmp_path / "clipA" / "coeffs" / "00000" / "exp.npy")
    assert pose.shape == (6,) and exp.shape == (50,)


def test_preprocess_vico(tmp_path):
    n = PPCLI.main(["vico", "--synthetic", "--out", str(tmp_path)])
    assert n == 1
    with open(tmp_path / "clip0.pkl", "rb") as f:
        clip = pickle.load(f)
    assert set(clip) == {"audio", "video_speaker", "video_listener"}
    # all three streams cut to the same length (vico_preprocessing.py:99-116)
    assert len({v.shape[0] for v in clip.values()}) == 1
    assert clip["video_speaker"].shape[-1] == 56


def test_preprocess_vico_l2l(tmp_path):
    n = PPCLI.main(["vico-l2l", "--synthetic", "--out", str(tmp_path)])
    assert n >= 1
    out = tmp_path / "train"
    faces = np.load(out / "p0_list_faces_clean_deca.npy")
    audio = np.load(out / "p0_speak_audio_clean_deca.npy")
    assert faces.shape[1:] == (64, 56 + 128)  # exp+pose+detail
    assert audio.shape[1:] == (256, 128)      # 64*4 mel frames
    # reference coin-flip quirk: everything lands in p0, p1 stays empty
    assert np.load(out / "p1_list_faces_clean_deca.npy").size == 0


def test_preprocess_elp(tmp_path):
    n = PPCLI.main(["elp", "--synthetic", "--out", str(tmp_path)])
    assert n == 1
    shards = np.load(tmp_path / "test_elp.npy", allow_pickle=True)
    s = shards[0]
    assert s["video_speaker"].shape == (64, 56) and s["sentiment"] == 1


def test_preprocess_l2l(tmp_path):
    n = PPCLI.main(["l2l", "--synthetic", "--out", str(tmp_path)])
    assert n == 2
    faces = np.load(tmp_path / "train" / "p0_list_faces_clean_deca.npy")
    assert faces.shape[1:] == (64, 184)  # exp 50 + pose 6 + detail 128


def test_preprocess_deception(tmp_path):
    pytest.importorskip("cv2")
    n = PPCLI.main(["deception", "--synthetic", "--out", str(tmp_path)])
    assert n == 1
    assert os.path.exists(tmp_path / "_synthetic_in" / "interview_left.mp4")
    assert os.path.exists(tmp_path / "_synthetic_in" / "interview_right.mp4")


def test_preprocess_voca(tmp_path):
    n = PPCLI.main(["voca", "--synthetic", "--out", str(tmp_path)])
    assert n == 3  # only the 26_C camera frames


def test_render_train_cli(tmp_path):
    """One run covers the CLI surface AND the multi-epoch regression: a
    single-use batches generator (bare or prefetch-wrapped) was exhausted
    after epoch 0 and later epochs silently ran zero steps."""
    from dyadic_interaction_modeling_tpu.cli import render_train

    trainer = render_train.main([
        "--synthetic", "--save-path", str(tmp_path), "--perceptual", "l1",
        "--steps-per-epoch", "2", "--max-epochs", "3", "--prefetch", "2",
        "--snapshot-iter", "2", "--resolution", "32"])
    assert trainer.iteration == 6, trainer.iteration
    assert os.path.exists(tmp_path / "latest_checkpoint.txt")
    assert list((tmp_path / "logs" / "images").glob("*.png"))


def test_render_inference_cli(tmp_path):
    from dyadic_interaction_modeling_tpu.cli import render_inference

    out = render_inference.main([
        "--synthetic", "--out", str(tmp_path), "--resolution", "32"])
    assert out["fake_image"].shape[0] == 6
    assert len(list((tmp_path / "fake").glob("*.png"))) == 6
    assert len(list((tmp_path / "warp").glob("*.png"))) == 6


def test_intuitive_control_cli(tmp_path):
    from dyadic_interaction_modeling_tpu.cli import intuitive_control

    n = intuitive_control.main([
        "--synthetic", "--out", str(tmp_path), "--num", "3",
        "--resolution", "32"])
    # 5 rotation controls + 7 expression controls, 3 steps each
    assert n == 3 * (len(intuitive_control.ROT_ORDER)
                     + len(intuitive_control.EXP_ORDER))
    assert len(list(tmp_path.glob("0*.png"))) == n  # excludes _source.png


def test_render_train_cli_real_data_layout(tmp_path):
    """--data-root path: clips from frames/ + coeffs/ dirs (the
    postprocess/emoca2flame export layout)."""
    from PIL import Image

    from dyadic_interaction_modeling_tpu.cli import render_train

    rng = np.random.RandomState(0)
    root = tmp_path / "clips" / "clipA"
    (root / "frames").mkdir(parents=True)
    for i in range(6):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(root / "frames" / f"{i:05d}.png")
        d = root / "coeffs" / f"{i:06d}"
        d.mkdir(parents=True)
        np.save(d / "pose.npy", rng.randn(6).astype(np.float32))
        np.save(d / "exp.npy", rng.randn(50).astype(np.float32))
    trainer = render_train.main([
        "--data-root", str(tmp_path / "clips"), "--save-path",
        str(tmp_path / "runs"), "--perceptual", "l1", "--resolution", "32",
        "--steps-per-epoch", "2", "--snapshot-iter", "2",
        "--logging-iter", "1"])
    assert trainer.iteration == 2


@pytest.mark.slow
def test_render_train_cli_debug_harness(tmp_path):
    """--debug N: the reference's test_everything protocol
    (trainers/base.py:147-166) - N train iterations then visualization +
    checkpoint + metric in one pass, everything finite."""
    from dyadic_interaction_modeling_tpu.cli import render_train

    trainer = render_train.main([
        "--synthetic", "--save-path", str(tmp_path), "--perceptual", "l1",
        "--debug", "3", "--pretrain-warp-iteration", "2",
        "--resolution", "32"])
    assert trainer.iteration == 3
    assert os.path.exists(tmp_path / "latest_checkpoint.txt")
    assert list((tmp_path / "logs" / "images").glob("*.png"))
    import json

    tags = {json.loads(l)["tag"] for l in open(tmp_path / "logs" / "scalars.jsonl")}
    assert "metric/perceptual_distance" in tags
