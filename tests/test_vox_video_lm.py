"""Round-5 render-periphery twins (VERDICT r4 Missing #1/#2).

* ``VoxVideoDataset`` + ``render_video_reenactment``: the cross-identity
  video reenactment demo (reference ``Pirender/inference.py:60-125`` +
  ``data/vox_video_dataset.py:1-101``) - same-id and cross-id modes over a
  synthetic prepared-VoxCeleb LMDB, crop renormalization, the side-by-side
  gt|warp|fake writer, and the CLI ``--video`` mode end to end;
* ``VoxLMDirDataset``: the ViCo render-finetune dir layout (person/clip
  frame dirs + per-clip pkl coefficients, ``vox_dataset.py:21-168``)
  including the [exp, 0, 0, pose] reorder, the radius-1 x27 window-tile
  quirk, the exclusion-window frame selection, and the render_train
  ``--feat-root`` branch.
"""

import os
import pickle

import numpy as np
import pytest

from dyadic_interaction_modeling_tpu.render.data import (
    VoxLMDirDataset,
    VoxVideoDataset,
    emoca_to_coeff3dmm,
    semantic_window,
    write_vox_lmdb,
)


def _make_video_root(tmp_path, n_frames=6, res=24, persons=("pA", "pB", "pC")):
    rng = np.random.default_rng(7)
    clips = {}
    for p in persons:
        name = f"{p}#clip1"
        frames = rng.uniform(-1, 1, (n_frames, res, res, 3)).astype(np.float32)
        emoca = rng.normal(0, 0.3, (n_frames, 56)).astype(np.float32)
        crop = rng.normal(1.0, 0.2, (n_frames, 3)).astype(np.float32)
        clips[name] = {"frames": frames,
                       "coeff_3dmm": emoca_to_coeff3dmm(emoca, crop)}
    root = str(tmp_path / "vox")
    write_vox_lmdb(root, clips, resolution=res,
                   test_names=list(clips), img_format="png")
    return root, clips


def test_vox_video_dataset_same_id(tmp_path):
    root, clips = _make_video_root(tmp_path)
    ds = VoxVideoDataset(root, resolution=24, semantic_radius=13)
    assert len(ds) == 3
    seen = []
    for _ in range(len(ds)):
        data = ds.load_next_video()
        seen.append(data["video_name"])
        t = clips[data["video_name"]]["frames"].shape[0]
        assert data["target_images"].shape == (t, 24, 24, 3)
        assert data["target_semantics"].shape == (t, 73, 27)
        # same-id: source is frame 0 of the SAME clip
        np.testing.assert_allclose(data["source_image"],
                                   data["target_images"][0], atol=2 / 255)
        # semantics match the offline slicing, frame by frame
        coeff = clips[data["video_name"]]["coeff_3dmm"]
        for f in (0, t - 1):
            win = semantic_window(coeff, f, 13)
            expect = np.concatenate([win[80:144], win[224:227],
                                     win[254:257], win[257:260]], axis=0)
            np.testing.assert_array_equal(data["target_semantics"][f], expect)
    assert sorted(seen) == sorted(clips)


def test_vox_video_dataset_cross_id(tmp_path):
    root, clips = _make_video_root(tmp_path)
    ds = VoxVideoDataset(root, resolution=24, semantic_radius=13,
                         cross_id=True, seed=5)
    data = ds.load_next_video()
    # name is source_to_target (vox_video_dataset.py:97-102)
    assert "_to_" in data["video_name"]
    src_name, tgt_name = data["video_name"].split("_to_", 1)
    assert tgt_name in clips
    # crop renormalization: col 257 scaled by the source/target ratio at the
    # exp+angle-nearest frame; every other column untouched
    raw = clips[tgt_name]["coeff_3dmm"]
    src_clip = next(n for n in clips if n.startswith(src_name))
    ratio = VoxVideoDataset.find_crop_norm_ratio(
        clips[src_clip]["coeff_3dmm"][0:1], raw)
    got_win = data["target_semantics"][0]  # (73, 27)
    win = semantic_window(raw, 0, 13)
    np.testing.assert_array_equal(got_win[:70], np.concatenate(
        [win[80:144], win[224:227], win[254:257]], axis=0))
    np.testing.assert_allclose(got_win[70], win[257] * ratio[0], rtol=1e-6)
    np.testing.assert_array_equal(got_win[71:], win[258:260])


def test_write_reenactment_video_png_fallback(tmp_path):
    from dyadic_interaction_modeling_tpu.render.inference import (
        write_reenactment_video,
    )

    gt = np.zeros((3, 8, 8, 3), np.float32)
    warp = np.ones((3, 8, 8, 3), np.float32) * 0.5
    fake = -np.ones((3, 8, 8, 3), np.float32)
    out = write_reenactment_video(str(tmp_path / "vid"), gt, warp, fake)
    if out.endswith(".mp4"):  # cv2 present
        assert os.path.exists(out)
    else:
        frames = sorted(os.listdir(out))
        assert len(frames) == 3
        from PIL import Image

        arr = np.asarray(Image.open(os.path.join(out, frames[0])))
        assert arr.shape == (8, 24, 3)  # gt|warp|fake side by side
        assert arr[0, 0, 0] == 127      # (0+1)/2*255
        assert arr[0, 8, 0] == 191      # (0.5+1)/2*255
        assert arr[0, 16, 0] == 0       # (-1+1)/2*255


@pytest.mark.slow
def test_render_inference_cli_video_mode(tmp_path):
    """The --video CLI twin renders same-id AND cross-id reenactment videos
    from a synthetic prepared LMDB (VERDICT r4 Missing #1 done-condition)."""
    from dyadic_interaction_modeling_tpu.cli import render_inference

    # resolution 32: the ADAIN hourglass downsamples x2^5, so the demo needs
    # a 32-divisible resolution (the reference always renders 256)
    root, clips = _make_video_root(tmp_path, n_frames=4, res=32)
    for mode, extra in (("same", []), ("cross", ["--cross-id"])):
        out_dir = str(tmp_path / f"out_{mode}")
        written = render_inference.main(
            ["--video", "--vox-root", root, "--out", out_dir,
             "--resolution", "32", "--synthetic", "--max-videos", "1",
             "--batch-size", "2"] + extra)
        assert len(written) == 1
        p = written[0]
        assert os.path.exists(p)
        if not p.endswith(".mp4"):
            frames = sorted(os.listdir(p))
            assert len(frames) == 4
            from PIL import Image

            arr = np.asarray(Image.open(os.path.join(p, frames[0])))
            assert arr.shape == (32, 96, 3)
        if mode == "cross":
            assert "_to_" in os.path.basename(p)


# --- VoxDataset_LM dir layout ------------------------------------------------


def _make_lm_tree(tmp_path, n_frames=8, res=24, clips=("clipA", "clipB"),
                  coeff_dim=56, prefix=""):
    from PIL import Image

    rng = np.random.default_rng(3)
    vids = tmp_path / "vids"
    feats = tmp_path / "feats"
    vids.mkdir(parents=True, exist_ok=True)
    feats.mkdir(parents=True, exist_ok=True)
    raw = {}
    for clip in clips:
        fdir = vids / (prefix + clip)
        fdir.mkdir()
        for i in range(n_frames):
            img = rng.integers(0, 255, (res, res, 3), dtype=np.uint8)
            Image.fromarray(img).save(fdir / f"{i:05d}.png")
        # pkl maps frame keys -> (C,) rows; iteration is sorted-key order
        rows = rng.normal(0, 0.3, (n_frames, coeff_dim)).astype(np.float32)
        coeff = {f"{i:05d}.png": rows[i] for i in range(n_frames)}
        with open(feats / f"{clip}.pkl", "wb") as f:
            pickle.dump(coeff, f)
        raw[clip] = rows
    return str(vids), str(feats), raw


def test_vox_lm_dir_dataset_layout_and_reorder(tmp_path):
    vids, feats, raw = _make_lm_tree(tmp_path)
    ds = VoxLMDirDataset(vids, feats, resolution=24, semantic_radius=13,
                         multiplier=2, seed=0)
    assert len(ds) == 4  # 2 clips x multiplier
    item = ds[0]
    assert item["source_image"].shape == (24, 24, 3)
    # decapirender (shipped face.yaml): [exp(50), zeros(2), pose(6)] = 58
    assert item["source_semantics"].shape == (58, 27)
    np.testing.assert_array_equal(item["source_semantics"][50:52], 0.0)

    # center column of the window is the frame's own reordered coefficients
    ds2 = VoxLMDirDataset(vids, feats, resolution=24, semantic_radius=13,
                          multiplier=1, seed=1)
    it = ds2[0]
    col = it["target_semantics"][:, 13]
    clip = next(c for c in raw
                if np.any(np.all(np.isclose(
                    np.concatenate([raw[c][:, 6:],
                                    np.zeros((len(raw[c]), 2)),
                                    raw[c][:, :6]], axis=1), col), axis=1)))
    assert clip in raw  # the column IS a reordered raw row

    # no-decapirender: [exp, pose] = 56-d
    ds56 = VoxLMDirDataset(vids, feats, resolution=24, semantic_radius=13,
                           decapirender=False, multiplier=1)
    assert ds56[0]["source_semantics"].shape == (56, 27)


def test_vox_lm_radius1_tile_quirk(tmp_path):
    """semantic_radius=1 (the shipped face.yaml value) tiles the 3-frame
    window x27 into an 81-wide window (vox_dataset.py:157-158)."""
    vids, feats, _ = _make_lm_tree(tmp_path)
    ds = VoxLMDirDataset(vids, feats, resolution=24, semantic_radius=1,
                         multiplier=1, seed=0)
    item = ds[0]
    assert item["source_semantics"].shape == (58, 81)
    w = item["source_semantics"]
    for k in range(1, 27):
        np.testing.assert_array_equal(w[:, 3 * k: 3 * k + 3], w[:, :3])


def test_vox_lm_exclusion_window_selection(tmp_path):
    vids, feats, _ = _make_lm_tree(tmp_path, n_frames=10)
    ds = VoxLMDirDataset(vids, feats, resolution=24, semantic_radius=1,
                         minimal_sample_distance=3, multiplier=1, seed=2)
    for _ in range(30):
        i, j = ds._select_frames(10)
        assert not (i - 3 <= j <= i + 3)
    with pytest.raises(ValueError):
        ds._select_frames(3)  # r=3 leaves no candidates in a 3-frame clip

    # frame-dir prefix maps feat names to the ViCo vid_vico_videos_ layout
    vids2, feats2, _ = _make_lm_tree(tmp_path / "p", prefix="vid_vico_videos_")
    ds2 = VoxLMDirDataset(vids2, feats2, resolution=24, semantic_radius=1,
                          multiplier=1, frame_dir_prefix="vid_vico_videos_")
    assert ds2[0]["source_image"].shape == (24, 24, 3)


@pytest.mark.slow
def test_render_train_cli_feat_root_branch(tmp_path):
    """render_train --data-root vids --feat-root feats trains from the exact
    VoxDataset_LM dir layout (VERDICT r4 Missing #2 done-condition)."""
    from dyadic_interaction_modeling_tpu.cli import render_train

    vids, feats, _ = _make_lm_tree(tmp_path, res=32)
    trainer = render_train.main([
        "--data-root", vids, "--feat-root", feats,
        "--save-path", str(tmp_path / "runs"),
        "--perceptual", "l1", "--resolution", "32",
        "--semantic-radius", "1", "--steps-per-epoch", "2",
        "--snapshot-iter", "2", "--logging-iter", "1",
        "--lmdb-multiplier", "1"])
    assert trainer.iteration == 2
