"""LMDB data interchange for the renderer (round-3 verdict Missing #3).

The reference's render training consumes LMDB environments produced by
``/root/reference/code/Pirender/scripts/prepare_vox_lmdb.py`` and read by
``VoxDataset_old`` (``code/Pirender/data/vox_dataset.py:345-449``). The
``lmdb`` binding is not in this image, so ``utils.lmdb_lite`` implements
the on-disk format directly. Tests:

* B+tree round-trip through the pure-Python reader/writer, covering inline
  values, overflow pages, multi-leaf and multi-level-branch trees;
* ``write_vox_lmdb`` / ``VoxLmdbDataset``: the reference key convention
  (``{video}-{frame:07d}`` / ``-length`` / ``-coeff_3dmm``), the 260-d
  coefficient slicing (exp[80:144] angles[224:227] translation[254:257]
  crop[257:260] -> 73-d) and window semantics of ``transform_semantic``;
* the ``render-prep-lmdb`` converter: render-prep clip dirs -> LMDB ->
  dataset items matching the originals.
"""

import os

import numpy as np
import pytest

from dyadic_interaction_modeling_tpu.render.data import (
    VoxLmdbDataset,
    emoca_to_coeff3dmm,
    semantic_window,
    write_vox_lmdb,
)
from dyadic_interaction_modeling_tpu.utils.lmdb_lite import (
    LmdbReader,
    format_for_lmdb,
    write_lmdb,
)


def test_lmdb_roundtrip_inline_overflow_and_deep_tree(tmp_path):
    rng = np.random.default_rng(0)
    items = {}
    for i in range(4000):  # enough keys for multiple branch levels
        items[format_for_lmdb("vid#a", i)] = bytes(
            rng.integers(0, 256, int(rng.integers(1, 80)), dtype=np.uint8))
    for i in range(8):     # values spanning 1..4 overflow pages
        items[format_for_lmdb(f"big{i}")] = bytes(
            rng.integers(0, 256, 1500 + 4000 * i, dtype=np.uint8))
    items[b""] = b"empty-key value"  # edge: zero-length key sorts first
    path = str(tmp_path / "env")
    write_lmdb(path, items.items())
    with LmdbReader(path) as r:
        assert r.entries == len(items)
        for k, v in items.items():
            assert r.get(k) == v
        assert r.get(b"missing") is None
        assert r.get(format_for_lmdb("vid#a", 99999)) is None
        got = list(r.items())
        assert [k for k, _ in got] == sorted(items)
        assert dict(got) == items


def test_format_for_lmdb_matches_reference_convention():
    # prepare_vox_lmdb.py:15-21: ints zfilled to 7, '-'-joined, utf-8
    assert format_for_lmdb("id#clip", 12) == b"id#clip-0000012"
    assert format_for_lmdb("v", "length") == b"v-length"
    assert format_for_lmdb("length") == b"length"


def _make_clips(n_frames=9, res=32):
    rng = np.random.default_rng(1)
    clips = {}
    for name in ("personA#clip1", "personA#clip2", "personB#clip1"):
        frames = rng.uniform(-1, 1, (n_frames, res, res, 3)).astype(np.float32)
        emoca = rng.normal(0, 0.3, (n_frames, 56)).astype(np.float32)
        crop = rng.normal(0, 1, (n_frames, 3)).astype(np.float32)
        clips[name] = {"frames": frames,
                       "coeff_3dmm": emoca_to_coeff3dmm(emoca, crop),
                       "emoca": emoca, "crop": crop}
    return clips


def test_write_vox_lmdb_layout_and_dataset(tmp_path):
    root = str(tmp_path / "vox")
    clips = _make_clips()
    write_vox_lmdb(root, {k: {kk: v[kk] for kk in ("frames", "coeff_3dmm")}
                          for k, v in clips.items()},
                   resolution=32, test_names=["personB#clip1"],
                   img_format="png")  # png: lossless, exact round-trip

    # raw layout: reference key convention under {root}/{resolution}
    with LmdbReader(os.path.join(root, "32")) as r:
        assert r.get(b"length") == b"0000003"
        assert r.get(b"personA#clip1-length") == b"0000009"
        assert r.get(format_for_lmdb("personA#clip1", 0)) is not None
        coeff = np.frombuffer(r.get(b"personA#clip1-coeff_3dmm"),
                              np.float32).reshape(9, 260)
        np.testing.assert_array_equal(coeff,
                                      clips["personA#clip1"]["coeff_3dmm"])
    with open(os.path.join(root, "train_list.txt")) as f:
        assert sorted(f.read().split()) == ["personA#clip1", "personA#clip2"]
    with open(os.path.join(root, "test_list.txt")) as f:
        assert f.read().split() == ["personB#clip1"]

    ds = VoxLmdbDataset(root, resolution=32, multiplier=2, seed=0)
    assert len(ds) == 2  # 1 train person x multiplier
    item = ds[0]
    assert item["source_image"].shape == (32, 32, 3)
    assert item["source_semantics"].shape == (73, 27)
    assert item["target_semantics"].shape == (73, 27)
    # batches() matches the FramePairDataset training contract
    batch = next(ds.batches(2, 1))
    assert batch["source_image"].shape == (2, 32, 32, 3)

    test_ds = VoxLmdbDataset(root, resolution=32, is_inference=True,
                             multiplier=1)
    assert test_ds.person_ids == ["personB"]


def test_vox_lmdb_semantics_match_reference_slicing(tmp_path):
    """transform_semantic (vox_dataset.py:439-460): window radius 13 clamped
    at clip edges, then exp[80:144]+angles[224:227]+translation[254:257]+
    crop[257:260], transposed to (73, 27)."""
    root = str(tmp_path / "vox")
    clips = _make_clips()
    write_vox_lmdb(root, {k: {kk: v[kk] for kk in ("frames", "coeff_3dmm")}
                          for k, v in clips.items()},
                   resolution=32, img_format="png")
    ds = VoxLmdbDataset(root, resolution=32, multiplier=1, seed=3)
    name = "personA#clip1"
    coeff = clips[name]["coeff_3dmm"]
    for frame in (0, 4, 8):  # edge-clamped, interior, end-clamped
        got = ds._semantics(coeff, frame)
        win = semantic_window(coeff, frame, 13)  # (260, 27)
        expect = np.concatenate([win[80:144], win[224:227], win[254:257],
                                 win[257:260]], axis=0)
        np.testing.assert_array_equal(got, expect)
        # EMOCA embedding lands where the reference slices
        emoca = clips[name]["emoca"]
        np.testing.assert_allclose(got[:50, 13], emoca[frame, 6:], rtol=1e-6)
        np.testing.assert_allclose(got[64:67, 13], emoca[frame, 0:3], rtol=1e-6)
        np.testing.assert_allclose(got[67:70, 13], emoca[frame, 3:6], rtol=1e-6)


@pytest.mark.slow
def test_render_train_cli_lmdb_branch(tmp_path):
    """render_train --data-root <lmdb root>: detected via train_list.txt,
    trains off the reference's prepared-data layout directly."""
    from dyadic_interaction_modeling_tpu.cli import render_train

    root = str(tmp_path / "vox")
    clips = _make_clips(res=32)
    write_vox_lmdb(root, {k: {kk: v[kk] for kk in ("frames", "coeff_3dmm")}
                          for k, v in clips.items()},
                   resolution=32, img_format="png")
    trainer = render_train.main([
        "--data-root", root, "--save-path", str(tmp_path / "runs"),
        "--perceptual", "l1", "--resolution", "32", "--steps-per-epoch", "2",
        "--snapshot-iter", "2", "--logging-iter", "1",
        "--lmdb-multiplier", "1"])
    assert trainer.iteration == 2


@pytest.mark.slow
def test_render_prep_lmdb_converter(tmp_path):
    """render-prep clip dirs -> reference LMDB layout -> VoxLmdbDataset."""
    cv2 = pytest.importorskip("cv2")  # noqa: F841 (render-prep synthetic needs it)
    from dyadic_interaction_modeling_tpu.cli import preprocess

    out = str(tmp_path / "lmdb_out")
    preprocess.main(["render-prep-lmdb", "--out", out, "--synthetic",
                     "--resolution", "64", "--img-format", "png"])
    ds = VoxLmdbDataset(out, resolution=64, multiplier=1)
    assert sorted(v["video_name"] for v in ds.video_items) == ["clipA", "clipB"]
    item = ds[0]
    assert item["source_image"].shape == (64, 64, 3)
    assert item["source_semantics"].shape == (73, 27)
