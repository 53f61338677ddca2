"""MetricsWriter (utils/observability.py) - the tensorboardX-equivalent
scalar/hparams/image-grid surface (reference: train_vq.py:68,147-149,
Pirender/util/meters.py:103)."""

import glob
import json
import os

import numpy as np

from dyadic_interaction_modeling_tpu.utils.observability import (
    MetricsWriter,
    make_grid,
    to_uint8,
)


def test_make_grid_layout_and_uint8():
    imgs = np.zeros((5, 4, 6, 3), np.float32)
    imgs[2] = 1.0
    grid = make_grid(imgs, nrow=3, pad=1)
    # 2 rows x 3 cols of 4x6 tiles with 1px padding
    assert grid.shape == (2 * 5 + 1, 3 * 7 + 1, 3)
    u8 = to_uint8(grid, value_range=(0.0, 1.0))
    assert u8.dtype == np.uint8 and u8.max() == 255


def test_metrics_writer_artifacts(tmp_path):
    d = str(tmp_path / "run")
    w = MetricsWriter(d, hparams={"lr": 1e-4, "depth": 4, "note": [1, 2]})
    w.add_scalar("loss", 1.5, step=0)
    w.add_scalars({"loss": 1.25, "acc": 0.5}, step=1, prefix="train/")
    img = np.random.default_rng(0).uniform(-1, 1, (4, 8, 8, 3)).astype(np.float32)
    png = w.add_image_grid("snap", [img, img], step=3, nrow=4)
    w.close()

    lines = [json.loads(l) for l in open(os.path.join(d, "scalars.jsonl"))]
    assert {"step": 0, "tag": "loss", "value": 1.5} in lines
    assert any(l["tag"] == "train/acc" and l["step"] == 1 for l in lines)
    hp = json.load(open(os.path.join(d, "hparams.json")))
    assert hp["lr"] == 1e-4 and hp["note"] == "[1, 2]"  # non-scalar stringified
    assert os.path.exists(png) and png.endswith("snap_000000003.png")
    # torch tensorboard is in the image: the mirror must produce event files
    assert glob.glob(os.path.join(d, "events.out.tfevents.*")), (
        "tensorboard mirror produced no event files")
