"""Intuitive control demo (reference: ``code/Pirender/intuitive_control.py``).

Interpolates the driving coefficients between control presets - rotation
(pose dims) and expression (exp dims) - and renders each step from a fixed
source image: for every control target, ``num`` frames walk linearly from the
current coefficients to the target (intuitive_control.py:110-135), the whole
semantic window is set to the interpolated vector, and the EMA generator
renders it.

Presets come from a ``.mat`` file with the reference's keys
(``expression_center/mouth/eyebrow/eyes``, ``rotation_center/...``) or - with
``--synthetic`` - from built-in small offsets. Our coefficient layout is the
DIM 56-d one: dims [0:6] pose ("rotation"), [6:56] expression.
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from ..render.generator import FaceGenerator
from ..utils.checkpoint import load_checkpoint
from .common import setup

EXP_ORDER = ["expression_center", "expression_mouth", "expression_center",
             "expression_eyebrow", "expression_center", "expression_eyes",
             "expression_center"]
ROT_ORDER = ["rotation_center", "rotation_left", "rotation_center",
             "rotation_right", "rotation_center"]


def _synthetic_controls(coeff_nc: int, rng) -> dict:
    ctr = np.zeros(coeff_nc, np.float32)
    out = {"expression_center": ctr[6:], "rotation_center": ctr[:6]}
    for name, scale in (("expression_mouth", 1.0), ("expression_eyebrow", 0.7),
                        ("expression_eyes", 0.5)):
        out[name] = rng.normal(0, scale, coeff_nc - 6).astype(np.float32)
    for name, yaw in (("rotation_left", -0.4), ("rotation_right", 0.4)):
        r = np.zeros(6, np.float32)
        r[1] = yaw
        out[name] = r
    return out


def _load_mat_controls(path: str) -> dict:
    from scipy.io import loadmat

    out = {}
    for fname, keys in (("expression.mat", ["expression_center", "expression_mouth",
                                            "expression_eyebrow", "expression_eyes"]),
                        ("rotation.mat", ["rotation_center", "rotation_left",
                                          "rotation_right"])):
        mat = loadmat(os.path.join(path, fname))
        for k in keys:
            if k in mat:
                out[k] = np.asarray(mat[k], np.float32).reshape(-1)
    return out


def main(argv=None):
    parser = argparse.ArgumentParser(description="PIRender intuitive control")
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--source-image", type=str, default=None)
    parser.add_argument("--controls", type=str, default=None,
                        help="dir with expression.mat / rotation.mat presets")
    parser.add_argument("--out", type=str, default="./control_out")
    parser.add_argument("--num", type=int, default=10,
                        help="interpolation steps per control")
    parser.add_argument("--resolution", type=int, default=64)
    parser.add_argument("--coeff-nc", type=int, default=58)
    parser.add_argument("--semantic-radius", type=int, default=13)
    parser.add_argument("--synthetic", action="store_true")
    args = parser.parse_args(argv)
    logger = setup(args)
    rng = np.random.RandomState(0)

    if args.synthetic and args.source_image is None:
        from PIL import Image

        os.makedirs(args.out, exist_ok=True)
        args.source_image = os.path.join(args.out, "_source.png")
        Image.fromarray(rng.randint(0, 255, (args.resolution, args.resolution, 3),
                                    dtype=np.uint8)).save(args.source_image)
    from PIL import Image

    src = np.asarray(Image.open(args.source_image).convert("RGB")
                     .resize((args.resolution, args.resolution)),
                     np.float32) / 127.5 - 1.0

    controls = (_load_mat_controls(args.controls) if args.controls
                else _synthetic_controls(args.coeff_nc, rng))

    model = FaceGenerator(flame_coeff_nc=args.coeff_nc, coeff_nc=73,
                          descriptor_nc=32 if args.synthetic else 256,
                          mapping_layers=2 if args.synthetic else 3)
    window = 2 * args.semantic_radius + 1
    if args.checkpoint:
        payload = load_checkpoint(args.checkpoint)["params"]
        params = payload.get("net_G_ema", payload)
    else:
        params = model.init(jax.random.PRNGKey(0), src[None],
                            np.zeros((1, args.coeff_nc, window), np.float32)
                            )["params"]
        logger.warning("no --checkpoint: rendering with a random generator")

    @jax.jit
    def fwd(params, img, sem):
        return model.apply({"params": params}, img, sem)["fake_image"]

    coeff = np.zeros(args.coeff_nc, np.float32)
    frames = []

    def sweep(order, lo, hi):
        nonlocal coeff
        current = coeff[lo:hi].copy()
        for name in order:
            target = controls.get(name)
            if target is None:
                continue
            target = target[: hi - lo]
            for i in range(args.num):
                val = (target - current) * i / (args.num - 1) + current
                coeff[lo:hi] = val
                sem = np.repeat(coeff[:, None], window, axis=1)[None]
                frames.append(np.asarray(fwd(params, src[None], sem))[0])
            current = val

    sweep(ROT_ORDER, 0, 6)          # rotation control (pose dims)
    sweep(EXP_ORDER, 6, args.coeff_nc)  # expression control

    os.makedirs(args.out, exist_ok=True)
    for i, f in enumerate(frames):
        arr = ((np.clip(f, -1, 1) + 1) * 127.5).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(args.out, f"{i:05d}.png"))
    logger.info(f"intuitive control: wrote {len(frames)} frames to {args.out}")
    return len(frames)


if __name__ == "__main__":
    main()
