"""PIRender batch inference entry
(reference: ``code/Pirender/inference_newmodel.py:339-405``).

Twin invocation::

    python -m dyadic_interaction_modeling_tpu.cli.render_inference \
        --checkpoint <trainer ckpt> --source-image src.png \
        --coeff-dir <exported EMOCA dir> --out ./render_out

Renders fake/warp PNG frames from a source image driven by an exported
coefficient directory (the postprocess/emoca2flame output layout).
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from ..render.generator import FaceGenerator

from ..utils.checkpoint import load_checkpoint
from .common import setup


def _load_source_image(path: str, resolution: int) -> np.ndarray:
    from PIL import Image

    img = Image.open(path).convert("RGB").resize((resolution, resolution))
    return np.asarray(img, dtype=np.float32) / 127.5 - 1.0


def _synthetic_inputs(root: str, resolution: int, frames: int = 6):
    rng = np.random.RandomState(0)
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    src = os.path.join(root, "source.png")
    Image.fromarray(rng.randint(0, 255, (resolution, resolution, 3),
                                dtype=np.uint8)).save(src)
    coeff_dir = os.path.join(root, "clip0")
    for i in range(frames):
        d = os.path.join(coeff_dir, f"{i:06d}")
        os.makedirs(d, exist_ok=True)
        np.save(os.path.join(d, "pose.npy"), rng.randn(6).astype(np.float32) * 0.1)
        np.save(os.path.join(d, "exp.npy"), rng.randn(50).astype(np.float32) * 0.3)
    return src, coeff_dir


def _video_reenactment(args, logger):
    """Twin of the reference demo entry (Pirender/inference.py:62-125):
    same-id or --cross-id reenactment videos from prepared VoxCeleb data."""
    from ..render.data import VoxVideoDataset
    from ..render.inference import render_video_reenactment

    if not args.vox_root:
        raise SystemExit("--video needs --vox-root <prepared LMDB root>")
    ds = VoxVideoDataset(args.vox_root, resolution=args.resolution,
                         semantic_radius=args.semantic_radius,
                         cross_id=args.cross_id)
    # LMDB semantics are the 73-d Deep3DFace slice (vox_dataset.py:438-450)
    if args.torch_checkpoint:
        import torch

        from ..render.import_torch import torch_face_generator_to_flax

        payload = torch.load(args.torch_checkpoint, map_location="cpu",
                             weights_only=False)
        sd = payload
        if isinstance(payload, dict) and not any(
                k.startswith("mapping_net") for k in payload):
            sd = payload.get("net_G_ema") or payload.get("net_G") or payload
        params = torch_face_generator_to_flax(sd)
        ckpt_nc = params["mapping_net"]["pre"]["kernel"].shape[1]
        model = FaceGenerator(flame_coeff_nc=ckpt_nc, coeff_nc=73)
    elif args.checkpoint:
        model = FaceGenerator(flame_coeff_nc=73, coeff_nc=73,
                              descriptor_nc=32 if args.synthetic else 256,
                              mapping_layers=2 if args.synthetic else 3)
        payload = load_checkpoint(args.checkpoint)["params"]
        params = payload.get("net_G_ema", payload)
    else:
        model = FaceGenerator(flame_coeff_nc=73, coeff_nc=73,
                              descriptor_nc=32 if args.synthetic else 256,
                              mapping_layers=2 if args.synthetic else 3)
        sem_w = 2 * args.semantic_radius + 1
        dummy = (np.zeros((1, args.resolution, args.resolution, 3),
                          np.float32),
                 np.zeros((1, 73, sem_w), np.float32))
        params = model.init(jax.random.PRNGKey(0), *dummy)["params"]
        logger.warning("no --checkpoint: rendering with a random generator")
    written = render_video_reenactment(model, params, ds, args.out,
                                       batch_size=args.batch_size,
                                       max_videos=args.max_videos,
                                       logger=logger)
    logger.info(f"wrote {len(written)} reenactment video(s) under {args.out} "
                f"(cross_id={args.cross_id})")
    return written


def main(argv=None):
    parser = argparse.ArgumentParser(description="PIRender inference")
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="FaceTrainer checkpoint (uses net_G_ema)")
    parser.add_argument("--torch-checkpoint", type=str, default=None,
                        help="reference PIRender torch checkpoint "
                             "(.pt with net_G_ema/net_G, trainers/base.py "
                             "layout) - imported via render.import_torch")
    parser.add_argument("--source-image", type=str, default=None)
    parser.add_argument("--coeff-dir", type=str, default=None)
    parser.add_argument("--out", type=str, default="./render_out")
    parser.add_argument("--resolution", type=int, default=64)
    parser.add_argument("--coeff-nc", type=int, default=58)
    parser.add_argument("--semantic-radius", type=int, default=13)
    parser.add_argument("--synthetic", action="store_true")
    # video reenactment demo (reference: Pirender/inference.py:60-125)
    parser.add_argument("--video", action="store_true",
                        help="whole-video reenactment over a prepared "
                             "VoxCeleb LMDB root (--vox-root): writes "
                             "gt|warp|fake side-by-side videos")
    parser.add_argument("--vox-root", type=str, default=None,
                        help="prepared LMDB root ({root}/{res} env + "
                             "test_list.txt)")
    parser.add_argument("--cross-id", action="store_true",
                        help="drive a random other person's source frame "
                             "(with crop renormalization)")
    parser.add_argument("--max-videos", type=int, default=0,
                        help="cap on rendered test videos (0 = all)")
    parser.add_argument("--batch-size", type=int, default=8)
    args = parser.parse_args(argv)
    logger = setup(args)

    if args.video:
        return _video_reenactment(args, logger)

    if args.synthetic and (args.source_image is None or args.coeff_dir is None):
        args.source_image, args.coeff_dir = _synthetic_inputs(
            os.path.join(args.out, "_synthetic_in"), args.resolution)

    from ..render.data import load_coeff_dir_clip

    coeffs = load_coeff_dir_clip(args.coeff_dir)
    coeff_nc = coeffs.shape[-1]  # 56 (pose+exp) or 58+ with cam/shape merged
    src = _load_source_image(args.source_image, args.resolution)
    if args.torch_checkpoint:
        # reference checkpoint layout: {'net_G': sd, 'net_G_ema': sd, ...}
        # (Pirender/trainers/base.py save); inference uses the EMA weights
        import torch

        from ..render.import_torch import torch_face_generator_to_flax

        payload = torch.load(args.torch_checkpoint, map_location="cpu",
                             weights_only=False)
        sd = payload
        if isinstance(payload, dict) and not any(
                k.startswith("mapping_net") for k in payload):
            sd = payload.get("net_G_ema") or payload.get("net_G") or payload
        params = torch_face_generator_to_flax(sd)
        # model dims follow the checkpoint, not the CLI flags
        ckpt_nc = params["mapping_net"]["pre"]["kernel"].shape[1]
        if ckpt_nc != coeff_nc:
            logger.warning(f"coefficient dim mismatch: checkpoint expects "
                           f"{ckpt_nc}, data has {coeff_nc}")
        model = FaceGenerator(flame_coeff_nc=ckpt_nc, coeff_nc=73)
    elif args.checkpoint:
        model = FaceGenerator(flame_coeff_nc=coeff_nc, coeff_nc=73,
                              descriptor_nc=32 if args.synthetic else 256,
                              mapping_layers=2 if args.synthetic else 3)
        payload = load_checkpoint(args.checkpoint)["params"]
        params = payload.get("net_G_ema", payload)
    else:
        model = FaceGenerator(flame_coeff_nc=coeff_nc, coeff_nc=73,
                              descriptor_nc=32 if args.synthetic else 256,
                              mapping_layers=2 if args.synthetic else 3)
        dummy_sem = np.zeros((1, coeff_nc, 2 * args.semantic_radius + 1),
                             np.float32)
        params = model.init(jax.random.PRNGKey(0), src[None], dummy_sem)["params"]
        logger.warning("no --checkpoint: rendering with a random generator")
    from ..render.inference import render_clip

    out = render_clip(model, params, src, coeffs,
                      semantic_radius=args.semantic_radius)
    from PIL import Image

    for kind in ("fake_image", "warp_image"):
        kdir = os.path.join(args.out, kind.split("_")[0])
        os.makedirs(kdir, exist_ok=True)
        for i, frame in enumerate(out[kind]):
            arr = ((np.clip(frame, -1, 1) + 1) * 127.5).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(kdir, f"{i:05d}.png"))
    logger.info(f"rendered {out['fake_image'].shape[0]} frames to {args.out} "
                f"(fake/ + warp/)")
    return out


if __name__ == "__main__":
    main()
