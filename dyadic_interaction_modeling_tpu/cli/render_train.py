"""PIRender training entry (reference: ``code/Pirender/train.py:38-110``).

Twin invocation::

    python -m dyadic_interaction_modeling_tpu.cli.render_train \
        --save-path ./runs_pirender [--vgg-weights vgg19.pth] [--synthetic]

Reproduces: auto-resume from ``latest_checkpoint.txt``, the two-stage
warp->gen schedule, the 2-hour wall-clock limit, snapshot image grids and
scalar logs (tensorboardX-equivalent, utils/observability).
"""

from __future__ import annotations

import argparse
import os

import jax

from ..render.data import synthetic_render_dataset
from ..render.generator import FaceGenerator
from ..render.trainer import FaceTrainer
from .common import setup


def load_vgg_weights(path):
    """torchvision-format vgg19 state_dict (.pth) -> flax params."""
    import torch

    from ..render.perceptual import torch_vgg19_to_flax

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return torch_vgg19_to_flax(sd)


def main(argv=None):
    parser = argparse.ArgumentParser(description="PIRender training")
    parser.add_argument("--save-path", type=str, default="./runs_pirender")
    parser.add_argument("--data-root", type=str, default=None,
                        help="dir of clip dirs, each with frames/ + coeffs/; "
                             "or a prepared LMDB root; or (with --feat-root) "
                             "the VoxDataset_LM frame-dir root")
    parser.add_argument("--feat-root", type=str, default=None,
                        help="per-clip .pkl coefficient dir - selects the "
                             "reference's VoxDataset_LM dir layout "
                             "(vox_dataset.py:21-168); --data-root is then "
                             "the person/clip frame-dir root")
    parser.add_argument("--frame-dir-prefix", type=str, default="",
                        help="feat-name -> frame-dir prefix "
                             "('vid_vico_videos_' for the ViCo mode_split=2 "
                             "layout, vox_dataset.py:252)")
    parser.add_argument("--no-decapirender", action="store_true",
                        help="VoxDataset_LM: emit [exp, pose] (56-d) instead "
                             "of the shipped [exp, 0, 0, pose] 58-d layout "
                             "(face.yaml decapirender: 1)")
    parser.add_argument("--minimal-sample-distance", type=int, default=1)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--resolution", type=int, default=64)
    parser.add_argument("--coeff-nc", type=int, default=58)
    parser.add_argument("--semantic-radius", type=int, default=13)
    parser.add_argument("--use-spect", action="store_true")
    parser.add_argument("--lmdb-multiplier", type=int, default=100,
                        help="person-list repetition for LMDB data "
                             "(vox_dataset.py:370 uses 100)")
    parser.add_argument("--pretrain-warp-iteration", type=int, default=2)
    parser.add_argument("--max-epochs", type=int, default=1)
    parser.add_argument("--steps-per-epoch", type=int, default=4)
    parser.add_argument("--batch-size", type=int, default=2)
    parser.add_argument("--snapshot-iter", type=int, default=2)
    parser.add_argument("--logging-iter", type=int, default=1)
    parser.add_argument("--max-seconds", type=float, default=2 * 3600,
                        help="wall-clock limit (train.py:90-110)")
    parser.add_argument("--vgg-weights", type=str, default=None,
                        help="torchvision vgg19 state_dict (.pth); without it "
                             "the perceptual loss uses random VGG features")
    parser.add_argument("--perceptual", type=str, default="vgg19",
                        choices=["vgg19", "vgg16", "alexnet", "resnet50", "l1"],
                        help="perceptual trunk (reference perceptual.py:203-302"
                             "; shipped face.yaml uses vgg19)")
    parser.add_argument("--prefetch", type=int, default=0,
                        help="background-thread batch prefetch depth (0=off)")
    parser.add_argument("--debug", type=int, default=0, metavar="N",
                        help="run the test_everything debug harness for N "
                             "iterations instead of training "
                             "(train.py:83-87, trainers/base.py:147-166)")
    parser.add_argument("--speed-benchmark", action="store_true",
                        help="log per-iteration data/step timing averages "
                             "(trainers/base.py:82-87,330-358)")
    parser.add_argument("--mesh", type=str, default=None,
                        help="data-parallel training mesh: 'auto' or "
                             "'data=N' (parallel.MeshPlan; the reference "
                             "trains PIRender under DDP)")
    args = parser.parse_args(argv)
    logger = setup(args)

    if args.synthetic:
        ds = synthetic_render_dataset(n_clips=2, frames_per_clip=8,
                                      resolution=args.resolution,
                                      coeff_dim=args.coeff_nc,
                                      semantic_radius=args.semantic_radius)
        desc_nc, mapping_layers = 32, 2
    elif args.feat_root:
        # the reference's ViCo render-finetune layout: person/clip frame
        # dirs + per-clip pkl coefficient files (VoxDataset_LM)
        from ..render.data import VoxLMDirDataset

        if not args.data_root:
            raise SystemExit("--feat-root needs --data-root <frame-dir root>")
        ds = VoxLMDirDataset(
            args.data_root, args.feat_root, resolution=args.resolution,
            semantic_radius=args.semantic_radius,
            decapirender=not args.no_decapirender,
            minimal_sample_distance=args.minimal_sample_distance,
            multiplier=args.lmdb_multiplier,
            frame_dir_prefix=args.frame_dir_prefix)
        args.coeff_nc = ds[0]["source_semantics"].shape[0]
        desc_nc, mapping_layers = 256, 3
        logger.info(f"VoxDataset_LM layout: {len(set(ds.person_ids))} clips, "
                    f"coeff_nc={args.coeff_nc}")
    elif args.data_root and os.path.isfile(
            os.path.join(args.data_root, "train_list.txt")):
        # the reference's prepared-VoxCeleb LMDB layout (prepare_vox_lmdb.py)
        from ..render.data import VoxLmdbDataset

        ds = VoxLmdbDataset(args.data_root, resolution=args.resolution,
                            semantic_radius=args.semantic_radius,
                            multiplier=args.lmdb_multiplier)
        args.coeff_nc = 73  # transform_semantic output (vox_dataset.py:449-459)
        desc_nc, mapping_layers = 256, 3
        logger.info(f"LMDB data: {len(ds.video_items)} videos, "
                    f"{len(set(ds.person_ids))} persons")
    else:
        if not args.data_root:
            raise SystemExit("pass --data-root <dir of clip dirs with frames/ "
                             "+ coeffs/, or a prepared LMDB root with "
                             "train_list.txt> or --synthetic")
        from ..render.data import FramePairDataset, load_clip_dirs

        clips = load_clip_dirs(args.data_root, resolution=args.resolution)
        if not clips:
            raise SystemExit(f"no usable clips under {args.data_root}")
        args.coeff_nc = clips[0]["coeffs"].shape[-1]
        ds = FramePairDataset(clips, semantic_radius=args.semantic_radius)
        desc_nc, mapping_layers = 256, 3
        logger.info(f"loaded {len(clips)} clips (coeff_nc={args.coeff_nc})")
    model = FaceGenerator(flame_coeff_nc=args.coeff_nc, coeff_nc=73,
                          descriptor_nc=desc_nc, mapping_layers=mapping_layers,
                          use_spect=args.use_spect)
    sample = next(ds.batches(2, 1))
    params = model.init(jax.random.PRNGKey(0), sample["source_image"],
                        sample["source_semantics"])
    vgg_params = load_vgg_weights(args.vgg_weights) if args.vgg_weights else None
    trainer = FaceTrainer(model, params,
                          pretrain_warp_iteration=args.pretrain_warp_iteration,
                          vgg_params=vgg_params,
                          perceptual_network=args.perceptual,
                          save_dir=args.save_path,
                          max_seconds=args.max_seconds,
                          logger=logger)
    if trainer.load_latest():
        logger.info(f"resumed from iteration {trainer.iteration}")
    from ..parallel import MeshPlan

    plan = MeshPlan.parse(args.mesh)
    if plan:
        trainer.shard_with(plan)
        logger.info(f"training on a {plan.describe()}")

    def batches():
        # fresh generator (and prefetch wrap) per epoch: ds.batches is
        # single-use, and max_epochs > 1 would otherwise iterate an
        # exhausted generator and silently run zero steps
        b = ds.batches(args.batch_size, args.steps_per_epoch)
        if getattr(args, "prefetch", 0):
            from ..data.loader import PrefetchLoader

            b = PrefetchLoader(b, depth=args.prefetch)
        if plan:
            b = plan.batches(b)
        return b

    if args.debug:
        out = trainer.test_everything(batches, iterations=args.debug)
        logger.info(f"debug harness done at iteration {trainer.iteration}: {out}")
        return trainer
    trainer.train(batches,
                  max_epochs=args.max_epochs,
                  snapshot_iter=args.snapshot_iter,
                  logging_iter=args.logging_iter,
                  speed_benchmark=args.speed_benchmark)
    logger.info(f"done at iteration {trainer.iteration}; "
                f"checkpoints + logs under {args.save_path}")
    return trainer


if __name__ == "__main__":
    main()
