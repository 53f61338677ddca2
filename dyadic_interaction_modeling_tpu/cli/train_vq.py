"""Stage-1 VQ-VAE training (reference: ``code/train_vq.py``).

Usage: ``python -m dyadic_interaction_modeling_tpu.cli.train_vq --config
config.yaml [KEY VALUE ...]`` - same CLI surface as the reference
(README.md:64-70). The reference's DDP/mp.spawn machinery
(train_vq.py:42-102) is replaced by a jitted data-parallel step on a device
mesh; checkpoints are orbax with best-val gating (train_vq.py:165-170).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import vq_listener_defaults
from ..data.loader import PaddedBatchLoader
from ..data.synthetic import synthetic_vico_dataset
from ..engine.train_state import create_train_state
from ..engine.vq_engine import make_vq_eval_step, make_vq_train_step, train_epoch, validate
from ..models import get_model
from ..utils.checkpoint import BestCheckpointKeeper
from .common import get_parser, load_config, setup


def _motion_collate(batch, min_bucket=32, max_len=1024):
    """Single-stream motion clips -> dense (B, L, C) batch; VQ training pads
    by repeating the last frame (lengths are not used by the reference's VQ
    loss, which trains on full dense clips at batch size 1)."""
    from ..data.loader import bucket_length

    xs = [b[0] for b in batch]
    L = bucket_length(max(len(x) for x in xs), min_bucket, max_len)
    dense = np.stack([np.concatenate(
        [x[:L], np.repeat(x[-1:], max(0, L - len(x)), axis=0)], axis=0)
        for x in xs])
    return jnp.asarray(dense)


def build_dataset(cfg, synthetic: bool, speaker: bool):
    if synthetic:
        base = synthetic_vico_dataset(n_clips=32, min_len=24, max_len=64,
                                      motion_dim=56)
        if speaker:
            # AV stream: motion + audio (824-d)
            class _AV:
                def __len__(self):
                    return len(base)

                def __getitem__(self, i):
                    combined, listener, *_ = base[i]
                    audio = combined[:, 56:]
                    return np.concatenate([listener, audio], axis=1), i

            return _AV(), _AV()
        class _Motion:
            def __len__(self):
                return len(base)

            def __getitem__(self, i):
                return base[i][1], i

        return _Motion(), _Motion()
    from ..data.datasets import ViCoListenerDataset, ViCoSpeakerDataset

    cls = ViCoSpeakerDataset if speaker else ViCoListenerDataset
    train = cls(cfg.get_or("data_path", "../data/vico_processed_30fps"),
                cfg.get_or("meta_data_path", "../data/RLD_data.csv"), "train")
    val = cls(cfg.get_or("data_path", "../data/vico_processed_30fps"),
              cfg.get_or("meta_data_path", "../data/RLD_data.csv"), "test")
    return train, val


def main(argv=None):
    args = get_parser("train stage-1 VQ-VAE").parse_args(argv)
    logger = setup(args)
    speaker = False
    cfg = load_config(args, vq_listener_defaults)
    if cfg.get_or("face_quan_num", 1) > 1 or cfg.in_dim > 56:
        speaker = cfg.in_dim > 56
    model = get_model(cfg)
    audio_visual = speaker and cfg.in_dim > 56

    train_ds, val_ds = build_dataset(cfg, args.synthetic, speaker)
    train_loader = PaddedBatchLoader(train_ds, cfg.get_or("batch_size", 1),
                                     shuffle=True, collate=_motion_collate)
    val_loader = PaddedBatchLoader(val_ds, cfg.get_or("batch_size_val", 1),
                                   shuffle=False, collate=_motion_collate)

    sample = next(iter(train_loader))
    if getattr(args, "prefetch", 0):
        from ..data.loader import PrefetchLoader

        train_loader = PrefetchLoader(train_loader, depth=args.prefetch)
    params = model.init(jax.random.PRNGKey(cfg.get_or("manual_seed", 131)), sample)
    # Reference quirk: the AdamW branch passes no weight_decay, so torch's
    # DEFAULT 0.01 applies and the config's weight_decay (0.002) is IGNORED
    # (train_vq.py:112; only the unused SGD branch at :109-110 reads it).
    # Reproduced deliberately; opt out with `adamw_config_weight_decay True`
    # on the CLI to honor the config value instead.
    if cfg.get_or("adamw_config_weight_decay", False):
        weight_decay = cfg.get_or("weight_decay", 0.0)
    else:
        weight_decay = 0.01
    state = create_train_state(model, params, cfg.base_lr,
                               weight_decay=weight_decay)
    from ..parallel import MeshPlan

    plan = MeshPlan.parse(getattr(args, "mesh", None))
    if plan:
        state = plan.shard_state(state)
        logger.info(f"training on a {plan.describe()}")
    step = make_vq_train_step(model, cfg.get_or("quant_loss_weight", 1.0),
                              audio_visual)
    eval_step = make_vq_eval_step(model, cfg.get_or("quant_loss_weight", 1.0),
                                  audio_visual)
    save_dir = (args.save_path or cfg.get_or("save_path", None)
                or "./runs_vq/model")
    keeper = BestCheckpointKeeper(save_dir)
    # tensorboard-equivalent scalars (train_vq.py:68,147-149,230-233)
    from ..utils.observability import MetricsWriter

    writer = MetricsWriter(save_dir, hparams=cfg)

    steps_per_epoch = len(train_ds) // max(1, cfg.get_or("batch_size", 1))
    for epoch in range(cfg.epochs):
        train_loader.set_epoch(epoch)
        state, metrics = train_epoch(state,
                                     plan.batches(train_loader) if plan
                                     else train_loader, step, epoch=epoch,
                                     print_freq=cfg.get_or("print_freq", 500),
                                     logger=logger, writer=writer,
                                     step_offset=epoch * steps_per_epoch,
                                     lr=cfg.base_lr)
        for k in ("rec_loss", "quant_loss", "perplexity"):
            if k in metrics:
                writer.add_scalar(f"train/{k}", metrics[k], epoch + 1)
        val = validate(state.params, val_loader, eval_step)
        logger.info(f"Epoch {epoch} val: " +
                    " ".join(f"{k} {v:.4f}" for k, v in val.items()))
        for k in ("rec_loss", "quant_loss", "perplexity"):
            writer.add_scalar(f"val/{k}", val[k], epoch + 1)
        if keeper.update(val["rec_loss"], state.params, epoch):
            logger.info(f"Epoch {epoch}: new best rec_loss {val['rec_loss']:.4f}")
    writer.close()
    return state, keeper


if __name__ == "__main__":
    main()
