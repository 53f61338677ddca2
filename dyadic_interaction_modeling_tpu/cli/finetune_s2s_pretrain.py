"""Listener finetune on ViCo (reference: ``code/finetune_s2s_pretrain.py``).

Loads the pretrained SLM weights into SLMFT (shared stack), finetunes on
ViCo dyadic clips, evaluates the FD battery each epoch and keeps the best-FD
checkpoint ('best_vico_causal.pt' semantics, finetune_s2s_pretrain.py:140-143).
"""

from __future__ import annotations

import jax

from ..config import slm_defaults
from ..data.datasets import ViCoDataset
from ..data.loader import PaddedBatchLoader, slm_batch_from_collated
from ..data.synthetic import synthetic_vico_dataset
from ..engine.pt_engine import evaluate_finetune_epoch, make_slm_train_step, train_epoch
from ..engine.train_state import create_train_state
from ..metrics.reporting import print_metrics
from ..models.slm import SLMFT, SLMFT_FROZEN_SUBSTRINGS
from ..utils.checkpoint import BestCheckpointKeeper, load_checkpoint, partial_load
from .common import get_parser, load_config, setup, vq_cfg_for
from .train_s2s_pretrain import load_pretrained_vqs


def make_loaders(args, batch_size: int):
    if args.synthetic:
        train = synthetic_vico_dataset(n_clips=16)
        val = synthetic_vico_dataset(n_clips=8, seed=3)
    else:
        train = ViCoDataset("../data/vico_processed_30fps", "../data/RLD_data.csv",
                            "train")
        val = ViCoDataset("../data/vico_processed_30fps", "../data/RLD_data.csv",
                          "test")
    return (PaddedBatchLoader(train, batch_size, shuffle=True),
            PaddedBatchLoader(val, batch_size, shuffle=False))


def _batches(loader, with_ids=False):
    import jax.numpy as jnp

    for collated in loader:
        b = tuple(jnp.asarray(x) for x in slm_batch_from_collated(collated))
        yield b + (collated[5],) if with_ids else b


def main(argv=None):
    parser = get_parser("SLMFT listener finetune")
    parser.add_argument("--pretrained", type=str, default=None,
                        help="orbax checkpoint from train_s2s_pretrain")
    parser.add_argument("--speaker-vq", type=str, default=None)
    parser.add_argument("--listener-vq", type=str, default=None)
    parser.add_argument("--batch-size", type=int, default=4)
    # Reference: AdamW(lr=1e-5) w/ torch default weight_decay=0.01 + clip=1.0
    # (finetune_s2s_pretrain.py:60,77,118,135; x_engine_pt.py:37-38).
    parser.add_argument("--lr", type=float, default=1e-5)
    parser.add_argument("--weight-decay", type=float, default=0.01)
    parser.add_argument("--clip-norm", type=float, default=1.0)
    parser.add_argument("--dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--vq-token-cache", action="store_true",
                        help="tokenize each clip once with the frozen VQs and "
                             "reuse across epochs (identical numerics; "
                             "engine.VQTokenCache)")
    args = parser.parse_args(argv)
    logger = setup(args)
    slm_cfg = load_config(args, slm_defaults)
    vq_cfg = vq_cfg_for(slm_cfg, args.synthetic)

    import jax.numpy as jnp

    model = SLMFT(slm_cfg, vq_cfg, dtype=getattr(jnp, args.dtype))
    train_loader, val_loader = make_loaders(args, args.batch_size)
    if args.prefetch:
        from ..data.loader import PrefetchLoader

        train_loader = PrefetchLoader(train_loader, depth=args.prefetch)
    rng = jax.random.PRNGKey(0)
    batch0 = next(_batches(train_loader))
    params = model.init(jax.random.PRNGKey(1), *batch0, rng)["params"]
    params = load_pretrained_vqs(params, vq_cfg, args.speaker_vq, args.listener_vq)
    if args.pretrained:
        loaded = load_checkpoint(args.pretrained)["params"]
        # SLM -> SLMFT partial load: shared encoder/decoder/patch embeds
        # (legacy key handling mirrors finetune_s2s_pretrain.py:47-58)
        params = partial_load(params, loaded)
    state = create_train_state(model, params, args.lr,
                               weight_decay=args.weight_decay,
                               clip_norm=args.clip_norm,
                               frozen_substrings=SLMFT_FROZEN_SUBSTRINGS)
    from ..parallel import MeshPlan

    plan = MeshPlan.parse(getattr(args, "mesh", None))
    if plan:
        state = plan.shard_state(state)
        logger.info(f"training on a {plan.describe()}")
    step = make_slm_train_step(model, with_vq_tokens=args.vq_token_cache)
    vq_cache = None
    if args.vq_token_cache:
        from ..engine.pt_engine import VQTokenCache

        vq_cache = VQTokenCache(model)
    save_dir = args.save_path or "./runs_vico_ft/model"
    keeper = BestCheckpointKeeper(save_dir)
    from ..utils.observability import MetricsWriter

    writer = MetricsWriter(save_dir, hparams=slm_cfg)

    epochs = slm_cfg.get_or("epochs", 10)
    for epoch in range(epochs):
        train_loader.set_epoch(epoch)
        rng, sub = jax.random.split(rng)
        if vq_cache:
            # see train_s2s_pretrain: snapshot params (the step donates its
            # state) for the lazy frozen-VQ tokenization
            from .train_s2s_pretrain import _slm_batches_with_vq_tokens

            tok_params = jax.tree_util.tree_map(
                lambda x: jnp.array(x, copy=True), state.params)
            batches = _slm_batches_with_vq_tokens(train_loader, vq_cache,
                                                  tok_params)
        else:
            batches = _batches(train_loader)
        if plan:
            batches = plan.batches(batches)
        state, logs = train_epoch(state, batches, step, sub,
                                  epoch=epoch, logger=logger)
        rng, sub = jax.random.split(rng)
        y_true, y_pred, xs, _ = evaluate_finetune_epoch(
            state.params, model, _batches(val_loader), sub)
        metrics = print_metrics(y_true, y_pred, xs, verbose=False)
        fd = metrics["fid_pose"] + metrics["fid_exp"]
        logger.info(f"Epoch {epoch}: FD pose {metrics['fid_pose']:.4f} "
                    f"exp {metrics['fid_exp']:.4f}")
        if logs:
            writer.add_scalars(logs, epoch + 1, prefix="train/")
        import numpy as _np

        writer.add_scalars({k: float(v) for k, v in metrics.items()
                            if _np.isscalar(v) or _np.ndim(v) == 0},
                           epoch + 1, prefix="val/")
        writer.add_scalar("learning_rate", args.lr, epoch + 1)
        if keeper.update(fd, state.params, epoch):
            logger.info(f"Epoch {epoch}: new best FD {fd:.4f}")
    writer.close()
    return state, keeper


if __name__ == "__main__":
    main()
