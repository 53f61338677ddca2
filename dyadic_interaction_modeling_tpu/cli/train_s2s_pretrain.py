"""Dyadic SLM pretraining on CANDOR (reference: ``code/train_s2s_pretrain.py``).

The reference runs at import time with nn.DataParallel (train_s2s_pretrain.py:39-64);
here: explicit main(), jitted train step, frozen VQ encoders/quantizers via
optimizer masks, best-val orbax checkpoint ('best_model_candor_pretrain_15'
semantics, :60-64).
"""

from __future__ import annotations

import jax

from ..config import slm_defaults
from ..data.datasets import CandorDataset, candor_split
from ..data.loader import PaddedBatchLoader, slm_batch_from_collated
from ..data.synthetic import synthetic_candor_dataset
from ..engine.pt_engine import (VQTokenCache, evaluate_epoch,
                                make_slm_train_step, train_epoch)
from ..engine.train_state import create_train_state
from ..models.slm import SLM, SLM_FROZEN_SUBSTRINGS
from ..utils.checkpoint import BestCheckpointKeeper, graft_subtree, load_torch_checkpoint
from ..utils.torch_import import torch_vq_to_flax
from .common import get_parser, load_config, setup, vq_cfg_for


def load_pretrained_vqs(params, cfg, speaker_ckpt=None, listener_ckpt=None):
    """Graft reference-trained VQ weights into the SLM tree
    (seq2seq_pretrain.py:86-93)."""
    if speaker_ckpt:
        sd = load_torch_checkpoint(speaker_ckpt)
        params = graft_subtree(params, "speaker_vq",
                               torch_vq_to_flax(sd, cfg)["params"])
    if listener_ckpt:
        sd = load_torch_checkpoint(listener_ckpt)
        params = graft_subtree(params, "listener_vq",
                               torch_vq_to_flax(sd, cfg)["params"])
    return params


def make_loaders(args, batch_size: int):
    if args.synthetic:
        train = synthetic_candor_dataset(n_clips=32)
        val = synthetic_candor_dataset(n_clips=8, seed=1)
    else:
        tr, va = candor_split("../data/candor_processed/speaker",
                              "../data/candor_processed/listener")
        train, val = CandorDataset(tr), CandorDataset(va)
    return (PaddedBatchLoader(train, batch_size, shuffle=True),
            PaddedBatchLoader(val, batch_size, shuffle=False))


def _slm_batches(loader):
    import jax.numpy as jnp

    for collated in loader:
        yield tuple(jnp.asarray(x) for x in slm_batch_from_collated(collated))


def _slm_batches_with_vq_tokens(loader, cache, params):
    """Batches extended with cached frozen-VQ tokens (engine.VQTokenCache):
    the tokenizers are frozen, so clips are tokenized once across all
    epochs regardless of shuffling."""
    import jax.numpy as jnp

    for collated in loader:
        names = collated[5] if len(collated) > 5 else None
        batch = tuple(jnp.asarray(x) for x in slm_batch_from_collated(collated))
        yield batch + tuple(cache(params, batch, names))


def main(argv=None):
    parser = get_parser("SLM dyadic pretraining")
    parser.add_argument("--speaker-vq", type=str, default=None)
    parser.add_argument("--listener-vq", type=str, default=None)
    parser.add_argument("--batch-size", type=int, default=32)
    # Reference: torch.optim.AdamW(lr=1e-5) -- torch's DEFAULT
    # weight_decay=0.01 -- plus clip=1.0 in the engine
    # (train_s2s_pretrain.py:45,59; x_engine_pt.py:37-38).
    parser.add_argument("--lr", type=float, default=1e-5)
    parser.add_argument("--weight-decay", type=float, default=0.01)
    parser.add_argument("--clip-norm", type=float, default=1.0)
    parser.add_argument("--dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--vq-token-cache", action="store_true",
                        help="tokenize each clip once with the frozen VQs "
                             "and reuse across epochs (identical numerics, "
                             "~16%% faster steps - PERF.md)")
    args = parser.parse_args(argv)
    logger = setup(args)
    slm_cfg = load_config(args, slm_defaults)
    vq_cfg = vq_cfg_for(slm_cfg, args.synthetic)

    import jax.numpy as jnp

    model = SLM(slm_cfg, vq_cfg, dtype=getattr(jnp, args.dtype))
    train_loader, val_loader = make_loaders(args, args.batch_size)
    if args.prefetch:
        from ..data.loader import PrefetchLoader

        train_loader = PrefetchLoader(train_loader, depth=args.prefetch)
    batch0 = next(_slm_batches(train_loader))
    rng = jax.random.PRNGKey(0)
    params = model.init(jax.random.PRNGKey(1), *batch0, rng)["params"]
    params = load_pretrained_vqs(params, vq_cfg, args.speaker_vq, args.listener_vq)
    state = create_train_state(model, params, args.lr,
                               weight_decay=args.weight_decay,
                               clip_norm=args.clip_norm,
                               frozen_substrings=SLM_FROZEN_SUBSTRINGS)
    from ..parallel import MeshPlan

    plan = MeshPlan.parse(getattr(args, "mesh", None))
    if plan:
        state = plan.shard_state(state)
        logger.info(f"training on a {plan.describe()}")
    step = make_slm_train_step(model, with_vq_tokens=args.vq_token_cache)
    save_dir = args.save_path or "./runs_pretrain/model"
    keeper = BestCheckpointKeeper(save_dir)
    vq_cache = VQTokenCache(model) if args.vq_token_cache else None
    from ..utils.observability import MetricsWriter

    writer = MetricsWriter(save_dir, hparams=slm_cfg)

    epochs = slm_cfg.get_or("epochs", 10)
    for epoch in range(epochs):
        train_loader.set_epoch(epoch)
        rng, sub = jax.random.split(rng)
        if vq_cache:
            # snapshot the params for lazy tokenization: the train step
            # DONATES its state, so buffers referenced by this generator
            # would be deleted mid-epoch (the VQs are frozen - any step's
            # params tokenize identically)
            tok_params = jax.tree_util.tree_map(
                lambda x: jnp.array(x, copy=True), state.params)
            batches = _slm_batches_with_vq_tokens(train_loader, vq_cache,
                                                  tok_params)
        else:
            batches = _slm_batches(train_loader)
        if plan:
            batches = plan.batches(batches)
        state, logs = train_epoch(state, batches, step, sub,
                                  epoch=epoch, logger=logger)
        rng, sub = jax.random.split(rng)
        val = evaluate_epoch(state.params, model, _slm_batches(val_loader), sub)
        val_loss = sum(val[k] for k in ("l_ce_s", "l_ce_l", "l_cont_s",
                                        "l_cont_l", "nce"))
        logger.info(f"Epoch {epoch} val loss {val_loss:.4f}: {val}")
        if logs:
            writer.add_scalars(logs, epoch + 1, prefix="train/")
        writer.add_scalars(val, epoch + 1, prefix="val/")
        writer.add_scalar("val/loss", val_loss, epoch + 1)
        writer.add_scalar("learning_rate", args.lr, epoch + 1)
        if keeper.update(val_loss, state.params, epoch):
            logger.info(f"Epoch {epoch}: new best {val_loss:.4f}")
    writer.close()
    return state, keeper


if __name__ == "__main__":
    main()
