"""Non-pretrained seq2seq listener training (reference: ``code/train_s2s.py``).

Trains ListenerGenerator on ViCo with CE + continuous loss, tracking val
perplexity (the reference's headline numbers: 41.47 no-pretrain / 28.3
pretrained, train_s2s.py:286-287).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import listener_generator_defaults, vq_listener_defaults
from ..engine.train_state import create_train_state

from ..models.listener_generator import ListenerGenerator
from ..utils.checkpoint import BestCheckpointKeeper
from .common import get_parser, load_config, setup
from .finetune_s2s_pretrain import make_loaders


# ListenerGenerator freezes the full speaker VQ and the listener encoder+
# quantizer (seq2seq.py:164-175)
LG_FROZEN = ("speaker_vq/", "listener_vq/quantize", "listener_vq/encoder")


def _batches(loader):
    for collated in loader:
        src, tgt, lens, mask, (sp, li), names = collated
        yield (jnp.asarray(src[..., :56]), jnp.asarray(tgt), jnp.asarray(mask),
               jnp.asarray(sp), jnp.asarray(li))


def _main_continuous(args, cfg, logger):
    """Continuous-decoder branch (reference train_s2s.py:97 +
    x_engine.train_continuous_epoch; best val loss 0.54554 noted at
    train_s2s.py:289)."""
    from ..engine.s2s_engine import (
        evaluate_continuous_epoch,
        make_continuous_train_step,
        train_continuous_epoch,
    )
    from ..models.listener_generator import ContinuousSeq2Seq

    model = ContinuousSeq2Seq(cfg)
    train_loader, val_loader = make_loaders(args, args.batch_size)

    def cbatches(loader):
        for b in _batches(loader):
            yield b[0], b[1], b[2]

    src, tgt, mask = next(cbatches(train_loader))
    params = model.init(jax.random.PRNGKey(0), src, tgt, mask)["params"]
    state = create_train_state(model, params, args.lr,
                               weight_decay=args.weight_decay,
                               clip_norm=args.clip_norm)
    from ..parallel import MeshPlan

    plan = MeshPlan.parse(getattr(args, "mesh", None))
    if plan:
        state = plan.shard_state(state)
        logger.info(f"training on a {plan.describe()}")
    step = make_continuous_train_step(model)
    save_dir = args.save_path or "./runs_s2s_cont/model"
    keeper = BestCheckpointKeeper(save_dir)
    from ..utils.observability import MetricsWriter

    writer = MetricsWriter(save_dir, hparams=cfg)
    for epoch in range(cfg.get_or("epochs", 10)):
        train_loader.set_epoch(epoch)
        state, train_loss = train_continuous_epoch(
            state, plan.batches(cbatches(train_loader)) if plan
            else cbatches(train_loader), step, epoch=epoch, logger=logger)
        val = evaluate_continuous_epoch(state.params, model,
                                        cbatches(val_loader))
        logger.info(f"Epoch {epoch}: val MSE {val:.5f}")
        writer.add_scalar("val/loss", val, epoch + 1)
        writer.add_scalar("learning_rate", args.lr, epoch + 1)
        if keeper.update(val, state.params, epoch):
            logger.info(f"Epoch {epoch}: new best {val:.5f}")
    writer.close()
    return state, keeper


def main(argv=None):
    parser = get_parser("ListenerGenerator training")
    parser.add_argument("--batch-size", type=int, default=4)
    # Reference: AdamW(lr=1e-5) w/ torch default weight_decay=0.01; its epoch
    # loop passes clip=0.0 (train_s2s.py:80,96).
    parser.add_argument("--lr", type=float, default=1e-5)
    parser.add_argument("--weight-decay", type=float, default=0.01)
    parser.add_argument("--clip-norm", type=float, default=0.0)
    parser.add_argument("--use-ids", action="store_true",
                        help="condition on speaker/listener identity embeddings")
    parser.add_argument("--continuous", action="store_true",
                        help="train the continuous (MSE AR) seq2seq instead "
                             "of the token generator - the reference keeps "
                             "this branch dormant (train_s2s.py:97, "
                             "x_engine.py:38-62)")
    args = parser.parse_args(argv)
    logger = setup(args)
    cfg = load_config(args, listener_generator_defaults)
    if args.continuous:
        return _main_continuous(args, cfg, logger)
    vq_cfg = vq_listener_defaults()
    vq_cfg.n_embed = cfg.dec_num_tokens  # decoder predicts listener VQ codes
    if args.synthetic and cfg.dim < 128:
        vq_cfg.update(dict(hidden_size=max(32, cfg.dim), num_hidden_layers=1,
                           num_attention_heads=2,
                           intermediate_size=2 * max(32, cfg.dim), zquant_dim=32))

    model = ListenerGenerator(cfg, vq_cfg, vq_cfg)
    train_loader, val_loader = make_loaders(args, args.batch_size)
    b0 = next(_batches(train_loader))
    sp0, li0 = (b0[3], b0[4]) if args.use_ids else (None, None)
    params = model.init(jax.random.PRNGKey(0), b0[0], b0[1], b0[2], sp0, li0)["params"]
    state = create_train_state(model, params, args.lr,
                               weight_decay=args.weight_decay,
                               clip_norm=args.clip_norm,
                               frozen_substrings=LG_FROZEN)
    from ..parallel import MeshPlan

    plan = MeshPlan.parse(getattr(args, "mesh", None))
    if plan:
        state = plan.shard_state(state)
        logger.info(f"training on a {plan.describe()}")

    def loss_fn(p, batch, use_ids):
        src, tgt, mask, sp, li = batch
        out = model.apply({"params": p}, src, tgt, mask,
                          sp if use_ids else None, li if use_ids else None)
        return out.loss

    @jax.jit
    def step(state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, args.use_ids)
        return state.apply_gradients(grads=grads), loss

    save_dir = args.save_path or "./runs_s2s/model"
    keeper = BestCheckpointKeeper(save_dir)
    from ..utils.observability import MetricsWriter

    writer = MetricsWriter(save_dir, hparams=cfg)
    epochs = cfg.get_or("epochs", 10)
    for epoch in range(epochs):
        train_loader.set_epoch(epoch)
        train_batches = (plan.batches(_batches(train_loader)) if plan
                         else _batches(train_loader))
        for batch in train_batches:
            state, loss = step(state, batch)
        val_losses = [float(loss_fn(state.params, b, args.use_ids))
                      for b in _batches(val_loader)]
        val = float(np.mean(val_losses))
        logger.info(f"Epoch {epoch}: train loss {float(loss):.4f} val loss {val:.4f}")
        writer.add_scalar("train/loss", float(loss), epoch + 1)
        writer.add_scalar("val/loss", val, epoch + 1)
        writer.add_scalar("learning_rate", args.lr, epoch + 1)
        if keeper.update(val, state.params, epoch):
            logger.info(f"Epoch {epoch}: new best val {val:.4f}")
    writer.close()
    return state, keeper


if __name__ == "__main__":
    main()
