"""ListenerGenerator evaluation (reference: ``code/test_s2s.py``): AR
generation + metric battery."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import listener_generator_defaults, vq_listener_defaults
from ..metrics.reporting import print_metrics
from ..models.listener_generator import ListenerGenerator
from ..models.xtrans import TokenDecoder, generate_tokens
from ..utils.checkpoint import load_checkpoint
from .common import get_parser, load_config, setup
from .finetune_s2s_pretrain import make_loaders
from .train_s2s import _batches


def main(argv=None):
    parser = get_parser("ListenerGenerator evaluation")
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--torch-checkpoint", type=str, default=None,
                        help="reference-format seq2seq .pt")
    parser.add_argument("--batch-size", type=int, default=4)
    args = parser.parse_args(argv)
    logger = setup(args)
    cfg = load_config(args, listener_generator_defaults)
    vq_cfg = vq_listener_defaults()
    vq_cfg.n_embed = cfg.dec_num_tokens  # decoder predicts listener VQ codes
    if args.synthetic and cfg.dim < 128:
        vq_cfg.update(dict(hidden_size=max(32, cfg.dim), num_hidden_layers=1,
                           num_attention_heads=2,
                           intermediate_size=2 * max(32, cfg.dim), zquant_dim=32))

    model = ListenerGenerator(cfg, vq_cfg, vq_cfg)
    _, val_loader = make_loaders(args, args.batch_size)
    b0 = next(_batches(val_loader))
    if args.checkpoint:
        params = load_checkpoint(args.checkpoint)["params"]
    elif args.torch_checkpoint:
        import torch

        from ..utils.torch_import import torch_listener_generator_to_flax

        sd = torch.load(args.torch_checkpoint, map_location="cpu",
                        weights_only=True)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        template = model.init(jax.random.PRNGKey(0), b0[0], b0[1], b0[2])["params"]
        params = torch_listener_generator_to_flax(
            sd, cfg, vq_cfg, vq_cfg, params_template=template)["params"]
    else:
        params = model.init(jax.random.PRNGKey(0), b0[0], b0[1], b0[2])["params"]
        logger.warning("no --checkpoint given: evaluating random init")

    decoder = TokenDecoder(num_tokens=cfg.dec_num_tokens, dim=cfg.dim,
                           max_seq_len=cfg.dec_max_seq_len, depth=cfg.dec_depth,
                           heads=cfg.dec_heads)
    rng = jax.random.PRNGKey(1)
    y_true, y_pred, xs = [], [], []
    for batch in _batches(val_loader):
        src, tgt, mask = batch[:3]
        enc, prompt = model.apply({"params": params}, src, tgt, mask,
                                  method=ListenerGenerator.encode_context)
        rng, sub = jax.random.split(rng)
        toks = generate_tokens(decoder, {"params": params["generator"]["decoder"]},
                               prompt, int(src.shape[1]) - 1, enc, mask, sub)
        motion = np.asarray(model.apply(
            {"params": params}, toks,
            method=ListenerGenerator.decode_tokens_to_motion))
        lens = np.asarray(jnp.sum(mask, axis=1))
        tgt_np, src_np = np.asarray(tgt), np.asarray(src)
        for j in range(src.shape[0]):
            lj = int(lens[j])
            y_true.append(tgt_np[j, 1:lj])
            y_pred.append(motion[j, : lj - 1])
            xs.append(src_np[j, : lj - 1])
    print_metrics(y_true, y_pred, xs)


if __name__ == "__main__":
    main()
