"""Listener evaluation with best-of-N sampling
(reference: ``code/test_s2s_pretrain.py``).

Loads the finetuned SLMFT checkpoint, generates with beam_size=10 best-of-N
by per-clip FD (x_engine_pt.py:232-277), prints the full metric battery and
pickles predictions ('l2l_listener_predictions.pkl' layout,
test_s2s_pretrain.py:77-84).
"""

from __future__ import annotations

import pickle

import jax

from ..config import slm_defaults, vq_listener_defaults
from ..data.loader import PaddedBatchLoader, slm_batch_from_collated
from ..engine.pt_engine import evaluate_test_epoch, make_slmft_generator
from ..metrics.reporting import print_metrics, print_metrics_full
from ..models.slm import SLMFT
from ..utils.checkpoint import load_checkpoint
from .common import get_parser, load_config, setup, vq_cfg_for
from .finetune_s2s_pretrain import make_loaders, _batches


def main(argv=None):
    parser = get_parser("SLMFT best-of-N evaluation")
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--torch-checkpoint", type=str, default=None,
                        help="reference-format .pt (e.g. best_vico_causal.pt)")
    parser.add_argument("--beam-size", type=int, default=10)
    parser.add_argument("--batch-size", type=int, default=4)
    parser.add_argument("--out", type=str, default="l2l_listener_predictions.pkl")
    args = parser.parse_args(argv)
    logger = setup(args)
    slm_cfg = load_config(args, slm_defaults)
    vq_cfg = vq_cfg_for(slm_cfg, args.synthetic)

    model = SLMFT(slm_cfg, vq_cfg)
    _, val_loader = make_loaders(args, args.batch_size)
    rng = jax.random.PRNGKey(0)
    batch0 = next(_batches(val_loader))
    if args.checkpoint:
        params = load_checkpoint(args.checkpoint)["params"]
    elif args.torch_checkpoint:
        from .common import load_torch_slm_params

        template = model.init(jax.random.PRNGKey(1), *batch0, rng)["params"]
        params = load_torch_slm_params(args.torch_checkpoint, template,
                                       slm_cfg, vq_cfg, variant="slmft")
    else:
        params = model.init(jax.random.PRNGKey(1), *batch0, rng)["params"]
        logger.warning("no --checkpoint given: evaluating random init")

    gen = make_slmft_generator(model, slm_cfg, max_len=int(batch0[0].shape[1]))
    y_true, y_pred, xs, ids = evaluate_test_epoch(
        params, model, gen, _batches(val_loader, with_ids=True), rng,
        beam_size=args.beam_size)
    print_metrics(y_true, y_pred, xs)
    print_metrics_full(y_true, y_pred, xs)
    with open(args.out, "wb") as f:
        pickle.dump({"y_true": y_true, "y_pred": y_pred, "x": xs, "ids": ids}, f)
    logger.info(f"wrote {args.out}")


if __name__ == "__main__":
    main()
