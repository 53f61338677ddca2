"""EmocaConverter training (reference: ``code/train_converter.py``).

MSE mesh loss + 5x mouth-region MSE (train_converter.py:34), frozen speaker
VQ; keeps the best-val checkpoint ('best_converter.pt' semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import vq_listener_defaults
from ..data.synthetic import synthetic_biwi_dataset, synthetic_vico_dataset
from ..engine.train_state import create_train_state
from ..models.slm import CONVERTER_FROZEN_SUBSTRINGS, EmocaConverter
from ..utils.checkpoint import BestCheckpointKeeper
from .common import get_parser, load_config, setup


def main(argv=None):
    parser = get_parser("EmocaConverter training")
    # Reference: AdamW(lr=1e-5) w/ torch default weight_decay=0.01
    # (train_converter.py:78). It passes clip=1.0, but its train_epoch calls
    # clip_grad_norm_ BEFORE loss.backward() (train_converter.py:35-37), when
    # grads are still zeroed -- so clipping is a no-op there; default 0 here.
    parser.add_argument("--lr", type=float, default=1e-5)
    parser.add_argument("--weight-decay", type=float, default=0.01)
    parser.add_argument("--clip-norm", type=float, default=0.0)
    parser.add_argument("--mouth-weight", type=float, default=5.0)
    parser.add_argument("--mouth-map", type=str, default=None,
                        help="path to lve.txt region file")
    parser.add_argument("--vertice-dim", type=int, default=70110)
    args = parser.parse_args(argv)
    logger = setup(args)
    vq_cfg = load_config(args, vq_listener_defaults)

    mouth_map = None
    if args.mouth_map:
        with open(args.mouth_map) as f:
            mouth_map = jnp.asarray([int(i) for i in f.read().split(", ")])

    model = EmocaConverter(vq_cfg, vertice_dim=args.vertice_dim)

    if args.synthetic:
        items, _ = synthetic_biwi_dataset(n_clips=8, length=24,
                                          n_vertices=args.vertice_dim // 3)
        motion = synthetic_vico_dataset(n_clips=8, min_len=24, max_len=24)
        batches = []
        for i, item in enumerate(items):
            emoca = motion[i][1][:24]
            batches.append((jnp.asarray(item["template"])[None],
                            jnp.asarray(emoca)[None],
                            jnp.asarray(item["vertice"])[None]))
    else:
        raise SystemExit("real converter data loading requires the BIWI/EMOCA "
                         "pairing pipeline; run with --synthetic or provide "
                         "a custom loader")

    params = model.init(jax.random.PRNGKey(0), *batches[0][:2])["params"]
    state = create_train_state(model, params, args.lr,
                               weight_decay=args.weight_decay,
                               clip_norm=args.clip_norm,
                               frozen_substrings=CONVERTER_FROZEN_SUBSTRINGS)

    def loss_fn(p, template, emoca, verts):
        out = model.apply({"params": p}, template, emoca)
        mse = jnp.mean(jnp.square(out - verts))
        if mouth_map is not None:
            o = out.reshape(out.shape[0], out.shape[1], -1, 3)[:, :, mouth_map]
            v = verts.reshape(out.shape[0], out.shape[1], -1, 3)[:, :, mouth_map]
            mse = mse + args.mouth_weight * jnp.mean(jnp.square(o - v))
        return mse

    @jax.jit
    def step(state, template, emoca, verts):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, template, emoca, verts)
        return state.apply_gradients(grads=grads), loss

    keeper = BestCheckpointKeeper(args.save_path or "./runs_converter/model")
    epochs = args.epochs or 10
    for epoch in range(epochs):
        losses = []
        for template, emoca, verts in batches:
            state, loss = step(state, template, emoca, verts)
            losses.append(float(loss))
        val = float(np.mean(losses))
        logger.info(f"Epoch {epoch}: loss {val:.6f}")
        if keeper.update(val, state.params, epoch):
            logger.info(f"Epoch {epoch}: new best {val:.6f}")
    return state, keeper


if __name__ == "__main__":
    main()
