"""Stage-2 CodeTalker training.

The reference ships the model (``code/models/stage2.py``) and its registry
entry but no training script (training came from the upstream CodeTalker
repo); this CLI completes the path: frozen wav2vec2 conv feature extractor
(stage2.py:20 ``_freeze_parameters``) + frozen stage-1 VQ (stage2.py:46-47),
Adam, motion+regularisation MSE loss.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import codetalker_defaults
from ..engine.train_state import create_train_state
from ..models.codetalker import CodeTalker
from ..models.wav2vec2 import W2VConfig
from ..utils.checkpoint import BestCheckpointKeeper
from .common import get_parser, load_config, setup

# frozen: the wav2vec2 conv extractor and the whole stage-1 autoencoder
CODETALKER_FROZEN_SUBSTRINGS = ("audio_encoder/feature_extractor", "autoencoder/")


def main(argv=None):
    parser = get_parser("CodeTalker stage-2 training")
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--w2v-layers", type=int, default=None,
                        help="override wav2vec2 depth (synthetic smoke)")
    args = parser.parse_args(argv)
    logger = setup(args)
    cfg = load_config(args, codetalker_defaults)

    w2v = W2VConfig(num_hidden_layers=args.w2v_layers) if args.w2v_layers else None
    model = CodeTalker(cfg, w2v_cfg=w2v)

    if args.synthetic:
        from ..data.synthetic import synthetic_biwi_dataset

        n_v = cfg.vertice_dim // 3
        items, _ = synthetic_biwi_dataset(n_clips=4, length=8, n_vertices=n_v)
        one_hot = np.eye(len(cfg.train_subjects.split()), dtype=np.float32)
        batches = []
        for i, item in enumerate(items):
            audio = np.random.default_rng(i).standard_normal(8 * 533 + 400).astype(np.float32)
            batches.append((jnp.asarray(audio)[None],
                            jnp.asarray(item["template"])[None],
                            jnp.asarray(item["vertice"])[None],
                            jnp.asarray(one_hot[i % one_hot.shape[0]])[None]))
    else:
        from ..data.datasets import BiwiDataset

        train, _, _, subjects = BiwiDataset.read_data(
            cfg.get_or("data_root", "./BIWI/"), cfg.get_or("wav_path", "wav"),
            cfg.get_or("vertices_path", "vertices_npy"),
            cfg.get_or("template_file", "templates.pkl"), cfg.dataset,
            cfg.train_subjects, cfg.val_subjects, cfg.test_subjects,
            read_audio=True)
        ds = BiwiDataset(train, subjects["train"], "train", read_audio=True)
        batches = [(jnp.asarray(a)[None], jnp.asarray(t)[None],
                    jnp.asarray(v)[None], jnp.asarray(o)[None])
                   for a, v, t, o, _ in (ds[i] for i in range(len(ds)))]

    a0, t0, v0, o0 = batches[0]
    params = model.init(jax.random.PRNGKey(0), a0, t0, v0, o0)
    state = create_train_state(model, params, args.lr,
                               frozen_substrings=CODETALKER_FROZEN_SUBSTRINGS)

    def loss_fn(p, audio, template, vertice, one_hot):
        total, (lm, lr_) = model.apply({"params": p}, audio, template, vertice,
                                       one_hot)
        return total, (lm, lr_)

    @jax.jit
    def step(state, audio, template, vertice, one_hot):
        (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, audio, template, vertice, one_hot)
        return state.apply_gradients(grads=grads), total, aux

    keeper = BestCheckpointKeeper(args.save_path or "./runs_stage2/model")
    epochs = args.epochs or cfg.get_or("epochs", 100)
    for epoch in range(epochs):
        losses = []
        for audio, template, vertice, one_hot in batches:
            state, total, (lm, lr_) = step(state, audio, template, vertice, one_hot)
            losses.append(float(total))
        mean = float(np.mean(losses))
        logger.info(f"Epoch {epoch}: loss {mean:.6f} "
                    f"(motion {float(lm):.6f} reg {float(lr_):.6f})")
        if keeper.update(mean, state.params, epoch):
            logger.info(f"Epoch {epoch}: new best {mean:.6f}")
    return state, keeper


if __name__ == "__main__":
    main()
