"""BIWI speaker evaluation (reference: ``code/test_biwi.py``).

SpeakerSLMFT with best-of-N (beam 50) by vertex L2, exports gt/pred ``.npy``
per clip (test_biwi.py:69-79) and prints LVE/FDD.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import slm_defaults, vq_listener_defaults
from ..engine.pt_engine import select_best_by_l2, speaker_ids_from_names
from ..metrics.reporting import print_biwi_metrics
from ..models.slm import SpeakerSLMFT
from ..utils.checkpoint import load_checkpoint
from .common import get_parser, load_config, setup, vq_cfg_for


def main(argv=None):
    parser = get_parser("BIWI speaker evaluation")
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--torch-checkpoint", type=str, default=None,
                        help="reference-format .pt (best_model_biwi_finetune*.pt)")
    parser.add_argument("--beam-size", type=int, default=50)
    parser.add_argument("--out-dir", type=str, default="./biwi_out")
    parser.add_argument("--vertice-dim", type=int, default=70110)
    parser.add_argument("--mouth-map", type=str, default=None,
                        help="vertex-index file (reference lve.txt) enabling LVE")
    parser.add_argument("--upper-map", type=str, default=None,
                        help="vertex-index file (reference fdd.txt) enabling FDD")
    parser.add_argument("--data-root", type=str, default=None,
                        help="raw BIWI tree (wav/ vertices_npy/ emoca_biwi/ "
                             "templates.pkl) - reference biwi.py:70-76 layout")
    parser.add_argument("--hubert-checkpoint", type=str, default=None,
                        help="torch HuBERT ckpt for on-the-fly audio features "
                             "(s3prl Upstream / fairseq / HF layouts)")
    parser.add_argument("--split", type=str, default="test",
                        choices=["train", "val", "test"])
    args = parser.parse_args(argv)
    logger = setup(args)
    slm_cfg = load_config(args, slm_defaults)
    vq_cfg = vq_cfg_for(slm_cfg, args.synthetic)

    model = SpeakerSLMFT(slm_cfg, vq_cfg, vertice_dim=args.vertice_dim)

    if args.synthetic:
        from ..data.synthetic import synthetic_biwi_dataset, synthetic_vico_dataset

        n_v = args.vertice_dim // 3
        items, templates = synthetic_biwi_dataset(n_clips=4, length=16, n_vertices=n_v)
        emoca_src = synthetic_vico_dataset(n_clips=4, min_len=16, max_len=16)
        batches = []
        for i, item in enumerate(items):
            audio = np.random.default_rng(i).standard_normal((16, 768)).astype(np.float32)
            batches.append((jnp.asarray(item["vertice"])[None],
                            jnp.asarray(emoca_src[i][1][:16])[None],
                            jnp.asarray(audio)[None],
                            jnp.asarray(item["template"])[None],
                            [item["name"]]))
        mouth_map = list(range(n_v // 2))
        upper_map = list(range(n_v // 2, n_v))
    else:
        if not args.data_root:
            raise SystemExit("pass --data-root pointing at the BIWI tree "
                             "(wav/ vertices_npy/ emoca_biwi/ templates.pkl) "
                             "or run with --synthetic")
        from ..data.datasets import BiwiEmocaDataset, read_biwi_emoca_data
        from ..models.hubert import make_hubert_extractor

        extract, _, _ = make_hubert_extractor(args.hubert_checkpoint)
        if not args.hubert_checkpoint:
            logger.warning("no --hubert-checkpoint: extracting with a "
                           "random-init HuBERT trunk (pipeline smoke only)")
        split_data = dict(zip(
            ("train", "val", "test"),
            read_biwi_emoca_data(args.data_root, extract)[:3]))
        ds = BiwiEmocaDataset(split_data[args.split], data_type=args.split,
                              read_audio=True)
        if len(ds) == 0:
            raise SystemExit(f"no clips in split {args.split!r} under "
                             f"{args.data_root}")
        # the reference evaluates with batch 1 (biwi.py:175-177); audio is
        # already interpolated to the vertex count by the dataset
        batches, templates = [], {}
        for i in range(len(ds)):
            audio, vertice, template, emoca, name = ds[i]
            n = min(len(vertice), len(emoca))
            batches.append((jnp.asarray(vertice[:n])[None],
                            jnp.asarray(emoca[:n])[None],
                            jnp.asarray(audio[:n])[None],
                            jnp.asarray(template)[None],
                            [name]))
            templates["_".join(name.split("_")[:-1])] = np.asarray(template)
        mouth_map = (np.loadtxt(args.mouth_map).astype(int).ravel().tolist()
                     if args.mouth_map else None)
        upper_map = (np.loadtxt(args.upper_map).astype(int).ravel().tolist()
                     if args.upper_map else None)

    b0 = batches[0]
    mask0 = jnp.ones(b0[0].shape[:2], dtype=bool)
    sids0 = speaker_ids_from_names(b0[4])
    if args.checkpoint:
        params = {"params": load_checkpoint(args.checkpoint)["params"]}
    elif args.torch_checkpoint:
        from .common import load_torch_slm_params

        template = model.init(jax.random.PRNGKey(0), b0[0], b0[1], b0[2],
                              mask0, b0[3], sids0)["params"]
        params = {"params": load_torch_slm_params(
            args.torch_checkpoint, template, slm_cfg, vq_cfg,
            variant="speaker_slmft")}
    else:
        params = model.init(jax.random.PRNGKey(0), b0[0], b0[1], b0[2],
                            mask0, b0[3], sids0)
        logger.warning("no --checkpoint given: evaluating random init")

    fwd = jax.jit(lambda p, v, e, a, m, t, s: model.apply(
        p, v, e, a, m, t, s).pred)

    os.makedirs(os.path.join(args.out_dir, "gt"), exist_ok=True)
    os.makedirs(os.path.join(args.out_dir, "pred"), exist_ok=True)
    y_true, y_pred, names = [], [], []
    for verts, emoca, audio, template, bnames in batches:
        mask = jnp.ones(verts.shape[:2], dtype=bool)
        sids = speaker_ids_from_names(bnames)
        # NOTE: the reference's best-of-50 loop (x_engine_pt.py:319-336) calls
        # the model with mode='train' - a DETERMINISTIC teacher-forced argmax
        # decode - so all 50 "samples" are identical; one forward is exact.
        pred = np.asarray(fwd(params, verts, emoca, audio, mask, template, sids))
        gt = np.asarray(emoca)[:, 1:, :]
        for j in range(verts.shape[0]):
            y_pred.append(pred[j])
            y_true.append(gt[j])
            names.append(bnames[j])
            np.save(os.path.join(args.out_dir, "gt", bnames[j].replace(".wav", ".npy")),
                    gt[j])
            np.save(os.path.join(args.out_dir, "pred", bnames[j].replace(".wav", ".npy")),
                    pred[j])
    logger.info(f"wrote {len(y_pred)} clips to {args.out_dir}")

    # LVE/FDD need mesh-space sequences + region maps + subject templates;
    # available in synthetic mode and whenever the maps are passed.
    if args.synthetic or (mouth_map and upper_map):
        mesh_head = jax.jit(lambda p, e: model.apply(
            p, jnp.asarray(e)[None], False,
            method=lambda m, toks, fl: m.vertice_map_reverse(
                m.vertice_map_reverse_lstm(toks))))
        gt_mesh, pred_mesh = [], []
        for (verts, _, _, template, bnames2), yp in zip(batches, y_pred):
            gt_mesh.append(np.asarray(verts)[0, 1:])
            mesh = np.asarray(mesh_head(params, yp))[0] + np.asarray(template)
            pred_mesh.append(mesh)
        metrics = print_biwi_metrics(gt_mesh, pred_mesh,
                                     [b[4][0] for b in batches], templates,
                                     mouth_map, upper_map,
                                     n_vertices=args.vertice_dim // 3)
        logger.info(f"LVE {metrics['lve']:.4e} FDD {metrics['fdd']:.4e}")
    return y_true, y_pred, names


if __name__ == "__main__":
    main()
