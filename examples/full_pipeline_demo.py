"""Full-pipeline demo on synthetic data: the complete DIM workflow in one run.

  1. train a listener VQ-VAE                  (reference: train_vq.py)
  2. dyadic SLM pretraining on CANDOR-style   (train_s2s_pretrain.py)
  3. SLMFT listener finetune on ViCo-style    (finetune_s2s_pretrain.py)
  4. best-of-N sampled eval + metric battery  (test_s2s_pretrain.py)
  5. smooth + export EMOCA frame dirs         (postprocess2emoca.py)
  6. render with PIRender                     (Pirender/inference_newmodel.py)

Runs in a few minutes on CPU (DIM_TPU_PLATFORM=cpu python examples/full_pipeline_demo.py)
or on the TPU chip (slower first-compile). Uses tiny dims; swap the
overrides for the full reference dims on real data.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("DIM_TPU_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["DIM_TPU_PLATFORM"])


TINY = ["dim", "32", "enc_depth", "1", "enc_heads", "2", "dec_depth", "1",
        "dec_heads", "2", "num_tokens", "24"]


def main(workdir: str = "/tmp/dim_tpu_demo"):
    import numpy as np

    from dyadic_interaction_modeling_tpu.cli import (
        finetune_s2s_pretrain,
        test_s2s_pretrain,
        train_s2s_pretrain,
        train_vq,
    )
    from dyadic_interaction_modeling_tpu.postprocess import export_emoca_dirs

    os.makedirs(workdir, exist_ok=True)

    print("=== 1) VQ-VAE training (synthetic ViCo listener motion) ===")
    train_vq.main(["--synthetic", "--epochs", "1",
                   "--save-path", f"{workdir}/vq",
                   "hidden_size", "32", "num_hidden_layers", "1",
                   "num_attention_heads", "2", "intermediate_size", "64",
                   "zquant_dim", "16", "n_embed", "24",
                   "batch_size", "4", "batch_size_val", "4"])

    print("=== 2) SLM dyadic pretraining (synthetic CANDOR) ===")
    train_s2s_pretrain.main(["--synthetic", "--batch-size", "8", "--epochs", "1",
                             "--save-path", f"{workdir}/pretrain"] + TINY)

    print("=== 3) SLMFT listener finetune (synthetic ViCo) ===")
    finetune_s2s_pretrain.main(["--synthetic", "--batch-size", "4", "--epochs", "1",
                                "--save-path", f"{workdir}/finetune"] + TINY)

    print("=== 4) best-of-N eval + metric battery ===")
    test_s2s_pretrain.main(["--synthetic", "--batch-size", "4", "--beam-size", "3",
                            "--out", f"{workdir}/predictions.pkl"] + TINY)

    print("=== 5) postprocess: smooth + export EMOCA frame dirs ===")
    import pickle

    with open(f"{workdir}/predictions.pkl", "rb") as f:
        preds = pickle.load(f)
    clip_dir = export_emoca_dirs(f"{workdir}/emoca_out", "demo_clip",
                                 np.asarray(preds["y_pred"][0]))
    print(f"exported {len(os.listdir(clip_dir))} frames to {clip_dir}")

    print("=== 6) PIRender inference over the exported coefficients ===")
    import jax
    import jax.numpy as jnp

    from dyadic_interaction_modeling_tpu.render.generator import FaceGenerator
    from dyadic_interaction_modeling_tpu.render.inference import render_coeff_dir

    model = FaceGenerator(flame_coeff_nc=56, coeff_nc=73, descriptor_nc=32,
                          mapping_layers=2)
    src = np.random.RandomState(0).uniform(-1, 1, (64, 64, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(src)[None],
                        jnp.zeros((1, 56, 27)))["params"]
    out = render_coeff_dir(model, params, src, clip_dir,
                           out_dir=f"{workdir}/rendered")
    print(f"rendered {out['fake_image'].shape[0]} frames "
          f"-> {workdir}/rendered/fake/*.png")
    print("demo complete:", workdir)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/dim_tpu_demo")
