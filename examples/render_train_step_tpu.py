"""PIRender training-step timings on the real TPU.

Measures the jitted warp-stage and gen-stage optimizer steps of the JAX
FaceTrainer (render/trainer.py) at the reference's 256x256 training
resolution (``/root/reference/code/Pirender/config/face.yaml``), plus the
EMA-forward inference step used by render_inference. Random-feature VGG
perceptual loss (no pretrained weights in-image; same compute shape as the
real loss).

Run: ``python examples/render_train_step_tpu.py [--resolution 256] [--b 4]``
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dyadic_interaction_modeling_tpu.utils.compilation_cache import (
    enable_persistent_cache,
)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--b", type=int, default=4)
    p.add_argument("--coeff-nc", type=int, default=58)
    p.add_argument("--semantic-radius", type=int, default=13)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    enable_persistent_cache()

    import jax.numpy as jnp

    from dyadic_interaction_modeling_tpu.render.generator import FaceGenerator
    from dyadic_interaction_modeling_tpu.render.trainer import FaceTrainer

    res, b = args.resolution, args.b
    win = 2 * args.semantic_radius + 1
    model = FaceGenerator(coeff_nc=args.coeff_nc, descriptor_nc=256)
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    img = jax.random.uniform(ks[0], (b, res, res, 3)) * 2 - 1
    sem = jax.random.normal(ks[1], (b, args.coeff_nc, win)) * 0.3
    gt = jax.random.uniform(ks[2], (b, res, res, 3)) * 2 - 1
    batch = {"source_image": img, "target_semantics": sem,
             "source_semantics": sem, "target_image": gt}

    print(f"res={res} B={b} platform={jax.default_backend()}")
    t0 = time.time()
    params = model.init(jax.random.PRNGKey(1), img[:1], sem[:1])
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"init: {time.time() - t0:.1f}s, {n_params / 1e6:.1f}M params")

    with tempfile.TemporaryDirectory() as d:
        for stage, warp_iters in (("warp", 10 ** 9), ("gen", 0)):
            tr = FaceTrainer(model, params, save_dir=d,
                             pretrain_warp_iteration=warp_iters)
            t0 = time.time()
            losses = tr.optimize_parameters(batch)
            print(f"{stage} step compile+run: {time.time() - t0:.1f}s, "
                  f"losses={ {k: round(float(v), 3) for k, v in losses.items()} }")
            iters = 10
            t0 = time.perf_counter()
            for _ in range(iters):
                losses = tr.optimize_parameters(batch)
            dt = (time.perf_counter() - t0) / iters
            print(f"{stage} step steady: {dt * 1000:.1f} ms "
                  f"({b / dt:.1f} images/s)")

        # inference (EMA forward), the render_inference path
        fwd = jax.jit(lambda p_, i, s: jnp.sum(
            model.apply(p_, i, s, stage="gen")["fake_image"].astype(jnp.float32)))
        t0 = time.time()
        float(fwd(params, img, sem))
        print(f"inference compile+run: {time.time() - t0:.1f}s")
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            float(fwd(params, img, sem))
        dt = (time.perf_counter() - t0) / iters
        print(f"inference steady: {dt * 1000:.1f} ms ({b / dt:.1f} frames/s)")


if __name__ == "__main__":
    main()
