"""CodeTalker at FULL BIWI dims (vertice_dim=70110) on the real TPU.

VERDICT round-1 weak #6: the stage-2 predict path had only been driven at
vertice_dim=7011. This script runs teacher-forced training forward + the
jitted AR predict loop at the reference's full mesh dimensionality
(``/root/reference/code/models/stage2.py:102-157``,
``code/config.yaml: vertice_dim 70110``) and reports step times.

Run: ``python examples/codetalker_full_dims_tpu.py [--frames 64] [--cpu]``
(the tunnel makes transfers slow - everything is fenced via on-device scalar
reductions; see CLAUDE.md platform notes).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dyadic_interaction_modeling_tpu.utils.compilation_cache import (
    enable_persistent_cache,
)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=64)
    parser.add_argument("--vertice-dim", type=int, default=70110)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    enable_persistent_cache()

    import jax.numpy as jnp

    from dyadic_interaction_modeling_tpu import config as C
    from dyadic_interaction_modeling_tpu.models.codetalker import CodeTalker
    from dyadic_interaction_modeling_tpu.models.wav2vec2 import W2VConfig

    cfg = C.codetalker_defaults()
    cfg.vertice_dim = args.vertice_dim
    # keep the transformer at reference scale; shrink only the audio trunk a
    # little is NOT needed - full wav2vec2-base
    w2v = W2VConfig()
    model = CodeTalker(cfg, w2v_cfg=w2v)

    frames = args.frames
    sr = 16000
    # BIWI: 25 fps motion, wav2vec gives 50 fps -> 2 audio frames per motion
    samples = int(frames / 25 * sr)
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    audio = jax.random.normal(ks[0], (1, samples)) * 0.1
    template = jax.random.normal(ks[1], (1, cfg.vertice_dim)) * 0.01
    vertice = jax.random.normal(ks[2], (1, frames, cfg.vertice_dim)) * 0.01
    one_hot = jnp.zeros((1, 6)).at[0, 0].set(1.0)

    print(f"init at full dims (vertice_dim={cfg.vertice_dim}, "
          f"frames={frames}, platform={jax.default_backend()})...")
    t0 = time.time()
    params = model.init(jax.random.PRNGKey(1), audio, template, vertice, one_hot)
    print(f"init: {time.time() - t0:.1f}s, "
          f"{sum(x.size for x in jax.tree_util.tree_leaves(params)) / 1e6:.1f}M params")

    fwd = jax.jit(lambda p, a, t, v, o: model.apply(p, a, t, v, o)[0])
    t0 = time.time()
    loss = float(fwd(params, audio, template, vertice, one_hot))
    print(f"train fwd compile+run: {time.time() - t0:.1f}s, loss={loss:.4f}")
    t0 = time.time()
    n = 5
    for _ in range(n):
        loss = float(fwd(params, audio, template, vertice, one_hot))
    print(f"train fwd steady: {(time.time() - t0) / n * 1000:.1f} ms")

    pred = jax.jit(lambda p, a, t, o: jnp.sum(model.apply(
        p, a, t, o, method=CodeTalker.predict).astype(jnp.float32)))
    t0 = time.time()
    s = float(pred(params, audio, template, one_hot))
    print(f"predict compile+run: {time.time() - t0:.1f}s (sum={s:.3e})")
    t0 = time.time()
    for _ in range(3):
        s = float(pred(params, audio, template, one_hot))
    dt = (time.time() - t0) / 3
    print(f"predict steady: {dt * 1000:.1f} ms for {frames} frames "
          f"({frames / dt:.1f} frames/s)")


if __name__ == "__main__":
    main()
