"""SpeakerSLMFT best-of-50 eval-path throughput on the real TPU.

The BIWI test protocol samples 50 candidates per clip
(``/root/reference/code/test_biwi.py:68``, sequential beam loop). Here the
50 samples run as ONE generate sharing each clip's cross-attention context
(make_speaker_generator). Full reference dims incl. vertice_dim=70110
converter front-end.

Run: ``python examples/speaker_bestof_tpu.py [--frames 64] [--clips 2]``
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
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=64)
    p.add_argument("--clips", type=int, default=2)
    p.add_argument("--n", type=int, default=50)
    p.add_argument("--vertice-dim", type=int, default=70110)
    p.add_argument("--kv-heads", type=int, default=0,
                   help="grouped-query attention K/V heads (0 = multi-head; "
                        "1 = MQA, PERF.md GQA section)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    enable_persistent_cache()

    import jax.numpy as jnp

    from dyadic_interaction_modeling_tpu import config as C
    from dyadic_interaction_modeling_tpu.engine.pt_engine import (
        make_speaker_generator,
    )
    from dyadic_interaction_modeling_tpu.models.slm import SpeakerSLMFT

    slm_cfg = C.slm_defaults()
    slm_cfg.update(dict(attn_kv_heads=args.kv_heads))
    vq_cfg = C.vq_listener_defaults()
    model = SpeakerSLMFT(slm_cfg, vq_cfg, vertice_dim=args.vertice_dim,
                         dtype=jnp.bfloat16)
    b, l, n = args.clips, args.frames, args.n
    ks = jax.random.split(jax.random.PRNGKey(0), 4)

    def batch_of(bb, ll):
        return (jax.random.normal(ks[0], (bb, ll, args.vertice_dim)) * 0.01,
                jax.random.normal(ks[1], (bb, ll, 56)),
                jax.random.normal(ks[2], (bb, ll, slm_cfg.dim_audio)),
                jnp.ones((bb, ll), dtype=bool),
                jax.random.normal(ks[3], (bb, args.vertice_dim)) * 0.01,
                jnp.zeros((bb,), jnp.int32))

    print(f"clips={b} frames={l} N={n} vertice_dim={args.vertice_dim} "
          f"platform={jax.default_backend()}")
    t0 = time.time()
    params = model.init(jax.random.PRNGKey(1), *batch_of(1, 8),
                        jax.random.PRNGKey(2))["params"]
    print(f"init: {time.time() - t0:.1f}s")

    gen = make_speaker_generator(model, slm_cfg, l)
    fenced = jax.jit(lambda p_, bt, r: jnp.sum(
        gen(p_, bt, r, n).astype(jnp.float32)))
    batch = batch_of(b, l)
    t0 = time.time()
    float(fenced(params, batch, jax.random.PRNGKey(3)))
    print(f"compile+run: {time.time() - t0:.1f}s")
    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        float(fenced(params, batch, jax.random.fold_in(jax.random.PRNGKey(3), i)))
    dt = (time.perf_counter() - t0) / iters
    print(f"best-of-{n} x {b} clips x {l - 1} frames: {dt * 1000:.1f} ms "
          f"({b * n * (l - 1) / dt / 1e3:.1f}k sampled frames/s; the "
          f"reference loops {n} sequential generates per clip)")


if __name__ == "__main__":
    main()
