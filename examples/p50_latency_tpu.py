"""p50 single-clip generation latency on the real TPU.

One 10-second ViCo clip (299 frames at ~30 fps), B=1, bf16, production
generator (chunked-prefix decode). Reports p50/min/max over repeated runs -
the latency-side complement to bench.py's throughput headline.

Run: ``python examples/p50_latency_tpu.py [--frames 299] [--runs 11]``
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
    p.add_argument("--frames", type=int, default=299)
    p.add_argument("--runs", type=int, default=11)
    p.add_argument("--chunk", type=int, default=32)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    enable_persistent_cache()

    import jax.numpy as jnp

    from dyadic_interaction_modeling_tpu import config as C
    from dyadic_interaction_modeling_tpu.engine.pt_engine import make_slmft_generator
    from dyadic_interaction_modeling_tpu.models.slm import SLMFT

    slm_cfg = C.slm_defaults()
    vq_cfg = C.vq_listener_defaults()
    model = SLMFT(slm_cfg, vq_cfg, dtype=jnp.bfloat16)
    l = args.frames
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    params = model.init(jax.random.PRNGKey(1),
                        jax.random.normal(ks[0], (1, 8, 56)),
                        jax.random.normal(ks[1], (1, 8, 56)),
                        jax.random.normal(ks[2], (1, 8, 768)),
                        jnp.ones((1, 8), dtype=bool),
                        jax.random.PRNGKey(2))["params"]
    batch = (jax.random.normal(ks[0], (1, l, 56)),
             jax.random.normal(ks[1], (1, l, 56)),
             jax.random.normal(ks[2], (1, l, 768)),
             jnp.ones((1, l), dtype=bool))
    gen = make_slmft_generator(model, slm_cfg, l, chunk=args.chunk or None)
    fenced = jax.jit(lambda p_, b, r: jnp.sum(
        gen(p_, b, r, 1).astype(jnp.float32)))

    print(f"frames={l} chunk={args.chunk} platform={jax.default_backend()}")
    t0 = time.time()
    float(fenced(params, batch, jax.random.PRNGKey(3)))
    print(f"compile: {time.time() - t0:.0f}s")
    times = []
    for i in range(args.runs):
        t0 = time.perf_counter()
        float(fenced(params, batch, jax.random.fold_in(jax.random.PRNGKey(3), i)))
        times.append(time.perf_counter() - t0)
    times.sort()
    print(f"p50 {times[len(times) // 2] * 1000:.0f} ms  "
          f"min {times[0] * 1000:.0f}  max {times[-1] * 1000:.0f}  "
          f"over {args.runs} runs")


if __name__ == "__main__":
    main()
