"""Isolated FaceGenerator latency on the real TPU: compute vs. tunnel.

The avatar round (examples/avatar_latency_tpu.py) times the renderer
end-to-end through the axon tunnel, which bundles three very different
costs: the on-device conv compute, the ~25 ms per-dispatch round trip, and
the uint8 frame download (B*8*res*res*3 bytes at the tunnel's ~20 MB/s -
~75 ms for 8 frames at 256x256 that a local PCIe host pays ~0.2 ms for).
This script separates them, back to back in ONE process so dtype variants
see identical conditions (CLAUDE.md: cross-session comparisons drift +-10%):

* on-device compute: K renders chained inside one jitted ``lax.scan``
  (each iteration perturbs the semantics so XLA cannot CSE them away),
  reduced to a scalar on device - the transfer is 4 bytes;
* dispatch+download: one ordinary render call returning uint8 frames,
  minus the compute, is the tunnel overhead;
* MFU: compiled-HLO FLOPs (cost_analysis) over the measured compute time.

Run: ``python examples/render_microbench_tpu.py [--res 256] [--frames 8]
[--iters 8] [--dtypes fp32 bf16 mixed]``
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
    parser.add_argument("--res", type=int, default=256)
    parser.add_argument("--frames", type=int, default=8,
                        help="images per render call (the avatar renders "
                             "chunk=8 finalized frames per round)")
    parser.add_argument("--iters", type=int, default=8,
                        help="chained renders per timed scan")
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--dtypes", nargs="+",
                        default=["fp32", "bf16", "mixed"])
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    enable_persistent_cache()

    import jax.numpy as jnp
    import numpy as np

    from dyadic_interaction_modeling_tpu.render.generator import FaceGenerator

    n, res = args.frames, args.res

    def make_generator(mode):
        dt = jnp.float32 if mode == "fp32" else jnp.bfloat16
        wdt = jnp.float32 if mode == "mixed" else None
        return FaceGenerator(flame_coeff_nc=56, coeff_nc=73,
                             descriptor_nc=256, mapping_layers=3,
                             dtype=dt, warp_dtype=wdt)

    # one fp32 param set shared by every dtype variant (params stay fp32 in
    # the serving config; compute dtype is the module's `dtype`)
    yy = jnp.linspace(0, 6.0, res)[None, :, None, None]
    xx = jnp.linspace(0, 6.0, res)[None, None, :, None]
    img = jnp.sin(yy + 1.7 * xx) * jnp.ones((n, 1, 1, 3)) * 0.7
    sems = jax.random.normal(jax.random.PRNGKey(1), (n, 56, 27)) * 0.5
    t0 = time.time()
    params = make_generator(args.dtypes[0]).init(
        jax.random.PRNGKey(0), img, sems)["params"]
    print(f"init ({args.dtypes[0]}): {time.time() - t0:.1f}s  "
          f"platform={jax.default_backend()}  frames={n} res={res}")

    for mode in args.dtypes:
        gen = make_generator(mode)

        @jax.jit
        def chained(params, img, sems, gen=gen):
            def body(acc, k):
                # perturb semantics per iteration so renders can't be CSE'd
                out = gen.apply({"params": params}, img,
                                sems + k.astype(sems.dtype) * 1e-3)
                return acc + jnp.sum(out["fake_image"].astype(jnp.float32)), 0

            acc, _ = jax.lax.scan(body, 0.0, jnp.arange(args.iters))
            return acc

        @jax.jit
        def single(params, img, sems, gen=gen):
            out = gen.apply({"params": params}, img, sems)
            return ((jnp.clip(out["fake_image"], -1, 1) + 1) * 127.5
                    ).astype(jnp.uint8)

        # compile both programs (cached for later sessions)
        t0 = time.time()
        lowered = chained.lower(params, img, sems)
        compiled = lowered.compile()
        flops = compiled.cost_analysis().get("flops", 0.0) / args.iters
        float(chained(params, img, sems))
        np.asarray(single(params, img, sems))
        t_compile = time.time() - t0

        comp = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(chained(params, img, sems))
            comp.append((time.perf_counter() - t0) / args.iters)
        e2e = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(single(params, img, sems))
            e2e.append(time.perf_counter() - t0)
        c_ms = min(comp) * 1e3
        e_ms = min(e2e) * 1e3
        # v5e peak: 197 TFLOP/s bf16, ~98.5 fp32 (MXU does fp32 at half rate)
        peak = 197e12 if mode != "fp32" else 98.5e12
        mfu = flops / (min(comp)) / peak * 100
        print(f"{mode:5s}: compute {c_ms:7.1f} ms/render ({n} frames -> "
              f"{n / min(comp):6.1f} fps/chip), e2e 1 call {e_ms:7.1f} ms "
              f"(tunnel overhead {e_ms - c_ms:6.1f} ms), "
              f"{flops / 1e9:,.0f} GFLOP/render, MFU {mfu:.1f}% "
              f"[compile {t_compile:.0f}s]")


if __name__ == "__main__":
    main()
