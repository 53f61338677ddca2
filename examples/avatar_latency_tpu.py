"""End-to-end live-avatar latency at full reference dims on the real TPU.

Drives serving.StreamingAvatarPipeline - the complete audio/motion ->
rendered-listener-video path that the reference only offers as three offline
batch scripts (test_s2s_pretrain.py -> postprocess2emoca.py ->
Pirender/inference_newmodel.py) - and reports:

* compile costs (session 3 programs + 1 masked VQ decode + 1 renderer);
* steady-state per-round latency of push(chunk): feed + generate + chunked
  coefficient decode + smoothing + windowing + PIRender of the finalized
  frames. The 30 fps real-time budget for chunk=8 is 267 ms/round;
* a per-stage breakdown (one extra timed call each).

Defaults: SLMFT at reference dims (384/768, bf16), FaceGenerator at the
reference's 256x256 / descriptor 256 (fp32, like the reference renderer),
vq_lookahead = vq_granularity = chunk (one decode per chunk), smoothing
window 10, semantic radius 13 -> 25..32 frames (~1 s at 30 fps) of pipeline
latency beyond the chunk cadence.

Platform note (CLAUDE.md): every host->device call costs ~25 ms over the
axon tunnel; a push round here is ~4 device calls (feed / generate / decode
/ render), so ~100 ms of the reported time is tunnel floor a local host
would not pay.

Run: ``python examples/avatar_latency_tpu.py [--rounds 24] [--res 256]``
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
    parser.add_argument("--chunk", type=int, default=8)
    parser.add_argument("--rounds", type=int, default=24)
    parser.add_argument("--max-frames", type=int, default=1024)
    parser.add_argument("--res", type=int, default=256)
    parser.add_argument("--batch", type=int, default=1,
                        help="concurrent avatar streams in lockstep")
    parser.add_argument("--no-render", action="store_true",
                        help="stop at smoothed windows (no FaceGenerator)")
    parser.add_argument("--full-outputs", action="store_true",
                        help="emit fake+warp as float32 (offline-script "
                             "parity shapes) instead of the serving config "
                             "(fake only, uint8 on device - 8x less "
                             "device->host traffic)")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    enable_persistent_cache()

    import jax.numpy as jnp
    import numpy as np

    from dyadic_interaction_modeling_tpu import config as C
    from dyadic_interaction_modeling_tpu.models.slm import SLMFT
    from dyadic_interaction_modeling_tpu.render.generator import FaceGenerator
    from dyadic_interaction_modeling_tpu.serving import (
        StreamingAvatarPipeline,
        StreamingListenerSession,
    )

    b, c = args.batch, args.chunk
    slm_cfg = C.slm_defaults()
    vq_cfg = C.vq_listener_defaults()
    model = SLMFT(slm_cfg, vq_cfg, dtype=jnp.bfloat16)
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    params = model.init(jax.random.PRNGKey(1),
                        jax.random.normal(ks[0], (1, 8, 56)),
                        jax.random.normal(ks[1], (1, 8, 56)),
                        jax.random.normal(ks[2], (1, 8, 768)),
                        jnp.ones((1, 8), dtype=bool),
                        jax.random.PRNGKey(2))

    renderer = r_params = src = None
    if not args.no_render:
        renderer = FaceGenerator(flame_coeff_nc=56, coeff_nc=73,
                                 descriptor_nc=256, mapping_layers=3)
        img = jax.random.uniform(jax.random.PRNGKey(5),
                                 (b, args.res, args.res, 3),
                                 minval=-1, maxval=1)
        sems = jnp.zeros((b, 56, 27))
        t0 = time.time()
        r_params = renderer.init(jax.random.PRNGKey(6), img, sems)["params"]
        print(f"renderer init: {time.time() - t0:.1f}s "
              f"({args.res}x{args.res}, descriptor 256)")
        src = np.asarray(img)

    sess = StreamingListenerSession(model, params, batch=b, chunk=c,
                                    max_frames=args.max_frames,
                                    max_tokens=args.max_frames)
    outputs = (("fake_image", "warp_image") if args.full_outputs
               else ("fake_image",))
    pipe = StreamingAvatarPipeline(sess, vq_lookahead=c, vq_granularity=c,
                                   renderer=renderer, render_params=r_params,
                                   source_images=src,
                                   render_frames_per_call=c,
                                   render_outputs=outputs,
                                   render_uint8=not args.full_outputs)
    print(f"chunk={c} batch={b} res={args.res} "
          f"platform={jax.default_backend()} slm=bf16 renderer=fp32 "
          f"outputs={'+'.join(outputs)}"
          f"{' uint8' if not args.full_outputs else ' f32'} "
          f"pipeline latency={pipe.latency_frames} frames "
          f"(+chunk cadence) = {(pipe.latency_frames + c) / 30:.2f} s @30fps")

    rng = np.random.default_rng(0)
    sp = rng.standard_normal((b, c, 56), dtype=np.float32)
    au = rng.standard_normal((b, c, 768), dtype=np.float32)

    t0 = time.time()
    out = pipe.push(sp, au)
    print(f"first push (feed+prompt+generate+decode compiles): "
          f"{time.time() - t0:.1f}s")
    def filled(o):
        return (o["fake_image"].shape[1] > 0 if "fake_image" in o
                else len(o["windows"]) > 0)

    t0 = time.time()
    while not filled(out) and pipe.session.frames_fed < args.max_frames - c:
        out = pipe.push(sp, au)
    print(f"pipeline filled to first rendered frames "
          f"(render compile included): {time.time() - t0:.1f}s")

    rounds, rendered = [], 0
    # leave room for the per-stage breakdown round below: the decoder cache
    # also holds the 1-token prompt (max_tokens == max_frames), so budget
    # against max_frames - prompt_len, not max_frames
    prompt_len = pipe.prompt.shape[1]
    budget = (args.max_frames - pipe.session.frames_fed - prompt_len) // c - 1
    for _ in range(min(args.rounds, budget)):
        t0 = time.perf_counter()
        out = pipe.push(sp, au)
        rounds.append(time.perf_counter() - t0)
        rendered += (out["fake_image"].shape[1]
                     if "fake_image" in out else len(out["windows"]))
    rounds.sort()
    n = len(rounds)
    p50 = rounds[n // 2]
    stage = "full avatar" if not args.no_render else "coeff+smooth+window"
    print(f"steady state over {n} rounds at context "
          f"~{pipe.session.frames_fed} frames ({stage}):")
    print(f"  push({c}) p50 {p50 * 1000:.1f} ms "
          f"(min {rounds[0] * 1000:.1f}, max {rounds[-1] * 1000:.1f}) vs "
          f"{1000 / 30 * c:.0f} ms real-time budget @30fps")
    print(f"  {b} stream(s): {b * c / p50:,.1f} rendered avatar frames/s")

    # per-stage breakdown (each includes one ~25 ms tunnel round-trip)
    t0 = time.perf_counter(); pipe.session.feed(sp, au)
    t_feed = time.perf_counter() - t0
    t0 = time.perf_counter(); toks = pipe.session.generate(c)
    t_gen = time.perf_counter() - t0
    t0 = time.perf_counter(); coeffs = pipe.decoder.push(toks)
    t_dec = time.perf_counter() - t0
    smoothed = pipe.smoother.push(coeffs)
    windows = pipe.windower.push(smoothed)
    t_ren = float("nan")
    if pipe.renderer is not None and windows:
        t0 = time.perf_counter(); pipe.renderer.push(windows)
        t_ren = time.perf_counter() - t0
    print(f"  breakdown: feed {t_feed * 1000:.1f} ms, generate "
          f"{t_gen * 1000:.1f} ms, vq-decode {t_dec * 1000:.1f} ms, "
          f"render({len(windows)}) {t_ren * 1000:.1f} ms")


if __name__ == "__main__":
    main()
