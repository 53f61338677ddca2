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
    parser.add_argument("--render-dtype", choices=("fp32", "bf16", "mixed"),
                        default="fp32",
                        help="FaceGenerator compute dtype (params stay fp32; "
                             "norm stats + flow field are fp32 either way; "
                             "'mixed' = fp32 WarpingNet + bf16 EditingNet)")
    parser.add_argument("--parity-check", action="store_true",
                        help="render one fixed batch in fp32/bf16/mixed and "
                             "report max-abs / PSNR vs fp32")
    parser.add_argument("--pipelined", action="store_true",
                        help="double-buffer the rendered-frame download "
                             "(render_pipeline_depth=1): the device->host "
                             "copy of round t overlaps round t+1's compute, "
                             "+1 chunk of latency")
    parser.add_argument("--fused", action="store_true",
                        help="serving fast path: FusedAvatarPipeline runs "
                             "the WHOLE round (feed+generate+decode+smooth+"
                             "window+render) as one device program with a "
                             "double-buffered uint8 download - 1 dispatch "
                             "per round instead of 4")
    parser.add_argument("--full-outputs", action="store_true",
                        help="emit fake+warp as float32 (offline-script "
                             "parity shapes) instead of the serving config "
                             "(fake only, uint8 on device - 8x less "
                             "device->host traffic)")
    parser.add_argument("--kv-heads", type=int, default=0,
                        help="grouped-query attention K/V heads (0 = "
                             "multi-head; 1 = MQA, PERF.md GQA section)")
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
    slm_cfg.update(dict(attn_kv_heads=args.kv_heads))
    vq_cfg = C.vq_listener_defaults()
    model = SLMFT(slm_cfg, vq_cfg, dtype=jnp.bfloat16)
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    params = model.init(jax.random.PRNGKey(1),
                        jax.random.normal(ks[0], (1, 8, 56)),
                        jax.random.normal(ks[1], (1, 8, 56)),
                        jax.random.normal(ks[2], (1, 8, 768)),
                        jnp.ones((1, 8), dtype=bool),
                        jax.random.PRNGKey(2))

    def make_generator(mode):
        dt = jnp.float32 if mode == "fp32" else jnp.bfloat16
        wdt = jnp.float32 if mode == "mixed" else None
        return FaceGenerator(flame_coeff_nc=56, coeff_nc=73,
                             descriptor_nc=256, mapping_layers=3,
                             dtype=dt, warp_dtype=wdt)

    def smooth_image(key, shape):
        """Low-frequency source (natural images are smooth; uniform noise
        makes any sub-pixel flow delta look like O(1) pixel error).
        Per-stream phases so every avatar gets a distinct source face."""
        yy = jnp.linspace(0, 6.0, shape[1])[None, :, None, None]
        xx = jnp.linspace(0, 6.0, shape[2])[None, None, :, None]
        ph = jax.random.uniform(key, (shape[0], 1, 1, shape[3]), maxval=6.28)
        return jnp.sin(yy + 1.7 * xx + ph) * 0.7

    renderer = r_params = src = None
    if not args.no_render:
        renderer = make_generator(args.render_dtype)
        img = smooth_image(jax.random.PRNGKey(5), (b, args.res, args.res, 3))
        sems = jnp.zeros((b, 56, 27))
        t0 = time.time()
        r_params = renderer.init(jax.random.PRNGKey(6), img, sems)["params"]
        print(f"renderer init: {time.time() - t0:.1f}s "
              f"({args.res}x{args.res}, descriptor 256, {args.render_dtype})")
        src = np.asarray(img)

        if args.parity_check:
            # one fixed batch through all dtypes: bound the image error
            fixed_sems = jax.random.normal(jax.random.PRNGKey(7),
                                           (b, 56, 27)) * 0.5
            outs = {}
            for name in ("fp32", "bf16", "mixed"):
                g = make_generator(name)
                o = jax.jit(lambda p, i, s, g=g: g.apply(
                    {"params": p}, i, s))(r_params, img, fixed_sems)
                outs[name] = np.asarray(o["fake_image"], np.float32)
            for name in ("bf16", "mixed"):
                diff = np.abs(outs[name] - outs["fp32"])
                mse = float(np.mean(diff ** 2))
                # images live in [-1, 1] -> peak-to-peak 2
                psnr = 10 * np.log10(4.0 / mse) if mse > 0 else float("inf")
                u8 = np.abs(
                    np.round((np.clip(outs[name], -1, 1) + 1) * 127.5)
                    - np.round((np.clip(outs["fp32"], -1, 1) + 1) * 127.5))
                print(f"{name} vs fp32 fake_image: max-abs {diff.max():.5f}, "
                      f"PSNR {psnr:.1f} dB, uint8 max delta {int(u8.max())} "
                      f"(mean {u8.mean():.3f}) levels")

    outputs = (("fake_image", "warp_image") if args.full_outputs
               else ("fake_image",))
    if args.fused:
        if args.no_render or args.full_outputs:
            raise SystemExit("--fused is the full-avatar uint8 serving path")
        from dyadic_interaction_modeling_tpu.serving import FusedAvatarPipeline

        pipe = FusedAvatarPipeline(model, params, renderer=renderer,
                                   render_params=r_params, source_images=src,
                                   batch=b, chunk=c,
                                   max_frames=args.max_frames,
                                   max_tokens=args.max_frames,
                                   vq_lookahead=c, render_uint8=True)
    else:
        sess = StreamingListenerSession(model, params, batch=b, chunk=c,
                                        max_frames=args.max_frames,
                                        max_tokens=args.max_frames)
        pipe = StreamingAvatarPipeline(
            sess, vq_lookahead=c, vq_granularity=c,
            renderer=renderer, render_params=r_params,
            source_images=src,
            render_frames_per_call=c,
            render_outputs=outputs,
            render_uint8=not args.full_outputs,
            render_pipeline_depth=int(args.pipelined))
    print(f"chunk={c} batch={b} res={args.res} "
          f"platform={jax.default_backend()} slm=bf16 "
          f"renderer={args.render_dtype} "
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

    def frames_fed():
        return pipe.frames_fed if args.fused else pipe.session.frames_fed

    t0 = time.time()
    while not filled(out) and frames_fed() < args.max_frames - c:
        out = pipe.push(sp, au)
    print(f"pipeline filled to first rendered frames "
          f"(render compile included): {time.time() - t0:.1f}s")

    rounds, rendered = [], 0
    # leave room for the per-stage breakdown round below: the decoder cache
    # also holds the 1-token prompt (max_tokens == max_frames), so budget
    # against max_frames - prompt_len, not max_frames
    prompt_len = pipe.prompt.shape[1]
    budget = (args.max_frames - frames_fed() - prompt_len) // c - 1
    for _ in range(min(args.rounds, budget)):
        t0 = time.perf_counter()
        out = pipe.push(sp, au)
        rounds.append(time.perf_counter() - t0)
        rendered += (out["fake_image"].shape[1]
                     if "fake_image" in out else len(out["windows"]))
    rounds.sort()
    n = len(rounds)
    p50 = rounds[n // 2]
    stage = ("fused avatar" if args.fused else
             "full avatar" if not args.no_render else "coeff+smooth+window")
    print(f"steady state over {n} rounds at context "
          f"~{frames_fed()} frames ({stage}):")
    print(f"  push({c}) p50 {p50 * 1000:.1f} ms "
          f"(min {rounds[0] * 1000:.1f}, max {rounds[-1] * 1000:.1f}) vs "
          f"{1000 / 30 * c:.0f} ms real-time budget @30fps")
    print(f"  {b} stream(s): {b * c / p50:,.1f} rendered avatar frames/s")

    if args.fused:
        return  # one program per round: there are no per-stage boundaries

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
