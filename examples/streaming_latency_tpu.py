"""Streaming serving session latency at reference SLMFT dims on the real TPU.

Drives serving.StreamingListenerSession (live dyadic listener generation -
no offline equivalent exists in the reference, whose eval encodes the full
clip first, ``/root/reference/code/x_engine_pt.py:232-277``) and reports:

* compile counts/costs (exactly three programs: feed / prompt / generate-n);
* steady-state per-round latency of feed(chunk) + generate(chunk) -
  the real-time budget for a 30 fps dyadic stream with chunk=8 is 267 ms;
* single-token latency (generate(1)) - the interactive floor.

Platform note (CLAUDE.md): every host->device call costs ~25 ms over the
axon tunnel, so one feed+generate round carries a ~50 ms floor that a
locally-attached host would not pay. Reported numbers INCLUDE the tunnel.

Run: ``python examples/streaming_latency_tpu.py [--chunk 8] [--rounds 30]``
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
    parser.add_argument("--rounds", type=int, default=30)
    parser.add_argument("--max-frames", type=int, default=1024)
    parser.add_argument("--batch", type=int, default=1,
                        help="concurrent sessions in lockstep (a serving "
                             "host batches many live dyadic streams)")
    parser.add_argument("--pool", action="store_true",
                        help="drive StreamingSessionPool instead of the "
                             "lockstep session: --batch slots at mixed "
                             "context lengths with one leave+join per round "
                             "(continuous batching)")
    parser.add_argument("--kv-heads", type=int, default=0,
                        help="grouped-query attention: K/V heads (0 = "
                             "multi-head). attn_kv_heads=1 (MQA) doubles "
                             "real-time capacity to 256 streams/chip "
                             "(PERF.md 'MQA capacity')")
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
    from dyadic_interaction_modeling_tpu.serving import StreamingListenerSession

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

    c = args.chunk
    b = args.batch
    if args.pool:
        _run_pool(args, model, params, jax, np)
        return
    sess = StreamingListenerSession(model, params, batch=b, chunk=c,
                                    max_frames=args.max_frames,
                                    max_tokens=args.max_frames)
    rng = np.random.default_rng(0)
    sp = rng.standard_normal((b, c, 56), dtype=np.float32)
    au = rng.standard_normal((b, c, 768), dtype=np.float32)

    print(f"chunk={c} batch={b} max_frames={args.max_frames} "
          f"kv_heads={args.kv_heads or 'multi-head'} "
          f"platform={jax.default_backend()} dtype=bf16 dims=reference(384/768)")
    t0 = time.time(); sess.feed(sp, au)
    print(f"feed compile: {time.time() - t0:.1f}s")
    t0 = time.time(); sess.start(np.zeros((b, 1), np.int32))
    print(f"prompt compile: {time.time() - t0:.1f}s")
    t0 = time.time(); sess.generate(c)
    print(f"generate({c}) compile: {time.time() - t0:.1f}s")
    t0 = time.time(); sess.generate(1)
    print(f"generate(1) compile: {time.time() - t0:.1f}s")
    t0 = time.time(); sess.round(sp, au)
    print(f"fused round({c}) compile: {time.time() - t0:.1f}s")

    rounds = []
    fused = []
    singles = []
    budget = args.max_frames // c - 4
    for i in range(min(args.rounds, budget)):
        t0 = time.perf_counter()
        sess.feed(sp, au)
        sess.generate(c)
        rounds.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        sess.round(sp, au)
        fused.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        sess.generate(1)
        singles.append(time.perf_counter() - t0)
    rounds.sort(); fused.sort(); singles.sort()
    n = len(rounds)
    print(f"steady state over {n} rounds at context ~{sess.frames_fed} frames:")
    print(f"  fused round({c}) p50 {fused[n // 2] * 1000:.1f} ms "
          f"(min {fused[0] * 1000:.1f}, max {fused[-1] * 1000:.1f}) "
          f"[ONE dispatch: the serving hot loop]")
    print(f"  feed({c})+generate({c}) p50 {rounds[n // 2] * 1000:.1f} ms "
          f"(min {rounds[0] * 1000:.1f}, max {rounds[-1] * 1000:.1f}) "
          f"-> {rounds[n // 2] / c * 1000:.1f} ms/frame vs "
          f"{1000 / 30 * c:.0f} ms real-time budget @30fps")
    print(f"  generate(1) p50 {singles[n // 2] * 1000:.1f} ms "
          f"(min {singles[0] * 1000:.1f}) [~25 ms is tunnel round-trip]")
    if b > 1:
        # measured A/B (round 5): the fused round wins at SMALL batch where
        # dispatch dominates (the avatar pipeline), but loses at B=128 where
        # the round is compute-bound - report the better of the two as the
        # production number
        per_round = min(fused[n // 2], rounds[n // 2])
        which = "fused" if fused[n // 2] <= rounds[n // 2] else "split"
        print(f"  serving throughput ({which} round): {b} lockstep sessions "
              f"x {c} frames / {per_round * 1000:.1f} ms = "
              f"{b * c / per_round:,.0f} generated frames/s "
              f"(+ equal context frames ingested)")


def _run_pool(args, model, params, jax, np):
    """Continuous-batching measurement: --batch pool slots, every round all
    slots feed+generate one chunk AND one stream ends while a fresh caller
    joins at context 0 - so steady state holds genuinely mixed context
    lengths (the workload the lockstep session cannot express). A round is
    3 device calls - the fused round() for the surviving slots plus feed +
    start for the newcomer, which begins decoding the NEXT round (a joining
    stream naturally waits out its first chunk)."""
    from dyadic_interaction_modeling_tpu.serving import StreamingSessionPool

    b, c = args.batch, args.chunk
    pool = StreamingSessionPool(model, params, capacity=b, chunk=c,
                                max_frames=args.max_frames,
                                max_tokens=args.max_frames)
    rng = np.random.default_rng(0)
    sp = rng.standard_normal((b, c, 56), dtype=np.float32)
    au = rng.standard_normal((b, c, 768), dtype=np.float32)
    slots = [pool.join(seed=i) for i in range(b)]
    print(f"pool capacity={b} chunk={c} max_frames={args.max_frames} "
          f"platform={jax.default_backend()} dtype=bf16 dims=reference(384/768)")
    t0 = time.time(); pool.feed(slots, sp, au)
    print(f"feed compile: {time.time() - t0:.1f}s")
    t0 = time.time(); pool.start(slots, np.zeros((b, 1), np.int32))
    print(f"prompt compile: {time.time() - t0:.1f}s")
    t0 = time.time(); pool.generate(slots, c)
    print(f"generate({c}) compile: {time.time() - t0:.1f}s")
    t0 = time.time(); pool.round(slots, sp, au)
    print(f"fused round({c}) compile: {time.time() - t0:.1f}s")

    rounds = []
    budget = args.max_frames // c - 3
    for i in range(min(args.rounds, budget)):
        t0 = time.perf_counter()
        victim = i % b
        pool.leave(slots[victim])
        slots[victim] = pool.join(seed=1000 + i)
        survivors = [s for j, s in enumerate(slots) if j != victim]
        pool.round(survivors, sp[1:], au[1:])
        pool.feed([slots[victim]], sp[:1], au[:1])
        pool.start([slots[victim]], np.zeros((1, 1), np.int32))
        rounds.append(time.perf_counter() - t0)
    rounds.sort()
    n = len(rounds)
    lens = [pool.frames_fed(s) for s in slots]
    print(f"steady state over {n} churn rounds (context lengths now "
          f"{min(lens)}..{max(lens)} frames):")
    print(f"  churn + fused-round + newcomer-prep p50 "
          f"{rounds[n // 2] * 1000:.1f} ms "
          f"(min {rounds[0] * 1000:.1f}, max {rounds[-1] * 1000:.1f}) vs "
          f"{1000 / 30 * c:.0f} ms real-time budget @30fps")
    print(f"  pool throughput: {b - 1} decoding mixed-length sessions x {c} "
          f"frames / {rounds[n // 2] * 1000:.1f} ms = "
          f"{(b - 1) * c / rounds[n // 2]:,.0f} generated frames/s "
          f"(+1 stream ingesting its first chunk)")


if __name__ == "__main__":
    main()
