"""GQA decode sweep on the real TPU chip.

The decode loop is ELEMENT-rate-limited on KV-cache reads (PERF.md int8
probe: int8/bf16/f32 step attention all run at the same time - ~82G
elements/s - so quantization buys nothing and reading FEWER elements is the
only lever). ``attn_kv_heads`` (grouped-query attention, models/xtrans.py)
divides both the self-cache and the cross-K/V elements by heads/kv_heads.

This harness measures SLMFT generation at reference dims (bf16, L=256) on:

* the REFERENCE EVAL WORKLOAD (25 clips x best-of-10, shared-context +
  geometric chunk=32) - bench.py's headline shape;
* independent clips (B=256, no sharing) - the worst case for cache traffic;
* optionally the streaming serving round at B=128 (--serving).

Arms: kv_heads in {heads (baseline, multi-head), 4, 2, 1} at the reference
head shape (12 x 64), plus optionally the TPU-native 6 x 128 shape
(--tpu-shape: kv in {6, 2, 1}). Each arm re-inits params (GQA shrinks the
K/V projections - a from-scratch training knob, not checkpoint-compatible).

Run: python examples/gqa_decode_tpu.py [--serving] [--tpu-shape] [--iters 5]

Measured (round 5, 1x v5e, see PERF.md "Grouped-query attention"):
12x64 kv=12: eval 140.6k / indep 58.5k / serving 171.1 ms; kv=4 x0.67 eval
(G=3 row tiles hurt) / x1.18 indep; kv=2 x1.01 / x1.85; kv=1 (MQA) x1.35 /
x2.46, serving 136.0 ms. 6x128 kv=6: eval 150.4k / indep 81.6k; 6x128 kv=1
(full TPU-native config): eval 211.6k (x1.50 vs headline) / indep 185.2k
(x3.17) / serving 134.7 ms - fastest arm on every workload.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


B0, N, L, CHUNK = 25, 10, 256, 32
B_INDEP = 256


def make_model(kv_heads: int, heads: int = 12, dim_head: int = 64):
    from dyadic_interaction_modeling_tpu import config as C
    from dyadic_interaction_modeling_tpu.models.slm import SLMFT

    slm_cfg = C.slm_defaults()
    slm_cfg.update(dict(enc_heads=heads, dec_heads=heads,
                        attn_dim_head=dim_head,
                        attn_kv_heads=0 if kv_heads == heads else kv_heads))
    vq_cfg = C.vq_listener_defaults()
    model = SLMFT(slm_cfg, vq_cfg, dtype=jnp.bfloat16)
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    l0 = 8
    v_s = jax.random.normal(ks[0], (1, l0, 56))
    v_l = jax.random.normal(ks[1], (1, l0, 56))
    v_a = jax.random.normal(ks[2], (1, l0, 768))
    mask = jnp.ones((1, l0), dtype=bool)
    params = model.init(jax.random.PRNGKey(1), v_s, v_l, v_a, mask,
                        jax.random.PRNGKey(2))["params"]
    return model, slm_cfg, params


def batch(b, l):
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    return (jax.random.normal(ks[0], (b, l, 56)),
            jax.random.normal(ks[1], (b, l, 56)),
            jax.random.normal(ks[2], (b, l, 768)),
            jnp.ones((b, l), dtype=bool))


def fenced_gen(model, slm_cfg, n_samples, chunk):
    from dyadic_interaction_modeling_tpu.engine.pt_engine import (
        make_slmft_generator)

    gen = make_slmft_generator(model, slm_cfg, L, chunk=chunk)
    # axon fencing: reduce to an on-device scalar, transfer 4 bytes
    return jax.jit(lambda p, b, r: jnp.sum(
        gen(p, b, r, n_samples).astype(jnp.float32)))


def time_workload(model, slm_cfg, params, b, n, iters):
    fn = fenced_gen(model, slm_cfg, n, CHUNK)
    bt = batch(b, L)
    rng = jax.random.PRNGKey(3)
    s = float(fn(params, bt, rng))  # compile
    assert s == s, "non-finite generation sum"
    t0 = time.perf_counter()
    for i in range(iters):
        float(fn(params, bt, jax.random.fold_in(rng, i)))
    dt = (time.perf_counter() - t0) / iters
    return b * n * (L - 1) / dt, dt


def time_serving(model, params, iters, batch_n=128, chunk=8):
    """p50 feed+generate round at B=128, split programs (the production
    large-batch serving config, bench.py measure_serving)."""
    import numpy as np

    from dyadic_interaction_modeling_tpu.serving import (
        StreamingListenerSession)

    sess = StreamingListenerSession(model, params, batch=batch_n, chunk=chunk,
                                    max_frames=1024, max_tokens=1024)
    sp = np.random.RandomState(0).randn(batch_n, chunk, 56).astype("float32")
    au = np.random.RandomState(1).randn(batch_n, chunk, 768).astype("float32")
    sess.feed(sp, au)
    sess.start(np.zeros((batch_n, 1), "int32"))
    sess.generate(chunk)  # compile both programs
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sess.feed(sp, au)
        sess.generate(chunk)
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--serving", action="store_true")
    ap.add_argument("--serving-rounds", type=int, default=12)
    ap.add_argument("--tpu-shape", action="store_true",
                    help="heads 6 x dim_head 128 arms instead of 12 x 64")
    ap.add_argument("--kv", type=int, nargs="*", default=None)
    args = ap.parse_args()

    heads, dim_head = (6, 128) if args.tpu_shape else (12, 64)
    kvs = args.kv or ([6, 2, 1] if args.tpu_shape else [12, 4, 2, 1])
    print(f"backend={jax.default_backend()} heads={heads} dim_head={dim_head}")

    base_eval = base_indep = base_round = None
    for kv in kvs:
        model, slm_cfg, params = make_model(kv, heads, dim_head)
        fps_eval, dt_e = time_workload(model, slm_cfg, params, B0, N,
                                       args.iters)
        fps_ind, dt_i = time_workload(model, slm_cfg, params, B_INDEP, 1,
                                      args.iters)
        line = (f"kv_heads={kv:2d}  eval {fps_eval/1e3:8.1f}k f/s "
                f"({dt_e*1e3:6.1f} ms)  indep {fps_ind/1e3:8.1f}k f/s "
                f"({dt_i*1e3:6.1f} ms)")
        if base_eval is None:
            base_eval, base_indep = fps_eval, fps_ind
        else:
            line += (f"  [x{fps_eval/base_eval:.2f} eval, "
                     f"x{fps_ind/base_indep:.2f} indep]")
        if args.serving:
            ms = time_serving(model, params, args.serving_rounds)
            line += f"  serving_round_p50 {ms:6.1f} ms"
            if base_round is None:
                base_round = ms
            else:
                line += f" [x{base_round/ms:.2f}]"
        print(line, flush=True)


if __name__ == "__main__":
    main()
