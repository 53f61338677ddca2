"""Sweep the chunked-prefix decode over chunk sizes on the real TPU.

Measures the SLMFT production generate path (make_slmft_generator shapes:
B=256, L=256, bf16) with ``generate_tokens(chunk=...)`` vs the single-scan
baseline. The chunked path statically bounds self-attention cache reads to
the live prefix (models/xtrans.py); this script decides the production
default.

Run: ``python examples/decode_chunk_sweep.py [--b 256] [--l 256]``
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
    p.add_argument("--b", type=int, default=256)
    p.add_argument("--l", type=int, default=256)
    p.add_argument("--chunks", type=str, default="0,32,64,128")
    p.add_argument("--bestof", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    enable_persistent_cache()

    import jax.numpy as jnp

    from dyadic_interaction_modeling_tpu import config as C
    from dyadic_interaction_modeling_tpu.models.slm import SLMFT
    from dyadic_interaction_modeling_tpu.models.xtrans import (
        TokenDecoder,
        generate_tokens,
    )

    slm_cfg = C.slm_defaults()
    vq_cfg = C.vq_listener_defaults()
    model = SLMFT(slm_cfg, vq_cfg, dtype=jnp.bfloat16)
    b, l = args.b, args.l

    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    l0 = 8
    params = model.init(jax.random.PRNGKey(1),
                        jax.random.normal(ks[0], (1, l0, 56)),
                        jax.random.normal(ks[1], (1, l0, 56)),
                        jax.random.normal(ks[2], (1, l0, 768)),
                        jnp.ones((1, l0), dtype=bool),
                        jax.random.PRNGKey(2))["params"]
    decoder = TokenDecoder(
        num_tokens=slm_cfg.num_tokens, dim=slm_cfg.dim + slm_cfg.dim_audio,
        max_seq_len=slm_cfg.dec_max_seq_len, depth=slm_cfg.dec_depth,
        heads=slm_cfg.dec_heads, use_abs_pos_emb=False, dtype=jnp.bfloat16)

    src_v = jax.random.normal(ks[0], (b, l, 56))
    tgt = jax.random.normal(ks[1], (b, l, 56))
    src_a = jax.random.normal(ks[2], (b, l, 768))
    mask = jnp.ones((b, l), dtype=bool)

    ctx, prompt = jax.jit(lambda p_, a, c, d, m: model.apply(
        {"params": p_}, a, c, d, m, method=SLMFT.encode_context))(
        params, src_v, tgt, src_a, mask)

    print(f"B={b} L={l} platform={jax.default_backend()}")
    results = {}
    for chunk in [int(c) for c in args.chunks.split(",")]:
        fenced = jax.jit(lambda p_, pr, c_, m_, r, ch=chunk: jnp.sum(
            generate_tokens(decoder, {"params": p_}, pr, l - 1, c_, m_, r,
                            chunk=ch or None).astype(jnp.float32)))
        t0 = time.time()
        float(fenced(params["decoder_joint"], prompt, ctx, mask,
                     jax.random.PRNGKey(3)))
        compile_s = time.time() - t0
        iters = 5
        t0 = time.perf_counter()
        for i in range(iters):
            float(fenced(params["decoder_joint"], prompt, ctx, mask,
                         jax.random.fold_in(jax.random.PRNGKey(3), i)))
        dt = (time.perf_counter() - t0) / iters
        fps = b * (l - 1) / dt
        results[chunk] = fps
        print(f"chunk={chunk or 'off':>4}: {dt * 1000:7.1f} ms  "
              f"{fps / 1e3:7.1f}k frames/s  [compile {compile_s:.0f}s]")
    base = results.get(0)
    if base:
        for c, f in results.items():
            if c:
                print(f"chunk={c}: {f / base:.3f}x vs unchunked")

    if args.bestof > 1:
        # production eval shape: B0 clips x best-of-N sharing one context
        from dyadic_interaction_modeling_tpu.engine.pt_engine import (
            make_slmft_generator,
        )

        n = args.bestof
        b0 = b // n
        gen = make_slmft_generator(model, slm_cfg, l)
        batch = (src_v[:b0], tgt[:b0], src_a[:b0], mask[:b0])
        fenced = jax.jit(lambda p_, bt, r: jnp.sum(
            gen(p_, bt, r, n).astype(jnp.float32)))
        t0 = time.time()
        float(fenced(params, batch, jax.random.PRNGKey(4)))
        compile_s = time.time() - t0
        iters = 5
        t0 = time.perf_counter()
        for i in range(iters):
            float(fenced(params, batch,
                         jax.random.fold_in(jax.random.PRNGKey(4), i)))
        dt = (time.perf_counter() - t0) / iters
        fps = b0 * n * (l - 1) / dt
        print(f"best-of-{n} (B0={b0}, {b0 * n} rows): {dt * 1000:7.1f} ms  "
              f"{fps / 1e3:7.1f}k sampled frames/s  [compile {compile_s:.0f}s]")


if __name__ == "__main__":
    main()
