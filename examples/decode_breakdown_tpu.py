"""Decode-step cost breakdown on the real TPU (B=256, L=256, bf16).

The bench headline (bench.py) is the SLMFT KV-cached ``lax.scan`` decode.
PERF.md puts it at ~34% of the analytic HBM roofline; ROADMAP round-3 #2
proposes a fused decoder-step kernel. Before writing any kernel, this script
ablates the per-step components to find where the 255-step scan actually
spends its time:

  full       - the production decode step (self-attn + cross-attn + FF)
  no_cross   - cross-attention replaced by identity
  no_self    - cached self-attention replaced by identity (cache still updated)
  no_ff      - feedforward replaced by identity
  attn_only  - self+cross attention, no FF, no logits

Each variant runs the same 255-step scan over the same preallocated cache.
Timing uses the axon fencing protocol (on-device scalar reduction; see
CLAUDE.md).

Run: ``python examples/decode_breakdown_tpu.py [--b 256] [--l 256]``
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
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    enable_persistent_cache()

    import jax.numpy as jnp

    from dyadic_interaction_modeling_tpu import config as C
    from dyadic_interaction_modeling_tpu.models.xtrans import (
        TokenDecoder,
        init_decoder_cache,
        top_k_filter,
    )

    slm = C.slm_defaults()
    dim = slm.dim + slm.dim_audio
    b, l = args.b, args.l
    dec = TokenDecoder(num_tokens=slm.num_tokens, dim=dim,
                       max_seq_len=slm.dec_max_seq_len, depth=slm.dec_depth,
                       heads=slm.dec_heads, use_abs_pos_emb=False,
                       dtype=jnp.bfloat16)
    ctx = jax.random.normal(jax.random.PRNGKey(0), (b, l, dim), jnp.bfloat16)
    tok0 = jnp.zeros((b, 1), dtype=jnp.int32)
    params = dec.init(jax.random.PRNGKey(1), tok0, ctx)

    mask = jnp.ones((b, l), dtype=bool)

    def run_variant(name, skip_self=False, skip_cross=False, skip_ff=False,
                    skip_logits=False):
        layers = dec.bind(params).layers

        def step(x_t, cache, t, cross_kv):
            new_cache = dict(cache)
            for i in range(layers.depth):
                if skip_self:
                    # still pay the cache write so the carry shape matches
                    pass
                else:
                    a, ck, cv = layers.self_attn[i].step_self(
                        layers.norm_self[i](x_t), cache[f"k_{i}"],
                        cache[f"v_{i}"], t)
                    new_cache[f"k_{i}"] = ck
                    new_cache[f"v_{i}"] = cv
                    x_t = x_t + a
                if not skip_cross:
                    k, v = cross_kv[i]
                    x_t = x_t + layers.cross_attn[i].step_cross(
                        layers.norm_cross[i](x_t), k, v, mask)
                if not skip_ff:
                    x_t = x_t + layers.ff[i](layers.norm_ff[i](x_t))
                cache = new_cache
            return layers.final_norm(x_t), new_cache

        def scan_fn(params_tree, ctx, rng):
            bound = dec.bind(params_tree)
            cross_kv = bound.layers.cross_kv(ctx)
            cache = init_decoder_cache(b, l, dec.depth, dec.heads,
                                       dtype=jnp.bfloat16)

            def body(carry, i):
                tok, cache, rng = carry
                emb = bound.token_emb(tok)
                h, cache = step(emb, cache, i, cross_kv)
                if skip_logits:
                    nxt = tok[:, 0]
                else:
                    logits = bound.to_logits(h)[:, 0].astype(jnp.float32)
                    rng, sub = jax.random.split(rng)
                    nxt = jax.random.categorical(
                        sub, top_k_filter(logits), axis=-1).astype(jnp.int32)
                return (nxt[:, None], cache, rng), nxt

            (_, _, _), toks = jax.lax.scan(
                body, (tok0, cache, rng), jnp.arange(l - 1))
            return jnp.sum(toks.astype(jnp.float32))

        fenced = jax.jit(scan_fn)
        t0 = time.time()
        float(fenced(params, ctx, jax.random.PRNGKey(2)))
        compile_s = time.time() - t0
        iters = 5
        t0 = time.perf_counter()
        for i in range(iters):
            float(fenced(params, ctx, jax.random.fold_in(jax.random.PRNGKey(2), i)))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:12s}: {dt * 1000:8.1f} ms/scan "
              f"({b * (l - 1) / dt / 1e3:7.1f}k tok/s)  [compile {compile_s:.0f}s]")
        return dt

    print(f"B={b} L={l} dim={dim} depth={slm.dec_depth} heads={slm.dec_heads} "
          f"platform={jax.default_backend()}")
    full = run_variant("full")
    no_self = run_variant("no_self", skip_self=True)
    no_cross = run_variant("no_cross", skip_cross=True)
    no_ff = run_variant("no_ff", skip_ff=True)
    attn = run_variant("attn_only", skip_ff=True, skip_logits=True)
    print(f"\nimplied: self-attn {1e3 * (full - no_self):.0f} ms, "
          f"cross-attn {1e3 * (full - no_cross):.0f} ms, "
          f"ff {1e3 * (full - no_ff):.0f} ms, "
          f"logits+sampling {1e3 * (attn - no_self - (full - no_cross) + (full - no_ff) - full):+.0f} (x-check), "
          f"attn_only {1e3 * attn:.0f} ms")


if __name__ == "__main__":
    main()
