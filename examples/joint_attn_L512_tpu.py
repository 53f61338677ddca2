"""A/B the SLM joint-encoder pass at L=512: flash kernel vs dense attention.

The round-4 backward breakdown (examples/slm_bwd_breakdown_tpu.py) showed
the joint pass (B=32, 2L=512, dim 384, h12/d64) at 15.9% MFU while the
same-token-count marginal pass at L=256 runs 33.7%. L=512 is exactly the
flash-dispatch gate's lower bound (models/xtrans._use_flash), which was set
from the L=1024 catastrophic-dense measurement — this script measures
whether flash actually wins at 512, fwd-only and fwd+bwd, and checks
numerics between the two paths on-chip. DIM_TPU_FLASH is read once per
process, so each arm runs the same jit with the env set before import.

Run: ``python examples/joint_attn_L512_tpu.py --flash 1`` then ``--flash 0``
(and optionally ``--l 768``/``--l 1024`` to re-check the upper range).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--flash", type=int, default=1)
    p.add_argument("--b", type=int, default=32)
    p.add_argument("--l", type=int, default=512)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    os.environ["DIM_TPU_FLASH"] = "1" if args.flash else "0"

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from dyadic_interaction_modeling_tpu.utils.compilation_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    import jax.numpy as jnp

    from dyadic_interaction_modeling_tpu import config as C
    from dyadic_interaction_modeling_tpu.models.xtrans import (
        ContinuousTransformerWrapper,
    )

    c = C.slm_defaults()
    enc = ContinuousTransformerWrapper(
        dim=c.dim, dim_out=c.dim, max_seq_len=c.enc_max_seq_len,
        depth=c.enc_depth, heads=c.enc_heads, dtype=jnp.bfloat16)
    b, l = args.b, args.l
    x = jax.random.normal(jax.random.PRNGKey(0), (b, l, c.dim),
                          dtype=jnp.bfloat16)
    mask = jnp.ones((b, l), dtype=bool)
    params = enc.init(jax.random.PRNGKey(1), x[:1, :8], mask=mask[:1, :8],
                      return_embeddings=True)["params"]
    print(f"flash={args.flash} B={b} L={l} bf16 "
          f"platform={jax.default_backend()}")

    def fwd(p_, x_):
        return jnp.sum(enc.apply({"params": p_}, x_, mask=mask,
                                 return_embeddings=True).astype(jnp.float32))

    # chain K iterations inside ONE jit (CLAUDE.md protocol: the tunnel
    # round-trip is 25-50 ms and varies run-to-run, so per-call floor
    # subtraction cannot resolve ~10 ms components). Each iteration's input
    # depends on the previous iteration's grads (negligibly in value), which
    # serializes them and defeats CSE/hoisting.
    K = args.iters

    @jax.jit
    def chain_fwd(x0):
        def body(x_, _):
            v = fwd(params, x_)
            return x_ + (v * 1e-30).astype(x_.dtype), v
        _, vs = jax.lax.scan(body, x0, None, length=K)
        return jnp.sum(vs)

    @jax.jit
    def chain_vg(x0):
        def body(x_, _):
            v, g = jax.value_and_grad(fwd)(params, x_)
            gsum = v + sum(jnp.sum(gl.astype(jnp.float32))
                           for gl in jax.tree_util.tree_leaves(g))
            return x_ + (gsum * 1e-30).astype(x_.dtype), gsum
        _, vs = jax.lax.scan(body, x0, None, length=K)
        return jnp.sum(vs)

    # single-call checksum so the two arms can be compared for agreement
    print(f"vg checksum (K={K} chained): {float(chain_vg(x)):.6e}")

    for name, f, per_iter_flops in (
            ("fwd", chain_fwd, None), ("fwd+bwd", chain_vg, None)):
        float(f(x))  # compile
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = float(f(x))
        dt = (time.perf_counter() - t0) / reps / K
        try:
            cost = f.lower(x).compile().cost_analysis()
            flops = (cost or {}).get("flops", float("nan")) / K
        except Exception:
            flops = float("nan")
        mfu = flops / dt / 197e12 * 100
        print(f"{name:8s} {dt * 1e3:8.2f} ms/iter  ({flops / 1e9:.0f} GFLOP, "
              f"MFU {mfu:.1f}%)")


if __name__ == "__main__":
    main()
