"""Full SLM pretrain step at 12x64 vs 6x128 attention heads on the chip.

PERF.md's round-5 joint_2L shape experiment measured the 4-layer joint
encoder COMPONENT at 1.57x for heads 6 x dim_head 128 over the reference's
12 x 64 (the 128-wide MXU lane is half-empty at dim_head 64) and estimated
a ~6-8% win on the FULL pretrain step.  This harness replaces that estimate
with a measurement: the complete dyadic-pretraining step (frozen-VQ
tokenization + 5 encoder passes + both cross-prediction decoders + losses +
AdamW(wd=0.01)+clip backward, exactly bench.py's measure_train_step shape)
is timed back-to-back for both head shapes in one process.

The two shapes are FLOP- and parameter-shape-identical (inner attention
width heads*dim_head = 768 either way; q/k/v kernels are 384x768 in both),
so the SAME initialized params drive both models - only the head reshape
differs.  `attn_dim_head` is the config knob (config.py slm_defaults);
the shipped default stays 64 for reference/checkpoint parity.

Run: ``python examples/slm_fullstep_shape_tpu.py [--batch 32] [--len 256]
[--iters 20]``   (add ``--cpu`` for a tiny smoke off the chip)
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

V5E_BF16_PEAK_FLOPS = 197e12


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--len", type=int, default=256, dest="seq_len")
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--mqa", action="store_true",
                        help="add a 6x128 + attn_kv_heads=1 arm (the full "
                             "TPU-native config; K/V projections shrink, so "
                             "this arm re-inits its own params)")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    enable_persistent_cache()

    import jax.numpy as jnp

    from dyadic_interaction_modeling_tpu import config as C
    from dyadic_interaction_modeling_tpu.engine.pt_engine import (
        make_slm_train_step,
    )
    from dyadic_interaction_modeling_tpu.engine.train_state import (
        create_train_state,
    )
    from dyadic_interaction_modeling_tpu.models.slm import (
        SLM,
        SLM_FROZEN_SUBSTRINGS,
    )

    b, l = args.batch, args.seq_len
    if args.cpu:
        b, l = 2, 16

    vq_cfg = C.vq_listener_defaults()
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    batch = (jax.random.normal(ks[0], (b, l, 56)),
             jax.random.normal(ks[1], (b, l, 56)),
             jax.random.normal(ks[2], (b, l, 768)),
             jnp.ones((b, l), dtype=bool))
    tiny = tuple(x[:1, :8] for x in batch)

    arms = [("12x64 (reference shape)", 12, 64, 0),
            ("6x128 (MXU-lane-matched)", 6, 128, 0)]
    if args.mqa:
        arms.append(("6x128 + MQA (kv_heads=1)", 6, 128, 1))
    params = None
    results = {}
    for name, heads, dim_head, kv in arms:
        slm_cfg = C.slm_defaults()
        slm_cfg.enc_heads = heads
        slm_cfg.dec_heads = heads
        slm_cfg.attn_dim_head = dim_head
        slm_cfg.attn_kv_heads = kv
        model = SLM(slm_cfg, vq_cfg, dtype=jnp.bfloat16)
        if params is None or kv:  # kv arms shrink K/V kernels - own init
            params = model.init(jax.random.PRNGKey(1), *tiny,
                                jax.random.PRNGKey(2))["params"]
        state = create_train_state(model, {"params": params}, 1e-5,
                                   weight_decay=0.01, clip_norm=1.0,
                                   frozen_substrings=SLM_FROZEN_SUBSTRINGS)
        step = make_slm_train_step(model)
        rng = jax.random.PRNGKey(3)
        flops = None
        try:
            ca = step.lower(state, batch, rng).compile().cost_analysis()
            flops = float(ca.get("flops", 0.0)) or None
        except Exception:
            pass
        t0 = time.time()
        state, logs = step(state, batch, rng)
        ce0 = float(logs["l_ce_l"])  # compile + fence
        compile_s = time.time() - t0
        t0 = time.perf_counter()
        for i in range(args.iters):
            state, logs = step(state, batch, jax.random.fold_in(rng, i))
        ce1 = float(logs["l_ce_l"])  # chained through state; fences all
        dt = (time.perf_counter() - t0) / args.iters
        results[name] = dt
        mfu = f", MFU {flops / dt / V5E_BF16_PEAK_FLOPS:.1%}" if flops else ""
        print(f"{name}: {dt * 1e3:.1f} ms/step "
              f"({b * l / dt:,.0f} frames/s{mfu}) "
              f"[compile {compile_s:.0f}s, CE {ce0:.2f}->{ce1:.2f}]")

    base = results[arms[0][0]]
    alt = results[arms[1][0]]
    print(f"full-step speedup 6x128 vs 12x64: {base / alt:.3f}x")
    if args.mqa:
        mqa = results[arms[2][0]]
        print(f"full-step speedup 6x128+MQA vs 12x64: {base / mqa:.3f}x "
              f"(vs 6x128: {alt / mqa:.3f}x; fewer K/V params, not "
              f"FLOP-identical)")


if __name__ == "__main__":
    main()
