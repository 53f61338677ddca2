"""SLM pretrain-step BACKWARD cost breakdown + per-component MFU on the TPU.

VERDICT round-3 #7: the backward is ~125 ms of the ~170 ms step - dissect it
the way examples/decode_breakdown_tpu.py dissected generation. For each
component of the step (reference seq2seq_pretrain.py:300-323; our
models/slm.py SLM.__call__) this times forward-only and forward+backward as
separate jits over the SAME params pytree (unused params get dead-code-
eliminated grads, so each timing is that component's chain alone), pulls
XLA's cost analysis for the fwd+bwd program, and reports per-component MFU
against the v5e bf16 peak (197 TFLOP/s). The gap between a component's MFU
and the peak is then attributable to its shapes, not to scheduling.

Components:
  enc_s        one marginal encoder pass, (B, L) at dim 384, depth 4, h12/d64
  joint_2L     the joint encoder pass at (B, 2L)
  marginal_2B  the batched two-marginal joint pass at (2B, L) (shared weights)
  dec_2B       the batched cross-prediction decoder, (2B, L) at dim 1152
               with cross-attention over an (2B, L, 1152) context
  ce_chain     ar_cross_entropy of both logit tensors (grad wrt logits)
  vqdec_cont   forward_vq_decoder + continuous pairwise loss (grads hit the
               trainable VQ decoders; argmax blocks grads to the logits)
  info_nce     masked-mean + InfoNCE (grad wrt the encoder reps)
  optimizer    AdamW(wd, clip) update alone, precomputed grads

Every timed call includes one ~25 ms axon tunnel round-trip (CLAUDE.md);
the script measures that floor with an empty jit and prints it - subtract
it mentally when comparing against the in-step cost, where components are
fused into one program.

Run: ``python examples/slm_bwd_breakdown_tpu.py [--b 32] [--l 256]``
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

V5E_BF16_PEAK = 197e12


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--b", type=int, default=32)
    p.add_argument("--l", type=int, default=256)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    enable_persistent_cache()

    import jax.numpy as jnp

    from dyadic_interaction_modeling_tpu import config as C
    from dyadic_interaction_modeling_tpu.engine.train_state import create_train_state
    from dyadic_interaction_modeling_tpu.models.slm import (
        SLM, SLM_FROZEN_SUBSTRINGS, info_nce, continuous_loss,
    )
    from dyadic_interaction_modeling_tpu.models.xtrans import (
        ar_inputs_targets, ar_cross_entropy,
    )

    b, l = args.b, args.l
    model = SLM(C.slm_defaults(), C.vq_listener_defaults(), dtype=jnp.bfloat16)
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    v_s = jax.random.normal(ks[0], (b, l, 56))
    v_l = jax.random.normal(ks[1], (b, l, 56))
    v_a = jax.random.normal(ks[2], (b, l, 768))
    mask = jnp.ones((b, l), dtype=bool)
    rng = jax.random.PRNGKey(1)
    params = model.init(jax.random.PRNGKey(2),
                        v_s[:1, :8], v_l[:1, :8], v_a[:1, :8],
                        mask[:1, :8], rng)["params"]
    print(f"B={b} L={l} bf16 platform={jax.default_backend()}")

    bound = lambda p_: model.bind({"params": p_}, rngs={})

    # constant intermediates each component consumes (stop-gradient inputs)
    m = bound(params)
    x_s = m.encoder_s(v_s.astype(jnp.bfloat16), mask=mask, return_embeddings=True)
    x_l = m.encoder_l(v_l.astype(jnp.bfloat16), mask=mask, return_embeddings=True)
    z_s, z_l = m.forward_vq(v_s, v_l, mask)
    inp_s, tgt_s = ar_inputs_targets(z_s)
    inp_l, tgt_l = ar_inputs_targets(z_l)
    dec_ctx = jnp.concatenate(
        [jnp.concatenate([x_l + jnp.zeros((1, 1, 384), x_l.dtype), v_a.astype(x_l.dtype)], axis=-1),
         jnp.concatenate([x_s, v_a.astype(x_s.dtype)], axis=-1)], axis=0)
    dec_inp = jnp.concatenate([inp_s, inp_l], axis=0)
    dec_msk = jnp.concatenate([mask, mask], axis=0)
    logits = m.decoder_joint(dec_inp, context=dec_ctx, context_mask=dec_msk)
    logits = jax.block_until_ready(logits)

    floor_fn = jax.jit(lambda x: x + 1.0)
    float(floor_fn(jnp.float32(0)))
    t0 = time.perf_counter()
    for _ in range(20):
        float(floor_fn(jnp.float32(0)))
    floor = (time.perf_counter() - t0) / 20
    print(f"tunnel floor (empty jit round-trip): {floor * 1000:.1f} ms\n")
    print(f"{'component':14s} {'fwd ms':>8s} {'fwd+bwd':>8s} {'bwd ms':>8s} "
          f"{'GFLOP':>8s} {'MFU%':>6s}")

    rows = []

    def grad_scalar(tree):
        return sum(jnp.sum(g.astype(jnp.float32))
                   for g in jax.tree_util.tree_leaves(tree))

    def bench(name, fn, *a, wrt=0, iters=args.iters):
        """fn(*a) -> scalar. Times jit(fn) and jit(value_and_grad(fn, wrt))."""
        f_fwd = jax.jit(fn)
        f_vg = jax.jit(lambda *xs: (lambda v, g: v + grad_scalar(g))(
            *jax.value_and_grad(fn, argnums=wrt)(*xs)))

        def timed(f):
            float(f(*a))  # compile
            t0 = time.perf_counter()
            for _ in range(iters):
                out = float(f(*a))
            return (time.perf_counter() - t0) / iters

        t_f, t_b = timed(f_fwd), timed(f_vg)
        try:
            cost = f_vg.lower(*a).compile().cost_analysis()
            flops = (cost or {}).get("flops", float("nan"))
        except Exception:
            flops = float("nan")
        mfu = flops / max(t_b - floor, 1e-9) / V5E_BF16_PEAK * 100
        print(f"{name:14s} {t_f*1e3:8.1f} {t_b*1e3:8.1f} "
              f"{(t_b - t_f)*1e3:8.1f} {flops/1e9:8.1f} {mfu:6.1f}")
        rows.append((name, t_f, t_b, flops))
        return t_f, t_b

    vsb = v_s.astype(jnp.bfloat16)
    bench("enc_s", lambda p_: jnp.sum(bound(p_).encoder_s(
        vsb, mask=mask, return_embeddings=True).astype(jnp.float32)), params)

    j_in = jnp.concatenate([x_s, x_l], axis=1)
    j_msk = jnp.concatenate([mask, mask], axis=-1)
    bench("joint_2L", lambda p_: jnp.sum(bound(p_).encoder_joint(
        j_in, mask=j_msk, return_embeddings=True).astype(jnp.float32)), params)

    m_in = jnp.concatenate([x_l, x_s], axis=0)
    m_msk = jnp.concatenate([mask, mask], axis=0)
    bench("marginal_2B", lambda p_: jnp.sum(bound(p_).encoder_joint(
        m_in, mask=m_msk, return_embeddings=True).astype(jnp.float32)), params)

    bench("dec_2B", lambda p_: jnp.sum(bound(p_).decoder_joint(
        dec_inp, context=dec_ctx, context_mask=dec_msk).astype(jnp.float32)),
        params)

    bench("ce_chain", lambda lg: ar_cross_entropy(lg[:b], tgt_s)
          + ar_cross_entropy(lg[b:], tgt_l), logits)

    def vqdec_cont(p_):
        pred_s, pred_l = bound(p_).forward_vq_decoder(logits[:b], logits[b:])
        return (continuous_loss(pred_s, v_s, mask)
                + continuous_loss(pred_l, v_l, mask))
    bench("vqdec_cont", vqdec_cont, params)

    bench("info_nce", lambda a_, c_: info_nce(a_, c_, mask, 0.05)[0],
          x_s.astype(jnp.float32), x_l.astype(jnp.float32), wrt=(0, 1))

    # optimizer update alone: reuse real grads from the full step
    state = create_train_state(model, {"params": params}, 1e-5,
                               weight_decay=0.01, clip_norm=1.0,
                               frozen_substrings=SLM_FROZEN_SUBSTRINGS)
    loss_fn = lambda p_: model.apply({"params": p_}, v_s, v_l, v_a, mask,
                                     rng).total_loss
    grads = jax.jit(jax.grad(loss_fn))(state.params)
    grads = jax.block_until_ready(grads)
    upd = jax.jit(lambda s, g: jnp.sum(
        s.apply_gradients(grads=g).params["patch_embed_s"]))
    float(upd(state, grads))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        float(upd(state, grads))
    t_opt = (time.perf_counter() - t0) / args.iters
    print(f"{'optimizer':14s} {'':8s} {t_opt*1e3:8.1f}")

    t_fwd_sum = sum(r[1] for r in rows)
    t_all_sum = sum(r[2] for r in rows) + t_opt
    n_calls = len(rows) + 1
    print(f"\nsum of components: fwd {t_fwd_sum*1e3:.0f} ms, fwd+bwd+opt "
          f"{t_all_sum*1e3:.0f} ms ({n_calls} calls x ~{floor*1e3:.0f} ms "
          f"tunnel floor = {n_calls*floor*1e3:.0f} ms of that)")

    # the real fused step (engine make_slm_train_step, donated state) for
    # comparison - iterations chain through state, fence once at the end,
    # so NO per-iteration tunnel floor (the bench.py protocol)
    from dyadic_interaction_modeling_tpu.engine.pt_engine import make_slm_train_step
    step = make_slm_train_step(model)
    batch = (v_s, v_l, v_a, mask)
    try:
        ca = step.lower(state, batch, rng).compile().cost_analysis()
        step_flops = float((ca or {}).get("flops", float("nan")))
    except Exception:
        step_flops = float("nan")
    st, logs = step(state, batch, rng)
    float(logs["l_ce_l"])
    t0 = time.perf_counter()
    for i in range(2 * args.iters):
        st, logs = step(st, batch, jax.random.fold_in(rng, i))
    float(logs["l_ce_l"])
    t_step = (time.perf_counter() - t0) / (2 * args.iters)
    print(f"fused train step (chained, no per-iter tunnel): {t_step*1e3:.1f} "
          f"ms, {step_flops/1e12:.2f} TFLOP, "
          f"MFU {step_flops/t_step/V5E_BF16_PEAK*100:.1f}%")


if __name__ == "__main__":
    main()
