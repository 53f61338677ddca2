"""SLM dyadic-pretraining step cost breakdown on the real TPU.

The pretrain step (models/slm.py SLM.__call__, reference
seq2seq_pretrain.py:300-323) runs: frozen VQ tokenization, 5 encoder passes
(speaker, listener, joint at 2L, and the two bug-compatible marginal joint
passes), 2 cross-prediction decoder passes, 2 frozen VQ decodes, and the
CE/continuous/InfoNCE losses - then the backward. This script times the
pieces forward-only plus the full optimizer step, the same way
examples/decode_breakdown_tpu.py dissected generation.

Run: ``python examples/slm_step_breakdown_tpu.py [--b 32] [--l 256]``
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
    p.add_argument("--b", type=int, default=32)
    p.add_argument("--l", type=int, default=256)
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    enable_persistent_cache()

    import jax.numpy as jnp

    from dyadic_interaction_modeling_tpu import config as C
    from dyadic_interaction_modeling_tpu.engine.train_state import create_train_state
    from dyadic_interaction_modeling_tpu.models.slm import SLM, SLM_FROZEN_SUBSTRINGS

    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    model = SLM(C.slm_defaults(), C.vq_listener_defaults(), dtype=dtype)
    b, l = args.b, args.l
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    v_s = jax.random.normal(ks[0], (b, l, 56))
    v_l = jax.random.normal(ks[1], (b, l, 56))
    v_a = jax.random.normal(ks[2], (b, l, 768))
    mask = jnp.ones((b, l), dtype=bool)
    rng = jax.random.PRNGKey(1)
    params = model.init(jax.random.PRNGKey(2),
                        v_s[:1, :8], v_l[:1, :8], v_a[:1, :8],
                        mask[:1, :8], rng)["params"]
    print(f"B={b} L={l} dtype={dtype.__name__} platform={jax.default_backend()}")

    def timeit(name, fn, *a, iters=10):
        t0 = time.time()
        float(fn(*a))
        compile_s = time.time() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = float(fn(*a))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:28s}: {dt * 1000:7.1f} ms  [compile {compile_s:.0f}s]")
        return dt

    bound = lambda p_: model.bind({"params": p_}, rngs={})

    vq_fn = jax.jit(lambda p_, a, c, m: jnp.sum(jnp.asarray(
        bound(p_).forward_vq(a, c, m)[0], jnp.float32)))
    t_vq = timeit("forward_vq (frozen)", vq_fn, params, v_s, v_l, mask)

    enc_fn = jax.jit(lambda p_, a, c, m, r: sum(
        jnp.sum(x.astype(jnp.float32))
        for x in bound(p_).forward_encoder(a, c, m, r)[:3]))
    t_enc = timeit("forward_encoder (5 passes)", enc_fn, params, v_s, v_l,
                   mask, rng)

    fwd_fn = jax.jit(lambda p_, a, c, d, m, r: model.apply(
        {"params": p_}, a, c, d, m, r).total_loss)
    t_fwd = timeit("full loss forward", fwd_fn, params, v_s, v_l, v_a, mask, rng)

    state = create_train_state(model, {"params": params}, 1e-4,
                               frozen_substrings=SLM_FROZEN_SUBSTRINGS)

    @jax.jit
    def train_step(state, a, c, d, m, r):
        def loss_fn(p_):
            return model.apply({"params": p_}, a, c, d, m, r).total_loss
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    def step_fenced(state, *a):
        new_state, loss = train_step(state, *a)
        return loss  # scalar transfer fences (axon protocol)

    t_step = timeit("train step (fwd+bwd+opt)", step_fenced, state,
                    v_s, v_l, v_a, mask, rng)

    # with precomputed frozen-VQ tokens (engine VQTokenCache path)
    z_s, z_l = vq_tok = jax.jit(lambda p_, a, c, m: bound(p_).forward_vq(
        a, c, m))(params, v_s, v_l, mask)

    @jax.jit
    def train_step_tok(state, a, c, d, m, r, z_s, z_l):
        def loss_fn(p_):
            return model.apply({"params": p_}, a, c, d, m, r,
                               vq_tokens=(z_s, z_l)).total_loss
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    t_tok = timeit("train step (cached vq tokens)",
                   lambda *a: train_step_tok(*a)[1], state,
                   v_s, v_l, v_a, mask, rng, z_s, z_l)

    print(f"\nimplied: vq {t_vq*1e3:.0f} ms | encoders {(t_enc - t_vq)*1e3:.0f}"
          f" ms (5 passes) | decoders+losses {(t_fwd - t_enc)*1e3:.0f} ms | "
          f"backward+opt {(t_step - t_fwd)*1e3:.0f} ms | "
          f"step {t_step*1e3:.0f} ms total "
          f"({b * l / t_step / 1e3:.1f}k frames/s)")


if __name__ == "__main__":
    main()
