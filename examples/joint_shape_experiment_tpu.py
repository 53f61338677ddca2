"""joint_2L shape experiment: can reshaping the WORK (not the kernel) lift
the joint encoder pass off its 15.9% single-call MFU?

Round-4 closed the KERNEL question for the joint pass (B=32, 2L=512, dim
384, heads 12 x dim_head 64): flash beats dense at L=512 (26.2 vs 37.0
ms/iter fwd+bwd, examples/joint_attn_L512_tpu.py). The round-4 verdict
(Weak #3) asked whether changing the problem's SHAPE - head count / head
dim / projection fusion - recovers part of the 15.9% -> 51% gap to the
step's best component, or whether the ceiling argument extends to the
shape. Arms (all inner dim 768, FLOP-identical up to the attention split):

* ``--heads 12 --dim-head 64``            the shipped shape (baseline)
* ``--heads 6 --dim-head 128``            head dim matched to the 128-wide
                                          MXU lane (fewer, fatter heads)
* ``--fused-qkv``                         one (384 -> 3*768) projection
                                          instead of three (384 -> 768)
* ``--flash 0``                           dense attention for any shape

Protocol: K iterations of the full 4-layer encoder fwd+bwd chained inside
ONE jit (CLAUDE.md: the 25-50 ms tunnel floor varies run-to-run and cannot
resolve ~10 ms components), grads chained into the next iteration's input
so XLA cannot CSE or reorder. DIM_TPU_FLASH is read once per process - run
each arm as its own invocation.

Run: ``python examples/joint_shape_experiment_tpu.py [--heads 6 --dim-head
128] [--fused-qkv] [--flash 0]``
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--heads", type=int, default=12)
    p.add_argument("--dim-head", type=int, default=64)
    p.add_argument("--fused-qkv", action="store_true")
    p.add_argument("--flash", type=int, default=1)
    p.add_argument("--b", type=int, default=32)
    p.add_argument("--l", type=int, default=512)
    p.add_argument("--depth", type=int, default=4)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--reps", type=int, default=3)
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

    import flax.linen as nn
    import jax.numpy as jnp

    from dyadic_interaction_modeling_tpu import config as C
    from dyadic_interaction_modeling_tpu.models import xtrans as X

    c = C.slm_defaults()
    dt = jnp.bfloat16

    class FusedQKVAttention(X.XAttention):
        """XAttention with one fused (dim -> 3*inner) projection: same math
        (separate q/k/v slices), one MXU dispatch instead of three."""

        def setup(self):
            inner = self.heads * self.dim_head
            self.to_qkv = nn.Dense(3 * inner, use_bias=False,
                                   dtype=self.dtype)
            self.to_out = nn.Dense(self.dim, use_bias=False, dtype=self.dtype)

        def _proj(self, x, name):
            qkv = self.to_qkv(x)
            inner = self.heads * self.dim_head
            i = {"to_q": 0, "to_k": 1, "to_v": 2}[name]
            return qkv[..., i * inner: (i + 1) * inner]

    class Layers(nn.Module):
        heads: int
        dim_head: int
        fused: bool

        @nn.compact
        def __call__(self, x, mask):
            attn_cls = FusedQKVAttention if self.fused else X.XAttention
            for i in range(args.depth):
                h = X._xt_norm(dt, f"na_{i}")(x)
                x = x + attn_cls(c.dim, self.heads, self.dim_head, dtype=dt,
                                 name=f"attn_{i}")(h, key_mask=mask)
                h = X._xt_norm(dt, f"nf_{i}")(x)
                x = x + X.FeedForward(c.dim, dtype=dt, name=f"ff_{i}")(h)
            return X._xt_norm(dt, "fn")(x)

    b, l = args.b, args.l
    enc = Layers(args.heads, args.dim_head, args.fused_qkv)
    x = jax.random.normal(jax.random.PRNGKey(0), (b, l, c.dim), dtype=dt)
    mask = jnp.ones((b, l), dtype=bool)
    params = enc.init(jax.random.PRNGKey(1), x[:1, :8], mask[:1, :8])["params"]
    tag = (f"h{args.heads}/d{args.dim_head}"
           f"{'+fusedQKV' if args.fused_qkv else ''}"
           f"{' dense' if not args.flash else ' flash'}")
    print(f"{tag}  B={b} L={l} depth={args.depth} bf16 "
          f"platform={jax.default_backend()}")

    def loss(p_, x_):
        return jnp.sum(enc.apply({"params": p_}, x_, mask).astype(jnp.float32))

    K = args.iters

    @jax.jit
    def chain(p_, x0):
        # round-4 protocol (examples/joint_attn_L512_tpu.py): grad wrt
        # PARAMS (the training backward), a grad-derived scalar chained into
        # the next iteration's input so XLA cannot CSE or reorder
        def body(x_, _):
            v, g = jax.value_and_grad(loss)(p_, x_)
            gsum = v + sum(jnp.sum(gl.astype(jnp.float32))
                           for gl in jax.tree_util.tree_leaves(g))
            return x_ + (gsum * 1e-30).astype(x_.dtype), gsum

        _, vs = jax.lax.scan(body, x0, None, length=K)
        return jnp.sum(vs)

    t0 = time.time()
    float(chain(params, x))
    # analytic FLOPs (XLA cost_analysis counts a scan body ONCE, not x K):
    # matmul fwd = 2 * matmul-params * tokens; attention quadratic =
    # 4*B*H*L^2*Dh (QK^T + AV), shape-invariant across the arms; backward
    # wrt params + activations ~= 2x forward
    inner = args.heads * args.dim_head
    p_mm = args.depth * (4 * c.dim * inner + 2 * c.dim * 4 * c.dim)
    fwd = 2 * p_mm * b * l + args.depth * 4 * b * args.heads * l * l \
        * args.dim_head
    flops = 3 * fwd
    print(f"compile {time.time() - t0:.0f}s, {flops / 1e9:,.0f} GFLOP/iter "
          f"(fwd + bwd wrt params, analytic)")
    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        float(chain(params, x))
        times.append((time.perf_counter() - t0) / K)
    ms = min(times) * 1e3
    mfu = flops / min(times) / 197e12 * 100
    print(f"{tag}: {ms:.2f} ms/iter fwd+bwd, MFU {mfu:.1f}% "
          f"(all reps: {[f'{t * 1e3:.2f}' for t in times]})")


if __name__ == "__main__":
    main()
