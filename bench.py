"""Benchmark harness - prints ONE JSON line.

Headline metric (BASELINE.json): listener-motion generation throughput in
frames/sec/chip - SLMFT at full reference dims (dim 384 + 768 audio, depth 4,
512 codes) generating 255 listener frames per 256-frame clip via the
KV-cached ``lax.scan`` decoder, on the real TPU chip.

``vs_baseline`` is LIKE-FOR-LIKE: same batch, same length, same precision,
same chip - against the reference's *execution model*, a KV-cached decode
driven by a per-token python loop with one device call per token
(x-transformers ``AutoregressiveWrapper.generate``; the library caches KV,
so the honest baseline grants it that). The speedup is therefore purely the
fused-``lax.scan``-decode win (no per-token dispatch / launch round trips),
not a batch-size or hardware artifact.

Secondary fields: ``hbm_roofline_fraction`` (analytic decode traffic - self
cache + cross K/V + weight reads - over measured time vs the v5e's 819 GB/s
peak) and ``vs_cpu_reference_b1_l64`` (the reference algorithm on host CPU
fp32 at B=1 L=64 - a different-B number, kept for continuity and clearly
labeled). Both baselines are self-measured (the repo publishes no numbers,
BASELINE.md) and cached in ``bench_baseline.json``.
"""

from __future__ import annotations

import json
import os
import time

from dyadic_interaction_modeling_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")

B, L = 256, 256  # bench batch: e.g. 25 clips x best-of-10 sampling, 256 frames each


def _make_model(dtype=None):
    import jax.numpy as jnp

    from dyadic_interaction_modeling_tpu import config as C
    from dyadic_interaction_modeling_tpu.models.slm import SLMFT

    slm_cfg = C.slm_defaults()
    vq_cfg = C.vq_listener_defaults()
    # bf16 activations + KV cache: the decode loop is cache-bandwidth bound
    # (measured 35k vs 20k frames/s on v5e); sampling happens in fp32.
    return SLMFT(slm_cfg, vq_cfg, dtype=dtype or jnp.bfloat16), slm_cfg


def _init_params(model):
    """Init with tiny-length inputs: param shapes are length-independent,
    so this avoids compiling the full-length init graph."""
    import jax
    import jax.numpy as jnp

    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    l0 = 8
    v_s = jax.random.normal(ks[0], (1, l0, 56))
    v_l = jax.random.normal(ks[1], (1, l0, 56))
    v_a = jax.random.normal(ks[2], (1, l0, 768))
    mask = jnp.ones((1, l0), dtype=bool)
    return model.init(jax.random.PRNGKey(1), v_s, v_l, v_a, mask,
                      jax.random.PRNGKey(2))["params"]


def _batch(b, l):
    import jax
    import jax.numpy as jnp

    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    return (jax.random.normal(ks[0], (b, l, 56)),
            jax.random.normal(ks[1], (b, l, 56)),
            jax.random.normal(ks[2], (b, l, 768)),
            jnp.ones((b, l), dtype=bool))


def measure_tpu_throughput(model, slm_cfg, params) -> float:
    import jax

    from dyadic_interaction_modeling_tpu.engine.pt_engine import make_slmft_generator

    import numpy as np

    import jax.numpy as jnp

    gen = make_slmft_generator(model, slm_cfg, L)
    fenced = jax.jit(lambda p, b, r, n: jnp.sum(
        gen(p, b, r, n).astype(jnp.float32)), static_argnums=(3,))
    batch = _batch(B, L)
    rng = jax.random.PRNGKey(3)
    # NOTE (axon platform): block_until_ready returns early AND device_get of
    # large outputs crawls over the tunnel (~20 MB/s) - fence by reducing to a
    # scalar ON DEVICE and transferring 4 bytes.
    float(fenced(params, batch, rng, 1))  # compile
    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        s = float(fenced(params, batch, jax.random.fold_in(rng, i), 1))
    dt = (time.perf_counter() - t0) / iters
    return B * (L - 1) / dt


def measure_cpu_reference_baseline(model, slm_cfg, params) -> float:
    """Reference-algorithm throughput on host CPU: full re-forward per token.

    The forward is jitted once at fixed length with a key mask over the live
    prefix (charitable to the baseline - the reference's python loop also
    retraces shapes); the algorithmic O(L^2) re-forward cost is preserved.
    """
    import jax
    import jax.numpy as jnp

    from dyadic_interaction_modeling_tpu.models.slm import SLMFT
    from dyadic_interaction_modeling_tpu.models.xtrans import TokenDecoder

    b, l = 1, 64
    cpu = jax.devices("cpu")[0]
    params = jax.device_put(params, cpu)
    with jax.default_device(cpu):
        v_s, v_l, v_a, mask = _batch(b, l)
        ctx, prompt = model.apply({"params": params}, v_s, v_l, v_a, mask,
                                  method=SLMFT.encode_context)
        dec = TokenDecoder(num_tokens=slm_cfg.num_tokens,
                           dim=slm_cfg.dim + slm_cfg.dim_audio,
                           max_seq_len=slm_cfg.dec_max_seq_len,
                           depth=slm_cfg.dec_depth, heads=slm_cfg.dec_heads,
                           use_abs_pos_emb=False)
        dparams = {"params": params["decoder_joint"]}

        @jax.jit
        def full_forward_step(tokens, t):
            live = jnp.arange(l)[None, :] <= t
            logits = dec.apply(dparams, tokens, ctx,
                               self_key_mask=live, context_mask=mask)
            nxt = jnp.argmax(jnp.take_along_axis(
                logits, t[None, None, None].repeat(b, 0), axis=1)[:, 0], axis=-1)
            return tokens.at[:, t + 1].set(nxt)

        tokens = jnp.zeros((b, l), dtype=jnp.int32).at[:, 0].set(prompt[:, 0])
        tokens = jax.block_until_ready(full_forward_step(tokens, jnp.int32(0)))  # compile
        t0 = time.perf_counter()
        for t in range(l - 1):
            tokens = full_forward_step(tokens, jnp.int32(t))
        jax.block_until_ready(tokens)
        dt = time.perf_counter() - t0
    return b * (l - 1) / dt


def measure_tpu_python_loop_baseline(model, slm_cfg, params) -> float:
    """Reference execution model, like-for-like: KV-cached decode at the SAME
    B, L, dtype and chip, but driven token-by-token from python with one
    device call per token (the x-transformers ``.generate`` loop)."""
    import jax
    import jax.numpy as jnp

    from dyadic_interaction_modeling_tpu.models.slm import SLMFT
    from dyadic_interaction_modeling_tpu.models.xtrans import (
        TokenDecoder,
        init_decoder_cache,
        top_k_filter,
    )

    v_s, v_l, v_a, mask = _batch(B, L)
    ctx, prompt = model.apply({"params": params}, v_s, v_l, v_a, mask,
                              method=SLMFT.encode_context)
    dec = TokenDecoder(num_tokens=slm_cfg.num_tokens,
                       dim=slm_cfg.dim + slm_cfg.dim_audio,
                       max_seq_len=slm_cfg.dec_max_seq_len,
                       depth=slm_cfg.dec_depth, heads=slm_cfg.dec_heads,
                       use_abs_pos_emb=False, dtype=jnp.bfloat16)
    dparams = {"params": params["decoder_joint"]}
    cross_kv = jax.jit(lambda c: dec.apply(dparams, c,
                                           method=TokenDecoder.cross_kv))(ctx)

    # NOTE: cross_kv/params MUST be jit arguments, not closures - closed-over
    # arrays become compile-time constants and these are GBs.
    @jax.jit
    def step(dparams, cross_kv, tok, cache, t, rng):
        logits, cache = dec.apply(dparams, tok, cache, t, cross_kv, mask,
                                  method=TokenDecoder.decode_step)
        rng, sub = jax.random.split(rng)
        filt = top_k_filter(logits.astype(jnp.float32), 0.1)
        nxt = jax.random.categorical(sub, filt, axis=-1).astype(jnp.int32)
        return nxt[:, None], cache, rng

    def run_loop():
        cache = init_decoder_cache(B, L, slm_cfg.dec_depth, slm_cfg.dec_heads,
                                   dtype=jnp.bfloat16)
        tok, rng = prompt.astype(jnp.int32), jax.random.PRNGKey(11)
        for t in range(L - 1):
            tok, cache, rng = step(dparams, cross_kv, tok, cache,
                                   jnp.int32(t), rng)
        return float(jnp.sum(tok))  # 4-byte fence (axon: see note above)

    run_loop()  # compile
    t0 = time.perf_counter()
    run_loop()
    dt = time.perf_counter() - t0
    return B * (L - 1) / dt


def decode_hbm_traffic_bytes(params, slm_cfg, b, l, bytes_per=2) -> int:
    """Analytic HBM traffic of the 255-step cached decode: growing self-KV
    reads + full cross-K/V reads + decoder weight reads per step."""
    import jax

    wbytes = sum(x.size for x in jax.tree_util.tree_leaves(
        params["decoder_joint"])) * bytes_per
    per_tok = b * slm_cfg.dec_heads * 64 * 2 * slm_cfg.dec_depth * bytes_per
    cache_reads = per_tok * (l * (l - 1) // 2)
    cross_reads = per_tok * l * (l - 1)
    weight_reads = wbytes * (l - 1)
    return cache_reads + cross_reads + weight_reads


V5E_HBM_PEAK = 819e9  # bytes/s


def _load_cache() -> dict:
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            return json.load(f)
    return {}


def get_cpu_reference() -> float:
    cache = _load_cache()
    if "cpu_reference_frames_per_sec" in cache:
        return float(cache["cpu_reference_frames_per_sec"])
    import jax.numpy as jnp

    model32, slm_cfg32 = _make_model(dtype=jnp.float32)  # baseline stays fp32
    params32 = _init_params(model32)
    fps = measure_cpu_reference_baseline(model32, slm_cfg32, params32)
    cache["cpu_reference_frames_per_sec"] = fps
    cache["cpu_how"] = ("full-reforward AR decode (reference algorithm, jitted) "
                        "on host CPU, SLMFT full dims, B=1 L=64")
    with open(BASELINE_FILE, "w") as f:
        json.dump(cache, f, indent=2)
    return fps


def get_tpu_loop_baseline(model, slm_cfg, params) -> float:
    cache = _load_cache()
    key = f"tpu_python_loop_frames_per_sec_B{B}_L{L}"
    if key in cache:
        return float(cache[key])
    fps = measure_tpu_python_loop_baseline(model, slm_cfg, params)
    cache[key] = fps
    cache["tpu_loop_how"] = ("KV-cached decode, per-token python loop, one "
                             "device call per token - same B/L/dtype/chip as "
                             "the headline (x-transformers generate execution "
                             "model)")
    with open(BASELINE_FILE, "w") as f:
        json.dump(cache, f, indent=2)
    return fps


def main():
    model, slm_cfg = _make_model()
    params = _init_params(model)
    fps = measure_tpu_throughput(model, slm_cfg, params)
    loop_fps = get_tpu_loop_baseline(model, slm_cfg, params)
    cpu_fps = get_cpu_reference()
    traffic = decode_hbm_traffic_bytes(params, slm_cfg, B, L)
    achieved_bw = traffic / (B * (L - 1) / fps)
    print(json.dumps({
        "metric": "listener_gen_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / loop_fps, 2),
        "baseline": f"same-B/L/dtype KV-cached per-token python-loop decode on this chip (B={B}, L={L}, bf16)",
        "hbm_roofline_fraction": round(achieved_bw / V5E_HBM_PEAK, 3),
        "vs_cpu_reference_b1_l64": round(fps / cpu_fps, 2),
    }))


if __name__ == "__main__":
    # the axon tunnel occasionally drops a remote_compile request; one retry
    # is cheap thanks to the persistent compilation cache
    try:
        main()
    except Exception as e:  # noqa: BLE001
        import sys, traceback

        traceback.print_exc()
        print("bench: transient failure, retrying once", file=sys.stderr)
        main()
