"""SLM-family training / evaluation engine (L4).

Parity target: ``/root/reference/code/x_engine_pt.py``:

* ``train_epoch``            (:9-60)   - split src 824 -> (56 motion, 768
  audio), length masks, loss dict logging
* ``evaluate_epoch``         (:134-165)
* ``evaluate_finetune_epoch``(:201-230) - teacher-forced preds for metrics
* ``evaluate_test_epoch``    (:232-277) - best-of-N sampling (N=10) keeping
  the lowest per-clip Frechet distance
* ``evaluate_test_epoch_biwi``(:279-336) - best-of-N (N=50) by vertex L2
* BIWI speaker-id mapper     (:76-91)

TPU redesign: best-of-N is one batched generate over a (B*N)-row batch -
prompt/context tiled N times with N independent PRNG streams - instead of the
reference's sequential python loop of N full AR decodes; selection happens on
host (FD needs scipy sqrtm).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..metrics.eval_utils import (
    calculate_activation_statistics,
    calculate_frechet_distance,
)
from ..models.slm import SLMFT
from ..models.xtrans import TokenDecoder, generate_tokens
from ..utils.logging import get_logger

# BIWI subject -> speaker-id (x_engine_pt.py:76-91)
BIWI_SPEAKER_IDS = {
    "F2": 0, "F3": 1, "F4": 2, "M3": 3, "M4": 4, "M5": 5,
    "F1": 6, "F5": 7, "F6": 8, "F7": 9, "F8": 10, "M1": 11,
    "M2": 12, "M6": 13,
}


def split_motion_audio(src: jnp.ndarray, motion_dim: int = 56
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """824-d combined features -> (56-d motion, 768-d audio) (x_engine_pt.py:30)."""
    return src[..., :motion_dim], src[..., motion_dim:]


def make_slm_train_step(model, with_vq_tokens: bool = False) -> Callable:
    """Jitted (state, batch, rng) -> (state, logs) for SLM/SLMFT.

    batch = (src_v, tgt, src_a, mask); the mask is precomputed from lengths
    (ops.positional.length_mask) instead of the reference's python loop.
    Gradient clipping / weight decay live in the optimizer chain
    (engine.train_state.make_optimizer).

    ``with_vq_tokens``: the batch carries two extra arrays (z_s, z_l) of
    precomputed frozen-VQ tokens (see VQTokenCache) and the step skips the
    two VQ encoder passes - identical numerics, ~16% faster (PERF.md).

    The incoming state is DONATED (callers reassign ``state = step(state,..)``
    everywhere): XLA updates params/moments in place instead of allocating a
    second copy - measured ~1.5% faster and half the peak param memory.
    """

    def loss_fn(params, batch, rng):
        src_v, tgt, src_a, mask = batch[:4]
        # only SLM takes vq_tokens; SLMFT/SpeakerSLMFT signatures are untouched
        kw = dict(vq_tokens=tuple(batch[4:6])) if with_vq_tokens else {}
        out = model.apply({"params": params}, src_v, tgt, src_a, mask, rng,
                          **kw)
        return out.total_loss, out.logs

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, batch, rng):
        (_, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng)
        state = state.apply_gradients(grads=grads)
        return state, logs

    return step


class VQTokenCache:
    """Per-clip cache of the frozen-VQ tokenization.

    The SLM pretrain step re-runs the two frozen 6-layer VQ encoders on
    every batch (~16% of the step, PERF.md breakdown) even though their
    output is DETERMINISTIC per clip: the masked batched encode is
    bit-identical to per-sample encoding within each clip's valid length
    (tests/test_slm.py), so tokens do not depend on batch composition or
    padding. This cache tokenizes each clip the first time it appears and
    afterwards reassembles the padded (z_s, z_l) batch arrays on the host
    (int32, ~KBs) - exactly matching forward_vq's padding (0 for speaker
    codes, ignore_index for listener codes, models/slm.py).

    Valid because the VQ tokenizers are frozen (SLM_FROZEN_SUBSTRINGS):
    the same params produce the same tokens for every step and epoch.
    """

    def __init__(self, model):
        self._fq = int(model.vq_cfg.face_quan_num)
        self._tokenize = jax.jit(lambda p, s, t, m: model.apply(
            {"params": p}, s, t, m, method="forward_vq"))
        self._store: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}

    def __call__(self, params, batch, names) -> Tuple[jnp.ndarray, jnp.ndarray]:
        from ..models.slm import IGNORE

        src_v, tgt, _src_a, mask = batch[:4]
        lens = np.asarray(jnp.sum(mask, axis=1)).astype(int)
        # clips are only cacheable under unique truthy identifiers (the
        # dataset's clip path); anything else falls back to computing
        usable = (names is not None and all(names)
                  and len(set(names)) == len(names))
        if not usable or any(n not in self._store for n in names):
            z_s, z_l = self._tokenize(params, src_v, tgt, mask)
            if usable:
                zs_np, zl_np = np.asarray(z_s), np.asarray(z_l)
                for i, n in enumerate(names):
                    self._store[n] = (zs_np[i, : lens[i] * self._fq].copy(),
                                      zl_np[i, : lens[i]].copy())
            return z_s, z_l
        b, l = src_v.shape[0], src_v.shape[1]
        z_s = np.zeros((b, l * self._fq), np.int32)
        z_l = np.full((b, l), IGNORE, np.int32)
        for i, n in enumerate(names):
            zs, zl = self._store[n]
            z_s[i, : zs.shape[0]] = zs
            z_l[i, : zl.shape[0]] = zl
        return jnp.asarray(z_s), jnp.asarray(z_l)


def train_epoch(state, loader: Iterable, train_step: Callable, rng,
                epoch: int = 0, print_freq: int = 200, logger=None):
    """Mirrors x_engine_pt.train_epoch's logging cadence."""
    logger = logger or get_logger()
    logs = None
    for i, batch in enumerate(loader):
        rng, sub = jax.random.split(rng)
        state, logs = train_step(state, batch, sub)
        if (i + 1) % print_freq == 0:
            msg = " ".join(f"{k} {float(v):.4f}" for k, v in logs.items())
            logger.info(f"Epoch {epoch} batch {i + 1}: {msg}")
    return state, ({k: float(v) for k, v in logs.items()} if logs else {})


def evaluate_epoch(params, model, loader: Iterable, rng) -> Dict[str, float]:
    """Teacher-forced validation loss (x_engine_pt.py:134-165)."""
    eval_step = jax.jit(lambda p, b, r: model.apply(
        {"params": p}, b[0], b[1], b[2], b[3], r).logs)
    sums: Dict[str, float] = {}
    n = 0
    for batch in loader:
        rng, sub = jax.random.split(rng)
        logs = eval_step(params, batch, sub)
        for k, v in logs.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        n += 1
    return {k: v / max(n, 1) for k, v in sums.items()}


def evaluate_finetune_epoch(params, model, loader: Iterable, rng
                            ) -> Tuple[List, List, List, List]:
    """Teacher-forced predictions for the metric battery
    (x_engine_pt.py:201-230). Returns (y_trues, y_preds, x, data_ids), each a
    list of (len_i - 1, C) numpy arrays."""
    pred_step = jax.jit(lambda p, b, r: model.apply(
        {"params": p}, b[0], b[1], b[2], b[3], r).pred)
    y_trues, y_preds, xs, ids = [], [], [], []
    for batch in loader:
        src_v, tgt, src_a, mask = batch[:4]
        data_ids = batch[4] if len(batch) > 4 else [None] * src_v.shape[0]
        rng, sub = jax.random.split(rng)
        preds = np.asarray(pred_step(params, batch[:4], sub))
        lens = np.asarray(jnp.sum(mask, axis=1))
        tgt_np = np.asarray(tgt)
        src_np = np.asarray(src_v)
        for j in range(src_v.shape[0]):
            lj = int(lens[j])
            y_preds.append(preds[j, : lj - 1])
            y_trues.append(tgt_np[j, 1:lj])
            xs.append(src_np[j, : lj - 1])
            ids.append(data_ids[j])
    return y_trues, y_preds, xs, ids


# ---------------------------------------------------------------------------
# best-of-N generation eval
# ---------------------------------------------------------------------------


def make_slmft_generator(model: SLMFT, slm_cfg, max_len: int,
                         chunk: Optional[int] = 32) -> Callable:
    """Jitted batched generator: (params, batch, rng, n_samples) ->
    (B, N, max_len-1, 56) candidate motions.

    Context is computed once and SHARED by the N resamples, which run as ONE
    generate call (vs the reference's sequential beam loop,
    x_engine_pt.py:255-268): only the prompt is tiled; cross-attention K/V is
    read once per clip, not once per sample (context_groups). ``chunk``
    enables the chunked-prefix decode (models/xtrans.py generate_tokens) -
    output-identical, measured fastest at 32 on the v5e (PERF.md).
    """
    decoder = TokenDecoder(
        num_tokens=slm_cfg.num_tokens, dim=slm_cfg.dim + slm_cfg.dim_audio,
        max_seq_len=slm_cfg.dec_max_seq_len, depth=slm_cfg.dec_depth,
        heads=slm_cfg.dec_heads,
        dim_head=getattr(slm_cfg, "attn_dim_head", 64),
        kv_heads=getattr(slm_cfg, "attn_kv_heads", 0) or None,
        use_abs_pos_emb=False, dtype=model.dtype)

    def generate(params, batch, rng, n_samples: int):
        src_v, tgt, src_a, mask = batch
        b, l = src_v.shape[0], src_v.shape[1]
        ctx, prompt = model.apply({"params": params}, src_v, tgt, src_a, mask,
                                  method=SLMFT.encode_context)
        prompt_t = jnp.tile(prompt, (n_samples, 1))
        # chunked-prefix decode pays off when the scan is bandwidth bound;
        # at few rows it is launch-latency bound and chunking loses ~5%
        # (PERF.md p50) - row count is static at trace time, so decide here
        eff_chunk = chunk if b * n_samples >= 32 else None
        tokens = generate_tokens(
            decoder, {"params": params["decoder_joint"]}, prompt_t, l - 1,
            ctx, mask, rng, context_groups=n_samples, chunk=eff_chunk)
        motion = model.apply({"params": params}, tokens,
                             method=SLMFT.decode_tokens_to_motion)
        # (N*B, L-1, 56) -> (B, N, L-1, 56)
        return motion.reshape(n_samples, b, l - 1, -1).transpose(1, 0, 2, 3)

    return jax.jit(generate, static_argnums=(3,))


def make_speaker_generator(model, slm_cfg, max_len: int,
                           chunk: Optional[int] = 32) -> Callable:
    """Batched AR generator for SpeakerSLMFT (the sampled alternative to the
    reference's degenerate teacher-forced beam loop, x_engine_pt.py:319-336).

    (params, (verts, emoca, audio, mask, template, speaker_ids), rng, n)
    -> (B, N, max_len-1, 56) candidate EMOCA sequences.
    """
    from ..models.slm import SpeakerSLMFT

    decoder = TokenDecoder(
        num_tokens=slm_cfg.num_tokens, dim=slm_cfg.dim + slm_cfg.dim_audio,
        max_seq_len=slm_cfg.dec_max_seq_len, depth=slm_cfg.dec_depth,
        heads=slm_cfg.dec_heads,
        dim_head=getattr(slm_cfg, "attn_dim_head", 64),
        kv_heads=getattr(slm_cfg, "attn_kv_heads", 0) or None,
        use_abs_pos_emb=True, dtype=model.dtype)

    def generate(params, batch, rng, n_samples: int):
        verts, emoca, audio, mask, template, sids = batch
        b, l = verts.shape[0], verts.shape[1]
        ctx, prompt = model.apply({"params": params}, verts, emoca, audio,
                                  mask, template, sids,
                                  method=SpeakerSLMFT.encode_context)
        eff_chunk = chunk if verts.shape[0] * n_samples >= 32 else None
        tokens = generate_tokens(
            decoder, {"params": params["decoder_joint"]},
            jnp.tile(prompt, (n_samples, 1)), l - 1,
            ctx, mask, rng, context_groups=n_samples, chunk=eff_chunk)
        emoca_out = model.apply({"params": params}, tokens, False,
                                method=SpeakerSLMFT.decode_emoca)[1]
        return emoca_out.reshape(n_samples, b, l - 1, -1).transpose(1, 0, 2, 3)

    return jax.jit(generate, static_argnums=(3,))


def select_best_by_fd(candidates: np.ndarray, target: np.ndarray) -> np.ndarray:
    """Pick the candidate with the lowest Frechet distance to the target clip
    (x_engine_pt.py:258-268). candidates: (N, T, C); target: (T, C)."""
    mu1, s1 = calculate_activation_statistics(target)
    best, best_fd = None, float("inf")
    for cand in candidates:
        mu2, s2 = calculate_activation_statistics(cand)
        try:
            fd = calculate_frechet_distance(mu1, s1, mu2, s2)
        except ValueError:
            fd = float("inf")
        if fd < best_fd:
            best, best_fd = cand, fd
    return best if best is not None else candidates[0]


def select_best_by_l2(candidates: np.ndarray, target: np.ndarray) -> np.ndarray:
    """Pick the candidate with lowest mean vertex L2 (x_engine_pt.py:328-334)."""
    d = np.mean(np.sqrt(np.sum((candidates - target[None]) ** 2, axis=-1)), axis=-1)
    return candidates[int(np.argmin(d))]


def evaluate_test_epoch(params, model: SLMFT, generator: Callable,
                        loader: Iterable, rng, beam_size: int = 10,
                        select: str = "fd") -> Tuple[List, List, List, List]:
    """Best-of-N sampled eval (x_engine_pt.py:232-277).

    Returns (y_trues, y_preds, x, data_ids) lists of per-clip numpy arrays.
    """
    y_trues, y_preds, xs, ids = [], [], [], []
    pick = select_best_by_fd if select == "fd" else select_best_by_l2
    for batch in loader:
        src_v, tgt, src_a, mask = batch[:4]
        data_ids = batch[4] if len(batch) > 4 else [None] * src_v.shape[0]
        rng, sub = jax.random.split(rng)
        cands = np.asarray(generator(params, batch[:4], sub, beam_size))
        lens = np.asarray(jnp.sum(mask, axis=1))
        tgt_np = np.asarray(tgt)
        src_np = np.asarray(src_v)
        for j in range(src_v.shape[0]):
            lj = int(lens[j])
            target = tgt_np[j, 1:lj]
            y_trues.append(target)
            xs.append(src_np[j, : lj - 1])
            ids.append(data_ids[j])
            y_preds.append(pick(cands[j, :, : lj - 1], target))
    return y_trues, y_preds, xs, ids


def speaker_ids_from_names(names: Iterable[str]) -> jnp.ndarray:
    """BIWI file names -> speaker id array (x_engine_pt.py:99-102)."""
    return jnp.asarray([BIWI_SPEAKER_IDS[n.split("_")[0]] for n in names],
                       dtype=jnp.int32)
