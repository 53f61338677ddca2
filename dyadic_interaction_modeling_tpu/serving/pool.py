"""Continuous-batching pool of streaming dyadic sessions.

``StreamingListenerSession`` batches sessions in LOCKSTEP - every stream
shares one context length and one token count. A serving host multiplexing
live callers needs more: streams join and leave at arbitrary times, so at
any instant the pool holds sessions at DIFFERENT context/token lengths, and
each ``feed``/``generate`` call touches only the subset of slots that have
data ready. The reference has no serving layer at all (its eval is
offline-only, ``/root/reference/code/x_engine_pt.py:232-277``); this is the
TPU-native production shape: one fixed-capacity device pool, static shapes,
three compiled programs total, per-slot progress tracked host-side.

Design (all shapes static, jit-friendly):

* Every per-slot quantity (encoder/cross/decoder KV caches, last logits,
  RNG key) lives in ONE device array with a leading pool axis. The per-slot
  computation is the single-session math at batch=1, ``jax.vmap``-ed over
  the pool axis with the params held constant - so a slot's results are the
  solo session's results by construction (pinned in tests/test_pool.py).
* Context/token counters are HOST-authoritative (``np`` vectors passed into
  each call) - join/leave are pure bookkeeping, no device reset: every read
  is masked by ``pos < t``, so a freed slot's stale cache is invisible and
  gets overwritten as the new occupant streams.
* Idle slots still execute each call (no dynamic shapes on TPU) but are
  rendered side-effect-free: their counters don't advance, their logits/RNG
  are ``where(active, new, old)``-gated, and their cache writes are aimed at
  a SLACK region past the usable capacity. The slack matters because
  ``lax.dynamic_update_slice`` CLAMPS out-of-bounds starts - without it, an
  idle slot sitting at full capacity would have its newest real entries
  overwritten by the garbage write. Caches are therefore allocated at
  ``max_frames + chunk`` / ``max_tokens + 1`` and idle writes land in
  ``[max_frames, max_frames+chunk)`` / ``[max_tokens]``, which no masked
  read ever touches.

Typical host loop::

    pool = StreamingSessionPool(model, params, capacity=64, chunk=8)
    a = pool.join(seed=1); b = pool.join(seed=2)
    pool.feed([a, b], sp2, au2)        # both have a chunk ready
    pool.start([a], prompt_a)          # a starts generating first
    toks = pool.generate([a], 8)
    pool.leave(a)                      # slot free for the next caller
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.slm import SLMFT
from ..models.xtrans import init_decoder_cache, top_k_filter


class StreamingSessionPool:
    """Fixed-capacity pool of independent streaming listener sessions.

    Parameters
    ----------
    model, params: the SLMFT module and its trained variables.
    capacity: number of slots (concurrent sessions).
    chunk: speaker frames per ``feed`` call (one compiled program per size).
    max_frames / max_tokens: per-session context / listener-token capacity.
    temperature / filter_frac / greedy: sampling controls matching
        ``xtrans.generate_tokens`` (pool-wide).
    """

    def __init__(self, model: SLMFT, params, *, capacity: int = 8,
                 chunk: int = 8, max_frames: int = 1024,
                 max_tokens: Optional[int] = None,
                 temperature: float = 1.0, filter_frac: float = 0.1,
                 greedy: bool = False, mesh=None):
        c = model.cfg
        self.model = model
        self.params = params
        self.mesh = mesh
        if mesh is not None:
            # Pool slots are fully independent - sharding the pool axis over
            # the mesh's 'data' axis needs ZERO collectives, so serving
            # capacity scales linearly with chips (tests/test_pool.py pins
            # sharded == unsharded token-for-token on the CPU mesh).
            from ..parallel.mesh import data_sharding, replicate

            if capacity % mesh.shape["data"] != 0:
                raise ValueError("capacity must divide evenly over the mesh's "
                                 f"data axis ({mesh.shape['data']} devices)")
            self.params = replicate(mesh, params)
            self._put = lambda x: jax.device_put(
                x, data_sharding(mesh, np.ndim(x)))
        else:
            self._put = jnp.asarray
        self.capacity = capacity
        self.chunk = chunk
        self.max_frames = max_frames
        self.max_tokens = max_tokens or max_frames
        dt = model.dtype
        P = capacity
        lmax = max_frames + chunk          # + slack for idle-slot writes
        tmax = self.max_tokens + 1

        dh = getattr(c, "attn_dim_head", 64)
        kvh = getattr(c, "attn_kv_heads", 0) or None  # GQA cache width
        self._enc_s = init_decoder_cache(P, lmax, c.enc_depth, c.enc_heads,
                                         dim_head=dh, dtype=dt, kv_heads=kvh)
        self._enc_j = init_decoder_cache(P, lmax, c.enc_depth, c.enc_heads,
                                         dim_head=dh, dtype=dt, kv_heads=kvh)
        self._cross = {}
        for i in range(c.dec_depth):
            shape = (P, kvh or c.dec_heads, lmax, dh)
            self._cross[f"ck_{i}"] = jnp.zeros(shape, dtype=dt)
            self._cross[f"cv_{i}"] = jnp.zeros(shape, dtype=dt)
        self._dec = init_decoder_cache(P, tmax, c.dec_depth, c.dec_heads,
                                       dim_head=dh, dtype=dt, kv_heads=kvh)
        self._logits = jnp.zeros((P, c.num_tokens), jnp.float32)
        self._keys = jnp.stack([jax.random.PRNGKey(0)] * P)
        if mesh is not None:
            (self._enc_s, self._enc_j, self._cross, self._dec, self._logits,
             self._keys) = jax.tree_util.tree_map(
                self._put, (self._enc_s, self._enc_j, self._cross, self._dec,
                            self._logits, self._keys))

        # host-authoritative per-slot progress
        self._t_ctx = np.zeros(P, np.int32)
        self._t_dec = np.zeros(P, np.int32)
        self._active = np.zeros(P, bool)
        self._started = np.zeros(P, bool)
        self._tokens: list[list[np.ndarray]] = [[] for _ in range(P)]

        dec_depth = c.dec_depth

        def _feed_one(params, enc_s, enc_j, cross, t, sp, au):
            # per-slot leaves carry no batch dim; run the batch=1 math
            e1 = {k: v[None] for k, v in enc_s.items()}
            j1 = {k: v[None] for k, v in enc_j.items()}
            ctx, e1, j1 = model.apply(params, sp[None], au[None], e1, j1, t,
                                      method=SLMFT.encode_context_chunk)
            kv = model.apply(params, ctx, method=SLMFT.stream_cross_kv)
            cross = dict(cross)
            for i, (k, v) in enumerate(kv):
                cross[f"ck_{i}"] = jax.lax.dynamic_update_slice(
                    cross[f"ck_{i}"], k[0], (0, t, 0))
                cross[f"cv_{i}"] = jax.lax.dynamic_update_slice(
                    cross[f"cv_{i}"], v[0], (0, t, 0))
            return ({k: v[0] for k, v in e1.items()},
                    {k: v[0] for k, v in j1.items()}, cross)

        @partial(jax.jit, donate_argnums=(1, 2, 3))
        def _feed(params, enc_s, enc_j, cross, t, sp, au):
            return jax.vmap(
                lambda *a: _feed_one(params, *a),
                in_axes=(0, 0, 0, 0, 0, 0))(enc_s, enc_j, cross, t, sp, au)

        self._feed_fn = _feed

        def _sample(logits, key):
            logits = logits.astype(jnp.float32)
            if greedy:
                return jnp.argmax(logits, axis=-1).astype(jnp.int32)
            filt = top_k_filter(logits, filter_frac) / temperature
            return jax.random.categorical(key, filt, axis=-1).astype(jnp.int32)

        def _ctx_mask(t_ctx):
            return (jnp.arange(lmax)[None, :] < t_ctx)   # (1, lmax)

        def _cross_kv(cross):
            return [(cross[f"ck_{i}"][None], cross[f"cv_{i}"][None])
                    for i in range(dec_depth)]

        def _prompt_one(params, p, dec, cross, t_ctx, t, logits, act, prompt):
            d1 = {k: v[None] for k, v in dec.items()}
            mask = _ctx_mask(t_ctx)
            kv = _cross_kv(cross)
            new_logits = logits
            for i in range(p):
                new_logits, d1 = model.apply(
                    params, prompt[None, i: i + 1], d1, t + i, kv, mask,
                    method=SLMFT.stream_decode_step)
                # carry logits in f32 (sampling is f32; model may be bf16)
                new_logits = new_logits[0].astype(jnp.float32)
            return ({k: v[0] for k, v in d1.items()},
                    jnp.where(act, new_logits, logits))

        @partial(jax.jit, static_argnums=(1,), donate_argnums=(2, 6))
        def _prompt(params, p, dec, cross, t_ctx, t, logits, act, prompt):
            return jax.vmap(
                lambda *a: _prompt_one(params, p, *a),
                in_axes=(0, 0, 0, 0, 0, 0, 0))(
                    dec, cross, t_ctx, t, logits, act, prompt)

        self._prompt_fn = _prompt

        def _generate_one(params, n, dec, cross, t_ctx, t, logits, key, act):
            d1 = {k: v[None] for k, v in dec.items()}
            mask = _ctx_mask(t_ctx)
            kv = _cross_kv(cross)

            def body(carry, _):
                logits, d1, key, t = carry
                key, sub = jax.random.split(key)
                tok = _sample(logits[None], sub)          # (1,)
                new_logits, d1 = model.apply(
                    params, tok[:, None], d1, t, kv, mask,
                    method=SLMFT.stream_decode_step)
                return (new_logits[0].astype(jnp.float32), d1, key, t + 1), tok[0]

            (new_logits, d1, new_key, _), toks = jax.lax.scan(
                body, (logits, d1, key, t), None, length=n)
            return ({k: v[0] for k, v in d1.items()},
                    jnp.where(act, new_logits, logits),
                    jnp.where(act, new_key, key), toks)

        @partial(jax.jit, static_argnums=(1,), donate_argnums=(2, 6, 7))
        def _generate(params, n, dec, cross, t_ctx, t, logits, keys, act):
            return jax.vmap(
                lambda *a: _generate_one(params, n, *a),
                in_axes=(0, 0, 0, 0, 0, 0, 0))(
                    dec, cross, t_ctx, t, logits, keys, act)

        self._generate_fn = _generate

        def _round_one(params, n, enc_s, enc_j, cross, dec, t_feed,
                       t_ctx_after, t_gen, logits, key, act, sp, au):
            enc_s, enc_j, cross = _feed_one(params, enc_s, enc_j, cross,
                                            t_feed, sp, au)
            dec, logits, key, toks = _generate_one(
                params, n, dec, cross, t_ctx_after, t_gen, logits, key, act)
            return enc_s, enc_j, cross, dec, logits, key, toks

        @partial(jax.jit, static_argnums=(1,),
                 donate_argnums=(2, 3, 4, 5, 9, 10))
        def _round(params, n, enc_s, enc_j, cross, dec, t_feed, t_ctx_after,
                   t_gen, logits, keys, act, sp, au):
            """feed + generate for the SAME slots fused into one program -
            the continuous-batching hot loop pays one dispatch per round
            instead of two (see StreamingListenerSession.round)."""
            return jax.vmap(
                lambda *a: _round_one(params, n, *a),
                in_axes=(0,) * 12)(enc_s, enc_j, cross, dec, t_feed,
                                   t_ctx_after, t_gen, logits, keys, act,
                                   sp, au)

        self._round_fn = _round

    # ------------------------------------------------------------------
    # slot management (host-side bookkeeping only)

    def join(self, seed: int = 0) -> int:
        """Claim a free slot for a new stream; returns the slot id."""
        free = np.flatnonzero(~self._active)
        if free.size == 0:
            raise RuntimeError("pool full; leave() a session or grow capacity")
        slot = int(free[0])
        self._active[slot] = True
        self._started[slot] = False
        self._t_ctx[slot] = 0
        self._t_dec[slot] = 0
        self._tokens[slot] = []
        self._keys = self._put(
            self._keys.at[slot].set(jax.random.PRNGKey(seed)))
        return slot

    def leave(self, slot: int) -> None:
        """Release a slot. No device reset needed: all reads are masked by
        the slot's counters, so stale cache contents are unreachable."""
        self._active[slot] = False

    def active_slots(self) -> np.ndarray:
        return np.flatnonzero(self._active)

    def frames_fed(self, slot: int) -> int:
        return int(self._t_ctx[slot])

    def tokens_generated(self, slot: int) -> int:
        return int(self._t_dec[slot])

    def _check(self, slots: Sequence[int]) -> np.ndarray:
        slots = np.asarray(slots, np.int64)
        if slots.size == 0:
            raise ValueError("empty slot list")
        if len(np.unique(slots)) != slots.size:
            raise ValueError("duplicate slots in one call")
        if not self._active[slots].all():
            raise ValueError("call includes a slot that has not join()ed")
        return slots

    # ------------------------------------------------------------------
    # streaming ops (each touches only the listed slots)

    def feed(self, slots: Sequence[int], speaker_chunks, audio_chunks,
             n_valid=None) -> None:
        """Stream one (len(slots), chunk, dim) speaker chunk (+ audio) into
        each listed slot, each at its own context frontier. ``n_valid`` may
        be an int or a per-slot array for short final chunks."""
        slots = self._check(slots)
        sp = np.asarray(speaker_chunks)
        au = np.asarray(audio_chunks)
        if sp.shape[0] != slots.size or sp.shape[1] != self.chunk:
            raise ValueError(f"expected ({slots.size}, {self.chunk}, dim) "
                             f"chunks, got {sp.shape}")
        nv = np.broadcast_to(np.asarray(
            self.chunk if n_valid is None else n_valid, np.int32), slots.shape)
        if (self._t_ctx[slots] + nv > self.max_frames).any():
            raise ValueError("context capacity exceeded; raise max_frames")
        P = self.capacity
        sp_buf = np.zeros((P,) + sp.shape[1:], sp.dtype)
        au_buf = np.zeros((P,) + au.shape[1:], au.dtype)
        sp_buf[slots], au_buf[slots] = sp, au
        act = np.zeros(P, bool)
        act[slots] = True
        # idle slots write into the slack region [max_frames, max_frames+chunk)
        t = np.where(act, self._t_ctx, self.max_frames).astype(np.int32)
        self._enc_s, self._enc_j, self._cross = self._feed_fn(
            self.params, self._enc_s, self._enc_j, self._cross,
            self._put(t), self._put(sp_buf.astype(self.model.dtype)),
            self._put(au_buf.astype(self.model.dtype)))
        self._t_ctx[slots] += nv

    def start(self, slots: Sequence[int], prompts) -> None:
        """Consume (len(slots), P) prompt tokens for the listed slots (the
        reference seeds generation with the first listener code,
        seq2seq_pretrain.py:450). Each slot needs at least one fed frame."""
        slots = self._check(slots)
        prompts = np.asarray(prompts, np.int32)
        if prompts.shape[0] != slots.size:
            raise ValueError("one prompt row per slot")
        if (self._t_ctx[slots] == 0).any():
            raise ValueError("feed at least one chunk before start()")
        P = self.capacity
        buf = np.zeros((P, prompts.shape[1]), np.int32)
        buf[slots] = prompts
        act = np.zeros(P, bool)
        act[slots] = True
        t = np.where(act, self._t_dec, self.max_tokens).astype(np.int32)
        self._dec, self._logits = self._prompt_fn(
            self.params, prompts.shape[1], self._dec, self._cross,
            self._put(self._t_ctx), self._put(t), self._logits,
            self._put(act), self._put(buf))
        self._t_dec[slots] += prompts.shape[1]
        self._started[slots] = True

    def generate(self, slots: Sequence[int], n: int) -> np.ndarray:
        """Sample the next ``n`` listener codes for each listed slot against
        the context it has received so far; returns (len(slots), n)."""
        slots = self._check(slots)
        if not self._started[slots].all():
            raise ValueError("call start(slots, prompts) before generate()")
        if (self._t_dec[slots] + n > self.max_tokens).any():
            raise ValueError("token capacity exceeded; raise max_tokens")
        P = self.capacity
        act = np.zeros(P, bool)
        act[slots] = True
        t = np.where(act, self._t_dec, self.max_tokens).astype(np.int32)
        self._dec, self._logits, self._keys, toks = self._generate_fn(
            self.params, n, self._dec, self._cross, self._put(self._t_ctx),
            self._put(t), self._logits, self._keys, self._put(act))
        toks = np.asarray(toks)[slots]                    # (n_slots, n)
        for row, slot in enumerate(slots):
            self._tokens[slot].append(toks[row])
        self._t_dec[slots] += n
        return toks

    def round(self, slots: Sequence[int], speaker_chunks, audio_chunks,
              n: Optional[int] = None, n_valid=None) -> np.ndarray:
        """One serving round for the listed slots: feed a chunk AND sample
        ``n`` codes (default ``chunk``) in a SINGLE device program -
        token-for-token identical to ``feed(...)`` then ``generate(n)``
        (tests/test_pool.py). Slots must all have ``start()``ed; use the
        separate calls for slots that only ingest or only decode."""
        slots = self._check(slots)
        n = self.chunk if n is None else n
        if not self._started[slots].all():
            raise ValueError("call start(slots, prompts) before round()")
        sp = np.asarray(speaker_chunks)
        au = np.asarray(audio_chunks)
        if sp.shape[0] != slots.size or sp.shape[1] != self.chunk:
            raise ValueError(f"expected ({slots.size}, {self.chunk}, dim) "
                             f"chunks, got {sp.shape}")
        nv = np.broadcast_to(np.asarray(
            self.chunk if n_valid is None else n_valid, np.int32), slots.shape)
        if (self._t_ctx[slots] + nv > self.max_frames).any():
            raise ValueError("context capacity exceeded; raise max_frames")
        if (self._t_dec[slots] + n > self.max_tokens).any():
            raise ValueError("token capacity exceeded; raise max_tokens")
        P = self.capacity
        sp_buf = np.zeros((P,) + sp.shape[1:], sp.dtype)
        au_buf = np.zeros((P,) + au.shape[1:], au.dtype)
        sp_buf[slots], au_buf[slots] = sp, au
        act = np.zeros(P, bool)
        act[slots] = True
        t_feed = np.where(act, self._t_ctx, self.max_frames).astype(np.int32)
        t_ctx_after = self._t_ctx.copy()
        t_ctx_after[slots] += nv
        t_gen = np.where(act, self._t_dec, self.max_tokens).astype(np.int32)
        (self._enc_s, self._enc_j, self._cross, self._dec, self._logits,
         self._keys, toks) = self._round_fn(
            self.params, n, self._enc_s, self._enc_j, self._cross, self._dec,
            self._put(t_feed), self._put(t_ctx_after.astype(np.int32)),
            self._put(t_gen), self._logits, self._keys, self._put(act),
            self._put(sp_buf.astype(self.model.dtype)),
            self._put(au_buf.astype(self.model.dtype)))
        self._t_ctx[slots] += nv
        toks = np.asarray(toks)[slots]
        for row, slot in enumerate(slots):
            self._tokens[slot].append(toks[row])
        self._t_dec[slots] += n
        return toks

    def tokens(self, slot: int) -> np.ndarray:
        """All listener codes generated for ``slot`` so far, (T,)."""
        if not self._tokens[slot]:
            return np.zeros((0,), np.int32)
        return np.concatenate(self._tokens[slot])

    def motion(self, slot: int, tokens=None) -> np.ndarray:
        """VQ-decode a slot's codes to motion frames (T, motion_dim); see
        ``StreamingListenerSession.motion`` on trailing-window re-decode."""
        if tokens is None:
            tokens = self.tokens(slot)
        out = self.model.apply(
            self.params, jnp.asarray(tokens, jnp.int32)[None],
            method=SLMFT.decode_tokens_to_motion)
        return np.asarray(out[0])
