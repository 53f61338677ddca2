"""Continuous-batching session pool: per-slot exactness under multiplexing.

The pool's contract (serving/pool.py): a slot's token stream is EXACTLY what
a solo ``StreamingListenerSession`` (batch=1, same seed, same call pattern)
would produce, no matter what the other slots are doing - streams at
different lengths, idle slots, slots at full capacity, freed-and-reused
slots. The reference has no serving layer (offline eval only,
``/root/reference/code/x_engine_pt.py:232-277``).
"""

import numpy as np
import pytest

import jax

from dyadic_interaction_modeling_tpu.serving import (
    StreamingListenerSession,
    StreamingSessionPool,
)
from tests.test_streaming import _slmft_and_inputs


def _solo(model, params, clip_s, clip_a, prompt, seed, schedule, *,
          greedy, chunk=4, max_frames=16, max_tokens=16):
    """Run one stream through a solo session following ``schedule``:
    a list of ("feed", lo, hi) / ("start",) / ("gen", n) ops."""
    sess = StreamingListenerSession(model, params, batch=1, chunk=chunk,
                                    max_frames=max_frames,
                                    max_tokens=max_tokens, rng=seed,
                                    greedy=greedy)
    for op in schedule:
        if op[0] == "feed":
            sess.feed(clip_s[None, op[1]: op[2]], clip_a[None, op[1]: op[2]])
        elif op[0] == "start":
            sess.start(prompt[None])
        else:
            sess.generate(op[1])
    return sess.tokens()[0]


@pytest.mark.parametrize("greedy", [True, False])
def test_pool_slots_match_solo_sessions(greedy):
    """Two streams join at different times, progress at different rates, and
    each must reproduce its solo session token-for-token (greedy AND the
    sampled RNG chain across multiple generate calls)."""
    model, params, v_s, _, v_a, _ = _slmft_and_inputs()
    pa = np.zeros((1,), np.int32)
    pb = np.ones((1,), np.int32)

    pool = StreamingSessionPool(model, params, capacity=3, chunk=4,
                                max_frames=16, max_tokens=16, greedy=greedy)
    a = pool.join(seed=5)
    pool.feed([a], v_s[0:1, 0:4], v_a[0:1, 0:4])
    pool.feed([a], v_s[0:1, 4:8], v_a[0:1, 4:8])
    pool.start([a], pa[None])
    pool.generate([a], 3)
    b = pool.join(seed=9)                       # b joins mid-flight
    assert b != a
    pool.feed([a, b], np.stack([v_s[0, 8:12], v_s[1, 0:4]]),
              np.stack([v_a[0, 8:12], v_a[1, 0:4]]))
    pool.start([b], pb[None])
    pool.generate([b], 2)                       # only b this round
    pool.generate([a, b], 4)                    # both
    pool.feed([b], v_s[1:2, 4:8], v_a[1:2, 4:8])
    pool.generate([b], 3)

    sa = _solo(model, params, v_s[0], v_a[0], pa, 5,
               [("feed", 0, 4), ("feed", 4, 8), ("start",), ("gen", 3),
                ("feed", 8, 12), ("gen", 4)], greedy=greedy)
    sb = _solo(model, params, v_s[1], v_a[1], pb, 9,
               [("feed", 0, 4), ("start",), ("gen", 2), ("gen", 4),
                ("feed", 4, 8), ("gen", 3)], greedy=greedy)
    np.testing.assert_array_equal(pool.tokens(a), sa)
    np.testing.assert_array_equal(pool.tokens(b), sb)
    assert pool.frames_fed(a) == 12 and pool.frames_fed(b) == 8
    assert pool.tokens_generated(a) == 8 and pool.tokens_generated(b) == 10

    motion = pool.motion(a)
    assert motion.shape == (7, 56)


def test_full_slot_survives_other_traffic():
    """A slot at FULL context and token capacity must be untouched by other
    slots' feeds/generates (the slack-region guarantee: idle writes clamp
    into [max_frames, max_frames+chunk), never onto real entries)."""
    model, params, v_s, _, v_a, _ = _slmft_and_inputs(l=8)
    p = np.zeros((1,), np.int32)

    pool = StreamingSessionPool(model, params, capacity=2, chunk=4,
                                max_frames=8, max_tokens=6, greedy=True)
    a = pool.join(seed=3)
    pool.feed([a], v_s[0:1, 0:4], v_a[0:1, 0:4])
    pool.feed([a], v_s[0:1, 4:8], v_a[0:1, 4:8])   # a: context FULL
    pool.start([a], p[None])
    first = pool.generate([a], 2)

    b = pool.join(seed=1)                           # traffic on b only
    pool.feed([b], v_s[1:2, 0:4], v_a[1:2, 0:4])
    pool.start([b], p[None])
    pool.generate([b], 3)
    pool.feed([b], v_s[1:2, 4:8], v_a[1:2, 4:8])
    pool.generate([b], 2)

    rest = pool.generate([a], 3)                    # a: tokens now FULL

    solo = _solo(model, params, v_s[0], v_a[0], p, 3,
                 [("feed", 0, 4), ("feed", 4, 8), ("start",), ("gen", 2),
                  ("gen", 3)], greedy=True, max_frames=8, max_tokens=6)
    np.testing.assert_array_equal(np.concatenate([first[0], rest[0]]), solo)


def test_slot_reuse_after_leave():
    """A freed slot's stale caches must be invisible to its next occupant."""
    model, params, v_s, _, v_a, _ = _slmft_and_inputs()
    p = np.zeros((1,), np.int32)

    pool = StreamingSessionPool(model, params, capacity=1, chunk=4,
                                max_frames=16, max_tokens=16, greedy=True)
    a = pool.join(seed=11)
    pool.feed([a], v_s[1:2, 0:4] + 3.0, v_a[1:2, 0:4] - 2.0)  # junk stream
    pool.start([a], p[None] + 2)
    pool.generate([a], 5)
    pool.leave(a)

    b = pool.join(seed=7)
    assert b == a                                   # same physical slot
    pool.feed([b], v_s[0:1, 0:4], v_a[0:1, 0:4])
    pool.feed([b], v_s[0:1, 4:8], v_a[0:1, 4:8])
    pool.start([b], p[None])
    pool.generate([b], 6)

    solo = _solo(model, params, v_s[0], v_a[0], p, 7,
                 [("feed", 0, 4), ("feed", 4, 8), ("start",), ("gen", 6)],
                 greedy=True)
    np.testing.assert_array_equal(pool.tokens(b), solo)


def test_pool_sharded_over_mesh_matches_unsharded():
    """Pool slots are independent, so sharding the pool axis over a device
    mesh ('data' axis) must be exact with ZERO collectives - serving
    capacity scales linearly with chips."""
    from dyadic_interaction_modeling_tpu.parallel.mesh import make_mesh

    model, params, v_s, _, v_a, _ = _slmft_and_inputs()
    sp = np.concatenate([np.asarray(v_s)] * 2)      # 4 streams
    au = np.concatenate([np.asarray(v_a)] * 2)

    def run(mesh):
        pool = StreamingSessionPool(model, params, capacity=4, chunk=4,
                                    max_frames=16, max_tokens=16, mesh=mesh)
        slots = [pool.join(seed=i) for i in range(4)]
        pool.feed(slots, sp[:, 0:4], au[:, 0:4])
        pool.feed(slots[:2], sp[:2, 4:8], au[:2, 4:8])   # staggered lengths
        pool.start(slots, np.zeros((4, 1), np.int32))
        pool.generate(slots, 5)
        pool.generate(slots[2:], 3)
        return np.stack([pool.tokens(s)[:5] for s in slots])

    mesh = make_mesh(devices=jax.devices()[:4])
    np.testing.assert_array_equal(run(mesh), run(None))


def test_pool_bf16_model():
    """The production pool runs bf16; the per-slot logits/RNG carries must
    hold their dtypes across the scan (regression: bf16 decode logits were
    carried into an f32 slot buffer -> scan carry type error)."""
    import jax.numpy as jnp

    from dyadic_interaction_modeling_tpu.models.slm import SLMFT
    from tests.test_streaming import _tiny_cfgs

    slm_cfg, vq_cfg = _tiny_cfgs()
    model = SLMFT(slm_cfg, vq_cfg, dtype=jnp.bfloat16)
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    v_s = jax.random.normal(ks[0], (1, 8, 56))
    v_l = jax.random.normal(ks[1], (1, 8, 56))
    v_a = jax.random.normal(ks[2], (1, 8, 16))
    params = model.init(ks[3], v_s, v_l, v_a, jnp.ones((1, 8), bool),
                        jax.random.PRNGKey(2))
    pool = StreamingSessionPool(model, params, capacity=2, chunk=4,
                                max_frames=8, max_tokens=8)
    a = pool.join(seed=1)
    pool.feed([a], np.asarray(v_s[:, :4]), np.asarray(v_a[:, :4]))
    pool.start([a], np.zeros((1, 1), np.int32))
    toks = pool.generate([a], 4)
    assert toks.shape == (1, 4)
    assert (toks >= 0).all() and (toks < slm_cfg.num_tokens).all()


def test_pool_guards():
    model, params, v_s, _, v_a, _ = _slmft_and_inputs()
    pool = StreamingSessionPool(model, params, capacity=2, chunk=4,
                                max_frames=8, max_tokens=4, greedy=True)
    a = pool.join()
    with pytest.raises(ValueError):                 # not joined
        pool.feed([a, 1], np.zeros((2, 4, 56)), np.zeros((2, 4, 16)))
    with pytest.raises(ValueError):                 # duplicate slots
        pool.feed([a, a], np.zeros((2, 4, 56)), np.zeros((2, 4, 16)))
    with pytest.raises(ValueError):                 # start before feed
        pool.start([a], np.zeros((1, 1), np.int32))
    pool.feed([a], v_s[0:1, :4], v_a[0:1, :4])
    with pytest.raises(ValueError):                 # generate before start
        pool.generate([a], 1)
    with pytest.raises(ValueError):                 # wrong chunk size
        pool.feed([a], v_s[0:1, :3], v_a[0:1, :3])
    pool.feed([a], v_s[0:1, 4:8], v_a[0:1, 4:8])
    with pytest.raises(ValueError):                 # context capacity
        pool.feed([a], v_s[0:1, :4], v_a[0:1, :4])
    pool.start([a], np.zeros((1, 1), np.int32))
    pool.generate([a], 3)
    with pytest.raises(ValueError):                 # token capacity
        pool.generate([a], 2)
    b = pool.join()
    assert b != a
    with pytest.raises(RuntimeError):               # pool full
        pool.join()
    pool.leave(b)
    assert pool.join() == b


def test_pool_fused_round_equals_feed_then_generate():
    """pool.round() (ONE program: feed + generate for the same slots) is
    token-for-token identical to feed(...) then generate(n), including with
    an idle slot in the pool and a short (n_valid) chunk."""
    model, params, v_s, _, v_a, _ = _slmft_and_inputs(l=16)
    prompts = np.array([[0], [1]], np.int32)

    def run(fused):
        pool = StreamingSessionPool(model, params, capacity=3, chunk=4,
                                    max_frames=16, max_tokens=20)
        a = pool.join(seed=5)
        b = pool.join(seed=9)
        sl = [a, b]
        pool.feed(sl, v_s[:, :4], v_a[:, :4])
        pool.start(sl, prompts)
        pool.generate(sl, 4)
        for t in (4, 8):
            if fused:
                pool.round(sl, v_s[:, t: t + 4], v_a[:, t: t + 4])
            else:
                pool.feed(sl, v_s[:, t: t + 4], v_a[:, t: t + 4])
                pool.generate(sl, 4)
        if fused:
            pool.round(sl, v_s[:, 12:16], v_a[:, 12:16], n=2, n_valid=2)
        else:
            pool.feed(sl, v_s[:, 12:16], v_a[:, 12:16], n_valid=2)
            pool.generate(sl, 2)
        assert pool.frames_fed(a) == 14
        return np.stack([pool.tokens(a), pool.tokens(b)])

    np.testing.assert_array_equal(run(fused=True), run(fused=False))

    # guards: round() on a non-started slot
    pool = StreamingSessionPool(model, params, capacity=2, chunk=4,
                                max_frames=8, max_tokens=8)
    a = pool.join()
    pool.feed([a], v_s[:1, :4], v_a[:1, :4])
    try:
        pool.round([a], v_s[:1, 4:8], v_a[:1, 4:8])
        raise AssertionError("round() before start() must raise")
    except ValueError:
        pass
