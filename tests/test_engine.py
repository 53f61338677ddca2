import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dyadic_interaction_modeling_tpu import config as C
from dyadic_interaction_modeling_tpu.data.loader import (
    PaddedBatchLoader,
    bucket_length,
    pad_collate,
    slm_batch_from_collated,
)
from dyadic_interaction_modeling_tpu.data.synthetic import (
    synthetic_candor_dataset,
    synthetic_vico_dataset,
    synthetic_biwi_dataset,
)
from dyadic_interaction_modeling_tpu.engine.pt_engine import (
    VQTokenCache,
    evaluate_test_epoch,
    make_slm_train_step,
    make_slmft_generator,
    select_best_by_fd,
    select_best_by_l2,
    speaker_ids_from_names,
)
from dyadic_interaction_modeling_tpu.engine.train_state import (
    create_train_state,
    frozen_mask,
)
from dyadic_interaction_modeling_tpu.engine.vq_engine import (
    make_vq_eval_step,
    make_vq_train_step,
    train_epoch,
    validate,
)
from dyadic_interaction_modeling_tpu.models import get_model
from dyadic_interaction_modeling_tpu.models.slm import SLMFT, SLMFT_FROZEN_SUBSTRINGS


def _tiny_vq_cfg():
    cfg = C.vq_listener_defaults()
    cfg.update(dict(hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
                    intermediate_size=64, zquant_dim=16, n_embed=32))
    return cfg


def _tiny_slm_cfgs():
    slm_cfg = C.slm_defaults()
    slm_cfg.update(dict(dim=32, dim_audio=768, enc_depth=1, enc_heads=2,
                        dec_depth=1, dec_heads=2, enc_max_seq_len=64,
                        dec_max_seq_len=64, num_tokens=32))  # == vq n_embed
    return slm_cfg, _tiny_vq_cfg()


def test_bucket_length():
    assert bucket_length(5) == 32
    assert bucket_length(33) == 64
    assert bucket_length(64) == 64
    assert bucket_length(2000, max_len=1024) == 1024


def test_pad_collate_and_loader():
    ds = synthetic_vico_dataset(n_clips=10, min_len=10, max_len=40, seed=0)
    loader = PaddedBatchLoader(ds, batch_size=4, shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == 3
    src, tgt, lens, mask, (sp, li), names = batches[0]
    assert src.shape[0] == 4 and src.shape[2] == 56 + 768
    assert tgt.shape[:2] == src.shape[:2]
    assert mask.shape == src.shape[:2]
    assert (mask.sum(axis=1) == lens).all()
    # bucketed: length is a power of two >= max len
    assert src.shape[1] in (32, 64)
    # epoch reshuffling is deterministic per (seed, epoch)
    loader.set_epoch(0)
    names0 = [b[5] for b in loader]
    loader.set_epoch(0)
    assert [b[5] for b in loader] == names0
    loader.set_epoch(1)
    assert [b[5] for b in loader] != names0


def test_prefetch_loader_matches_sequential():
    from dyadic_interaction_modeling_tpu.data.loader import PrefetchLoader

    ds = synthetic_vico_dataset(n_clips=10, min_len=10, max_len=40, seed=0)
    loader = PaddedBatchLoader(ds, batch_size=4, shuffle=True, seed=1)
    direct = list(loader)
    pre = PrefetchLoader(loader, depth=2)
    assert len(pre) == len(loader)
    fetched = list(pre)
    assert len(fetched) == len(direct)
    for a, b in zip(direct, fetched):
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[3], b[3])
        assert a[5] == b[5]
    # transform hook + set_epoch passthrough + reiterability
    pre_t = PrefetchLoader(loader, depth=3, transform=slm_batch_from_collated)
    pre_t.set_epoch(2)
    loader.set_epoch(2)
    direct2 = [slm_batch_from_collated(c) for c in loader]
    for a, b in zip(direct2, list(pre_t)):
        np.testing.assert_array_equal(a[0], b[0])
    # early break must not wedge subsequent iterations
    it = iter(pre)
    next(it)
    del it
    assert len(list(pre)) == len(direct)


def test_prefetch_loader_device_put():
    from dyadic_interaction_modeling_tpu.data.loader import PrefetchLoader

    ds = synthetic_vico_dataset(n_clips=4, min_len=10, max_len=20, seed=0)
    loader = PaddedBatchLoader(ds, batch_size=2, shuffle=False)
    pre = PrefetchLoader(loader, depth=1, transform=slm_batch_from_collated,
                         device_put=True)
    batches = list(pre)
    assert batches and all(isinstance(x, jax.Array) for b in batches for x in b)
    ref = [slm_batch_from_collated(c) for c in loader]
    np.testing.assert_array_equal(np.asarray(batches[0][0]), ref[0][0])


def test_prefetch_loader_propagates_worker_errors():
    from dyadic_interaction_modeling_tpu.data.loader import PrefetchLoader

    class Boom:
        def __len__(self):
            return 6

        def __getitem__(self, i):
            if i == 4:
                raise RuntimeError("corrupt sample")
            return (np.zeros((8, 824), np.float32), np.zeros((8, 56), np.float32),
                    f"c{i}", 0, 0, 0)

    loader = PaddedBatchLoader(Boom(), batch_size=2, shuffle=False)
    pre = PrefetchLoader(loader, depth=1)
    with pytest.raises(RuntimeError, match="corrupt sample"):
        list(pre)


def test_vq_training_loss_decreases():
    cfg = _tiny_vq_cfg()
    model = get_model(cfg)
    rng = np.random.default_rng(0)
    t = np.arange(32)[:, None] / 8.0
    batch = jnp.asarray((np.sin(t + rng.standard_normal((1, 56))) *
                         rng.uniform(0.5, 1, (1, 56))).astype(np.float32))[None].repeat(4, 0)
    params = model.init(jax.random.PRNGKey(0), batch)
    state = create_train_state(model, params, learning_rate=1e-3)
    step = make_vq_train_step(model, cfg.quant_loss_weight)
    first = None
    for i in range(100):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["rec_loss"])
    # the reconstruction objective must learn; the quantization term is
    # non-monotonic early on (codebook chasing the encoder range)
    last = float(metrics["rec_loss"])
    assert last < first * 0.3, (first, last)


def test_frozen_params_stay_fixed():
    slm_cfg, vq_cfg = _tiny_slm_cfgs()
    model = SLMFT(slm_cfg, vq_cfg)
    ds = synthetic_vico_dataset(n_clips=4, min_len=10, max_len=20, seed=0)
    loader = PaddedBatchLoader(ds, batch_size=4, shuffle=False)
    batch = slm_batch_from_collated(next(iter(loader)))
    batch = tuple(jnp.asarray(x) for x in batch)
    params = model.init(jax.random.PRNGKey(0), *batch, jax.random.PRNGKey(1))
    state = create_train_state(model, params, learning_rate=1e-3,
                               frozen_substrings=SLMFT_FROZEN_SUBSTRINGS)
    step = make_slm_train_step(model)
    before_frozen = np.asarray(
        state.params["listener_vq"]["quantize"]["embedding"]).copy()
    before_train = np.asarray(
        state.params["decoder_joint"]["to_logits"]["kernel"]).copy()
    state, logs = step(state, batch, jax.random.PRNGKey(2))
    state, logs = step(state, batch, jax.random.PRNGKey(3))
    np.testing.assert_array_equal(
        np.asarray(state.params["listener_vq"]["quantize"]["embedding"]),
        before_frozen)
    assert not np.array_equal(
        np.asarray(state.params["decoder_joint"]["to_logits"]["kernel"]),
        before_train)


def test_best_of_n_selectors():
    rng = np.random.default_rng(0)
    target = rng.standard_normal((20, 8))
    cands = np.stack([rng.standard_normal((20, 8)) for _ in range(4)] + [target + 0.01])
    best = select_best_by_l2(cands, target)
    np.testing.assert_allclose(best, cands[-1])
    best_fd = select_best_by_fd(cands, target)
    np.testing.assert_allclose(best_fd, cands[-1])


def test_evaluate_test_epoch_end_to_end():
    slm_cfg, vq_cfg = _tiny_slm_cfgs()
    model = SLMFT(slm_cfg, vq_cfg)
    ds = synthetic_vico_dataset(n_clips=4, min_len=24, max_len=30, seed=0)
    loader = PaddedBatchLoader(ds, batch_size=2, shuffle=False)

    def slm_loader():
        for collated in loader:
            yield slm_batch_from_collated(collated) + (collated[5],)

    batch0 = next(iter(slm_loader()))
    params = model.init(jax.random.PRNGKey(0), *batch0[:4], jax.random.PRNGKey(1))
    gen = make_slmft_generator(model, slm_cfg, max_len=32)
    y_true, y_pred, xs, ids = evaluate_test_epoch(
        params["params"], model, gen, slm_loader(), jax.random.PRNGKey(2),
        beam_size=3)
    assert len(y_true) == len(y_pred) == len(xs) == len(ids) == 4
    for yt, yp in zip(y_true, y_pred):
        assert yt.shape == yp.shape
        assert np.isfinite(yp).all()


@pytest.mark.slow
def test_vq_token_cache_matches_forward_vq_across_compositions():
    """Cache-assembled (z_s, z_l) must be identical to forward_vq for ANY
    batch composition: clips tokenized in one grouping on epoch 1 are
    reassembled for a different grouping (different padded length too) on
    epoch 2 - the frozen tokenization is per-clip deterministic."""
    from dyadic_interaction_modeling_tpu.models.slm import SLM

    slm_cfg, vq_cfg = _tiny_slm_cfgs()
    model = SLM(slm_cfg, vq_cfg)
    ds = synthetic_candor_dataset(n_clips=6, min_len=12, max_len=30, seed=3)
    rng = jax.random.PRNGKey(1)

    loader1 = PaddedBatchLoader(ds, batch_size=3, shuffle=False)
    collated = list(loader1)
    b0 = slm_batch_from_collated(collated[0])
    params = model.init(jax.random.PRNGKey(0), *b0, rng)["params"]

    cache = VQTokenCache(model)
    # jitted reference tokenizer (eager apply of the 2x6-layer VQ encoders
    # per batch made this the suite's hottest test)
    ref_fn = jax.jit(lambda p, a, b, m: model.apply(
        {"params": p}, a, b, m, method="forward_vq"))
    # epoch 1: populate (compute path)
    for col in collated:
        batch = slm_batch_from_collated(col)
        z = cache(params, batch, col[5])
        ref = ref_fn(params, batch[0], batch[1], batch[3])
        np.testing.assert_array_equal(np.asarray(z[0]), np.asarray(ref[0]))
        np.testing.assert_array_equal(np.asarray(z[1]), np.asarray(ref[1]))
    # epoch 2: different composition - assembled from the cache
    loader2 = PaddedBatchLoader(ds, batch_size=2, shuffle=True)
    loader2.set_epoch(7)
    for col in loader2:
        batch = slm_batch_from_collated(col)
        assert all(n in cache._store for n in col[5])
        z = cache(params, batch, col[5])
        ref = ref_fn(params, batch[0], batch[1], batch[3])
        np.testing.assert_array_equal(np.asarray(z[0]), np.asarray(ref[0]))
        np.testing.assert_array_equal(np.asarray(z[1]), np.asarray(ref[1]))

    # and the training step accepts the extended batch: same loss as inline
    step_tok = make_slm_train_step(model, with_vq_tokens=True)
    step_inline = make_slm_train_step(model)
    from dyadic_interaction_modeling_tpu.engine.train_state import (
        create_train_state,
    )
    from dyadic_interaction_modeling_tpu.models.slm import SLM_FROZEN_SUBSTRINGS

    state = create_train_state(model, {"params": params}, 1e-4,
                               frozen_substrings=SLM_FROZEN_SUBSTRINGS)
    col = collated[0]
    batch = tuple(jnp.asarray(x) for x in slm_batch_from_collated(col))
    tokens = cache(params, batch, col[5])
    r = jax.random.PRNGKey(9)
    # steps DONATE their state (no-op on CPU, real on TPU) - use a fresh
    # state per call rather than reusing a donated one
    state2 = create_train_state(model, {"params": params}, 1e-4,
                                frozen_substrings=SLM_FROZEN_SUBSTRINGS)
    _, logs_tok = step_tok(state, batch + tokens, r)
    _, logs_inline = step_inline(state2, batch, r)
    for k in logs_inline:
        np.testing.assert_allclose(float(logs_tok[k]), float(logs_inline[k]),
                                   rtol=1e-6, atol=1e-6)


def test_speaker_ids_from_names():
    ids = speaker_ids_from_names(["F2_01.wav", "M6_40.wav"])
    assert ids.tolist() == [0, 13]


def test_synthetic_biwi_dataset_shapes():
    items, templates = synthetic_biwi_dataset(n_clips=2, length=8, n_vertices=100)
    assert items[0]["vertice"].shape == (8, 300)
    assert set(templates) == {"F2", "F3"}
