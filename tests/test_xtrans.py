import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dyadic_interaction_modeling_tpu.models.xtrans import (
    ContinuousTransformerWrapper,
    TokenDecoder,
    ar_cross_entropy,
    ar_inputs_targets,
    ar_mask_prob_kv_mask,
    generate_tokens,
    top_k_filter,
)


def _decoder(num_tokens=32, dim=64, depth=2, heads=4, max_seq_len=64):
    return TokenDecoder(num_tokens=num_tokens, dim=dim, max_seq_len=max_seq_len,
                        depth=depth, heads=heads)


def test_encoder_wrapper_shapes_and_mask_nan_safety():
    enc = ContinuousTransformerWrapper(dim=64, dim_out=48, max_seq_len=32,
                                       depth=2, heads=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 7))
    mask = jnp.zeros((2, 10), dtype=bool).at[0, :5].set(True)  # row 1 fully padded
    params = enc.init(jax.random.PRNGKey(1), x)
    y = enc.apply(params, x, mask=mask, return_embeddings=True)
    assert y.shape == (2, 10, 64)
    assert np.isfinite(np.asarray(y)).all()
    out = enc.apply(params, x, mask=mask)
    assert out.shape == (2, 10, 48)


def test_encoder_mask_blocks_padding_influence():
    enc = ContinuousTransformerWrapper(dim=32, dim_out=32, max_seq_len=16,
                                       depth=1, heads=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 5))
    params = enc.init(jax.random.PRNGKey(1), x)
    mask = jnp.array([[True] * 4 + [False] * 4])
    y1 = enc.apply(params, x, mask=mask, return_embeddings=True)
    x2 = x.at[:, 4:].set(99.0)  # change padded content
    y2 = enc.apply(params, x2, mask=mask, return_embeddings=True)
    np.testing.assert_allclose(np.asarray(y1[:, :4]), np.asarray(y2[:, :4]),
                               rtol=1e-5, atol=1e-5)


def test_decoder_causality():
    dec = _decoder()
    tokens = jax.random.randint(jax.random.PRNGKey(0), (2, 12), 0, 32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 64))
    params = dec.init(jax.random.PRNGKey(2), tokens, ctx)
    l1 = dec.apply(params, tokens, ctx)
    tokens2 = tokens.at[:, 8:].set(0)
    l2 = dec.apply(params, tokens2, ctx)
    np.testing.assert_allclose(np.asarray(l1[:, :8]), np.asarray(l2[:, :8]),
                               rtol=1e-4, atol=1e-5)


def test_ar_inputs_targets():
    x = jnp.array([[5, 7, -100, 3]])
    inp, tgt = ar_inputs_targets(x)
    assert inp.tolist() == [[5, 7, 0]]
    assert tgt.tolist() == [[7, -100, 3]]


def test_ar_cross_entropy_matches_torch():
    torch = pytest.importorskip("torch")
    logits = np.random.RandomState(0).randn(3, 7, 11).astype(np.float32)
    targets = np.random.RandomState(1).randint(0, 11, size=(3, 7))
    targets[0, :3] = -100
    ours = float(ar_cross_entropy(jnp.asarray(logits), jnp.asarray(targets)))
    ref = float(torch.nn.functional.cross_entropy(
        torch.tensor(logits).permute(0, 2, 1), torch.tensor(targets),
        ignore_index=-100))
    assert ours == pytest.approx(ref, rel=1e-5)


def test_mask_prob_kv_mask():
    m = ar_mask_prob_kv_mask(jax.random.PRNGKey(0), 4, 20, 0.15)
    m = np.asarray(m)
    assert m.shape == (4, 20)
    assert m[:, 0].all()  # first position never masked
    assert (m.sum(axis=1) == 20 - int(20 * 0.15)).all()


def test_top_k_filter():
    logits = jnp.asarray(np.random.RandomState(0).randn(2, 512))
    f = np.asarray(top_k_filter(logits, 0.1))
    kept = np.isfinite(f).sum(axis=-1)
    assert (kept == 52).all()  # ceil(0.1 * 512)


def test_generate_matches_naive_greedy():
    """KV-cached scan decode must equal the naive full-reforward argmax decode."""
    dec = _decoder(num_tokens=16, dim=32, depth=2, heads=4, max_seq_len=32)
    ctx = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 32))
    prompt = jnp.array([[3], [7]], dtype=jnp.int32)
    params = dec.init(jax.random.PRNGKey(1), prompt, ctx)
    ctx_mask = jnp.array([[True] * 5, [True] * 3 + [False] * 2])

    gen = generate_tokens(dec, params, prompt, 6, ctx, ctx_mask,
                          jax.random.PRNGKey(2), greedy=True)
    assert gen.shape == (2, 6)

    # naive: re-forward the whole prefix each step, take argmax
    seq = prompt
    for _ in range(6):
        logits = dec.apply(params, seq, ctx, context_mask=ctx_mask)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
        seq = jnp.concatenate([seq, nxt], axis=1)
    np.testing.assert_array_equal(np.asarray(gen), np.asarray(seq[:, 1:]))


def test_generate_chunked_matches_unchunked():
    """The chunked-prefix decode (segmented cache slices) must be
    token-identical to the single-scan path - same step math, same RNG
    stream - including when seq_len is not a multiple of the chunk."""
    dec = _decoder(num_tokens=16, dim=32, depth=2, heads=4, max_seq_len=64)
    ctx = jax.random.normal(jax.random.PRNGKey(0), (3, 6, 32))
    prompt = jnp.array([[3], [7], [1]], dtype=jnp.int32)
    params = dec.init(jax.random.PRNGKey(1), prompt, ctx)
    ctx_mask = jnp.array([[True] * 6, [True] * 4 + [False] * 2, [True] * 6])

    # (seq_len, chunk) pairs cover: remainder segment (17 % 4), exact
    # multiple (16 / 4), chunk >= seq_len (single-scan shortcut)
    cases = {17: (4, 8), 16: (4, 64)}
    for seq_len, chunks in cases.items():
        base = generate_tokens(dec, params, prompt, seq_len, ctx, ctx_mask,
                               jax.random.PRNGKey(5))
        for chunk in chunks:
            chunked = generate_tokens(dec, params, prompt, seq_len, ctx,
                                      ctx_mask, jax.random.PRNGKey(5),
                                      chunk=chunk)
            np.testing.assert_array_equal(np.asarray(base), np.asarray(chunked))


def test_generate_chunked_scan_count_is_logarithmic(monkeypatch):
    """The geometric segment schedule must trace O(log(seq_len/chunk)) scans,
    not seq_len/chunk (round-2 weakness: L=1024/chunk=32 compiled 32 scans)."""
    import jax.lax as lax

    from dyadic_interaction_modeling_tpu.models import xtrans as X

    calls = {"n": 0}
    real_scan = lax.scan

    def counting_scan(*a, **kw):
        calls["n"] += 1
        return real_scan(*a, **kw)

    monkeypatch.setattr(X.jax.lax, "scan", counting_scan)
    dec = _decoder(num_tokens=16, dim=32, depth=2, heads=4, max_seq_len=160)
    ctx = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 32))
    prompt = jnp.array([[3], [7]], dtype=jnp.int32)
    params = dec.init(jax.random.PRNGKey(1), prompt, ctx)
    seq_len, chunk = 128, 4
    generate_tokens(dec, params, prompt, seq_len, ctx, None,
                    jax.random.PRNGKey(5), chunk=chunk)
    # schedule 4,4,8,16,32,64(,rest) -> ~log2(seq_len/chunk)+2 scans
    bound = int(np.ceil(np.log2(seq_len / chunk))) + 2
    assert calls["n"] <= bound, (calls["n"], bound)
    assert calls["n"] >= 3  # actually chunked, not the single-scan shortcut


def test_generate_context_groups_matches_tiled():
    """Best-of-N context sharing (context_groups) must be token-identical to
    physically tiling context/mask N times - alone and combined with the
    chunked-prefix path."""
    n, b0 = 3, 2
    dec = _decoder(num_tokens=16, dim=32, depth=2, heads=4, max_seq_len=32)
    ctx = jax.random.normal(jax.random.PRNGKey(0), (b0, 5, 32))
    prompt = jnp.array([[3], [7]], dtype=jnp.int32)
    params = dec.init(jax.random.PRNGKey(1), prompt, ctx)
    mask = jnp.array([[True] * 5, [True] * 3 + [False] * 2])

    prompt_t = jnp.tile(prompt, (n, 1))
    base = generate_tokens(dec, params, prompt_t, 9,
                           jnp.tile(ctx, (n, 1, 1)), jnp.tile(mask, (n, 1)),
                           jax.random.PRNGKey(5))
    grouped = generate_tokens(dec, params, prompt_t, 9, ctx, mask,
                              jax.random.PRNGKey(5), context_groups=n)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(grouped))
    both = generate_tokens(dec, params, prompt_t, 9, ctx, mask,
                           jax.random.PRNGKey(5), context_groups=n, chunk=4)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(both))


def test_generate_sampling_reproducible_and_in_range():
    dec = _decoder(num_tokens=16, dim=32, depth=1, heads=4, max_seq_len=32)
    ctx = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 32))
    prompt = jnp.zeros((2, 1), dtype=jnp.int32)
    params = dec.init(jax.random.PRNGKey(1), prompt, ctx)
    g1 = generate_tokens(dec, params, prompt, 5, ctx, None, jax.random.PRNGKey(7))
    g2 = generate_tokens(dec, params, prompt, 5, ctx, None, jax.random.PRNGKey(7))
    g3 = generate_tokens(dec, params, prompt, 5, ctx, None, jax.random.PRNGKey(8))
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    assert (np.asarray(g1) >= 0).all() and (np.asarray(g1) < 16).all()
    assert not np.array_equal(np.asarray(g1), np.asarray(g3))  # different key, different sample


def test_dropout_seq():
    from dyadic_interaction_modeling_tpu.models.xtrans import dropout_seq

    seq = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 4))
    mask = jnp.ones((2, 10), dtype=bool).at[1, 6:].set(False)
    new_seq, new_mask = dropout_seq(jax.random.PRNGKey(1), seq, mask, 0.3)
    assert new_seq.shape == (2, 7, 4)
    assert new_mask.shape == (2, 7)
    assert bool(new_mask[0].all())      # row 0 had 10 valid -> all 7 kept valid
    assert int(new_mask[1].sum()) == 6  # row 1 had only 6 valid positions
