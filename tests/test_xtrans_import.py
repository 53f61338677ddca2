"""x-transformers checkpoint importer validation + SLM-family numerical parity.

The reference delegates the SLM family to ``x-transformers==1.30.16``
(``/root/reference/code/seq2seq_pretrain.py:10``); the wheel is not in this
image, so these tests rebuild the SAME architecture in plain torch with the
library's exact state_dict key layout (documented in
``utils/torch_import.py``) and x-transformers' forward semantics — custom
LayerNorm saved as gamma (param) + beta (buffer), learned absolute positional
embeddings scaled by dim**-0.5 at forward, pre-norm (attn[, cross], ff)
blocks, bias-free q/k/v/out and to_logits — then assert that importing the
torch state_dict into our flax modules reproduces the torch forward
numerically. This pins BOTH the key map and the transformer semantics the
flagship models rest on.

The full-checkpoint test builds a ``best_vico_causal.pt``-shaped dict
(reference VQ state_dicts under speaker_vq./listener_vq. + the transformer
stack, wrapped with DataParallel's ``module.`` prefix) and runs the imported
SLMFT end to end against the torch composition of reference-VQ + mini-xt.
"""

import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE_ROOT, has_reference

torch = pytest.importorskip("torch")
nn = torch.nn

import jax
import jax.numpy as jnp

from dyadic_interaction_modeling_tpu import config as C
from dyadic_interaction_modeling_tpu.models.slm import SLMFT
from dyadic_interaction_modeling_tpu.models.xtrans import (
    ContinuousTransformerWrapper,
    TokenDecoder,
    ar_cross_entropy,
    ar_inputs_targets,
)
from dyadic_interaction_modeling_tpu.utils.torch_import import torch_slm_to_flax

DIM, DIM_A, DEPTH, HEADS, NTOK, MAXLEN = 64, 32, 2, 2, 64, 64


# ---------------------------------------------------------------------------
# torch mini x-transformers (1.30 layout + semantics)
# ---------------------------------------------------------------------------


class XTLayerNorm(nn.Module):
    """x-transformers custom LayerNorm: gamma param + beta BUFFER."""

    def __init__(self, dim):
        super().__init__()
        self.gamma = nn.Parameter(torch.ones(dim))
        self.register_buffer("beta", torch.zeros(dim))

    def forward(self, x):
        return torch.nn.functional.layer_norm(x, x.shape[-1:], self.gamma, self.beta)


class XTAttention(nn.Module):
    def __init__(self, dim, heads, dim_head=64, causal=False):
        super().__init__()
        inner = heads * dim_head
        self.heads, self.dim_head, self.causal = heads, dim_head, causal
        self.to_q = nn.Linear(dim, inner, bias=False)
        self.to_k = nn.Linear(dim, inner, bias=False)
        self.to_v = nn.Linear(dim, inner, bias=False)
        self.to_out = nn.Linear(inner, dim, bias=False)

    def forward(self, x, context=None, mask=None, attn_mask=None):
        src = x if context is None else context
        b, n, _ = x.shape
        q = self.to_q(x).view(b, n, self.heads, self.dim_head).transpose(1, 2)
        k = self.to_k(src).view(b, src.shape[1], self.heads, self.dim_head).transpose(1, 2)
        v = self.to_v(src).view(b, src.shape[1], self.heads, self.dim_head).transpose(1, 2)
        dots = torch.einsum("bhid,bhjd->bhij", q, k) * self.dim_head ** -0.5
        big_neg = -torch.finfo(dots.dtype).max
        if self.causal:
            causal = torch.ones(n, src.shape[1], dtype=torch.bool).tril(
                src.shape[1] - n)
            dots = dots.masked_fill(~causal[None, None], big_neg)
        if attn_mask is not None:
            dots = dots.masked_fill(~attn_mask[None, None], big_neg)
        if mask is not None:
            dots = dots.masked_fill(~mask[:, None, None, :], big_neg)
        attn = dots.softmax(dim=-1)
        out = torch.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(1, 2).reshape(b, n, -1)
        return self.to_out(out)


class XTFeedForward(nn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        self.ff = nn.Sequential(
            nn.Sequential(nn.Linear(dim, dim * mult), nn.GELU()),
            nn.Identity(), nn.Dropout(0.0), nn.Linear(dim * mult, dim))

    def forward(self, x):
        return self.ff(x)


class XTAttentionLayers(nn.Module):
    """Encoder: (a, f) per depth; Decoder(cross_attend): (a, c, f)."""

    def __init__(self, dim, depth, heads, cross_attend=False, causal=False):
        super().__init__()
        self.cross_attend = cross_attend
        self.layers = nn.ModuleList([])
        block = ("a", "c", "f") if cross_attend else ("a", "f")
        for _ in range(depth):
            for t in block:
                if t == "a":
                    layer = XTAttention(dim, heads, causal=causal)
                elif t == "c":
                    layer = XTAttention(dim, heads, causal=False)
                else:
                    layer = XTFeedForward(dim)
                norms = nn.ModuleList([XTLayerNorm(dim), None, None])
                self.layers.append(nn.ModuleList([norms, layer, nn.Identity()]))
        self.final_norm = XTLayerNorm(dim)

    def forward(self, x, context=None, mask=None, attn_mask=None,
                self_attn_kv_mask=None, context_mask=None):
        block = ("a", "c", "f") if self.cross_attend else ("a", "f")
        for j, (norms, layer, _) in enumerate(self.layers):
            t = block[j % len(block)]
            h = norms[0](x)
            if t == "a":
                x = x + layer(h, mask=self_attn_kv_mask if self.cross_attend else mask,
                              attn_mask=attn_mask)
            elif t == "c":
                x = x + layer(h, context=context, mask=context_mask)
            else:
                x = x + layer(h)
        return self.final_norm(x)


class XTPosEmb(nn.Module):
    def __init__(self, dim, max_seq_len):
        super().__init__()
        self.scale = dim ** -0.5
        self.emb = nn.Embedding(max_seq_len, dim)

    def forward(self, n):
        return self.emb(torch.arange(n)) * self.scale


class XTContinuousTransformerWrapper(nn.Module):
    def __init__(self, dim_in, dim_out, dim, depth, heads, max_seq_len):
        super().__init__()
        self.project_in = nn.Linear(dim_in, dim)
        self.pos_emb = XTPosEmb(dim, max_seq_len)
        self.attn_layers = XTAttentionLayers(dim, depth, heads)
        self.project_out = nn.Linear(dim, dim_out)

    def forward(self, x, mask=None, attn_mask=None, return_embeddings=True):
        h = self.project_in(x) + self.pos_emb(x.shape[1])
        h = self.attn_layers(h, mask=mask, attn_mask=attn_mask)
        return h if return_embeddings else self.project_out(h)


class XTTransformerWrapper(nn.Module):
    def __init__(self, num_tokens, dim, depth, heads, max_seq_len,
                 use_abs_pos_emb=True):
        super().__init__()
        self.token_emb = nn.Module()
        self.token_emb.emb = nn.Embedding(num_tokens, dim)
        if use_abs_pos_emb:
            self.pos_emb = XTPosEmb(dim, max_seq_len)
        self.use_abs_pos_emb = use_abs_pos_emb
        self.attn_layers = XTAttentionLayers(dim, depth, heads,
                                             cross_attend=True, causal=True)
        self.to_logits = nn.Linear(dim, num_tokens, bias=False)

    def forward(self, tokens, context=None, self_attn_kv_mask=None,
                context_mask=None):
        h = self.token_emb.emb(tokens)
        if self.use_abs_pos_emb:
            h = h + self.pos_emb(tokens.shape[1])
        h = self.attn_layers(h, context=context,
                             self_attn_kv_mask=self_attn_kv_mask,
                             context_mask=context_mask)
        return self.to_logits(h)


class XTAutoregressiveWrapper(nn.Module):
    """Only the state_dict shape matters here (keys under .net)."""

    def __init__(self, net):
        super().__init__()
        self.net = net


def _tiny_cfgs():
    cfg = C.slm_defaults()
    cfg.update(dict(dim=DIM, dim_audio=DIM_A, enc_depth=DEPTH, enc_heads=HEADS,
                    dec_depth=DEPTH, dec_heads=HEADS, enc_max_seq_len=MAXLEN,
                    dec_max_seq_len=MAXLEN, num_tokens=NTOK))
    vq = C.vq_listener_defaults()
    vq.update(dict(hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
                   intermediate_size=128, zquant_dim=32, n_embed=NTOK))
    return cfg, vq


# ---------------------------------------------------------------------------
# component parity
# ---------------------------------------------------------------------------


def _import_component(sd_prefix, sd, cfg, template, variant="slmft"):
    """Route a component state_dict through the full SLM importer namespace."""
    full = {f"{sd_prefix}.{k}": v for k, v in sd.items()}
    return full


def test_continuous_wrapper_import_parity():
    torch.manual_seed(0)
    ref = XTContinuousTransformerWrapper(56, DIM, DIM, DEPTH, HEADS, MAXLEN).eval()
    b, l = 2, 24
    x = torch.randn(b, l, 56)
    mask = torch.ones(b, l, dtype=torch.bool)
    mask[1, 20:] = False
    attn_mask = torch.ones(l, l, dtype=torch.bool).tril()
    with torch.no_grad():
        out_ref = ref(x, mask=mask, attn_mask=attn_mask, return_embeddings=True)

    model = ContinuousTransformerWrapper(dim=DIM, dim_out=DIM, max_seq_len=MAXLEN,
                                         depth=DEPTH, heads=HEADS)
    xj = jnp.asarray(x.numpy())
    mj = jnp.asarray(mask.numpy())
    amj = jnp.asarray(attn_mask.numpy())
    variables = model.init(jax.random.PRNGKey(0), xj, mask=mj, attn_mask=amj,
                           return_embeddings=True)

    # route through the SLM importer under the encoder_s namespace
    from dyadic_interaction_modeling_tpu.utils import torch_import as TI

    tree = {}
    TI._xt_continuous(tree, "m", TI.normalize_legacy_keys(
        {f"x.{k}": v for k, v in ref.state_dict().items()}), "x", DEPTH, DIM)
    flat_tpl = TI._leaf_paths(variables["params"])
    flat_new = TI._leaf_paths(tree["m"])
    assert set(flat_tpl) - set(flat_new) == set(), sorted(set(flat_tpl) - set(flat_new))
    params = {}
    for p in flat_tpl:
        TI._set(params, p, np.asarray(flat_new[p], dtype=np.float32))

    out = model.apply({"params": params}, xj, mask=mj, attn_mask=amj,
                      return_embeddings=True)
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(), rtol=1e-4, atol=1e-4)


def test_token_decoder_import_parity():
    torch.manual_seed(1)
    dim = DIM + DIM_A
    ref = XTTransformerWrapper(NTOK, dim, DEPTH, HEADS, MAXLEN,
                               use_abs_pos_emb=True).eval()
    b, l, lc = 2, 12, 20
    tokens = torch.randint(0, NTOK, (b, l))
    ctx = torch.randn(b, lc, dim)
    cmask = torch.ones(b, lc, dtype=torch.bool)
    cmask[0, 15:] = False
    with torch.no_grad():
        logits_ref = ref(tokens, context=ctx, context_mask=cmask)

    model = TokenDecoder(num_tokens=NTOK, dim=dim, max_seq_len=MAXLEN,
                         depth=DEPTH, heads=HEADS, use_abs_pos_emb=True)
    tj = jnp.asarray(tokens.numpy())
    cj = jnp.asarray(ctx.numpy())
    cmj = jnp.asarray(cmask.numpy())
    variables = model.init(jax.random.PRNGKey(0), tj, context=cj, context_mask=cmj)

    from dyadic_interaction_modeling_tpu.utils import torch_import as TI

    tree = {}
    TI._xt_token_decoder(tree, "m", TI.normalize_legacy_keys(
        {f"d.net.{k}": v for k, v in ref.state_dict().items()}), "d.net", DEPTH, dim)
    flat_tpl = TI._leaf_paths(variables["params"])
    flat_new = TI._leaf_paths(tree["m"])
    assert set(flat_tpl) - set(flat_new) == set(), sorted(set(flat_tpl) - set(flat_new))
    params = {}
    for p in flat_tpl:
        TI._set(params, p, np.asarray(flat_new[p], dtype=np.float32))

    logits = model.apply({"params": params}, tj, context=cj, context_mask=cmj)
    np.testing.assert_allclose(np.asarray(logits), logits_ref.numpy(),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# full SLMFT checkpoint (best_vico_causal.pt shape)
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_full_slmft_checkpoint_import_and_forward_parity():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from models import stage1_BIWI  # reference code, read-only

    cfg, vq_cfg = _tiny_cfgs()
    torch.manual_seed(2)
    ref_vq_s = stage1_BIWI.VQAutoEncoder(vq_cfg).eval()
    ref_vq_l = stage1_BIWI.VQAutoEncoder(vq_cfg).eval()

    enc_s = XTContinuousTransformerWrapper(56, DIM, DIM, DEPTH, HEADS, MAXLEN).eval()
    enc_l = XTContinuousTransformerWrapper(56, DIM, DIM, DEPTH, HEADS, MAXLEN).eval()
    enc_j = XTContinuousTransformerWrapper(DIM, DIM, DIM, DEPTH, HEADS, MAXLEN).eval()
    # SLMFT decoder quirk: use_abs_pos_emb=False (seq2seq_pretrain.py:386)
    dec = XTAutoregressiveWrapper(XTTransformerWrapper(
        NTOK, DIM + DIM_A, DEPTH, HEADS, MAXLEN, use_abs_pos_emb=False)).eval()
    patch_s = torch.randn(1, 1, 56) * 0.02
    patch_dec_s = torch.randn(1, 1, DIM) * 0.02
    norm_s = nn.LayerNorm(DIM).eval()
    with torch.no_grad():
        norm_s.weight.mul_(0).add_(torch.rand(DIM) + 0.5)
        norm_s.bias.add_(torch.randn(DIM) * 0.1)

    # --- assemble the reference-format checkpoint dict ---
    sd = {}
    for prefix, module in (("speaker_vq", ref_vq_s), ("listener_vq", ref_vq_l),
                           ("encoder_s", enc_s), ("encoder_l", enc_l),
                           ("encoder_joint", enc_j), ("decoder_joint", dec),
                           ("norm_s", norm_s), ("norm_l", nn.LayerNorm(DIM)),
                           ("norm", nn.LayerNorm(DIM))):
        for k, v in module.state_dict().items():
            sd[f"module.{prefix}.{k}"] = v  # DataParallel prefix
    sd["module.patch_embed_s"] = patch_s
    sd["module.patch_embed_l"] = torch.zeros(1, 1, 56)
    sd["module.patch_embed_dec_s"] = patch_dec_s
    sd["module.patch_embed_dec_l"] = torch.zeros(1, 1, DIM)

    # --- import into flax SLMFT ---
    model = SLMFT(cfg, vq_cfg)
    b, l = 2, 16
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    v_s = jax.random.normal(ks[0], (b, l, 56))
    v_l = jax.random.normal(ks[1], (b, l, 56))
    v_a = jax.random.normal(ks[2], (b, l, DIM_A))
    mask = jnp.ones((b, l), dtype=bool)
    template = model.init(jax.random.PRNGKey(4), v_s, v_l, v_a, mask, None)
    params = torch_slm_to_flax(sd, cfg, vq_cfg, variant="slmft",
                               params_template=template["params"])

    # --- torch composition of the same forward (seq2seq_pretrain.py:431-513) ---
    vs_t = torch.from_numpy(np.asarray(v_s))
    vl_t = torch.from_numpy(np.asarray(v_l))
    va_t = torch.from_numpy(np.asarray(v_a))
    mask_t = torch.ones(b, l, dtype=torch.bool)
    with torch.no_grad():
        # forward_vq for the listener: PER-SAMPLE encode like the reference's
        # python loop (seq2seq_pretrain.py:185-199) - batch size 1 triggers
        # the PositionalEncoding batch-axis quirk our lengths path reproduces
        z_l = torch.stack([
            ref_vq_l.encode(vl_t[i].unsqueeze(0))[2][2].squeeze()
            for i in range(b)], dim=0)
        attn = torch.ones(l, l, dtype=torch.bool).tril()
        x_s = enc_s(vs_t + patch_s, mask=mask_t, attn_mask=attn)
        x_s = enc_j(x_s, mask=mask_t, attn_mask=attn)
        x_s = norm_s(x_s)
        ctx = torch.cat([x_s + patch_dec_s, va_t], dim=-1)
        logits_ref = dec.net(z_l[:, :-1], context=ctx, context_mask=mask_t)

    # --- flax: same internals via module methods ---
    x_s_j = model.apply(params, v_s, mask, method=SLMFT.forward_encoder)
    np.testing.assert_allclose(np.asarray(x_s_j), x_s.numpy(), rtol=1e-4, atol=1e-4)

    _, z_l_j = model.apply(params, v_s, v_l, mask, method=SLMFT.forward_vq)
    np.testing.assert_array_equal(np.asarray(z_l_j), z_l.numpy())

    l_ce, logits_j = model.apply(params, x_s_j, z_l_j, v_a, mask, None,
                                 method=SLMFT.decode_train)
    np.testing.assert_allclose(np.asarray(logits_j), logits_ref.numpy(),
                               rtol=2e-4, atol=2e-4)

    # torch-side CE for the same shifted targets
    tgt = z_l[:, 1:]
    ce_ref = torch.nn.functional.cross_entropy(
        logits_ref.reshape(-1, NTOK), tgt.reshape(-1), ignore_index=-100)
    np.testing.assert_allclose(float(l_ce), float(ce_ref), rtol=1e-5)

    # end-to-end: the full training forward runs and is finite
    out = model.apply(params, v_s, v_l, v_a, mask, None)
    assert np.isfinite(float(out.total_loss))


def test_importer_rejects_incomplete_checkpoint():
    cfg, vq_cfg = _tiny_cfgs()
    with pytest.raises(KeyError):
        torch_slm_to_flax({"patch_embed_s": torch.zeros(1, 1, 56)}, cfg, vq_cfg,
                          variant="slmft")


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_converter_checkpoint_import():
    """EmocaConverter .pt (best_converter.pt shape: reference VQ under
    speaker_vq. + LSTM/mesh heads) loads with full template coverage."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from models import stage1_BIWI

    from dyadic_interaction_modeling_tpu.models.slm import EmocaConverter

    cfg, vq_cfg = _tiny_cfgs()
    torch.manual_seed(5)
    ref_vq = stage1_BIWI.VQAutoEncoder(vq_cfg).eval()
    vdim = 120  # tiny stand-in for 70110

    sd = {f"speaker_vq.{k}": v for k, v in ref_vq.state_dict().items()}
    sd["vertice_mapping.0.weight"] = torch.randn(56, vdim) * 0.01
    sd["vertice_mapping.0.bias"] = torch.zeros(56)
    sd["squasher.0.0.weight"] = torch.randn(56, 56, 5) * 0.05
    sd["squasher.0.0.bias"] = torch.zeros(56)
    for name in ("vertice_map_reverse_lstm", "vertice_map_reverse_lstm_2"):
        lstm = nn.LSTM(input_size=56, hidden_size=384, num_layers=2,
                       batch_first=True, bidirectional=True)
        for k, v in lstm.state_dict().items():
            sd[f"{name}.{k}"] = v
    for name in ("vertice_map_reverse", "vertice_map_reverse2"):
        sd[f"{name}.0.weight"] = torch.randn(768, 768) * 0.01
        sd[f"{name}.0.bias"] = torch.zeros(768)
        sd[f"{name}.2.weight"] = torch.randn(vdim, 768) * 0.01
        sd[f"{name}.2.bias"] = torch.zeros(vdim)

    model = EmocaConverter(vq_cfg, vertice_dim=vdim)
    template = jnp.zeros((2, vdim))
    v56 = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 56))
    tpl_params = model.init(jax.random.PRNGKey(1), template, v56)["params"]
    params = torch_slm_to_flax(sd, cfg, vq_cfg, variant="converter",
                               params_template=tpl_params)
    out = model.apply(params, template, v56)
    assert out.shape == (2, 12, vdim)
    assert np.isfinite(np.asarray(out)).all()

    # forward parity of the mesh head path vs torch composition
    with torch.no_grad():
        dec_ref, _, _ = ref_vq(torch.from_numpy(np.asarray(v56)))
        lstm = nn.LSTM(input_size=56, hidden_size=384, num_layers=2,
                       batch_first=True, bidirectional=True)
        lstm.load_state_dict({k[len("vertice_map_reverse_lstm."):]: v
                              for k, v in sd.items()
                              if k.startswith("vertice_map_reverse_lstm.")
                              and "lstm_2" not in k})
        h, _ = lstm(dec_ref)
        head = torch.nn.Sequential(
            nn.Linear(768, 768), nn.LeakyReLU(0.2), nn.Linear(768, vdim))
        head[0].weight.data = sd["vertice_map_reverse.0.weight"]
        head[0].bias.data = sd["vertice_map_reverse.0.bias"]
        head[2].weight.data = sd["vertice_map_reverse.2.weight"]
        head[2].bias.data = sd["vertice_map_reverse.2.bias"]
        out_ref = head(h)
    # NOTE: converter VQ roundtrip uses the BATCHED forward in both impls
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_speaker_slmft_checkpoint_import():
    """best_model_biwi_finetune*.pt-shaped dict (SLM stack + converter heads
    + speaker embedding + W) loads into SpeakerSLMFT and runs."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from models import stage1_BIWI

    from dyadic_interaction_modeling_tpu.models.slm import SpeakerSLMFT

    cfg, vq_cfg = _tiny_cfgs()
    torch.manual_seed(6)
    ref_vq_s = stage1_BIWI.VQAutoEncoder(vq_cfg).eval()
    ref_vq_l = stage1_BIWI.VQAutoEncoder(vq_cfg).eval()
    vdim = 120

    enc_s = XTContinuousTransformerWrapper(56, DIM, DIM, DEPTH, HEADS, MAXLEN)
    enc_l = XTContinuousTransformerWrapper(56, DIM, DIM, DEPTH, HEADS, MAXLEN)
    enc_j = XTContinuousTransformerWrapper(DIM, DIM, DIM, DEPTH, HEADS, MAXLEN)
    dec = XTAutoregressiveWrapper(XTTransformerWrapper(
        NTOK, DIM + DIM_A, DEPTH, HEADS, MAXLEN, use_abs_pos_emb=True))

    sd = {}
    for prefix, module in (("speaker_vq", ref_vq_s), ("listener_vq", ref_vq_l),
                           ("encoder_s", enc_s), ("encoder_l", enc_l),
                           ("encoder_joint", enc_j), ("decoder_joint", dec),
                           ("norm_s", nn.LayerNorm(DIM)),
                           ("norm_l", nn.LayerNorm(DIM)),
                           ("norm", nn.LayerNorm(DIM))):
        for k, v in module.state_dict().items():
            sd[f"{prefix}.{k}"] = v
    for nm, shape in (("patch_embed_s", (1, 1, 56)), ("patch_embed_l", (1, 1, 56)),
                      ("patch_embed_dec_s", (1, 1, DIM)),
                      ("patch_embed_dec_l", (1, 1, DIM))):
        sd[nm] = torch.zeros(*shape)
    sd["vertice_mapping.0.weight"] = torch.randn(56, vdim) * 0.01
    sd["vertice_mapping.0.bias"] = torch.zeros(56)
    sd["squasher.0.0.weight"] = torch.randn(56, 56, 5) * 0.05
    sd["squasher.0.0.bias"] = torch.zeros(56)
    for name in ("vertice_map_reverse_lstm", "vertice_map_reverse_lstm_2"):
        lstm = nn.LSTM(input_size=56, hidden_size=384, num_layers=2,
                       batch_first=True, bidirectional=True)
        for k, v in lstm.state_dict().items():
            sd[f"{name}.{k}"] = v
    for name in ("vertice_map_reverse", "vertice_map_reverse2"):
        sd[f"{name}.0.weight"] = torch.randn(768, 768) * 0.01
        sd[f"{name}.0.bias"] = torch.zeros(768)
        sd[f"{name}.2.weight"] = torch.randn(vdim, 768) * 0.01
        sd[f"{name}.2.bias"] = torch.zeros(vdim)
    sd["speaker_embed.weight"] = torch.randn(15, DIM) * 0.02
    sd["W"] = torch.randn(2)

    model = SpeakerSLMFT(cfg, vq_cfg, vertice_dim=vdim)
    b, l = 2, 12
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    verts = jax.random.normal(ks[0], (b, l, vdim))
    emoca = jax.random.normal(ks[1], (b, l, 56))
    aud = jax.random.normal(ks[2], (b, l, DIM_A))
    mask = jnp.ones((b, l), dtype=bool)
    template = jnp.zeros((b, vdim))
    sids = jnp.zeros((b,), jnp.int32)
    tpl = model.init(jax.random.PRNGKey(8), verts, emoca, aud, mask,
                     template, sids)["params"]
    params = torch_slm_to_flax(sd, cfg, vq_cfg, variant="speaker_slmft",
                               params_template=tpl)
    out = model.apply(params, verts, emoca, aud, mask, template, sids)
    assert np.isfinite(float(out.total_loss))


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_listener_generator_checkpoint_import():
    """seq2seq.py ListenerGenerator checkpoint (generator.encoder /
    generator.decoder.net / id embeddings / fc heads) loads and runs."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from models import stage1_BIWI

    from dyadic_interaction_modeling_tpu.models.listener_generator import (
        ListenerGenerator,
    )
    from dyadic_interaction_modeling_tpu.utils.torch_import import (
        torch_listener_generator_to_flax,
    )

    _, vq_cfg = _tiny_cfgs()
    lg_cfg = C.listener_generator_defaults()
    lg_cfg.update(dict(dim=DIM, enc_depth=DEPTH, enc_heads=HEADS,
                       enc_max_seq_len=MAXLEN, dec_num_tokens=NTOK,
                       dec_depth=DEPTH, dec_heads=HEADS, dec_max_seq_len=MAXLEN,
                       num_identities=10, id_embed_dim=16))
    torch.manual_seed(9)
    ref_vq_s = stage1_BIWI.VQAutoEncoder(vq_cfg).eval()
    ref_vq_l = stage1_BIWI.VQAutoEncoder(vq_cfg).eval()
    dim_in = vq_cfg.face_quan_num * vq_cfg.zquant_dim

    enc = XTContinuousTransformerWrapper(dim_in, DIM, DIM, DEPTH, HEADS, MAXLEN)
    dec = XTAutoregressiveWrapper(XTTransformerWrapper(
        NTOK, DIM, DEPTH, HEADS, MAXLEN, use_abs_pos_emb=True))
    sd = {}
    for prefix, module in (("speaker_vq", ref_vq_s), ("listener_vq", ref_vq_l),
                           ("generator.encoder", enc),
                           ("generator.decoder", dec)):
        for k, v in module.state_dict().items():
            sd[f"{prefix}.{k}"] = v
    sd["speaker_embeddings.weight"] = torch.randn(10, 16) * 0.02
    sd["listener_embeddings.weight"] = torch.randn(10, 16) * 0.02
    sd["fc_speaker.weight"] = torch.randn(lg_cfg.enc_max_seq_len, 16) * 0.02
    sd["fc_speaker.bias"] = torch.zeros(lg_cfg.enc_max_seq_len)
    sd["fc_listener.weight"] = torch.randn(DIM, 16) * 0.02
    sd["fc_listener.bias"] = torch.zeros(DIM)

    model = ListenerGenerator(lg_cfg, vq_cfg, vq_cfg)
    b, l = 2, 12
    ks = jax.random.split(jax.random.PRNGKey(10), 2)
    v_s = jax.random.normal(ks[0], (b, l, 56))
    v_l = jax.random.normal(ks[1], (b, l, 56))
    mask = jnp.ones((b, l), dtype=bool)
    sids = jnp.zeros((b,), jnp.int32)
    lids = jnp.ones((b,), jnp.int32)
    tpl = model.init(jax.random.PRNGKey(11), v_s, v_l, mask, sids, lids)["params"]
    params = torch_listener_generator_to_flax(
        sd, lg_cfg, vq_cfg, vq_cfg, params_template=tpl)
    out = model.apply(params, v_s, v_l, mask, sids, lids)
    assert np.isfinite(float(out.loss))
