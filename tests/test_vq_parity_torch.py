"""Numerical parity of the VQ-VAE against the PyTorch reference.

Imports the reference implementation directly from the read-only mount
(no code copied), builds a randomly-initialised torch model, maps its weights
into our flax modules, and compares encode/quantize/decode outputs.
"""

import os
import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE_ROOT, has_reference

torch = pytest.importorskip("torch")

if not has_reference():
    pytest.skip("reference repo not mounted", allow_module_level=True)

if REFERENCE_ROOT not in sys.path:
    sys.path.insert(0, REFERENCE_ROOT)

import jax
import jax.numpy as jnp

from dyadic_interaction_modeling_tpu import config as C
from dyadic_interaction_modeling_tpu.models.vq_vae import VQAutoEncoder, VQSpeakerAutoEncoder
from dyadic_interaction_modeling_tpu.utils.torch_import import (
    torch_vq_to_flax,
    torch_vq_speaker_to_flax,
)
from dyadic_interaction_modeling_tpu.metrics.loss import calc_vq_loss


def _ref_cfg_listener():
    cfg = C.vq_listener_defaults()
    # shrink for test speed, keep structure identical
    cfg.hidden_size = 64
    cfg.num_hidden_layers = 2
    cfg.num_attention_heads = 4
    cfg.intermediate_size = 128
    cfg.zquant_dim = 32
    cfg.n_embed = 64
    return cfg


def _to_ref_args(cfg):
    """Our flattened CfgNode is directly compatible with the reference models."""
    return cfg


@pytest.fixture(scope="module")
def ref_modules():
    from models import stage1_BIWI  # reference code, imported read-only

    return stage1_BIWI


# quant_factor > 0 cannot be parity-tested: the reference's own
# ConvTranspose1d(padding_mode='replicate') raises in torch >= 2.x
# (stage1_BIWI.py:338-340); shipped configs all use quant_factor=0.
@pytest.mark.parametrize("face_quan_num,quant_factor", [(1, 0), (2, 0)])
def test_vq_autoencoder_forward_parity(ref_modules, face_quan_num, quant_factor):
    cfg = _ref_cfg_listener()
    cfg.face_quan_num = face_quan_num
    cfg.quant_factor = quant_factor

    torch.manual_seed(0)
    ref = ref_modules.VQAutoEncoder(_to_ref_args(cfg)).eval()
    x = torch.randn(2, 16, cfg.in_dim)
    with torch.no_grad():
        dec_ref, emb_loss_ref, info_ref = ref(x)

    model = VQAutoEncoder(cfg, variant="BIWI")
    params = torch_vq_to_flax(ref.state_dict(), cfg, variant="BIWI")
    xj = jnp.asarray(x.numpy())
    dec, emb_loss, enc = model.apply(params, xj)

    np.testing.assert_allclose(np.asarray(dec), dec_ref.numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(emb_loss), float(emb_loss_ref), rtol=1e-3, atol=1e-5)
    # code assignments must match exactly (stable tokenization)
    idx_ref = info_ref[2].numpy().reshape(2, -1)
    np.testing.assert_array_equal(np.asarray(enc.indices), idx_ref)
    # perplexity
    np.testing.assert_allclose(float(enc.perplexity), float(info_ref[0]), rtol=1e-4)


def test_vq_loss_parity(ref_modules):
    from metrics.loss import calc_vq_loss as ref_loss

    cfg = _ref_cfg_listener()
    torch.manual_seed(1)
    pred = torch.randn(2, 16, 56)
    target = torch.randn(2, 16, 56)
    q = torch.tensor(0.37)
    ref_total, (ref_rec, ref_q) = ref_loss(pred, target, q)
    total, (rec, quant) = calc_vq_loss(jnp.asarray(pred.numpy()), jnp.asarray(target.numpy()),
                                       jnp.asarray(0.37))
    np.testing.assert_allclose(float(total), float(ref_total), rtol=1e-5)
    np.testing.assert_allclose(float(rec), float(ref_rec), rtol=1e-5)


def test_vq_speaker_autoencoder_parity(ref_modules):
    cfg = _ref_cfg_listener()
    cfg.in_dim = 824
    cfg.face_quan_num = 4
    torch.manual_seed(2)
    ref = ref_modules.VQSpeakerAutoEncoder(_to_ref_args(cfg)).eval()
    x = torch.randn(2, 12, 824)
    with torch.no_grad():
        dec_ref, emb_loss_ref, info_ref = ref(x)

    model = VQSpeakerAutoEncoder(cfg)
    params = torch_vq_speaker_to_flax(ref.state_dict(), cfg)
    dec, emb_loss, enc = model.apply(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(dec), dec_ref.numpy(), rtol=3e-4, atol=3e-4)
    idx_ref = info_ref[2].numpy().reshape(2, -1)
    np.testing.assert_array_equal(np.asarray(enc.indices), idx_ref)


def test_decode_to_img_parity(ref_modules):
    cfg = _ref_cfg_listener()
    torch.manual_seed(3)
    ref = ref_modules.VQAutoEncoder(_to_ref_args(cfg)).eval()
    model = VQAutoEncoder(cfg, variant="BIWI")
    params = torch_vq_to_flax(ref.state_dict(), cfg, variant="BIWI")

    idx = torch.randint(0, cfg.n_embed, (1, 10))
    zshape = (1, 10, cfg.zquant_dim)
    with torch.no_grad():
        out_ref = ref.decode_to_img(idx, zshape)
    out = model.apply(params, jnp.asarray(idx.numpy()), zshape, method=VQAutoEncoder.decode_to_img)
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(), rtol=2e-4, atol=2e-4)


def test_get_logit_decode_logit_parity(ref_modules):
    """Deterministic branches of the sampling utilities match the reference;
    the multinomial branch is checked for shape/validity (RNG streams differ).
    Quirk pinned: top_p is accepted but never applied (stage1_BIWI.py:118-137)."""
    from dyadic_interaction_modeling_tpu.models.vq_vae import get_logit

    cfg = _ref_cfg_listener()
    torch.manual_seed(4)
    ref = ref_modules.VQAutoEncoder(_to_ref_args(cfg)).eval()
    model = VQAutoEncoder(cfg, variant="BIWI")
    params = torch_vq_to_flax(ref.state_dict(), cfg, variant="BIWI")

    logits = torch.randn(2, 10, cfg.n_embed)
    with torch.no_grad():
        ix_ref, probs_ref = ref.get_logit(logits, sample=False)
    ix, probs = get_logit(jax.random.PRNGKey(0), jnp.asarray(logits.numpy()),
                          sample=False)
    np.testing.assert_array_equal(np.asarray(ix), ix_ref.squeeze(-1).numpy())
    np.testing.assert_allclose(np.asarray(probs), probs_ref.numpy(),
                               rtol=1e-5, atol=1e-6)

    ix_s, _ = get_logit(jax.random.PRNGKey(1), jnp.asarray(logits.numpy()))
    assert ix_s.shape == (2, 10)
    assert (np.asarray(ix_s) >= 0).all() and (np.asarray(ix_s) < cfg.n_embed).all()

    zshape = (2, 10, cfg.zquant_dim)
    with torch.no_grad():
        out_ref = ref.decode_logit(logits, zshape)
    out = model.apply(params, jnp.asarray(logits.numpy()), zshape,
                      method=VQAutoEncoder.decode_logit)
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(),
                               rtol=2e-4, atol=2e-4)
