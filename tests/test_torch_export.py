"""Flax -> torch checkpoint EXPORT validation.

The interchange the north star requires in both directions: a TPU-trained
model handed back to the reference's PyTorch eval scripts. Three layers of
proof per family:

1. round trip: ``torch_import(flax_export(p)) == p`` exactly (pins both key
   maps against each other),
2. loading the exported dict into the ACTUAL reference torch modules
   (stage1_BIWI, importable read-only) with ``strict=True``,
3. forward parity of the loaded torch model vs our flax forward.

The SLM family's reference modules need the x-transformers wheel (absent
in-image), so step 2/3 use the plain-torch twin from
tests/test_train_parity_torch.py - the same 1.30 layout the importer is
validated against.
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
from dyadic_interaction_modeling_tpu.models.slm import SLMFT, EmocaConverter
from dyadic_interaction_modeling_tpu.models.vq_vae import (
    VQAutoEncoder,
    VQSpeakerAutoEncoder,
)
from dyadic_interaction_modeling_tpu.utils.torch_export import (
    flax_slm_to_torch,
    flax_vq_speaker_to_torch,
    flax_vq_to_torch,
    to_torch_state_dict,
)
from dyadic_interaction_modeling_tpu.utils.torch_import import (
    torch_slm_to_flax,
    torch_vq_speaker_to_flax,
    torch_vq_to_flax,
)

from tests.test_train_parity_torch import _TorchSLMFT, _vq_cfg
from tests.test_xtrans_import import DIM_A, _tiny_cfgs


def _tree_equal(a, b):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(fa) == len(fb)
    for path, leaf in fa:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(fb[path]),
            err_msg=f"round-trip mismatch at {jax.tree_util.keystr(path)}")


def test_vq_export_roundtrip():
    cfg = _vq_cfg()
    model = VQAutoEncoder(cfg, variant="BIWI")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, cfg.in_dim))
    params = model.init(jax.random.PRNGKey(1), x)
    sd = flax_vq_to_torch(params, cfg)
    back = torch_vq_to_flax(sd, cfg, variant="BIWI")
    _tree_equal(params["params"], back["params"])


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_vq_export_loads_reference_module_strict():
    """Exported dict loads into the actual reference VQAutoEncoder with
    strict=True and reproduces our forward."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from models import stage1_BIWI

    cfg = _vq_cfg()
    model = VQAutoEncoder(cfg, variant="BIWI")
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 12, cfg.in_dim))
    params = model.init(jax.random.PRNGKey(3), x)
    dec, emb_loss, enc = model.apply(params, x)

    ref = stage1_BIWI.VQAutoEncoder(cfg)
    missing, unexpected = ref.load_state_dict(
        to_torch_state_dict(flax_vq_to_torch(params, cfg)), strict=True)
    assert not missing and not unexpected
    ref.eval()
    with torch.no_grad():
        dec_ref, emb_ref, info_ref = ref(torch.from_numpy(np.asarray(x)))
    np.testing.assert_allclose(np.asarray(dec), dec_ref.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(enc.indices),
                                  info_ref[2].numpy().reshape(2, -1))


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_vq_speaker_export_loads_reference_module_strict():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from models import stage1_BIWI

    cfg = _vq_cfg()
    cfg.in_dim = 88  # tiny AV stand-in (56 motion + 32 audio)
    cfg.face_quan_num = 4
    model = VQSpeakerAutoEncoder(cfg)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 10, cfg.in_dim))
    params = model.init(jax.random.PRNGKey(5), x)
    dec, _, enc = model.apply(params, x)

    sd = flax_vq_speaker_to_torch(params, cfg)
    back = torch_vq_speaker_to_flax(sd, cfg)
    _tree_equal(params["params"], back["params"])

    ref = stage1_BIWI.VQSpeakerAutoEncoder(cfg)
    missing, unexpected = ref.load_state_dict(to_torch_state_dict(sd), strict=True)
    assert not missing and not unexpected
    ref.eval()
    with torch.no_grad():
        dec_ref, _, info_ref = ref(torch.from_numpy(np.asarray(x)))
    np.testing.assert_allclose(np.asarray(dec), dec_ref.numpy(),
                               rtol=3e-4, atol=3e-4)


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_slmft_export_roundtrip_and_twin_forward_parity():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from models import stage1_BIWI

    cfg, vq_cfg = _tiny_cfgs()
    model = SLMFT(cfg, vq_cfg)
    b, l = 2, 16
    ks = jax.random.split(jax.random.PRNGKey(6), 3)
    v_s = jax.random.normal(ks[0], (b, l, 56))
    v_l = jax.random.normal(ks[1], (b, l, 56))
    v_a = jax.random.normal(ks[2], (b, l, DIM_A))
    mask = jnp.ones((b, l), dtype=bool)
    params = model.init(jax.random.PRNGKey(7), v_s, v_l, v_a, mask, None)

    sd = flax_slm_to_torch(params, cfg, vq_cfg, variant="slmft")

    # round trip through the importer reproduces the tree exactly
    back = torch_slm_to_flax(sd, cfg, vq_cfg, variant="slmft",
                             params_template=params["params"])
    _tree_equal(params["params"], back["params"])

    # the torch twin loads it; the only missing keys are submodules our
    # SLMFT forward never materializes: the encoders' project_out Linears
    # (return_embeddings=True everywhere) and the speaker VQ's decoder
    # (SLMFT only ENCODES the speaker stream)
    torch.manual_seed(0)
    twin = _TorchSLMFT(stage1_BIWI.VQAutoEncoder(vq_cfg),
                       stage1_BIWI.VQAutoEncoder(vq_cfg))
    missing, unexpected = twin.load_state_dict(to_torch_state_dict(sd),
                                               strict=False)
    assert not unexpected, unexpected
    unused_prefixes = ("speaker_vq.decoder", "encoder_l.", "norm_l.", "norm.")
    bad = [k for k in missing if "project_out" not in k
           and not k.startswith(unused_prefixes)]
    assert not bad, bad
    twin.eval()

    out = model.apply(params, v_s, v_l, v_a, mask, None)
    with torch.no_grad():
        loss_ref = twin(torch.from_numpy(np.asarray(v_s)),
                        torch.from_numpy(np.asarray(v_l)),
                        torch.from_numpy(np.asarray(v_a)),
                        torch.ones(b, l, dtype=torch.bool))
    np.testing.assert_allclose(float(out.total_loss), float(loss_ref),
                               rtol=1e-4, atol=1e-5)


def test_converter_export_roundtrip():
    cfg, vq_cfg = _tiny_cfgs()
    vdim = 120
    model = EmocaConverter(vq_cfg, vertice_dim=vdim)
    tpl = jnp.zeros((2, vdim))
    v56 = jax.random.normal(jax.random.PRNGKey(8), (2, 10, 56))
    params = model.init(jax.random.PRNGKey(9), tpl, v56)
    sd = flax_slm_to_torch(params, cfg, vq_cfg, variant="converter")
    back = torch_slm_to_flax(sd, cfg, vq_cfg, variant="converter",
                             params_template=params["params"])
    _tree_equal(params["params"], back["params"])


def test_save_state_dict_torch_load(tmp_path):
    """The written .pt round-trips through torch.load - the file format the
    reference scripts consume (test_s2s_pretrain.py:43)."""
    from dyadic_interaction_modeling_tpu.utils.torch_export import save_state_dict

    sd = {"a.weight": np.ones((3, 2), dtype=np.float32)}
    path = str(tmp_path / "export.pt")
    save_state_dict(sd, path)
    loaded = torch.load(path)
    np.testing.assert_array_equal(loaded["a.weight"].numpy(), sd["a.weight"])
