"""FaceGenerator checkpoint interchange vs the ACTUAL reference module.

Imports ``generators/face_model.py`` from the read-only reference tree,
maps its state_dict through ``render.import_torch`` and pins:

* forward parity (flow / warp / fake image) torch vs flax on the same input;
* export loads into the reference module ``strict=True`` and round-trips;
* spectral-norm checkpoints resolve to effective weights (inference parity).

This is the render-side twin of the SLM-family import/export battery
(tests/test_xtrans_import.py, tests/test_torch_export.py).
"""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

from tests.conftest import REFERENCE_ROOT, has_reference

torch = pytest.importorskip("torch")

from dyadic_interaction_modeling_tpu.render.generator import FaceGenerator
from dyadic_interaction_modeling_tpu.render.import_torch import (
    flax_face_generator_to_torch,
    torch_face_generator_to_flax,
)

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason="reference tree not present")


def _ref_face_generator():
    pir = REFERENCE_ROOT + "/Pirender"
    if pir not in sys.path:
        sys.path.insert(0, pir)
    # face_model does ``from util import flow_util`` - make sure a stale
    # non-Pirender ``util`` module isn't cached from another parity test
    u = sys.modules.get("util")
    if u is not None and "Pirender" not in (getattr(u, "__file__", "") or ""):
        del sys.modules["util"]
    from generators.face_model import FaceGenerator as TorchFaceGenerator

    torch.manual_seed(0)
    gen = TorchFaceGenerator()
    gen.eval()
    return gen


def _inputs(rng):
    img = rng.randn(1, 64, 64, 3).astype(np.float32)
    drv = rng.randn(1, 58, 27).astype(np.float32)
    return img, drv


def _torch_forward(gen, img, drv):
    with torch.no_grad():
        out = gen(torch.from_numpy(img.transpose(0, 3, 1, 2)),
                  torch.from_numpy(drv))
    return {k: v.numpy() for k, v in out.items()}


@pytest.mark.slow
def test_import_forward_parity_vs_reference_module():
    gen = _ref_face_generator()
    img, drv = _inputs(np.random.RandomState(1))
    ref = _torch_forward(gen, img, drv)

    params = torch_face_generator_to_flax(gen.state_dict())
    ours = FaceGenerator().apply({"params": params}, jnp.asarray(img),
                                 jnp.asarray(drv))
    for key in ("flow_field", "warp_image", "fake_image"):
        got = np.asarray(ours[key]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, ref[key], rtol=2e-4, atol=2e-4,
                                   err_msg=key)


@pytest.mark.slow
def test_export_loads_strict_and_roundtrips():
    gen = _ref_face_generator()
    params = torch_face_generator_to_flax(gen.state_dict())
    sd = flax_face_generator_to_torch(params)

    gen2 = _ref_face_generator()
    missing, unexpected = gen2.load_state_dict(
        {k: torch.from_numpy(v.copy()) for k, v in sd.items()}, strict=True)
    assert not missing and not unexpected
    for k, v in gen.state_dict().items():
        np.testing.assert_allclose(gen2.state_dict()[k].numpy(), v.numpy(),
                                   rtol=1e-6, atol=1e-6, err_msg=k)

    # import(export(p)) == p exactly
    params2 = torch_face_generator_to_flax(sd)

    import jax

    flat1 = {jax.tree_util.keystr(k): v for k, v in
             jax.tree_util.tree_leaves_with_path(params)}
    flat2 = {jax.tree_util.keystr(k): v for k, v in
             jax.tree_util.tree_leaves_with_path(params2)}
    assert set(flat1) == set(flat2)
    for k in flat1:
        np.testing.assert_array_equal(np.asarray(flat1[k]),
                                      np.asarray(flat2[k]), err_msg=k)


@pytest.mark.slow
def test_spectral_norm_checkpoint_resolves_effective_weight():
    gen = _ref_face_generator()
    conv = gen.warpping_net.hourglass.encoder.encoder0.conv_0
    torch.nn.utils.spectral_norm(conv)
    gen.eval()
    sd = gen.state_dict()
    assert "warpping_net.hourglass.encoder.encoder0.conv_0.weight_orig" in sd

    img, drv = _inputs(np.random.RandomState(2))
    ref = _torch_forward(gen, img, drv)
    params = torch_face_generator_to_flax(sd)
    ours = FaceGenerator().apply({"params": params}, jnp.asarray(img),
                                 jnp.asarray(drv))
    got = np.asarray(ours["fake_image"]).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref["fake_image"], rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_render_inference_cli_torch_checkpoint(tmp_path):
    """render_inference --torch-checkpoint consumes a reference-layout .pt
    (synthesized here via the exporter) and renders frames with the imported
    weights - the reference-user path: released renderer -> TPU inference."""
    import jax

    from dyadic_interaction_modeling_tpu.cli.render_inference import main

    model = FaceGenerator(flame_coeff_nc=56, coeff_nc=73)
    rng = np.random.RandomState(0)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32)),
        jnp.asarray(rng.randn(1, 56, 27).astype(np.float32)))["params"]
    sd = flax_face_generator_to_torch(params)
    ckpt = str(tmp_path / "ref_checkpoint.pt")
    torch.save({"net_G_ema": {k: torch.from_numpy(v.copy())
                              for k, v in sd.items()}}, ckpt)

    out = main(["--torch-checkpoint", ckpt, "--synthetic",
                "--out", str(tmp_path / "out"), "--resolution", "64"])
    assert out["fake_image"].shape[0] == 6
    assert (tmp_path / "out" / "fake" / "00000.png").exists()
    assert (tmp_path / "out" / "warp" / "00000.png").exists()


def test_strict_key_accounting():
    sd = {"mapping_net.pre.weight": np.zeros((73, 58, 1), np.float32)}
    with pytest.raises(KeyError, match="missing key"):
        torch_face_generator_to_flax(sd)
