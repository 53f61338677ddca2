import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dyadic_interaction_modeling_tpu.render.flow import (
    convert_flow_to_deformation,
    grid_sample_bilinear,
    make_coordinate_grid,
    warp_image,
)
from dyadic_interaction_modeling_tpu.render.generator import (
    ADAIN,
    FaceGenerator,
    LayerNorm2d,
    MappingNet,
)
from dyadic_interaction_modeling_tpu.render.data import (
    FramePairDataset,
    semantic_window,
    synthetic_render_dataset,
)
from dyadic_interaction_modeling_tpu.render.perceptual import (
    PerceptualLoss,
    VGG19Features,
    VGG19_TAPS,
)
from dyadic_interaction_modeling_tpu.render.trainer import FaceTrainer, ema_update


def test_grid_sample_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    img = rng.randn(2, 3, 8, 10).astype(np.float32)  # NCHW for torch
    grid = rng.uniform(-1.2, 1.2, (2, 6, 7, 2)).astype(np.float32)
    ref = torch.nn.functional.grid_sample(
        torch.tensor(img), torch.tensor(grid), align_corners=False).numpy()
    ours = np.asarray(grid_sample_bilinear(
        jnp.asarray(img.transpose(0, 2, 3, 1)), jnp.asarray(grid)))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-5)


def test_flow_warp_matches_torch_reference_semantics():
    """End-to-end flow->deformation->warp vs the reference's torch math.

    NOTE: the reference builds the grid with align_corners=True coordinates
    but samples with grid_sample's default align_corners=False, so zero flow
    is NOT an identity warp - we reproduce that exactly.
    """
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    img = rng.randn(1, 3, 16, 16).astype(np.float32)
    flow = rng.randn(1, 2, 16, 16).astype(np.float32) * 2

    # reference math (flow_util.py:3-56) in torch
    tf = torch.tensor(flow)
    w, h = 16, 16
    flow_norm = 2 * torch.cat([tf[:, :1] / (w - 1), tf[:, 1:] / (h - 1)], 1)
    xs = 2 * (torch.arange(w) / (w - 1)) - 1
    ys = 2 * (torch.arange(h) / (h - 1)) - 1
    grid = torch.stack([xs[None, :].repeat(h, 1), ys[:, None].repeat(1, w)], -1)
    deform_t = grid[None] + flow_norm.permute(0, 2, 3, 1)
    ref = torch.nn.functional.grid_sample(torch.tensor(img), deform_t,
                                          align_corners=False).numpy()

    deform = convert_flow_to_deformation(jnp.asarray(flow.transpose(0, 2, 3, 1)))
    out = warp_image(jnp.asarray(img.transpose(0, 2, 3, 1)), deform)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)


def test_mapping_net_window_math():
    m = MappingNet(flame_coeff_nc=58, coeff_nc=73, descriptor_nc=64, layer=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 58, 27))
    params = m.init(jax.random.PRNGKey(1), x)
    out = m.apply(params, x)
    assert out.shape == (2, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_layernorm2d_and_adain():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4)) * 3 + 1
    ln = LayerNorm2d(4)
    p = ln.init(jax.random.PRNGKey(1), x)
    y = np.asarray(ln.apply(p, x))
    assert abs(y.mean()) < 1e-3 and abs(y.std() - 1) < 1e-2
    ad = ADAIN(4)
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 16))
    p = ad.init(jax.random.PRNGKey(3), x, z)
    out = np.asarray(ad.apply(p, x, z))
    assert out.shape == x.shape and np.isfinite(out).all()


def test_face_generator_end_to_end():
    model = FaceGenerator(flame_coeff_nc=58, coeff_nc=73, descriptor_nc=64,
                          mapping_layers=2)
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3), minval=-1,
                             maxval=1)
    coeffs = jax.random.normal(jax.random.PRNGKey(1), (1, 58, 27))
    params = model.init(jax.random.PRNGKey(2), img, coeffs)
    out = model.apply(params, img, coeffs)
    assert out["fake_image"].shape == (1, 64, 64, 3)
    assert out["warp_image"].shape == (1, 64, 64, 3)
    assert out["flow_field"].shape[-1] == 2
    assert np.isfinite(np.asarray(out["fake_image"])).all()
    assert np.asarray(out["fake_image"]).max() <= 1.0  # tanh output
    # warp stage skips the editing net
    out_warp = model.apply(params, img, coeffs, "warp")
    assert "fake_image" not in out_warp


def test_vgg19_taps_and_perceptual():
    assert VGG19_TAPS["relu_1_1"] == 0
    assert VGG19_TAPS["relu_5_1"] == 12
    loss = PerceptualLoss(layers=("relu_1_1", "relu_2_1"), num_scales=2,
                          rng=jax.random.PRNGKey(0))
    a = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3), minval=-1, maxval=1)
    b = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 3), minval=-1, maxval=1)
    la = float(loss(a, a))
    lab = float(loss(a, b))
    assert la < 1e-5 and lab > la


def test_semantic_window_clamping():
    coeffs = np.arange(10)[:, None].repeat(3, 1).astype(np.float32)
    w = semantic_window(coeffs, 0, 2)
    assert w.shape == (3, 5)
    np.testing.assert_allclose(w[0], [0, 0, 0, 1, 2])  # clamped at start
    w2 = semantic_window(coeffs, 9, 2)
    np.testing.assert_allclose(w2[0], [7, 8, 9, 9, 9])


def test_face_trainer_two_stage_smoke():
    model = FaceGenerator(flame_coeff_nc=58, coeff_nc=73, descriptor_nc=32,
                          mapping_layers=2)
    ds = synthetic_render_dataset(n_clips=2, frames_per_clip=4, resolution=32)
    sample = next(ds.batches(2, 1))
    params = model.init(jax.random.PRNGKey(0), sample["source_image"],
                        sample["source_semantics"])
    trainer = FaceTrainer(model, params, pretrain_warp_iteration=2,
                          perceptual_network="l1", save_dir="/tmp/test_pirender")
    losses_seen = []
    for batch in ds.batches(2, 4):
        losses_seen.append(trainer.optimize_parameters(batch))
    # first two steps: warp stage only
    assert "perceptual_final" not in losses_seen[0]
    assert "perceptual_final" in losses_seen[-1]
    assert all(np.isfinite(l["total_loss"]) for l in losses_seen)
    # checkpoint + resume
    trainer.save()
    trainer2 = FaceTrainer(model, params, perceptual_network="l1",
                           save_dir="/tmp/test_pirender")
    assert trainer2.load_latest()
    assert trainer2.iteration == trainer.iteration


def test_ema_update():
    p = {"w": jnp.ones(3)}
    e = {"w": jnp.zeros(3)}
    out = ema_update(e, p, 0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1, rtol=1e-6)


def test_render_inference_roundtrip(tmp_path):
    from dyadic_interaction_modeling_tpu.postprocess import export_emoca_dirs
    from dyadic_interaction_modeling_tpu.render.inference import render_coeff_dir

    coeffs = np.random.RandomState(0).randn(12, 56)
    clip_dir = export_emoca_dirs(str(tmp_path), "clipA", coeffs, smooth_window=None)
    model = FaceGenerator(flame_coeff_nc=56, coeff_nc=73, descriptor_nc=32,
                          mapping_layers=2)
    src = np.random.RandomState(1).uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(src)[None],
                        jnp.zeros((1, 56, 27)))["params"]
    out = render_coeff_dir(model, params, src, clip_dir,
                           out_dir=str(tmp_path / "rendered"))
    assert out["fake_image"].shape == (12, 32, 32, 3)
    import os

    assert len(os.listdir(tmp_path / "rendered" / "fake")) == 12


def test_perceptual_distance_lpips_style():
    from dyadic_interaction_modeling_tpu.render.metrics import PerceptualDistance

    d = PerceptualDistance(rng=jax.random.PRNGKey(0))
    a = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3), minval=-1, maxval=1)
    b = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3), minval=-1, maxval=1)
    daa = np.asarray(d(a, a))
    dab = np.asarray(d(a, b))
    assert daa.shape == (2,)
    assert (daa < 1e-6).all() and (dab > daa).all()
