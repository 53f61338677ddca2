"""Flow-field warping (reference: ``code/Pirender/util/flow_util.py``).

``convert_flow_to_deformation`` normalises pixel flow to [-1, 1] offsets and
adds the identity grid (flow_util.py:3-15); ``warp_image`` bilinearly samples
the source image at the deformed grid with torch ``grid_sample`` semantics
(align_corners=False, zero padding - flow_util.py:41-56).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def make_coordinate_grid(h: int, w: int, dtype=jnp.float32) -> Array:
    """Identity grid in [-1, 1], shape (h, w, 2) ordered (x, y)."""
    x = 2 * (jnp.arange(w, dtype=dtype) / (w - 1)) - 1
    y = 2 * (jnp.arange(h, dtype=dtype) / (h - 1)) - 1
    xx = jnp.tile(x[None, :], (h, 1))
    yy = jnp.tile(y[:, None], (1, w))
    return jnp.stack([xx, yy], axis=-1)


def convert_flow_to_deformation(flow: Array) -> Array:
    """flow: (B, H, W, 2) pixel offsets (x, y) -> sampling grid in [-1, 1]."""
    b, h, w, _ = flow.shape
    flow_norm = 2 * jnp.stack([flow[..., 0] / (w - 1), flow[..., 1] / (h - 1)],
                              axis=-1)
    grid = make_coordinate_grid(h, w, flow.dtype)
    return grid[None] + flow_norm


def grid_sample_bilinear(image: Array, grid: Array) -> Array:
    """torch.nn.functional.grid_sample(align_corners=False, padding='zeros').

    image: (B, H, W, C); grid: (B, Hg, Wg, 2) in [-1, 1] (x, y) order.
    """
    b, h, w, c = image.shape
    gx = (grid[..., 0] + 1) * w / 2 - 0.5
    gy = (grid[..., 1] + 1) * h / 2 - 0.5
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = gx - x0
    wy = gy - y0

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        flat = image.reshape(b, h * w, c)
        idx = yi_c * w + xi_c  # (B, Hg, Wg)
        vals = jnp.take_along_axis(
            flat, idx.reshape(b, -1, 1).astype(jnp.int32), axis=1)
        vals = vals.reshape(idx.shape + (c,))
        return vals * valid[..., None].astype(image.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wx = wx[..., None].astype(image.dtype)
    wy = wy[..., None].astype(image.dtype)
    return (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
            + v10 * (1 - wx) * wy + v11 * wx * wy)


def warp_image(source_image: Array, deformation: Array) -> Array:
    """source: (B, H, W, C); deformation (B, Hd, Wd, 2) - resized bilinearly
    to the image size if needed (flow_util.py:50-56)."""
    b, h, w, c = source_image.shape
    hd, wd = deformation.shape[1:3]
    if (hd, wd) != (h, w):
        deformation = jax.image.resize(deformation, (b, h, w, 2), method="bilinear")
    return grid_sample_bilinear(source_image, deformation)
