"""PIRender batch inference (reference: ``code/Pirender/inference_newmodel.py``).

Renders a source frame driven by exported EMOCA coefficient windows into
fake/warp images per frame.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .data import load_coeff_dir_clip, semantic_window
from .generator import FaceGenerator


def render_clip(model: FaceGenerator, params, source_image: np.ndarray,
                coeffs: np.ndarray, semantic_radius: int = 13,
                batch_size: int = 8) -> Dict[str, np.ndarray]:
    """source_image (H, W, 3) in [-1, 1]; coeffs (T, C).

    Returns {'fake_image': (T,H,W,3), 'warp_image': (T,H,W,3)}."""
    t = coeffs.shape[0]
    windows = np.stack([semantic_window(coeffs, i, semantic_radius)
                        for i in range(t)])  # (T, C, W)

    @jax.jit
    def fwd(params, imgs, sems):
        out = model.apply({"params": params}, imgs, sems)
        return out["fake_image"], out["warp_image"]

    fakes, warps = [], []
    src = jnp.asarray(source_image)[None]
    for i in range(0, t, batch_size):
        w = jnp.asarray(windows[i: i + batch_size])
        imgs = jnp.tile(src, (w.shape[0], 1, 1, 1))
        fake, warp = fwd(params, imgs, w)
        fakes.append(np.asarray(fake))
        warps.append(np.asarray(warp))
    return {"fake_image": np.concatenate(fakes),
            "warp_image": np.concatenate(warps)}


def render_coeff_dir(model: FaceGenerator, params, source_image: np.ndarray,
                     clip_dir: str, out_dir: Optional[str] = None,
                     semantic_radius: int = 13) -> Dict[str, np.ndarray]:
    """Render an exported coefficient directory (postprocess.export_emoca_dirs
    / merge_biwi_to_emoca layout); optionally write PNG frames."""
    coeffs = load_coeff_dir_clip(clip_dir)
    out = render_clip(model, params, source_image, coeffs, semantic_radius)
    if out_dir:
        from PIL import Image

        for kind in ("fake_image", "warp_image"):
            kdir = os.path.join(out_dir, kind.split("_")[0])
            os.makedirs(kdir, exist_ok=True)
            for i, frame in enumerate(out[kind]):
                arr = ((np.clip(frame, -1, 1) + 1) * 127.5).astype(np.uint8)
                Image.fromarray(arr).save(os.path.join(kdir, f"{i:05d}.png"))
    return out
