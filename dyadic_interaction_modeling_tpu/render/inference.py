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


def render_windows(model: FaceGenerator, params, source_image: np.ndarray,
                   windows: np.ndarray, batch_size: int = 8
                   ) -> Dict[str, np.ndarray]:
    """Render precomputed (T, C, W) semantic windows against one source
    frame (the VoxVideoDataset contract). Pads the last block so one jitted
    program serves every clip length."""
    t = windows.shape[0]

    @jax.jit
    def fwd(params, imgs, sems):
        out = model.apply({"params": params}, imgs, sems)
        return out["fake_image"], out["warp_image"]

    src = jnp.tile(jnp.asarray(source_image)[None], (batch_size, 1, 1, 1))
    fakes, warps = [], []
    for i in range(0, t, batch_size):
        block = windows[i: i + batch_size]
        n = block.shape[0]
        if n < batch_size:
            block = np.concatenate(
                [block, np.repeat(block[-1:], batch_size - n, axis=0)])
        fake, warp = fwd(params, src, jnp.asarray(block))
        fakes.append(np.asarray(fake)[:n])
        warps.append(np.asarray(warp)[:n])
    return {"fake_image": np.concatenate(fakes),
            "warp_image": np.concatenate(warps)}


def to_uint8_video(video: np.ndarray) -> np.ndarray:
    """(T, H, W, 3) in [-1, 1] -> uint8, the write2video conversion
    (Pirender/inference.py:44-46; clipped here - the reference clamps
    fake/warp upstream and trusts gt to be in range)."""
    return ((np.clip(video, -1, 1) + 1) / 2.0 * 255.0).astype(np.uint8)


def write_reenactment_video(out_base: str, *videos: np.ndarray,
                            fps: int = 15) -> str:
    """Twin of ``write2video`` (Pirender/inference.py:40-60): concatenate
    the given (T, H, W, 3) videos side by side (reference order: gt, warp,
    fake) and write ``{out_base}.mp4`` at 15 fps via cv2, falling back to a
    ``{out_base}/`` PNG frame dir when cv2 is absent (this image has no
    OpenCV). Returns the path written."""
    cat = np.concatenate([to_uint8_video(v) for v in videos], axis=2)
    try:
        import cv2  # pragma: no cover - not in this image

        out_name = out_base + ".mp4"
        h, w = cat.shape[1:3]
        out = cv2.VideoWriter(out_name, cv2.VideoWriter_fourcc(*"mp4v"),
                              fps, (w, h))
        for frame in cat:
            out.write(frame[:, :, ::-1])
        out.release()
        return out_name
    except ImportError:
        from PIL import Image

        os.makedirs(out_base, exist_ok=True)
        for i, frame in enumerate(cat):
            Image.fromarray(frame).save(os.path.join(out_base, f"{i:05d}.png"))
        return out_base


def render_video_reenactment(model: FaceGenerator, params, dataset,
                             out_dir: str, batch_size: int = 8,
                             max_videos: int = 0, logger=None) -> list:
    """The reenactment demo loop (Pirender/inference.py:99-125): for each
    test video render every frame from the (same- or cross-id) source frame
    and write a gt|warp|fake side-by-side video. ``dataset`` is a
    ``render.data.VoxVideoDataset``. Returns the written paths."""
    os.makedirs(out_dir, exist_ok=True)
    written = []
    n = len(dataset) if not max_videos else min(max_videos, len(dataset))
    for _ in range(n):
        data = dataset.load_next_video()
        out = render_windows(model, params, data["source_image"],
                             data["target_semantics"], batch_size=batch_size)
        path = write_reenactment_video(
            os.path.join(out_dir, data["video_name"].replace("/", "_")),
            data["target_images"], out["warp_image"], out["fake_image"])
        if logger:
            logger.info(f"write results to video {path}")
        written.append(path)
    return written


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
