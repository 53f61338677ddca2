"""PIRender data (reference: ``code/Pirender/data/vox_dataset.py``).

* ``semantic_window``: coefficient window of radius ``semantic_radius`` around
  a frame, clamped at clip boundaries (vox_dataset.py obtain_seq_index
  semantics) -> (C_coeff, 2r + 1),
* ``FramePairDataset``: source/target frame pairs from the same clip with a
  minimal sample distance, images in [-1, 1] NHWC,
* ``synthetic_render_dataset``: structurally identical generated data for
  smoke tests (no licensed video data needed).
"""

from __future__ import annotations

import os
import random
from typing import Dict, Sequence

import numpy as np


def semantic_window(coeffs: np.ndarray, frame_index: int, radius: int) -> np.ndarray:
    """(T, C) coefficients -> (C, 2r+1) window centered at frame, indices
    clamped to the clip (the reference clamps via max/min)."""
    t = coeffs.shape[0]
    idx = [min(max(i, 0), t - 1)
           for i in range(frame_index - radius, frame_index + radius + 1)]
    return coeffs[idx].T.astype(np.float32)


class FramePairDataset:
    """Items: dict(source_image, target_image, source_semantics,
    target_semantics) - the FaceTrainer batch contract."""

    def __init__(self, clips: Sequence[Dict], semantic_radius: int = 13,
                 minimal_sample_distance: int = 1, seed: int = 0):
        """clips: list of {'frames': (T, H, W, 3) in [-1, 1],
        'coeffs': (T, C)}."""
        self.clips = list(clips)
        self.radius = semantic_radius
        self.min_dist = minimal_sample_distance
        self.rng = random.Random(seed)

    def __len__(self):
        return len(self.clips)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        clip = self.clips[index]
        t = clip["frames"].shape[0]
        i = self.rng.randrange(t)
        j = self.rng.randrange(t)
        while abs(i - j) < self.min_dist and t > self.min_dist:
            j = self.rng.randrange(t)
        return {
            "source_image": clip["frames"][i],
            "target_image": clip["frames"][j],
            "source_semantics": semantic_window(clip["coeffs"], i, self.radius),
            "target_semantics": semantic_window(clip["coeffs"], j, self.radius),
        }

    def batches(self, batch_size: int, steps: int):
        import jax.numpy as jnp

        for _ in range(steps):
            items = [self[self.rng.randrange(len(self))] for _ in range(batch_size)]
            yield {k: jnp.asarray(np.stack([it[k] for it in items]))
                   for k in items[0]}


def synthetic_render_dataset(n_clips: int = 2, frames_per_clip: int = 8,
                             resolution: int = 64, coeff_dim: int = 58,
                             semantic_radius: int = 13,
                             seed: int = 0) -> FramePairDataset:
    rng = np.random.default_rng(seed)
    clips = []
    for _ in range(n_clips):
        base = rng.uniform(-0.5, 0.5, (1, resolution, resolution, 3))
        drift = rng.normal(0, 0.05, (frames_per_clip, 1, 1, 3))
        frames = np.clip(base + drift, -1, 1).astype(np.float32)
        coeffs = rng.normal(0, 0.3, (frames_per_clip, coeff_dim)).astype(np.float32)
        clips.append({"frames": frames, "coeffs": coeffs})
    return FramePairDataset(clips, semantic_radius=semantic_radius)


def load_coeff_dir_clip(clip_dir: str, pose_first: bool = True) -> np.ndarray:
    """Read an exported EMOCA coefficient dir ({frame}/pose.npy, exp.npy, ...)
    back into (T, 56+) coefficients - the inference input format
    (Pirender/inference_newmodel.py)."""
    frames = []
    for d in sorted(os.listdir(clip_dir)):
        fd = os.path.join(clip_dir, d)
        if not os.path.isdir(fd):
            continue
        pose = np.load(os.path.join(fd, "pose.npy"))
        exp = np.load(os.path.join(fd, "exp.npy"))
        parts = [pose, exp] if pose_first else [exp, pose]
        for extra in ("cam", "shape"):
            p = os.path.join(fd, f"{extra}.npy")
            if os.path.exists(p):
                parts.append(np.load(p).reshape(-1))
        frames.append(np.concatenate(parts, axis=0))
    return np.asarray(frames, dtype=np.float32)


def load_clip_dirs(root: str, frames_subdir: str = "frames",
                   coeffs_subdir: str = "coeffs", resolution: int = 256,
                   max_clips: int = 0) -> list:
    """Read real render-training clips from disk into FramePairDataset items.

    Layout (one directory per clip, the ViCo/VoxCeleb export convention):

        root/<clip_id>/frames/00000.png ...     RGB frames
        root/<clip_id>/coeffs/<frame>/pose.npy, exp.npy[, cam.npy, shape.npy]

    Frames load to [-1, 1] NHWC at ``resolution``; coefficients via
    ``load_coeff_dir_clip`` (the postprocess/emoca2flame export layout, so a
    rendered prediction dir is directly trainable). Clips shorter than 2
    frames or with frame/coeff length mismatch are skipped (the reference's
    broad-except convention).
    """
    from PIL import Image

    clips = []
    for clip_id in sorted(os.listdir(root)):
        cdir = os.path.join(root, clip_id)
        fdir = os.path.join(cdir, frames_subdir)
        codir = os.path.join(cdir, coeffs_subdir)
        if not (os.path.isdir(fdir) and os.path.isdir(codir)):
            continue
        names = sorted(f for f in os.listdir(fdir)
                       if f.endswith((".png", ".jpg", ".jpeg")))
        coeffs = load_coeff_dir_clip(codir)
        n = min(len(names), coeffs.shape[0])
        if n < 2:
            continue
        frames = np.stack([
            np.asarray(Image.open(os.path.join(fdir, f)).convert("RGB")
                       .resize((resolution, resolution)), np.float32)
            / 127.5 - 1.0
            for f in names[:n]])
        clips.append({"frames": frames, "coeffs": coeffs[:n]})
        if max_clips and len(clips) >= max_clips:
            break
    return clips
