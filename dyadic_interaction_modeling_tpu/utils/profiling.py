"""Tracing / profiling (L0 aux, SURVEY.md section 5).

The reference only tracks data/batch wall-clock with AverageMeters
(train_vq.py:174-229) plus PIRender's opt-in per-phase ``speed_benchmark``
(Pirender/trainers/base.py:82-87,330-358). Here:

* ``StepTimer`` - per-phase timing meters with ETA, fenced correctly for the
  axon platform (device_get, since block_until_ready can return early),
* ``trace`` - context manager around ``jax.profiler`` emitting TensorBoard-
  loadable traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

from .logging import AverageMeter


def fence(tree) -> None:
    """Reliable device fence for timing on the axon platform: reduce each
    array to a scalar ON DEVICE and transfer only that (block_until_ready can
    return early; device_get of large tensors is tunnel-bound)."""
    import jax
    import jax.numpy as jnp

    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "shape"):
            float(jnp.sum(leaf.astype(jnp.float32)))


class StepTimer:
    """Per-phase meters (data / forward+backward / eval) with ETA."""

    def __init__(self, max_iter: Optional[int] = None):
        self.meters: Dict[str, AverageMeter] = {}
        self.max_iter = max_iter
        self._t0 = time.perf_counter()
        self.iteration = 0

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            fence(sync)
        self.meters.setdefault(name, AverageMeter()).update(time.perf_counter() - t0)

    def tick(self) -> None:
        self.iteration += 1

    def summary(self) -> str:
        parts = [f"{k} {m.avg * 1000:.1f}ms" for k, m in self.meters.items()]
        if self.max_iter and self.iteration:
            per_iter = (time.perf_counter() - self._t0) / self.iteration
            remain = per_iter * (self.max_iter - self.iteration)
            parts.append(f"eta {remain / 60:.1f}min")
        return " | ".join(parts)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/dim_tpu_trace"):
    """jax.profiler trace window (open with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
