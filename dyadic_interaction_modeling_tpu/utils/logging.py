"""Logging / meters / small filesystem helpers (L0).

Parity targets: ``get_logger`` / ``AverageMeter`` / ``main_process`` /
``check_makedirs`` in ``/root/reference/code/base/utilities.py:24-66``.
On TPU, "main process" is ``jax.process_index() == 0`` instead of a
rank-within-node computation.
"""

from __future__ import annotations

import logging
import os


def get_logger(name: str = "main-logger") -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(logging.INFO)
    handler = logging.StreamHandler()
    fmt = "[%(asctime)s %(levelname)s %(filename)s line %(lineno)d %(process)d]=>%(message)s"
    handler.setFormatter(logging.Formatter(fmt))
    logger.addHandler(handler)
    logger.propagate = False
    return logger


class AverageMeter:
    """Computes and stores the average and current value."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


def check_makedirs(dir_name: str) -> None:
    os.makedirs(dir_name, exist_ok=True)


def main_process() -> bool:
    """True on the host that should log / checkpoint (process 0)."""
    import jax

    return jax.process_index() == 0
