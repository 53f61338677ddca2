"""Seeding (L0 aux, SURVEY.md section 5).

The reference seeds python/numpy/torch in PIRender
(``code/Pirender/util/trainer.py:19-30``) and carries ``manual_seed: 131`` in
the main config (config.yaml:54, never actually applied by train_vq - we DO
apply it). JAX randomness is functional, so the entry points derive a root
``PRNGKey`` here and split it explicitly everywhere.
"""

from __future__ import annotations

import random

import numpy as np


def set_random_seed(seed: int):
    """Seed host-side RNGs and return the root jax PRNGKey."""
    import jax

    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
