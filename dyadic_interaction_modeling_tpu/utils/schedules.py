"""Learning-rate schedules (L0).

Parity targets: ``step_learning_rate`` / ``poly_learning_rate`` in
``/root/reference/code/base/baseTrainer.py:10-19``. Exposed both as plain
python functions (reference behavior) and as optax schedules for jitted
training loops.
"""

from __future__ import annotations

import optax


def step_learning_rate(base_lr: float, epoch: int, step_epoch: int, multiplier: float = 0.1) -> float:
    return base_lr * (multiplier ** (epoch // step_epoch))


def poly_learning_rate(base_lr: float, curr_iter: int, max_iter: int, power: float = 0.9) -> float:
    """Poly LR policy (baseTrainer.py:15-18)."""
    return base_lr * (1 - float(curr_iter) / max_iter) ** power


def make_lr_schedule(
    kind: str,
    base_lr: float,
    *,
    max_iter: int = 1,
    power: float = 0.9,
    step_size: int = 1,
    gamma: float = 0.5,
    warmup_steps: int = 0,
) -> optax.Schedule:
    """Build an optax schedule matching the reference policies.

    kind: 'constant' | 'poly' | 'step'. ``warmup_steps`` prepends a linear
    warmup (the reference config carries warmup_steps, config.yaml:41).
    """
    if kind == "constant":
        sched = optax.constant_schedule(base_lr)
    elif kind == "poly":
        sched = lambda count: base_lr * (1 - count / max_iter) ** power  # noqa: E731
    elif kind == "step":
        sched = lambda count: base_lr * gamma ** (count // step_size)  # noqa: E731
    else:
        raise ValueError(f"unknown schedule kind: {kind}")

    if warmup_steps and warmup_steps > 1:
        warmup = optax.linear_schedule(0.0, base_lr, warmup_steps)
        return optax.join_schedules([warmup, sched], [warmup_steps])
    return sched
