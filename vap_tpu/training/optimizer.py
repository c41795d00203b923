"""Optimizers and LR schedules (optax).

Mirrors finetrainers/optimizer.py:103-260: adam/adamw plus constant(+warmup),
linear, cosine(+restarts), polynomial, and piecewise-constant schedules.
The bitsandbytes 8-bit variants map to a TPU-native blockwise-int8 Adam
(vap_tpu/training/optim8bit.py); adafactor is also offered as the
factored-state memory-lean option.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import optax


def get_lr_schedule(
    name: str,
    lr: float,
    *,
    warmup_steps: int = 0,
    train_steps: int = 10000,
    num_cycles: float = 0.5,
    power: float = 1.0,
    milestones: Optional[Sequence[Tuple[int, float]]] = None,
):
    if name in ("constant", "constant_with_warmup"):
        if warmup_steps > 0:
            return optax.join_schedules(
                [optax.linear_schedule(0.0, lr, warmup_steps), optax.constant_schedule(lr)],
                [warmup_steps],
            )
        return optax.constant_schedule(lr)
    if name == "linear":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup_steps),
             optax.linear_schedule(lr, 0.0, max(1, train_steps - warmup_steps))],
            [warmup_steps],
        )
    if name == "cosine":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup_steps),
             optax.cosine_decay_schedule(lr, max(1, train_steps - warmup_steps), alpha=0.0)],
            [warmup_steps],
        )
    if name == "cosine_with_restarts":
        cycles = max(1, int(num_cycles))
        cycle_len = max(1, (train_steps - warmup_steps) // cycles)
        scheds = [optax.linear_schedule(0.0, lr, warmup_steps)]
        bounds = [warmup_steps]
        for c in range(cycles):
            scheds.append(optax.cosine_decay_schedule(lr, cycle_len, alpha=0.0))
            bounds.append(warmup_steps + (c + 1) * cycle_len)
        return optax.join_schedules(scheds, bounds[:-1])
    if name == "polynomial":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup_steps),
             optax.polynomial_schedule(lr, 0.0, power, max(1, train_steps - warmup_steps))],
            [warmup_steps],
        )
    if name == "piecewise_constant":
        assert milestones, "piecewise_constant needs milestones [(step, scale), ...]"
        return optax.piecewise_constant_schedule(lr, dict(milestones))
    raise ValueError(f"unknown lr schedule {name!r}")


def get_optimizer(
    name: str,
    schedule,
    *,
    beta1: float = 0.9,
    beta2: float = 0.99,
    epsilon: float = 1e-8,
    weight_decay: float = 1e-4,
    max_grad_norm: Optional[float] = 1.0,
) -> optax.GradientTransformation:
    if name == "adamw":
        tx = optax.adamw(schedule, b1=beta1, b2=beta2, eps=epsilon, weight_decay=weight_decay)
    elif name == "adam":
        tx = optax.adam(schedule, b1=beta1, b2=beta2, eps=epsilon)
    elif name in ("adamw-8bit", "adamw-bnb-8bit"):
        from .optim8bit import adamw_8bit

        tx = adamw_8bit(schedule, b1=beta1, b2=beta2, eps=epsilon,
                        weight_decay=weight_decay)
    elif name in ("adam-8bit", "adam-bnb-8bit"):
        from .optim8bit import adam_8bit

        tx = adam_8bit(schedule, b1=beta1, b2=beta2, eps=epsilon)
    elif name == "adafactor":
        tx = optax.adafactor(schedule)
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    if max_grad_norm:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx
