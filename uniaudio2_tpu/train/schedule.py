"""LR schedules.

``warmup_lr`` reproduces the reference's `WarmupLR`
(`/root/reference/llm_utils/train_utils.py:207-244`):
``lr * warmup^0.5 * min(step^-0.5, step * warmup^-1.5)`` — peak equals the
base lr at ``step == warmup_steps``. Expressed as an optax-compatible
schedule function (step -> lr).

The scheduler registry mirrors the reference's `abs_scheduler` indirection
(`llm_utils/abs_scheduler.py:6-81`) using optax's schedule combinators.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp
import optax


def warmup_lr(base_lr: float, warmup_steps: int = 25000) -> optax.Schedule:
    w = float(warmup_steps)

    def schedule(step):
        s = jnp.maximum(step.astype(jnp.float32) + 1.0, 1.0)
        return base_lr * (w ** 0.5) * jnp.minimum(s ** -0.5, s * (w ** -1.5))

    return schedule


def noam_lr(base_lr: float, model_size: int, warmup_steps: int = 25000) -> optax.Schedule:
    w = float(warmup_steps)

    def schedule(step):
        s = jnp.maximum(step.astype(jnp.float32) + 1.0, 1.0)
        return base_lr * (model_size ** -0.5) * jnp.minimum(s ** -0.5, s * (w ** -1.5))

    return schedule


def cosine_lr(base_lr: float, warmup_steps: int, total_steps: int,
              end_scale: float = 0.1) -> optax.Schedule:
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=base_lr, warmup_steps=warmup_steps,
        decay_steps=total_steps, end_value=base_lr * end_scale,
    )


SCHEDULES: Dict[str, Callable[..., optax.Schedule]] = {
    "warmuplr": warmup_lr,
    "noamlr": noam_lr,
    "cosine": cosine_lr,
}


def get_schedule(name: str, **kwargs) -> optax.Schedule:
    key = name.lower()
    if key not in SCHEDULES:
        raise ValueError(f"unknown schedule {name!r}; known: {sorted(SCHEDULES)}")
    return SCHEDULES[key](**kwargs)
