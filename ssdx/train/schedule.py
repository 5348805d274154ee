"""LR schedule + optimizer construction (optax).

Replaces the reference's ``get_cosine_schedule_with_warmup``
(SSD_trainer.py:1030-1113) and ``build_optimizer_and_scheduler`` (:1116-1172).
Same math: linear warmup 0 -> base_lr over ``warmup_steps``, then cosine decay
base_lr -> min_lr over the remaining steps; stepped once per optimizer step.
Optimizer: SGD with Nesterov momentum and decoupled-from-schedule L2 weight
decay added to the gradient before momentum, matching torch.optim.SGD
(SSD_trainer.py:1153-1159).
"""
from __future__ import annotations

import jax.numpy as jnp
import optax

__all__ = ["warmup_cosine_schedule", "build_optimizer"]


def warmup_cosine_schedule(
    base_lr: float,
    warmup_steps: int,
    total_steps: int,
    min_lr: float = 0.0,
) -> optax.Schedule:
    """LR(t) = base_lr * f(t) with the reference's exact factor function
    (SSD_trainer.py:1075-1111)."""
    if warmup_steps < 0:
        raise ValueError("warmup_steps must be >= 0")
    if total_steps <= 0:
        raise ValueError("total_steps must be > 0")
    if warmup_steps > total_steps:
        raise ValueError("warmup_steps cannot exceed total_steps")
    if min_lr > base_lr:
        raise ValueError("min_lr cannot be larger than base_lr")
    min_ratio = min_lr / base_lr if base_lr > 0 else 0.0

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        progress = (step - warmup_steps) / jnp.maximum(1.0, total_steps - warmup_steps)
        progress = jnp.clip(progress, 0.0, 1.0)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        factor = jnp.where(
            (step < warmup_steps) & (warmup_steps > 0),
            warm,
            min_ratio + (1.0 - min_ratio) * cos,
        )
        return base_lr * factor

    return schedule


def build_optimizer(
    steps_per_epoch: int,
    max_epochs: int = 150,
    warmup_epochs: int = 5,
    base_lr: float = 3e-3,
    min_lr: float = 1e-6,
    momentum: float = 0.9,
    weight_decay: float = 5e-3,
) -> tuple[optax.GradientTransformation, optax.Schedule]:
    """SGD(momentum, nesterov) + warmup-cosine, sized from steps_per_epoch
    like the reference (SSD_trainer.py:1161-1163).  Returns (tx, schedule)."""
    schedule = warmup_cosine_schedule(
        base_lr=base_lr,
        warmup_steps=warmup_epochs * steps_per_epoch,
        total_steps=max_epochs * steps_per_epoch,
        min_lr=min_lr,
    )
    tx = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(learning_rate=schedule, momentum=momentum, nesterov=True),
    )
    # Ravel the param pytree into ONE contiguous vector before the update:
    # the per-leaf chain otherwise lowers to hundreds of small kernels
    # (~170 leaves x several ops), measured at ~4 ms/step of pure dispatch
    # overhead on TPU at bs=16; flattened it is a handful of fused
    # full-width passes.  Numerics are identical; only the opt_state
    # layout changes (momentum is stored as one flat vector).
    return optax.flatten(tx), schedule
