"""Optimizers and LR schedules (optax).

Covers the reference's training hyperparameter surface: AdamW with weight
decay and betas (``finetune/full.py:30-42``, ``pretrain/redpajama.py:40-50``),
linear warmup for finetuning and warmup+cosine decay for pretraining
(``pretrain/redpajama.py:307-319``), and global-norm gradient clipping
(``pretrain/redpajama.py:189``).
"""

from __future__ import annotations

from typing import Optional

import optax


def warmup_cosine(
    learning_rate: float,
    warmup_steps: int,
    total_steps: int,
    min_lr: float = 0.0,
) -> optax.Schedule:
    """Linear warmup then cosine decay to ``min_lr`` — the pretrain schedule
    (``pretrain/redpajama.py:307-319``)."""
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=learning_rate,
        warmup_steps=warmup_steps,
        decay_steps=total_steps,
        end_value=min_lr,
    )


def warmup_constant(learning_rate: float, warmup_steps: int) -> optax.Schedule:
    """Linear warmup to a constant — the finetune schedule
    (``finetune/full.py:152-155``)."""
    schedules = [
        optax.linear_schedule(0.0, learning_rate, max(warmup_steps, 1)),
        optax.constant_schedule(learning_rate),
    ]
    return optax.join_schedules(schedules, [max(warmup_steps, 1)])


def adamw(
    schedule,
    weight_decay: float = 0.02,
    beta1: float = 0.9,
    beta2: float = 0.95,
    grad_clip: Optional[float] = 1.0,
) -> optax.GradientTransformation:
    tx = [
        optax.clip_by_global_norm(grad_clip) if grad_clip else optax.identity(),
        optax.adamw(schedule, b1=beta1, b2=beta2, weight_decay=weight_decay),
    ]
    return optax.chain(*tx)
