"""LR schedulers for SSL pretraining.

Counterpart of /root/reference/examples/self_supervised_learning/lr_schedulers/
(_linear_decay.py:5-27) as optax schedules.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["linear_decay_schedule", "tri_stage_schedule"]


def linear_decay_schedule(base_lr: float, warmup_updates: int, max_updates: int):
    """Linear warmup to base_lr, then linear decay to 0 at max_updates."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(warmup_updates, 1)
        pct_remaining = (max_updates - step) / jnp.maximum(max_updates - warmup_updates, 1)
        lr = jnp.where(step <= warmup_updates, warm, pct_remaining)
        return base_lr * jnp.clip(lr, 0.0, 1.0)

    return schedule


def tri_stage_schedule(base_lr: float, warmup: int, hold: int, decay: int,
                       init_scale: float = 0.01, final_scale: float = 0.05):
    """fairseq-style tri-stage schedule used by wav2vec2 fine-tuning."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = init_scale + (1 - init_scale) * step / jnp.maximum(warmup, 1)
        decay_pct = jnp.clip((step - warmup - hold) / jnp.maximum(decay, 1), 0.0, 1.0)
        decayed = jnp.exp(jnp.log(final_scale) * decay_pct)
        scale = jnp.where(step < warmup, warm, jnp.where(step < warmup + hold, 1.0, decayed))
        return base_lr * scale

    return schedule
