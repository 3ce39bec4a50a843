"""LR schedules matching the reference's.

- cosine warmup (TTE): `/root/reference/train.py:13-52`
  (linear warmup to init_lr, half-cosine decay to 0 over total steps).
- per-epoch exponential decay (vocoder): ExponentialLR gamma=lr_decay stepped
  once per epoch (`/root/reference/utils/vocoder/train.py:88-89,234-235`).
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_warmup_schedule(init_lr: float, warmup_steps: int,
                           total_steps: int, num_cycles: float = 0.5):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        progress = (step - warmup_steps) / jnp.maximum(
            1.0, total_steps - warmup_steps)
        cos = jnp.maximum(
            0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * num_cycles * 2.0 * progress)))
        return init_lr * jnp.where(step < warmup_steps, warm, cos)

    return schedule


def exponential_epoch_schedule(init_lr: float, gamma: float,
                               steps_per_epoch: int):
    """lr = init_lr * gamma^epoch with epoch = step // steps_per_epoch."""
    def schedule(step):
        epoch = jnp.asarray(step, jnp.float32) // steps_per_epoch
        return init_lr * jnp.power(gamma, epoch)

    return schedule
