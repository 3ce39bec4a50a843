"""Parameter initializers matching PyTorch defaults.

The reference relies on torch's default inits everywhere except the HiFi-GAN
normal(0, 0.01) conv init (`/root/reference/utils/vocoder/utils.py:32-35`).
Matching init distributions keeps training dynamics comparable when
reproducing reference loss curves.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def kaiming_uniform(key, shape, fan_in: int, dtype=jnp.float32) -> jnp.ndarray:
    """torch default for Conv*/Linear weights: kaiming_uniform(a=sqrt(5)),
    which reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def uniform_fan_in(key, shape, fan_in: int, dtype=jnp.float32) -> jnp.ndarray:
    """torch default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    return kaiming_uniform(key, shape, fan_in, dtype)


def xavier_uniform(key, shape, fan_in: int, fan_out: int, dtype=jnp.float32):
    """torch nn.MultiheadAttention in_proj init."""
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def normal(key, shape, mean: float = 0.0, std: float = 1.0, dtype=jnp.float32):
    return mean + std * jax.random.normal(key, shape, dtype)


def hifigan_conv(key, shape, dtype=jnp.float32) -> jnp.ndarray:
    """HiFi-GAN `init_weights`: N(0, 0.01) (reference utils/vocoder/utils.py:32-35)."""
    return normal(key, shape, 0.0, 0.01, dtype)


def embedding(key, shape, padding_idx: int | None = None, dtype=jnp.float32):
    """torch nn.Embedding default N(0,1); `padding_idx` row zeroed
    (reference modules/parrot.py:21 uses padding_idx=src_pad_idx)."""
    emb = jax.random.normal(key, shape, dtype)
    if padding_idx is not None:
        emb = emb.at[padding_idx].set(0.0)
    return emb
