"""HiFi-GAN LSGAN / feature-matching / mel losses.

Reference: `/root/reference/utils/vocoder/models.py:279-310` + mel L1 x45
(`utils/vocoder/train.py:157`).
"""

from __future__ import annotations

import jax.numpy as jnp


def feature_loss(fmap_r, fmap_g) -> jnp.ndarray:
    """L1 over all feature maps, x2 (reference models.py:279-285)."""
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            # f32 reduction: stable regardless of disc compute dtype
            loss = loss + jnp.mean(jnp.abs(rl.astype(jnp.float32)
                                           - gl.astype(jnp.float32)))
    return loss * 2


def discriminator_loss(disc_real, disc_gen):
    """LSGAN D loss: mean((1-D(y))^2) + mean(D(y_hat)^2)
    (reference models.py:288-299). Returns (total, r_losses, g_losses)."""
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(disc_real, disc_gen):
        r = jnp.mean(jnp.square(1.0 - dr.astype(jnp.float32)))
        g = jnp.mean(jnp.square(dg.astype(jnp.float32)))
        loss = loss + r + g
        r_losses.append(r)
        g_losses.append(g)
    return loss, r_losses, g_losses


def generator_loss(disc_gen):
    """LSGAN G adversarial loss: mean((1-D(y_hat))^2)
    (reference models.py:302-310)."""
    loss = 0.0
    gen_losses = []
    for dg in disc_gen:
        l = jnp.mean(jnp.square(1.0 - dg.astype(jnp.float32)))
        gen_losses.append(l)
        loss = loss + l
    return loss, gen_losses


def mel_l1_loss(mel_real: jnp.ndarray, mel_gen: jnp.ndarray,
                weight: float = 45.0) -> jnp.ndarray:
    """L1 mel loss x45 (reference train.py:157)."""
    return jnp.mean(jnp.abs(mel_real - mel_gen)) * weight
