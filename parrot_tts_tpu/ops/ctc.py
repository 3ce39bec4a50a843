"""CTC loss with torch semantics (the aligner's objective).

Reference: `torch.nn.CTCLoss()` with default blank=0, reduction='mean'
(`/root/reference/utils/aligner/trainer.py:21,60-63`) — torch's 'mean'
divides each sample's loss by its TARGET length before averaging. Built on
optax's log-space forward algorithm (ctc_loss), which is jit/grad-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def ctc_loss_torch_mean(
    logits: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    labels: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank_id: int = 0,
) -> jnp.ndarray:
    """Args:
      logits: (B, T, V) unnormalized scores.
      logit_lengths: (B,) valid frame counts.
      labels: (B, L) int labels (blank_id never appears in labels).
      label_lengths: (B,) valid label counts.
    """
    t = logits.shape[1]
    l = labels.shape[1]
    logit_pad = (jnp.arange(t)[None, :] >= logit_lengths[:, None]).astype(
        jnp.float32)
    label_pad = (jnp.arange(l)[None, :] >= label_lengths[:, None]).astype(
        jnp.float32)
    per_seq = optax.ctc_loss(logits, logit_pad, labels, label_pad,
                             blank_id=blank_id)
    return jnp.mean(per_seq / jnp.maximum(label_lengths, 1))
