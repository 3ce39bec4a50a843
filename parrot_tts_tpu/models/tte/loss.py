"""TTE loss: CE over HuBERT codes + MSE on log-durations.

Reference: `/root/reference/modules/loss.py:5-21` — CrossEntropyLoss with
ignore_index = n_codes (the pad code) and MSELoss on log(dur + 1) masked to
real tokens.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tte_loss(
    logits: jnp.ndarray,
    log_dur_pred: jnp.ndarray,
    codes: jnp.ndarray,
    durations: jnp.ndarray,
    src_mask: jnp.ndarray,
    *,
    num_codes: int = 1000,
    sample_weight: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Args:
      logits: (B, T, num_codes); codes: (B, T) int with pad = num_codes.
      log_dur_pred: (B, S); durations: (B, S) int; src_mask: (B, S) True=valid.
      sample_weight: optional (B,) loss weights — 0.0 drops a row entirely
        (static-shape filler rows from the bucketed loader); weights scale
        both numerator and denominator so all-ones reproduces torch's
        masked-mean reductions exactly.

    Returns (total, code_loss, dur_loss) — means over unmasked elements,
    matching torch's default reductions.
    """
    # CE with ignore_index=num_codes (reference loss.py:10,17)
    code_valid = (codes != num_codes).astype(jnp.float32)
    dur_valid = src_mask.astype(jnp.float32)
    if sample_weight is not None:
        code_valid = code_valid * sample_weight[:, None]
        dur_valid = dur_valid * sample_weight[:, None]
    safe_codes = jnp.where(codes != num_codes, codes, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_codes[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(code_valid), 1.0)
    code_loss = jnp.sum(nll * code_valid) / denom

    # MSE on log(dur + 1) masked-select to valid tokens (loss.py:13-15)
    log_dur_tgt = jnp.log(durations.astype(jnp.float32) + 1.0)
    sq = jnp.square(log_dur_pred - log_dur_tgt)
    dur_denom = jnp.maximum(jnp.sum(dur_valid), 1.0)
    dur_loss = jnp.sum(sq * dur_valid) / dur_denom

    return code_loss + dur_loss, code_loss, dur_loss
