"""Static-shape length regulator (FastSpeech2 expand-by-duration).

The reference implements this as a per-sample Python loop of
`repeat_interleave` + pad (`/root/reference/modules/duration.py:6-24`) — a
data-dependent-shape pattern that cannot compile under jit. The TPU-native
redesign: token index of output frame t is `searchsorted(cumsum(dur), t,
right)`, a pure gather into a bucket-padded output length. One vectorized
gather replaces the loop; frames beyond sum(dur) are zero-filled exactly like
the reference's `F.pad(..., 0.0)`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def length_regulator(
    x: jnp.ndarray,
    durations: jnp.ndarray,
    out_len: int,
    *,
    inclusive_mask: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Expand encoder states by per-token durations.

    Args:
      x: (B, S, D) encoder states.
      durations: (B, S) int frame counts (padding tokens carry 0).
      out_len: static output length (bucket >= max total duration).
      inclusive_mask: reproduce the reference's `ids <= length` off-by-one
        (`modules/data.py:18`, used on the inference path via
        `get_mask_from_lengths`) — the returned mask then has length+1 True
        positions (clipped to out_len).

    Returns:
      expanded: (B, out_len, D) with zeros beyond each sample's total.
      mask: (B, out_len) bool, True = valid frame.
    """
    durations = durations.astype(jnp.int32)
    cum = jnp.cumsum(durations, axis=1)               # (B, S)
    t = jnp.arange(out_len, dtype=jnp.int32)          # (T,)

    # idx[b, t] = #(cum[b, :] <= t): frame t comes from token idx
    idx = jax.vmap(lambda c: jnp.searchsorted(c, t, side="right"))(cum)
    total = cum[:, -1]
    valid = t[None, :] < total[:, None]
    idx = jnp.minimum(idx, x.shape[1] - 1)

    expanded = jnp.take_along_axis(x, idx[:, :, None], axis=1)
    expanded = jnp.where(valid[:, :, None], expanded, 0.0)

    if inclusive_mask:
        mask = t[None, :] <= total[:, None]
    else:
        mask = valid
    return expanded, mask


def durations_from_log_pred(log_dur_pred: jnp.ndarray) -> jnp.ndarray:
    """Inference-time duration rounding `clamp(round(exp(p) - 1), min=0)`
    (reference modules/parrot.py:82-86). `jnp.round` matches torch.round's
    round-half-to-even."""
    return jnp.maximum(jnp.round(jnp.exp(log_dur_pred) - 1.0), 0.0).astype(jnp.int32)
