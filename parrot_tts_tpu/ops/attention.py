"""Multi-head attention matching torch.nn.MultiheadAttention semantics.

The reference TTE wraps `nn.MultiheadAttention(d_model, n_head, bias=False,
batch_first=True)` behind an extra bias-free qkv Linear and a trailing wo
Linear (`/root/reference/modules/fft.py:41-59`) — i.e. queries/keys/values are
projected TWICE (qkv then MHA's own in_proj) and outputs twice (out_proj then
wo). That quirk is load-bearing for unit-exact parity (SURVEY.md §7), so the
op exposes the inner MHA exactly; the double projection lives in the FFT
block module.

Layout: (B, T, D) with D on lanes. At reference scale (T <= 3500, d_head 128)
XLA's fused softmax-attention is already MXU-bound; a Pallas flash-attention
path can slot in behind the same signature for longer sequences.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    in_proj: jnp.ndarray,
    out_proj: jnp.ndarray,
    n_head: int,
    *,
    key_padding_mask: jnp.ndarray | None = None,
    dropout_p: float = 0.0,
    dropout_rng: jax.Array | None = None,
    deterministic: bool = True,
    precision=None,
) -> jnp.ndarray:
    """torch F.multi_head_attention_forward with bias-free projections.

    Args:
      q, k, v: (B, T, D).
      in_proj: (D, 3D) packed projection, native (in, out) layout —
        `from_torch_linear(in_proj_weight)` of torch's (3D, D).
      out_proj: (D, D) native layout.
      key_padding_mask: (B, T) bool, True = IGNORE that key (torch
        convention; the reference passes `~src_mask`, modules/parrot.py:97).
    """
    b, t, d = q.shape
    if d % n_head:
        raise ValueError(f"d_model {d} % n_head {n_head} != 0")
    d_head = d // n_head

    wq, wk, wv = jnp.split(in_proj, 3, axis=1)
    qp = jnp.einsum("btd,de->bte", q, wq, precision=precision)
    kp = jnp.einsum("btd,de->bte", k, wk, precision=precision)
    vp = jnp.einsum("btd,de->bte", v, wv, precision=precision)

    def heads(x):
        return x.reshape(b, -1, n_head, d_head).transpose(0, 2, 1, 3)

    qp, kp, vp = heads(qp), heads(kp), heads(vp)     # (B, H, T, dh)

    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", qp, kp, precision=precision
    ) / math.sqrt(d_head)
    if key_padding_mask is not None:
        scores = jnp.where(key_padding_mask[:, None, None, :], NEG_INF, scores)

    attn = jax.nn.softmax(scores, axis=-1)
    if dropout_p > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_p, attn.shape)
        attn = jnp.where(keep, attn / (1.0 - dropout_p), 0.0)

    out = jnp.einsum("bhqk,bhkd->bhqd", attn, vp, precision=precision)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
    return jnp.einsum("btd,de->bte", out, out_proj, precision=precision)
