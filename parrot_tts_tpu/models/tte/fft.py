"""FFT (feed-forward transformer) block — the TTE's core layer.

Reference: `/root/reference/modules/fft.py`. Pre-LN block: MHA + 2-conv
position-wise FFN (kernels 9/1), residuals. Two reference quirks are
reproduced under `reference_compat` (SURVEY.md §7):

  * positional "encoding" adds ONE table row — `pe[seqlen]` — broadcast to
    every position instead of `pe[:seqlen]` (fft.py:17-19). Per-sample row
    indices are passed in so bucket-padded batches still add the row the
    reference's batch-1 inference would.
  * the double projection: a bias-free qkv Linear feeds nn.MultiheadAttention
    (which applies its own in_proj), and an extra wo Linear follows MHA's
    out_proj (fft.py:48-57).

Padding discipline (new, TPU-first): padded positions are zeroed at every
conv input, which makes outputs independent of the bucket size and exactly
equal to the reference's batch-size-1 decode (its canonical inference path,
/root/reference/inference.py:31-37) — reference batched outputs otherwise
depend on batch composition through conv pad leakage.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from parrot_tts_tpu.ops import attention as attn_ops
from parrot_tts_tpu.ops import conv as conv_ops
from parrot_tts_tpu.ops import init as init_ops


def sinusoidal_pos_table(max_len: int, d_model: int) -> np.ndarray:
    """Reference `positionalencoding1d` (modules/fft.py:21-38). Note the
    div_term uses arange(0, d_model, 2) * -(ln(10000)/d_model)."""
    if d_model % 2:
        raise ValueError("d_model must be even for sin/cos positional encoding")
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32) * -(math.log(10000.0) / d_model)
    )
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


def add_pos_emb(
    x: jnp.ndarray,
    pe: jnp.ndarray,
    lengths: jnp.ndarray | None,
    *,
    reference_compat: bool = True,
) -> jnp.ndarray:
    """Positional add. compat: per-sample `x + pe[length_b]` row broadcast
    (reference fft.py:17-19, where x.size(1) is that batch's max length —
    batch-1 inference makes it the sample's own length). clean: x + pe[:T].

    The PE table is built f32; follow x's dtype so bf16-compute passes
    don't silently promote every downstream op back to f32."""
    pe = pe.astype(x.dtype)
    if reference_compat:
        if lengths is None:
            row = pe[x.shape[1]]
            return x + row[None, None, :]
        rows = pe[jnp.clip(lengths, 0, pe.shape[0] - 1)]   # (B, D)
        return x + rows[:, None, :]
    return x + pe[None, : x.shape[1], :]


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               eps: float = 1e-5) -> jnp.ndarray:
    """torch nn.LayerNorm over the last dim."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


# ---------------------------------------------------------------------------
# FFT block params
# ---------------------------------------------------------------------------


def init_fft_block(key, d_model: int, n_filter: int,
                   kernel_sizes: tuple[int, int]) -> dict:
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    ks1, ks2 = kernel_sizes
    return {
        "attn": {
            # qkv / wo: torch nn.Linear default init (kaiming uniform)
            "qkv": init_ops.kaiming_uniform(k1, (d_model, 3 * d_model), d_model),
            # MHA packed in_proj: xavier_uniform (torch MHA reset_parameters)
            "in_proj": init_ops.xavier_uniform(
                k2, (d_model, 3 * d_model), d_model, 3 * d_model),
            # MHA out_proj: NonDynamicallyQuantizableLinear default (kaiming)
            "out_proj": init_ops.kaiming_uniform(k3, (d_model, d_model), d_model),
            "wo": init_ops.kaiming_uniform(k4, (d_model, d_model), d_model),
        },
        "conv1": {
            "w": init_ops.kaiming_uniform(
                k5, (ks1, d_model, n_filter), d_model * ks1),
            "b": init_ops.uniform_fan_in(
                jax.random.fold_in(k5, 1), (n_filter,), d_model * ks1),
        },
        "conv2": {
            "w": init_ops.kaiming_uniform(
                k6, (ks2, n_filter, d_model), n_filter * ks2),
            "b": init_ops.uniform_fan_in(
                jax.random.fold_in(k6, 1), (d_model,), n_filter * ks2),
        },
        "attn_norm": {"scale": jnp.ones((d_model,)), "bias": jnp.zeros((d_model,))},
        "conv_norm": {"scale": jnp.ones((d_model,)), "bias": jnp.zeros((d_model,))},
    }


def apply_fft_block(
    params: dict,
    x: jnp.ndarray,
    *,
    kernel_sizes: tuple[int, int],
    n_head: int,
    key_padding_mask: jnp.ndarray | None = None,
    dropout_p: float = 0.0,
    dropout_rng: jax.Array | None = None,
    deterministic: bool = True,
    precision=None,
) -> jnp.ndarray:
    """One FFT block (reference fft.py:94-99). key_padding_mask: True=IGNORE.

    Valid positions are zeroed into the conv path so outputs don't depend on
    bucket padding (see module docstring).
    """
    valid = None
    if key_padding_mask is not None:
        valid = (~key_padding_mask)[:, :, None].astype(x.dtype)   # (B,T,1)

    a = params["attn"]
    h = layer_norm(x, params["attn_norm"]["scale"], params["attn_norm"]["bias"])
    if "qkv" in a:
        q, k, v = jnp.split(
            jnp.einsum("btd,de->bte", h, a["qkv"], precision=precision),
            3, axis=-1)
        y = attn_ops.multi_head_attention(
            q, k, v, a["in_proj"], a["out_proj"], n_head,
            key_padding_mask=key_padding_mask, dropout_p=dropout_p,
            dropout_rng=dropout_rng, deterministic=deterministic,
            precision=precision)
        y = jnp.einsum("btd,de->bte", y, a["wo"], precision=precision)
    else:
        # serving-folded params (fold_attention_params): the reference's
        # double projections collapse into one in_proj and one out_proj
        y = attn_ops.multi_head_attention(
            h, h, h, a["in_proj"], a["out_proj"], n_head,
            key_padding_mask=key_padding_mask, dropout_p=dropout_p,
            dropout_rng=dropout_rng, deterministic=deterministic,
            precision=precision)
    h = x + y

    c = layer_norm(h, params["conv_norm"]["scale"], params["conv_norm"]["bias"])
    if valid is not None:
        c = c * valid
    ks1, ks2 = kernel_sizes
    c = conv_ops.conv1d(c, params["conv1"]["w"], params["conv1"]["b"],
                        padding=(ks1 - 1) // 2, precision=precision)
    c = jax.nn.relu(c)
    if valid is not None:
        c = c * valid
    c = conv_ops.conv1d(c, params["conv2"]["w"], params["conv2"]["b"],
                        padding=(ks2 - 1) // 2, precision=precision)
    out = h + c
    if valid is not None:
        out = out * valid
    return out
