"""Convolution ops with PyTorch-exact semantics in TPU-native layouts.

The reference's hot loops bottom out in cuDNN Conv1d / ConvTranspose1d /
Conv2d (`/root/reference/utils/vocoder/models.py:17-28,75-91,177-182`,
`modules/fft.py:62-82`, `modules/duration.py:51-78`). Here every conv runs in
channels-last (NWC / NHWC) layout — channels on the TPU lane dimension — via
`lax.conv_general_dilated`, which XLA tiles onto the MXU directly.

Kernel storage layout is (K, Cin/groups, Cout) ("WIO"); `from_torch_*`
helpers convert PyTorch state-dict layouts. Output-size semantics (padding,
dilation, transposed-conv `(k-u)//2` padding) match torch exactly — an
off-by-one here destroys mel-allclose parity (SURVEY.md §7 hard parts).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def conv1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    *,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    groups: int = 1,
    precision=None,
    quant: bool = False,
) -> jnp.ndarray:
    """torch.nn.functional.conv1d on (B, T, Cin) with w (K, Cin/groups, Cout).
    quant=True (stride 1, no groups) runs the int8 MXU path (ops/quant.py)."""
    if quant:
        assert stride == 1 and groups == 1, "int8 path: stride-1 dense only"
        from parrot_tts_tpu.ops import quant as quant_ops

        return quant_ops.int8_conv_nwc(x, w, b, pads=(padding, padding),
                                       rhs_dilation=dilation)
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=((padding, padding),),
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
        precision=precision,
    )
    if b is not None:
        out = out + b
    return out


_WARNED_QUANT_FALLBACK: set = set()


def _warn_quant_fallback(k: int, stride: int, padding: int) -> None:
    """One-time signal when a quant request cannot use the packed int8
    path (all shipped configs satisfy K - 2*padding == stride, so this
    only fires on custom upsample topologies)."""
    key = (k, stride, padding)
    if key not in _WARNED_QUANT_FALLBACK:
        _WARNED_QUANT_FALLBACK.add(key)
        import warnings

        warnings.warn(
            f"conv_transpose1d(K={k}, stride={stride}, padding={padding}): "
            "quant=True requires K - 2*padding == stride (polyphase "
            "packing); this layer runs the float lowering instead")


def conv_transpose1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    *,
    stride: int = 1,
    padding: int = 0,
    precision=None,
    polyphase: bool = True,
    quant: bool = False,
) -> jnp.ndarray:
    """torch.nn.ConvTranspose1d on (B, T, Cin), w (K, Cin, Cout).

    Torch semantics: out_len = (T-1)*stride - 2*padding + K. Two lowerings:

    * polyphase (default when K - 2*padding == stride, the vocoder's
      upsample configuration): the K-tap zero-inserting deconvolution is
      repacked as ONE dense conv with ceil(K/stride) taps producing
      stride*Cout channels, then a depth-to-time reshape — stride x fewer
      MACs and no multiply-by-zero work on the MXU.
    * general: fractionally-strided conv via lhs_dilation with the
      spatially-flipped kernel.

    Both match the reference's 5-stage x320 upsample
    (utils/vocoder/models.py:85-91) bit-for-bit up to fp reassociation.
    """
    k = w.shape[0]
    if polyphase and stride > 1 and k - 2 * padding == stride:
        return _conv_transpose1d_polyphase(x, w, b, stride, padding,
                                           precision, quant=quant)
    # quant needs the polyphase packing (stride-1 NWC form); topologies
    # outside K - 2*padding == stride fall back to the float lowering
    if quant:
        _warn_quant_fallback(k, stride, padding)
    w_flip = jnp.flip(w, axis=0)
    out = jax.lax.conv_general_dilated(
        x,
        w_flip,
        window_strides=(1,),
        padding=((k - 1 - padding, k - 1 - padding),),
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
        precision=precision,
    )
    if b is not None:
        out = out + b
    return out


def _polyphase_plan(k: int, u: int, pad: int):
    """Static packing plan. Phase p of the output (o = t*u + p) reads input
    taps j = j0_p + m*u with j0_p = (p+pad) % u, shifted by
    s_p = (p+pad-j0_p)//u:  out[t*u+p] = sum_m x[t+s_p-m] * w[j0_p+m*u]."""
    j0 = [(p + pad) % u for p in range(u)]
    m_taps = [-(-(k - j) // u) for j in j0]            # ceil((k-j0)/u)
    s = [(p + pad - j0[p]) // u for p in range(u)]
    pad_left = max(m_taps[p] - 1 - s[p] for p in range(u))
    q_len = pad_left + max(s) + 1
    return j0, m_taps, s, pad_left, q_len


def polyphase_weights(w, stride, padding):
    """Pack a transposed-conv kernel (K, Cin, Cout) into the equivalent
    stride-1 conv kernel (q_len, Cin, stride*Cout) emitting phase-major
    channels, plus its left pad. Used by both the polyphase lowering below
    and the folded-tail algebra (`ops/folded.py`)."""
    k, cin, cout = w.shape
    u = stride
    j0, m_taps, s, pad_left, q_len = _polyphase_plan(k, u, padding)

    # W2[q, ci, p, co] = w[j0_p + (pad_left + s_p - q)*u, ci, co] (or 0)
    q_idx = np.arange(q_len)[:, None]                  # (Q, 1)
    m = np.asarray([pad_left + s[p] for p in range(u)])[None, :] - q_idx
    j = np.asarray(j0)[None, :] + m * u                # (Q, u)
    valid = (m >= 0) & (m < np.asarray(m_taps)[None, :])
    j_safe = np.where(valid, j, 0)

    w2 = jnp.take(w, jnp.asarray(j_safe.reshape(-1)), axis=0)
    w2 = w2.reshape(q_len, u, cin, cout)
    w2 = jnp.where(jnp.asarray(valid)[:, :, None, None], w2, 0)
    w2 = w2.transpose(0, 2, 1, 3).reshape(q_len, cin, u * cout)
    return w2, pad_left, q_len


def _conv_transpose1d_polyphase(x, w, b, stride, padding, precision,
                                quant=False):
    k, cin, cout = w.shape
    u = stride
    w2, pad_left, q_len = polyphase_weights(w, u, padding)

    if quant:
        from parrot_tts_tpu.ops import quant as quant_ops

        y = quant_ops.int8_conv_nwc(x, w2, None,
                                    pads=(pad_left, q_len - 1 - pad_left))
        bsz, t = x.shape[0], x.shape[1]
        out = y.reshape(bsz, t * u, cout)
        if b is not None:
            out = out + b
        return out
    y = jax.lax.conv_general_dilated(
        x, w2.astype(w.dtype),
        window_strides=(1,),
        padding=((pad_left, q_len - 1 - pad_left),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
        precision=precision,
    )                                                   # (B, T, u*Cout)
    bsz, t = x.shape[0], x.shape[1]
    out = y.reshape(bsz, t * u, cout)
    if b is not None:
        out = out + b
    return out


def retiled_conv1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    *,
    dilation: int = 1,
    padding: int = 0,
    group_size: int = 8,
    precision=None,
) -> jnp.ndarray:
    """conv1d for LANE-STARVED channel counts (Cout << 128).

    The vocoder's tail stages run T up to 80k frames at 16-32 channels —
    a plain conv puts Cout on the MXU lane dim and wastes ~90% of each pass.
    This lowering computes G consecutive output frames per matmul row
    instead: patches (B, T/G, W*Cin) @ block-Toeplitz weights
    (W*Cin, G*Cout) with W = G + (K-1)*dilation, so the lane dim becomes
    G*Cout (pick G so G*Cout ~ 128). FLOPs inflate by W/K but MXU
    utilization rises by G — a net win for small channels. Patches are built
    from three shifted block views (pure slicing, no gather).

    Requires T % G == 0 (always true for the vocoder's x320 chain) and
    W <= 3G. Output matches conv1d(stride=1) exactly.
    """
    k, cin, cout = w.shape
    bsz, t, _ = x.shape
    g = group_size
    win = g + (k - 1) * dilation
    if t % g or win > 3 * g:
        return conv1d(x, w, b, padding=padding, dilation=dilation,
                      precision=precision)

    # pad so that block t covers x[g*t - padding : g*t - padding + win]
    pad_r = max(0, win - g - padding)
    xp = jnp.pad(x, ((0, 0), (padding, pad_r), (0, 0)))
    xp = xp[:, : t + padding + pad_r]
    nb = (t + padding + pad_r) // g
    extra = (t + padding + pad_r) - nb * g
    if extra:
        xp = jnp.pad(xp, ((0, 0), (0, g - extra), (0, 0)))
        nb += 1
    blocks = xp.reshape(bsz, nb, g, cin)

    zero = jnp.zeros_like(blocks[:, :1])
    nxt = jnp.concatenate([blocks[:, 1:], zero], axis=1)
    nxt2 = jnp.concatenate([blocks[:, 2:], zero, zero], axis=1)
    patches = jnp.concatenate([blocks, nxt, nxt2], axis=2)[:, : t // g, :win]
    patches = patches.reshape(bsz, t // g, win * cin)

    # W2[(delta, ci), (r, co)] = w[(delta - r)/dilation, ci, co]
    delta = np.arange(win)[:, None]
    r = np.arange(g)[None, :]
    j, rem = np.divmod(delta - r, dilation)
    valid = (rem == 0) & (j >= 0) & (j < k)
    j_safe = np.where(valid, j, 0)
    w2 = jnp.take(w, jnp.asarray(j_safe.reshape(-1)), axis=0)
    w2 = w2.reshape(win, g, cin, cout)
    w2 = jnp.where(jnp.asarray(valid)[:, :, None, None], w2, 0)
    w2 = w2.transpose(0, 2, 1, 3).reshape(win * cin, g * cout)

    y = jnp.einsum("btp,pq->btq", patches, w2, precision=precision,
                   preferred_element_type=jnp.float32
                   if x.dtype == jnp.float32 else None)
    y = y.reshape(bsz, t, cout).astype(x.dtype)
    if b is not None:
        y = y + b
    return y


def smart_conv1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    *,
    padding: int = 0,
    dilation: int = 1,
    precision=None,
) -> jnp.ndarray:
    """conv1d that retiles lane-starved shapes (Cout <= 32) onto full MXU
    lanes; plain conv otherwise. retiled_conv1d falls back by itself when
    the window would span more than 3 blocks (heavy dilation)."""
    cout = w.shape[2]
    if cout <= 32:
        g = max(8, 128 // max(cout, 1))
        if x.shape[1] % g == 0:
            return retiled_conv1d(x, w, b, dilation=dilation, padding=padding,
                                  group_size=g, precision=precision)
    return conv1d(x, w, b, padding=padding, dilation=dilation,
                  precision=precision)


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    *,
    stride: tuple[int, int] = (1, 1),
    padding: tuple[int, int] = (0, 0),
    precision=None,
) -> jnp.ndarray:
    """torch.nn.functional.conv2d on (B, H, W, Cin) with w (Kh, Kw, Cin, Cout).
    Used by the period discriminators (reference models.py:177-182)."""
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=((padding[0], padding[0]), (padding[1], padding[1])),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
        precision=precision,
    )
    if b is not None:
        out = out + b
    return out


def avg_pool1d(x: jnp.ndarray, kernel: int, stride: int, padding: int) -> jnp.ndarray:
    """torch.nn.AvgPool1d(count_include_pad=True) on (B, T, C)
    (reference MSD mean-pool pyramid, models.py:258)."""
    s = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        window_dimensions=(1, kernel, 1),
        window_strides=(1, stride, 1),
        padding=((0, 0), (padding, padding), (0, 0)),
    )
    return s / kernel


def get_padding(kernel_size: int, dilation: int = 1) -> int:
    """'same'-style padding helper (reference utils/vocoder/utils.py:44-45)."""
    return (kernel_size * dilation - dilation) // 2


def conv1d_out_len(t: int, k: int, stride: int = 1, padding: int = 0,
                   dilation: int = 1) -> int:
    return (t + 2 * padding - dilation * (k - 1) - 1) // stride + 1


def conv_transpose1d_out_len(t: int, k: int, stride: int, padding: int) -> int:
    return (t - 1) * stride - 2 * padding + k


# ---------------------------------------------------------------------------
# PyTorch layout conversion
# ---------------------------------------------------------------------------


def from_torch_conv1d(w: np.ndarray) -> np.ndarray:
    """torch (Cout, Cin/groups, K) -> native (K, Cin/groups, Cout)."""
    return np.transpose(np.asarray(w), (2, 1, 0))


def from_torch_conv_transpose1d(w: np.ndarray) -> np.ndarray:
    """torch (Cin, Cout, K) -> native (K, Cin, Cout)."""
    return np.transpose(np.asarray(w), (2, 0, 1))


def from_torch_conv2d(w: np.ndarray) -> np.ndarray:
    """torch (Cout, Cin, Kh, Kw) -> native (Kh, Kw, Cin, Cout)."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def from_torch_linear(w: np.ndarray) -> np.ndarray:
    """torch (Out, In) -> native (In, Out)."""
    return np.transpose(np.asarray(w), (1, 0))
