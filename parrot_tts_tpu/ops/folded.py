"""Folded (space-to-depth) conv algebra for lane-starved tail stages.

The vocoder's tail runs T up to 80k frames at 16-32 channels (reference
`utils/vocoder/models.py:95-111`, stage channels 512/2^i). A plain NWC conv
puts C on the TPU lane dimension, so at C=16 both the MXU contraction dim
(Cin) and output dim (Cout) use 16 of 128 lanes — ~1/64 utilization.

Fix: keep the activations PERMANENTLY in a folded layout
``(B, T, C) -> (B, T/g, g*C)`` with ``g*C >= 128``. In row-major
channels-last memory this reshape is FREE (identical bytes):
``x[b, g*tb + p, c] == xf[b, tb, p*C + c]``. Every stride-1 conv (any
dilation, any same-length padding) on the unfolded sequence is EXACTLY a
conv on the folded sequence with a block-Toeplitz-packed kernel:

    y[g*t + p, co] = sum_j x[g*t + p + d*j - Pl, ci] * w[j, ci, co]
    let o = p + d*j - Pl,  q = floor(o/g),  r = o - g*q:
    yf[t, p*Co+co] = sum_q xf[t+q, r*Ci+ci] * Wb[q, r*Ci+ci, p*Co+co]

so XLA sees a standard 128+-channel conv and tiles it onto full MXU passes.
FLOPs inflate by Kb*g/k (structured zeros in Wb) but utilization rises by
(128/C)^2 — a large net win for C <= 32 (measured: see PERF.md).

Transposed convs compose with the polyphase lowering in `ops/conv.py`
(itself a stride-1 conv producing u*Cout channels), and the natural nesting
of (block p, phase phi) reproduces the canonical folded layout with
g_out = g_in * u — so one fold at the tail entry carries through every
upsample with zero repacking. This replaces the per-conv `retiled_conv1d`
approach whose patch materialization was measured 2.5x slower end-to-end.

Reference hot loop this accelerates: `utils/vocoder/models.py:13-44,95-111`
(MRF ResBlock stacks + conv_post at stages C=32, C=16).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from parrot_tts_tpu.ops import conv as conv_ops


def fold(x: jnp.ndarray, g: int) -> jnp.ndarray:
    """(B, T, C) -> (B, T/g, g*C). Free in row-major memory."""
    if g == 1:
        return x
    b, t, c = x.shape
    assert t % g == 0, (t, g)
    return x.reshape(b, t // g, g * c)


def unfold(x: jnp.ndarray, g: int) -> jnp.ndarray:
    """(B, Tb, g*C) -> (B, Tb*g, C). Free in row-major memory."""
    if g == 1:
        return x
    b, tb, gc = x.shape
    assert gc % g == 0, (gc, g)
    return x.reshape(b, tb * g, gc // g)


def _fold_plan(k: int, dilation: int, pad_left: int, g: int):
    """Static scatter plan: S[kappa, r, p, j] = 1 iff unfolded tap j of
    output phase p reads folded block offset kappa+qmin at intra-block
    position r."""
    p = np.arange(g)[:, None]
    j = np.arange(k)[None, :]
    o = p + dilation * j - pad_left          # (g, k) unfolded input offset
    q = o // g                                # floor div (negatives ok)
    r = o - g * q
    qmin = int(q.min())
    qmax = int(q.max())
    kb = qmax - qmin + 1
    s = np.zeros((kb, g, g, k), np.float32)
    pp, jj = np.broadcast_arrays(p, j)
    s[(q - qmin).ravel(), r.ravel(), pp.ravel(), jj.ravel()] = 1.0
    return kb, qmin, s


def fold_conv1d_kernel(w: jnp.ndarray, *, dilation: int, pad_left: int,
                       g: int):
    """Pack a stride-1 conv kernel (K, Ci, Co) into the folded block kernel
    (Kb, g*Ci, g*Co) plus the block-axis (pad_l, pad_r). Requires the conv
    to be same-length: pad_left + pad_right == dilation*(K-1)."""
    k, ci, co = w.shape
    kb, qmin, s = _fold_plan(k, dilation, pad_left, g)
    # Wb[kappa, r*Ci+ci, p*Co+co] = sum_j S[kappa,r,p,j] * w[j,ci,co]
    wb = jnp.einsum("krpj,jio->kripo", jnp.asarray(s, w.dtype), w,
                    precision=jax.lax.Precision.HIGHEST)
    wb = wb.reshape(kb, g * ci, g * co)
    return wb, (-qmin, qmin + kb - 1)


def folded_conv1d(xf: jnp.ndarray, w: jnp.ndarray,
                  b: jnp.ndarray | None = None, *, g: int,
                  padding: int = 0, dilation: int = 1,
                  precision=None, quant: bool = False) -> jnp.ndarray:
    """conv1d(unfold(xf), w, padding, dilation) folded by g, computed
    without leaving the folded layout. Same-length convs only
    (2*padding == dilation*(K-1)), which covers every MRF/post conv.
    quant=True runs the packed conv on the int8 MXU path (ops/quant.py)."""
    k = w.shape[0]
    assert 2 * padding == dilation * (k - 1), (k, padding, dilation)
    wb, (pl, pr) = fold_conv1d_kernel(w, dilation=dilation, pad_left=padding,
                                      g=g)
    if quant:
        from parrot_tts_tpu.ops import quant as quant_ops

        return quant_ops.int8_conv_nwc(
            xf, wb, jnp.tile(b, g) if b is not None else None,
            pads=(pl, pr))
    y = jax.lax.conv_general_dilated(
        xf, wb.astype(xf.dtype),
        window_strides=(1,),
        padding=((pl, pr),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32 if xf.dtype == jnp.float32 else None,
        precision=precision,
    )
    if b is not None:
        y = y + jnp.tile(b, g)
    return y


def _fold_plan_strided(k: int, stride: int, pad_left: int, f: int):
    """Scatter plan for a STRIDED conv folded by f (output folds by
    f_out = f/stride): S[q, r, p, j] = 1 iff tap j of output phase p reads
    folded block offset q+qmin at intra-block position r
    (o = stride*p + j - pad_left)."""
    assert f % stride == 0, (f, stride)
    f_out = f // stride
    p = np.arange(f_out)[:, None]
    j = np.arange(k)[None, :]
    o = stride * p + j - pad_left
    q = o // f
    r = o - f * q
    qmin, qmax = int(q.min()), int(q.max())
    kb = qmax - qmin + 1
    s = np.zeros((kb, f, f_out, k), np.float32)
    pp, jj = np.broadcast_arrays(p, j)
    s[(q - qmin).ravel(), r.ravel(), pp.ravel(), jj.ravel()] = 1.0
    return kb, qmin, s


def folded_grouped_conv1d(x: jnp.ndarray, w: jnp.ndarray,
                          b: jnp.ndarray | None = None, *, stride: int,
                          padding: int, groups: int, f: int,
                          precision=None) -> jnp.ndarray:
    """Strided GROUPED conv computed in a time-folded layout.

    The MSD's k=41 convs contract only ci/groups (8..64) of the MXU's 128
    lanes; its backward measured ~10 TF/s (scripts/exp_msd_bisect.py).
    Folding time by f makes the per-group contraction f*(ci/g) (pick f so
    that's 128) and the per-group output f_out*(co/g), at a
    Kb*f_out*stride/k ~= 1.1-2x FLOP inflation — measured 2.1-3.2x faster
    dW at the MSD shapes (scripts/exp_msd_folded.py).

    x: (B, T, Ci) canonical channels-last (T % f == 0); w: (K, Ci/g, Co)
    with out channels group-major (the grouped-conv kernel layout);
    returns canonical (B, T//stride, Co). Exact vs the grouped conv
    (rel ~1e-7, tests/test_conv.py).
    """
    bsz, t, ci = x.shape
    k, cig, co = w.shape
    g = groups
    cog = co // g
    assert ci == cig * g, (x.shape, w.shape, g)
    f_out = f // stride
    t_out = (t + 2 * padding - k) // stride + 1
    # the fold computes ceil(t/stride) rows then slices; it is a pure
    # output relayout only when t_out <= ceil(t/stride)
    assert t_out <= -(-t // stride), (t, k, stride, padding)

    # ragged T: right-pad with zeros to a multiple of f — identical
    # semantics to the conv's own zero padding for the first t_out rows
    t_pad = -(-t // f) * f
    if t_pad != t:
        x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))

    kb, qmin, s = _fold_plan_strided(k, stride, padding, f)
    pl_, pr_ = -qmin, qmin + kb - 1

    # group-major fold: (B,T,C) -> (B,T/f,f,g,cig) -> (B,T/f,g,f,cig)
    xf = x.reshape(bsz, t_pad // f, f, g, cig)
    xf = jnp.transpose(xf, (0, 1, 3, 2, 4)).reshape(bsz, t_pad // f,
                                                    g * f * cig)

    # block kernel: Wb[q, (r,i), (gi,p,o)] = sum_j S[q,r,p,j] w[j,i,gi,o]
    w4 = w.reshape(k, cig, g, cog)
    wb = jnp.einsum("qrpj,jigo->qrigpo", jnp.asarray(s, w.dtype), w4,
                    precision=jax.lax.Precision.HIGHEST)
    wb = wb.reshape(kb, f * cig, g * f_out * cog)

    yf = jax.lax.conv_general_dilated(
        xf, wb, window_strides=(1,), padding=((pl_, pr_),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=g, precision=precision)

    # back to canonical: (B,Tb,(g,p,o)) -> (B,Tb,p,g,o) -> (B,T',Co)
    tb = yf.shape[1]
    y5 = yf.reshape(bsz, tb, g, f_out, cog)
    y = jnp.transpose(y5, (0, 1, 3, 2, 4)).reshape(bsz, tb * f_out, co)
    y = y[:, :t_out]
    if b is not None:
        y = y + b
    return y


def folded_conv_transpose1d(xf: jnp.ndarray, w: jnp.ndarray,
                            b: jnp.ndarray | None = None, *, g_in: int,
                            stride: int, padding: int,
                            precision=None, quant: bool = False) -> jnp.ndarray:
    """ConvTranspose1d on a g_in-folded input, producing a
    (g_in*stride)-folded output directly (no unfold/refold).

    Uses the polyphase lowering (transposed conv == stride-1 conv emitting
    stride*Cout phase-major channels, `ops/conv.py`), then block-folds that
    conv by g_in. Output channel nesting (p, phi, co) == canonical folded
    layout at g_out = g_in*stride. Requires the vocoder's upsample
    configuration K - 2*padding == stride (reference models.py:85-91)."""
    k, cin, cout = w.shape
    u = stride
    assert k - 2 * padding == u, (k, padding, u)
    w2, pad_left, q_len = conv_ops.polyphase_weights(w, u, padding)
    # w2: (q_len, Cin, u*Cout), same-length conv with pads
    # (pad_left, q_len-1-pad_left) — fold it by g_in.
    wb, (pl, pr) = fold_conv1d_kernel(w2, dilation=1, pad_left=pad_left,
                                      g=g_in)
    if quant:
        from parrot_tts_tpu.ops import quant as quant_ops

        return quant_ops.int8_conv_nwc(
            xf, wb, jnp.tile(b, g_in * u) if b is not None else None,
            pads=(pl, pr))
    y = jax.lax.conv_general_dilated(
        xf, wb.astype(xf.dtype),
        window_strides=(1,),
        padding=((pl, pr),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32 if xf.dtype == jnp.float32 else None,
        precision=precision,
    )
    if b is not None:
        y = y + jnp.tile(b, g_in * u)
    return y
