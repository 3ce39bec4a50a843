"""Dynamic int8 quantized convolution for the vocoder serving path.

Why (measured, round 4 — PERF.md 4a, which RETRACTS the round-3 single-op
numbers as relay-dispatch-overhead artifacts): the v5e int8 MXU rate is
REAL and XLA-reachable — 332 TOP/s marginal = 1.70x the 196 TF/s bf16
rate (84% of the 394 nominal peak), and XLA's "decomposed" dynamic-int8
convs run ABOVE the bf16 conv rate at the MRF shape (211 vs 178 TF/s
marginal). The end-to-end serving gain (+12.6%, 5016->5647 A/B) therefore
comes from BOTH rate and halved activation HBM bytes; the folded-tail
shape is HBM-bound (~650 MB/call for the absmax+quantize+conv+dequant
chain), so the remaining serving levers are traffic — int8 inter-stage
activations, fusing quantize into producer epilogues — not rate.
Fidelity cost is measured and bounded on hardware
(scripts/tpu_parity_check.py). A hand Pallas int8 conv was built and
measured SLOWER than XLA's own lowering (ops/pallas_qconv.py, PERF.md 4b).

Scheme (standard symmetric dynamic PTQ):
  * weights: per-output-channel symmetric scales over the PACKED kernel
    (block-Toeplitz / polyphase packing happens first, quantization last,
    so every out lane of the actual matmul gets its own scale);
  * activations: per-BATCH-ROW dynamic absmax scales computed on device
    per call — no calibration corpus, robust to any checkpoint, and no
    cross-utterance coupling in batched serving;
  * accumulation in int32 on the MXU, dequantize fused into the epilogue:
    y = acc * (s_x * s_w[co]) + bias, then the usual leaky-relu / residual
    algebra continues in the compute dtype.

Every conv lowering in this codebase (plain NWC conv, the polyphase
transposed conv, the folded block-Toeplitz conv, the folded transposed
conv) bottoms out in ONE stride-1 NWC `lax.conv_general_dilated` on a
packed kernel, so this module only needs that single primitive.

Reference hot loop this accelerates: `/root/reference/utils/vocoder/
models.py:13-44,95-111` (the reference serves it in fp16-free f32 CUDA;
precision policy is ours to choose and to bound, like bf16 was).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# int8 symmetric range. 127 (not 128) keeps the grid symmetric so
# quantize(-x) == -quantize(x) and the MXU never sees -128.
QMAX = 127.0


def _absmax(x: jnp.ndarray, axes) -> jnp.ndarray:
    m = jnp.max(jnp.abs(x), axis=axes, keepdims=False)
    # guard all-zero operands: scale 1 maps 0 -> 0
    return jnp.where(m > 0, m, 1.0).astype(jnp.float32)


def quantize_per_tensor(x: jnp.ndarray):
    """x (any shape) -> (int8 values, scalar f32 scale)."""
    scale = _absmax(x, None) / QMAX
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -QMAX, QMAX)
    return q.astype(jnp.int8), scale


def quantize_per_row(x: jnp.ndarray):
    """x (B, T, C) -> (int8 values, (B, 1, 1) f32 scales).

    Per-BATCH-ROW scales: a conv mixes values only within one batch
    element, so each utterance gets its own scale — batched synthesis of
    a quiet utterance is not degraded by a loud batchmate, and batched vs
    serial synthesis of the same codes produce identical waveforms (the
    batch-invariance the float path is tested for)."""
    scale = (_absmax(x, (1, 2)) / QMAX)[:, None, None]
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -QMAX, QMAX)
    return q.astype(jnp.int8), scale


def quantize_per_out_channel(w: jnp.ndarray):
    """w (K, Ci, Co) -> (int8 values, (Co,) f32 scales)."""
    scale = _absmax(w, (0, 1)) / QMAX
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale[None, None, :]),
                 -QMAX, QMAX)
    return q.astype(jnp.int8), scale


def quantize_static(x: jnp.ndarray, scale) -> jnp.ndarray:
    """x (float) -> int8 with STATIC (data-independent) scales.

    The static-activation serving mode (PERF.md r5): scales are calibrated
    once per checkpoint, so the per-call absmax reduction pass disappears
    and XLA can fuse this quantize into the producing conv's epilogue —
    inter-stage tensors then cross HBM at 1 byte/element. `scale` is a
    (C,) per-channel vector (broadcast over (B, T, C)) or a scalar; values
    beyond scale*127 clip (the calibration margin bounds how often).
    Per-channel scales cost nothing at conv time: the consuming conv folds
    them into its weight quantization (int8_conv_qin)."""
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -QMAX, QMAX)
    return q.astype(jnp.int8)


def int8_conv_qin(
    xq: jnp.ndarray,
    sx,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    *,
    pads: tuple[int, int],
    rhs_dilation: int = 1,
) -> jnp.ndarray:
    """Stride-1 NWC conv on an ALREADY-int8 activation (static scales sx).

    xq: (B, T, Ci) int8; sx: (Ci,) per-channel scales (or scalar);
    w: (K, Ci, Co) float packed kernel. The activation scales fold into
    the weight before its per-out-channel quantization —
    conv(xq*sx, w) == conv(xq, w*sx[ci]) exactly, because sx is constant
    over the contraction's (K, T) window for each ci — so per-channel
    activation resolution is free at conv time (measured necessary:
    per-tensor scales cost ~5 dB SNR on the V1 generator, PERF.md r5).
    Returns (B, T', Co) float32 = acc * sw' + b for the caller's epilogue
    algebra (leaky/residual/requantize), which XLA fuses.

    The weight quantize deliberately stays IN-GRAPH per call rather than
    precomputed at calibration: (a) the whole V1 weight set is ~28 MB vs
    multi-GB activation traffic per serving batch, so the recompute is
    <2% of the budget (cost-analysis in scripts/exp_staticq_cost.py);
    (b) feeding pre-quantized int8 kernels as jit ARGUMENTS was the exact
    configuration round 3 measured hitting a pathological XLA conv
    lowering (PERF.md 3b row 3) — in-graph quantization keeps XLA on the
    fused int8 path it demonstrably handles well."""
    sx = jnp.asarray(sx, jnp.float32)
    w_eff = w.astype(jnp.float32) * (sx[None, :, None] if sx.ndim == 1
                                     else sx)
    wq, sw = quantize_per_out_channel(w_eff)
    acc = jax.lax.conv_general_dilated(
        xq, wq,
        window_strides=(1,),
        padding=(pads,),
        rhs_dilation=(rhs_dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * sw[None, None, :]
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y


def int8_conv_nwc(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    *,
    pads: tuple[int, int],
    rhs_dilation: int = 1,
    out_dtype=None,
) -> jnp.ndarray:
    """Stride-1 NWC conv with both operands dynamically quantized to int8.

    x: (B, T, Ci) float; w: (K, Ci, Co) float (already packed by the
    caller's lowering). Returns (B, T', Co) in out_dtype (default x.dtype).
    Matches the float conv up to the quantization error bounded by the
    per-row/per-channel scales.
    """
    out_dtype = out_dtype or x.dtype
    xq, sx = quantize_per_row(x)                    # (B,1,1) scales
    wq, sw = quantize_per_out_channel(w)
    acc = jax.lax.conv_general_dilated(
        xq, wq,
        window_strides=(1,),
        padding=(pads,),
        rhs_dilation=(rhs_dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (sx * sw[None, None, :])
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(out_dtype)
