"""Static-scale int8 serving forward for the unit HiFi-GAN generator.

Round-5 serving lever (VERDICT r4 #1, PERF.md 4a conclusion 2): the
dynamic-quant path (`ops/quant.py::int8_conv_nwc`, cfg.quant="int8")
re-derives per-row absmax scales at EVERY conv — each site pays a full
read of the bf16 activation for the absmax reduction, a read+write for the
quantize, and materializes its output in bf16 again (~650 MB/call of
traffic on the HBM-bound folded tail). Here activation scales are STATIC
(calibrated once per checkpoint from a representative batch), so:

  * the absmax passes disappear entirely;
  * every inter-stage tensor is materialized as int8 (1 byte/element):
    the producing conv's epilogue (dequant + bias + residual + leaky)
    fuses with the next site's `quantize_static`, and consumers
    (residual adds, MRF averages) read int8 and dequantize in-register;
  * convs run on the int8 MXU rate (332 TOP/s = 1.70x bf16, PERF.md 4a)
    exactly like the dynamic path.

The price is STATIC (not per-call-dynamic) scales: a value louder than
the calibration absmax clips. Two measured design points keep fidelity at
bf16 parity (PERF.md 5a): scales are per-CHANNEL (folded into the weight
quantization for free — per-tensor scales cost ~5 dB SNR), and residual
carriers stay bf16 by default (`residual_int8=False` — quantization
error then enters only at conv inputs, like the dynamic mode). Fidelity
is gated on hardware next to the bf16 and dynamic-int8 bounds with a
calibration-disjoint batch (scripts/tpu_parity_check.py; hard budgets
maxdev < 2e-3, SNR >= 33 dB, mel-L1 < 0.3 vs f32; measured 34.0 dB /
0.2375 — matching bf16's own 35.0 / 0.2387).

Topology mirrors `generator.py::apply_generator` (reference
`/root/reference/utils/vocoder/models.py:95-111`) with the same folded
tail; only the materialization discipline differs. Calibration and
serving share ONE forward body so the site order can never skew.

The mirrored forward is a DELIBERATE duplication, not an oversight: the
materialization points pervade every statement (conv inputs, residual
carriers, MRF sums), so injecting them into apply_generator as callbacks
would contort the trainable path that autodiff and the parity suite
depend on, for a serving-only mode. Divergence is pinned by tests that
compare this forward against apply_code_generator on the same params
(tests/test_quant.py::test_generator_int8_static — the SNR envelope
fails if the topologies drift) and by the on-chip fidelity gate
(scripts/tpu_parity_check.py, hard budgets vs the f32 generator).
Anyone changing generator.py's topology must update this file in the
same commit.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from parrot_tts_tpu.core.config import VocoderModelConfig
from parrot_tts_tpu.ops import conv as conv_ops
from parrot_tts_tpu.ops import folded as folded_ops
from parrot_tts_tpu.ops import quant as quant_ops
from parrot_tts_tpu.models.vocoder.generator import (
    LRELU_SLOPE,
    _kernel,
)
from parrot_tts_tpu.ops.weight_norm import WN_AXES_CONV1D, WN_AXES_CONV_T1D


@dataclass
class _QTape:
    """Threads the static per-site scales through the forward.

    mode "calibrate": convs run float; each materialization point records
    absmax of the tensor it would quantize. mode "serve": the same points
    consume `scales[i]` in order. The forward body is shared, so the site
    order is identical by construction; serve-mode site-count mismatch
    raises."""

    mode: str                      # "calibrate" | "serve"
    scales: jnp.ndarray | None = None
    collected: list = field(default_factory=list)
    i: int = 0

    def next_scale(self):
        s = self.scales[self.i]
        self.i += 1
        return s


class _QT:
    """int8 tensor + its static scale (serve mode)."""

    __slots__ = ("q", "s")

    def __init__(self, q, s):
        self.q, self.s = q, s


def _forward(params: dict, x: jnp.ndarray, cfg: VocoderModelConfig,
             tape: _QTape, lane_target: int = 128,
             residual_int8: bool = False) -> jnp.ndarray:
    """Shared body: the generator forward with explicit materialization
    points. x: (B, T, model_in_dim) float.

    residual_int8=False (default) keeps the residual carriers (stage
    inputs and resblock pair outputs) in the bf16 compute dtype so
    quantization error enters only at CONV inputs — measured worth
    ~2 dB SNR on-chip for ~no throughput cost (the absmax passes are
    gone either way; PERF.md r5). True quantizes every materialization
    (the maximum-traffic-saving variant)."""
    nk = len(cfg.resblock_kernel_sizes)
    dtype = jnp.dtype(cfg.dtype)
    calib = tape.mode == "calibrate"
    assert cfg.resblock == "1", "int8-static serving targets the V1 topology"

    def mat(xf, int8=True):
        """Materialize an inter-stage tensor (int8 in serve mode).
        Scales are per-CHANNEL (amax over batch and time): per-tensor
        scales measured ~5 dB worse on-chip (PERF.md r5), and the
        consuming conv folds channel scales into its weights for free.
        int8=False materializes in the compute dtype instead (residual
        carriers when residual_int8 is off); site order stays identical
        between calibrate and serve because the flag is static."""
        if not int8:
            return xf if calib else xf.astype(dtype)
        if calib:
            tape.collected.append(
                jnp.max(jnp.abs(xf.astype(jnp.float32)), axis=(0, 1)))
            return xf
        s = tape.next_scale()
        return _QT(quant_ops.quantize_static(xf, s), s)

    def deq(xt):
        if isinstance(xt, _QT):
            return xt.q.astype(jnp.float32) * xt.s
        return xt.astype(jnp.float32)

    def qconv(xt, w, b, *, pads, dil=1):
        """Conv on a materialized tensor; returns f32 (epilogue fuses)."""
        if calib:
            y = jax.lax.conv_general_dilated(
                xt.astype(dtype), w.astype(dtype),
                window_strides=(1,), padding=(pads,), rhs_dilation=(dil,),
                dimension_numbers=("NWC", "WIO", "NWC"))
            return (y + b.astype(dtype)).astype(jnp.float32)
        return quant_ops.int8_conv_qin(xt.q, xt.s, w, b, pads=pads,
                                       rhs_dilation=dil)

    # conv_pre stays float (same policy as the dynamic int8 mode)
    x = conv_ops.conv1d(
        x.astype(dtype), _kernel(params["conv_pre"], WN_AXES_CONV1D, dtype),
        params["conv_pre"]["b"].astype(dtype), padding=3)
    x = x.astype(jnp.float32)

    g = 1
    for i, (u, k) in enumerate(zip(cfg.upsample_rates,
                                   cfg.upsample_kernel_sizes)):
        cout = cfg.upsample_initial_channel // (2 ** (i + 1))
        up = params["ups"][i]
        w = _kernel(up, WN_AXES_CONV_T1D)
        ups_in = mat(jax.nn.leaky_relu(x, LRELU_SLOPE))
        if g > 1:
            # folded transposed conv: polyphase pack then block-fold
            w2, pad_left, q_len = conv_ops.polyphase_weights(
                w, u, (k - u) // 2)
            wb, (pl, pr) = folded_ops.fold_conv1d_kernel(
                w2, dilation=1, pad_left=pad_left, g=g)
            x = qconv(ups_in, wb, jnp.tile(up["b"], g * u), pads=(pl, pr))
            g *= u
        else:
            w2, pad_left, q_len = conv_ops.polyphase_weights(
                w, u, (k - u) // 2)
            y = qconv(ups_in, w2, jnp.tile(up["b"], u),
                      pads=(pad_left, q_len - 1 - pad_left))
            # phase-major (B, T, u*Co) -> (B, u*T, Co)
            bsz, t, _ = y.shape
            x = y.reshape(bsz, t * u, cout)
            want = max(1, lane_target // cout) if cfg.fold_tail else 1
            if want > 1 and x.shape[1] % want == 0:
                x = folded_ops.fold(x, want)        # free reshape
                g = want

        stage_rbs = params["resblocks"][i * nk:(i + 1) * nk]
        x_mat = mat(x, int8=residual_int8)   # shared by all nk resblocks
        acc = None
        for j in range(nk):
            rk = cfg.resblock_kernel_sizes[j]
            rds = cfg.resblock_dilation_sizes[j]
            xt_res = x_mat       # residual carrier for this resblock
            for c1, c2, d in zip(stage_rbs[j]["convs1"],
                                 stage_rbs[j]["convs2"], rds):
                c1w, c2w = _kernel(c1, WN_AXES_CONV1D), _kernel(c2, WN_AXES_CONV1D)
                p1 = conv_ops.get_padding(rk, d)
                p2 = conv_ops.get_padding(rk, 1)
                if g > 1:
                    c1w, (l1, r1) = folded_ops.fold_conv1d_kernel(
                        c1w, dilation=d, pad_left=p1, g=g)
                    c2w, (l2, r2) = folded_ops.fold_conv1d_kernel(
                        c2w, dilation=1, pad_left=p2, g=g)
                    b1, b2 = jnp.tile(c1["b"], g), jnp.tile(c2["b"], g)
                    d1 = 1
                else:
                    (l1, r1), (l2, r2) = (p1, p1), (p2, p2)
                    b1, b2 = c1["b"], c2["b"]
                    d1 = d
                h = mat(jax.nn.leaky_relu(deq(xt_res), LRELU_SLOPE))
                h = qconv(h, c1w, b1, pads=(l1, r1), dil=d1)
                h = mat(jax.nn.leaky_relu(h, LRELU_SLOPE))
                h = qconv(h, c2w, b2, pads=(l2, r2))
                xt_res = mat(h + deq(xt_res), int8=residual_int8)
            acc = deq(xt_res) if acc is None else acc + deq(xt_res)
        x = acc / nk

    # conv_post stays float (policy above); torch default slope 0.01
    x = jax.nn.leaky_relu(x, 0.01).astype(dtype)
    cp = params["conv_post"]
    if g > 1:
        x = folded_ops.folded_conv1d(
            x, _kernel(cp, WN_AXES_CONV1D, dtype), cp["b"].astype(dtype),
            g=g, padding=3)
        x = folded_ops.unfold(x, g)
    else:
        x = conv_ops.conv1d(x, _kernel(cp, WN_AXES_CONV1D, dtype),
                            cp["b"].astype(dtype), padding=3)
    return jnp.tanh(x).astype(jnp.float32)


def _embed(params, code, spkr, cfg):
    x = jnp.take(params["dict"], code, axis=0)
    if cfg.multispkr:
        s = jnp.take(params["spkr"], spkr.reshape(spkr.shape[0]), axis=0)
        x = jnp.concatenate([x, jnp.broadcast_to(s[:, None, :], x.shape)],
                            axis=-1)
    return x


def calibrate_qscales(params: dict, code: jnp.ndarray, spkr,
                      cfg: VocoderModelConfig, *, margin: float = 1.0,
                      lane_target: int = 128,
                      residual_int8: bool = False) -> tuple:
    """Run the float forward once on a representative batch and return the
    per-site, per-CHANNEL static activation scales
    (tuple of (C_site,) arrays: absmax over (B, T) * margin / 127).

    margin > 1 leaves clip headroom for batches louder than calibration;
    the on-chip fidelity gate picks the shipped value."""

    def f(params, code, spkr):
        tape = _QTape("calibrate")
        _forward(params, _embed(params, code, spkr, cfg), cfg, tape,
                 lane_target, residual_int8=residual_int8)
        return tuple(tape.collected)

    absmax = jax.jit(f)(params, code, spkr)
    import numpy as np

    out = []
    for a in absmax:
        a = np.asarray(a, np.float64)
        a = np.where(a > 0, a, 1.0)
        out.append(jnp.asarray(a * margin / quant_ops.QMAX, jnp.float32))
    return tuple(out)


def apply_code_generator_staticq(params: dict, code: jnp.ndarray, spkr,
                                 qscales: tuple,
                                 cfg: VocoderModelConfig,
                                 lane_target: int = 128,
                                 residual_int8: bool = False) -> jnp.ndarray:
    """Serving forward with static int8 inter-stage activations.
    qscales: from `calibrate_qscales` (same checkpoint, same cfg,
    same residual_int8)."""
    tape = _QTape("serve", scales=qscales)
    y = _forward(params, _embed(params, code, spkr, cfg), cfg, tape,
                 lane_target, residual_int8=residual_int8)
    if tape.i != len(qscales):
        raise ValueError(
            f"qscales has {len(qscales)} sites, forward used {tape.i} "
            "(stale calibration for this config?)")
    return y


def save_qscales(path, qscales: tuple) -> None:
    """Persist calibrated scales beside a checkpoint (npz, one array per
    site) so serving restarts skip the calibration forward."""
    import numpy as np

    np.savez(path, **{f"site_{i:03d}": np.asarray(s)
                      for i, s in enumerate(qscales)})


def load_qscales(path) -> tuple:
    """Inverse of save_qscales; returns the tuple apply_code_generator_staticq
    consumes (site order preserved)."""
    import numpy as np

    with np.load(path) as z:
        return tuple(jnp.asarray(z[k]) for k in sorted(z.files))
