"""HiFi-GAN discriminators: multi-period (MPD) + multi-scale (MSD).

Reference: `/root/reference/utils/vocoder/models.py:171-276`. MPD: 5 period
discriminators (2,3,5,7,11) that fold the waveform into (T/p, p) and run 2D
convs with stride (3,1). MSD: 3 scale discriminators over a x1/x2/x4
avg-pooled pyramid, grouped 1D convs; the first scale uses spectral norm
whose power-iteration vectors are explicit state threaded through apply.

Layouts: waveforms (B, T, 1); MPD folds to NHWC (B, T/p, p, 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from parrot_tts_tpu.ops import conv as conv_ops
from parrot_tts_tpu.ops import folded as folded_ops
from parrot_tts_tpu.ops import init as init_ops
from parrot_tts_tpu.ops.weight_norm import (
    WN_AXES_CONV1D,
    WN_AXES_CONV2D,
    sn_init,
    sn_resolve,
    wn_init,
    wn_resolve,
)

LRELU_SLOPE = 0.1

MPD_PERIODS = (2, 3, 5, 7, 11)
# (cin, cout) per conv layer (reference models.py:175-181)
_MPD_CHANNELS = ((1, 32), (32, 128), (128, 512), (512, 1024), (1024, 1024))
# (cin, cout, kernel, stride, groups, padding) (reference models.py:231-236)
_MSD_LAYERS = (
    (1, 128, 15, 1, 1, 7),
    (128, 128, 41, 2, 4, 20),
    (128, 256, 41, 2, 16, 20),
    (256, 512, 41, 4, 16, 20),
    (512, 1024, 41, 4, 16, 20),
    (1024, 1024, 41, 1, 16, 20),
    (1024, 1024, 5, 1, 1, 2),
)


def _norm_conv_init(key, shape, fan_in, spectral: bool):
    kw, kb, ku = jax.random.split(key, 3)
    w = init_ops.kaiming_uniform(kw, shape, fan_in)
    b = init_ops.uniform_fan_in(kb, (shape[-1],), fan_in)
    if spectral:
        return {**sn_init(w, ku), "b": b}
    return {**wn_init(w, WN_AXES_CONV2D if len(shape) == 4 else WN_AXES_CONV1D),
            "b": b}


def _resolve(p, axes, update: bool):
    """Returns (kernel, new_param_dict)."""
    if "u" in p:
        return sn_resolve(p, update=update)
    if "v" in p:
        return wn_resolve(p, axes), p
    return p["w"], p


# ---------------------------------------------------------------------------
# DiscriminatorP (reference models.py:171-203)
# ---------------------------------------------------------------------------


def init_discriminator_p(key, kernel_size: int = 5) -> dict:
    keys = jax.random.split(key, len(_MPD_CHANNELS) + 1)
    convs = [
        _norm_conv_init(keys[i], (kernel_size, 1, ci, co), ci * kernel_size,
                        spectral=False)
        for i, (ci, co) in enumerate(_MPD_CHANNELS)
    ]
    conv_post = _norm_conv_init(keys[-1], (3, 1, 1024, 1), 1024 * 3,
                                spectral=False)
    return {"convs": convs, "conv_post": conv_post}


# time-fold factor for the MPD's 1D-equivalent early layers (folded=True):
# contraction widened to ~128+ lanes; multiples of the stride 3
_MPD_FOLD_F = {0: 126, 1: 12}


def apply_discriminator_p(p: dict, x: jnp.ndarray, period: int,
                          precision=None, dtype=None, folded: bool = False):
    """x: (B, T, 1). Returns (score (B, n), fmaps list).

    folded=True (trainer only): the (5,1) kernels never mix the period
    axis, so each period discriminator is a 1D conv chain over H=T/p with
    p independent columns — move p into the batch ((B, H, p, C) ->
    (B*p, H, C)) and run the starved early layers (C=1->32 at large H)
    through the time-folded lowering. Score/fmap VALUES are identical up
    to element order (both losses are element-order-invariant means; the
    parity tests keep the NHWC path)."""
    b, t, c = x.shape
    if dtype is not None:
        x = x.astype(dtype)
    if t % period:
        n_pad = period - (t % period)
        x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)), mode="reflect")
        t = t + n_pad

    fmap = []
    if folded:
        h = t // period
        x = x.reshape(b, h, period, c)
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * period, h, c)
        strides1 = [3] * 4 + [1]
        for li, (conv, s) in enumerate(zip(p["convs"], strides1)):
            w = wn_resolve(conv, WN_AXES_CONV2D) if "v" in conv else conv["w"]
            if dtype is not None:
                w = w.astype(dtype)
            w1 = w[:, 0]                      # (k, 1, ci, co) -> (k, ci, co)
            # padding 2 is a REFERENCE QUIRK, not (k-1)//2: DiscriminatorP
            # hardcodes get_padding(5,1) for every kernel_size
            # (models.py:177-182) — the NHWC path and this one both
            # reproduce it, and folded_grouped_conv1d's t_out assert
            # rejects any kernel_size where the fold stops being a pure
            # output relayout
            if li in _MPD_FOLD_F:
                x = folded_ops.folded_grouped_conv1d(
                    x, w1, conv["b"].astype(x.dtype), stride=s, padding=2,
                    groups=1, f=_MPD_FOLD_F[li], precision=precision)
            else:
                x = conv_ops.conv1d(x, w1, conv["b"].astype(x.dtype),
                                    stride=s, padding=2,
                                    precision=precision)
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x.reshape(b, period, x.shape[1], x.shape[2]))
        cp = p["conv_post"]
        w = wn_resolve(cp, WN_AXES_CONV2D) if "v" in cp else cp["w"]
        if dtype is not None:
            w = w.astype(dtype)
        x = conv_ops.conv1d(x, w[:, 0], cp["b"].astype(x.dtype), stride=1,
                            padding=1, precision=precision)
        fmap.append(x.reshape(b, period, x.shape[1], x.shape[2]))
        return x.reshape(b, -1), fmap

    x = x.reshape(b, t // period, period, c)        # NHWC
    strides = [(3, 1)] * 4 + [(1, 1)]
    for conv, stride in zip(p["convs"], strides):
        w = wn_resolve(conv, WN_AXES_CONV2D) if "v" in conv else conv["w"]
        if dtype is not None:
            w = w.astype(dtype)
        x = conv_ops.conv2d(x, w, conv["b"].astype(x.dtype), stride=stride,
                            padding=(2, 0), precision=precision)
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
    cp = p["conv_post"]
    w = wn_resolve(cp, WN_AXES_CONV2D) if "v" in cp else cp["w"]
    if dtype is not None:
        w = w.astype(dtype)
    x = conv_ops.conv2d(x, w, cp["b"].astype(x.dtype), stride=(1, 1),
                        padding=(1, 0), precision=precision)
    fmap.append(x)
    return x.reshape(b, -1), fmap


def init_mpd(key) -> dict:
    keys = jax.random.split(key, len(MPD_PERIODS))
    return {"discriminators": [init_discriminator_p(k) for k in keys]}


def apply_mpd(params: dict, y: jnp.ndarray, y_hat: jnp.ndarray,
              precision=None, dtype=None, stacked: bool = False,
              folded: bool = False):
    """Returns (y_d_rs, y_d_gs, fmap_rs, fmap_gs) like the reference
    MultiPeriodDiscriminator (models.py:206-225). dtype=bfloat16 runs the
    disc stack in bf16 compute (params stay f32) — a TPU training lever.

    stacked=True runs real+fake as ONE batch-2B pass per period — exactly
    equivalent here (weight-norm only, no state; convs are per-sample) and
    measured ~10% faster on the MSD analog (scripts/exp_msd_bisect.py);
    the training step uses it, parity tests keep the sequential default."""
    y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
    b = y.shape[0]
    for p, period in zip(params["discriminators"], MPD_PERIODS):
        if stacked:
            s, f = apply_discriminator_p(
                p, jnp.concatenate([y, y_hat], axis=0), period, precision,
                dtype, folded=folded)
            s_r, s_g = s[:b], s[b:]
            f_r = [t[:b] for t in f]
            f_g = [t[b:] for t in f]
        else:
            s_r, f_r = apply_discriminator_p(p, y, period, precision, dtype,
                                             folded=folded)
            s_g, f_g = apply_discriminator_p(p, y_hat, period, precision,
                                             dtype, folded=folded)
        y_d_rs.append(s_r)
        y_d_gs.append(s_g)
        fmap_rs.append(f_r)
        fmap_gs.append(f_g)
    return y_d_rs, y_d_gs, fmap_rs, fmap_gs


# ---------------------------------------------------------------------------
# DiscriminatorS (reference models.py:228-276)
# ---------------------------------------------------------------------------


def init_discriminator_s(key, use_spectral_norm: bool = False) -> dict:
    keys = jax.random.split(key, len(_MSD_LAYERS) + 1)
    convs = [
        _norm_conv_init(keys[i], (k, ci // g, co), (ci // g) * k,
                        spectral=use_spectral_norm)
        for i, (ci, co, k, s, g, pad) in enumerate(_MSD_LAYERS)
    ]
    conv_post = _norm_conv_init(keys[-1], (3, 1024, 1), 1024 * 3,
                                spectral=use_spectral_norm)
    return {"convs": convs, "conv_post": conv_post}


# time-fold factor per MSD layer for the folded training path: chosen so
# the per-group contraction f*(ci/g) is 128 full lanes. Only the big-T
# early layers win (scripts/exp_msd_folded.py: 2.1-3.2x faster dW at
# L1-L3; L4's T is too small — folded measured 0.67x there).
_MSD_FOLD_F = {0: 128, 1: 4, 2: 16, 3: 8}


def apply_discriminator_s(p: dict, x: jnp.ndarray, *, update_sn: bool,
                          precision=None, dtype=None, folded: bool = False):
    """x: (B, T, 1). Returns (score, fmaps, new_params). Spectral-norm power
    iteration always runs in f32 (the kernel is cast after _resolve).

    folded=True computes the big-T grouped convs in the time-folded layout
    (ops/folded.py::folded_grouped_conv1d) — numerically exact, used by
    the trainer for the backward-dominated step."""
    fmap = []
    new_convs = []
    if dtype is not None:
        x = x.astype(dtype)
    for li, (conv, (ci, co, k, s, g, pad)) in enumerate(
            zip(p["convs"], _MSD_LAYERS)):
        w, new_conv = _resolve(conv, WN_AXES_CONV1D, update_sn)
        new_convs.append(new_conv)
        if dtype is not None:
            w = w.astype(dtype)
        if folded and li in _MSD_FOLD_F:
            x = folded_ops.folded_grouped_conv1d(
                x, w, conv["b"].astype(x.dtype), stride=s, padding=pad,
                groups=g, f=_MSD_FOLD_F[li], precision=precision)
        else:
            x = conv_ops.conv1d(x, w, conv["b"].astype(x.dtype), stride=s,
                                padding=pad, groups=g, precision=precision)
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
    w, new_post = _resolve(p["conv_post"], WN_AXES_CONV1D, update_sn)
    if dtype is not None:
        w = w.astype(dtype)
    x = conv_ops.conv1d(x, w, p["conv_post"]["b"].astype(x.dtype), padding=1,
                        precision=precision)
    fmap.append(x)
    new_p = {"convs": new_convs, "conv_post": new_post}
    return x.reshape(x.shape[0], -1), fmap, new_p


def init_msd(key) -> dict:
    k0, k1, k2 = jax.random.split(key, 3)
    return {"discriminators": [
        init_discriminator_s(k0, use_spectral_norm=True),
        init_discriminator_s(k1),
        init_discriminator_s(k2),
    ]}


def _sn_advance(p: dict) -> dict:
    """Advance spectral-norm power iteration on every SN conv of one
    discriminator without computing its forward."""
    new_convs = []
    for conv in p["convs"]:
        if "u" in conv:
            _, conv = sn_resolve(conv, update=True)
        new_convs.append(conv)
    post = p["conv_post"]
    if "u" in post:
        _, post = sn_resolve(post, update=True)
    return {"convs": new_convs, "conv_post": post}


def apply_msd(params: dict, y: jnp.ndarray, y_hat: jnp.ndarray, *,
              update_sn: bool = False, precision=None, dtype=None,
              stacked: bool = False, folded: bool = False):
    """Returns (y_d_rs, y_d_gs, fmap_rs, fmap_gs, new_params). The x2/x4
    scales see AvgPool1d(4, 2, padding=2) pyramids (reference models.py:258).

    Note: torch runs one power iteration per inner-discriminator forward;
    the reference's MSD forward calls d(y) then d(y_hat) (models.py:264-266),
    i.e. u advances twice per MSD call in train mode — matched here.

    stacked=True runs real+fake as ONE batch-2B pass per scale (~10%
    faster, scripts/exp_msd_bisect.py). Exactly equivalent on the
    weight-norm scales; on the SN scale 0 the u-advance COUNT is
    preserved (two per call) but both halves resolve with the first
    iterate's sigma, where the reference's sequential fake pass sees the
    second — a one-power-iteration difference in a converging estimator,
    used by the trainer only (parity tests keep the sequential default)."""
    y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
    new_discs = []
    b = y.shape[0]
    for i, p in enumerate(params["discriminators"]):
        if i != 0:
            y = conv_ops.avg_pool1d(y, 4, 2, 2)
            y_hat = conv_ops.avg_pool1d(y_hat, 4, 2, 2)
        if stacked:
            s, f, new_p = apply_discriminator_s(
                p, jnp.concatenate([y, y_hat], axis=0),
                update_sn=update_sn, precision=precision, dtype=dtype,
                folded=folded)
            if update_sn:
                new_p = _sn_advance(new_p)  # keep the 2-advance-per-call count
            s_r, s_g = s[:b], s[b:]
            f_r = [t[:b] for t in f]
            f_g = [t[b:] for t in f]
        else:
            s_r, f_r, new_p = apply_discriminator_s(
                p, y, update_sn=update_sn, precision=precision, dtype=dtype,
                folded=folded)
            s_g, f_g, new_p = apply_discriminator_s(
                new_p, y_hat, update_sn=update_sn, precision=precision,
                dtype=dtype, folded=folded)
        new_discs.append(new_p)
        y_d_rs.append(s_r)
        y_d_gs.append(s_g)
        fmap_rs.append(f_r)
        fmap_gs.append(f_g)
    return y_d_rs, y_d_gs, fmap_rs, fmap_gs, {"discriminators": new_discs}
