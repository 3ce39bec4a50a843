"""Unit-conditioned HiFi-GAN generator (V1 topology), TPU-native.

Reference: `/root/reference/utils/vocoder/models.py:69-169` (Generator /
CodeGenerator, adapted from jik876/hifi-gan). conv_pre -> 5x [leakyReLU ->
ConvTranspose1d upsample (5,4,4,2,2) -> MRF (3 ResBlocks k=3,7,11, dilations
(1,3,5), averaged)] -> leakyReLU -> conv_post -> tanh; weight norm on every
conv. CodeGenerator embeds HuBERT codes (1000x128) + speaker ids (10x128),
nearest-repeat-upsamples the speaker signal over frames and concats to a
256-channel input (models.py:122-169).

All activations are channels-last (B, T, C) so channels ride the TPU lane
dim; every conv lowers to an MXU matmul. Weight norm lives in the param tree
as {g, v}; `fold_params` collapses it for inference (= remove_weight_norm,
reference models.py:113-119).

Init note: the reference applies `init_weights` N(0, 0.01) AFTER weight_norm
(models.py:93-94,109-110), which torch silently discards on the first forward
(weight is recomputed from g,v) — the effective init is torch's default
kaiming. We init kaiming accordingly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from parrot_tts_tpu.core.config import VocoderModelConfig
from parrot_tts_tpu.ops import conv as conv_ops
from parrot_tts_tpu.ops import folded as folded_ops
from parrot_tts_tpu.ops import init as init_ops
from parrot_tts_tpu.ops.weight_norm import (
    WN_AXES_CONV1D,
    WN_AXES_CONV_T1D,
    wn_init,
    wn_resolve,
)

LRELU_SLOPE = 0.1  # reference models.py:11


def _wn_conv1d_init(key, k, cin, cout):
    kw, kb = jax.random.split(key)
    w = init_ops.kaiming_uniform(kw, (k, cin, cout), cin * k)
    return {**wn_init(w, WN_AXES_CONV1D),
            "b": init_ops.uniform_fan_in(kb, (cout,), cin * k)}


def _wn_convt1d_init(key, k, cin, cout):
    kw, kb = jax.random.split(key)
    w = init_ops.kaiming_uniform(kw, (k, cin, cout), cin * k)
    # torch ConvTranspose1d bias fan_in is also cin*k
    return {**wn_init(w, WN_AXES_CONV_T1D),
            "b": init_ops.uniform_fan_in(kb, (cout,), cin * k)}


def _kernel(p: dict, axes, dtype=None) -> jnp.ndarray:
    w = wn_resolve(p, axes) if "v" in p else p["w"]
    return w.astype(dtype) if dtype is not None else w


def init_resblock1(key, channels: int, kernel_size: int,
                   dilations: tuple[int, ...]) -> dict:
    keys = jax.random.split(key, 2 * len(dilations))
    return {
        "convs1": [_wn_conv1d_init(keys[i], kernel_size, channels, channels)
                   for i in range(len(dilations))],
        "convs2": [_wn_conv1d_init(keys[len(dilations) + i], kernel_size,
                                   channels, channels)
                   for i in range(len(dilations))],
    }


def _conv(x, w, b, *, padding, dilation=1, g=1, precision=None, quant=False):
    """Dispatch: plain channels-last conv, or the folded-layout equivalent
    when the activations are g-folded (ops/folded.py). quant routes the
    packed conv to the int8 MXU path (ops/quant.py)."""
    if g == 1:
        return conv_ops.conv1d(x, w, b, padding=padding, dilation=dilation,
                               precision=precision, quant=quant)
    return folded_ops.folded_conv1d(x, w, b, g=g, padding=padding,
                                    dilation=dilation, precision=precision,
                                    quant=quant)


def _quant_stage(cfg: VocoderModelConfig, g: int) -> bool:
    """Should this MRF/upsample site run int8? (see VocoderModelConfig.quant)"""
    if cfg.quant == "int8":
        return True
    if cfg.quant == "int8-tail":
        return g > 1
    return False


def apply_resblock1(p: dict, x: jnp.ndarray, kernel_size: int,
                    dilations: tuple[int, ...], precision=None,
                    dtype=None, g: int = 1, quant: bool = False) -> jnp.ndarray:
    """ResBlock1 (reference models.py:13-44): pairs of (dilated, plain) convs
    with leaky relus and residual adds."""
    for c1, c2, d in zip(p["convs1"], p["convs2"], dilations):
        xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
        xt = _conv(xt, _kernel(c1, WN_AXES_CONV1D, dtype),
                   c1["b"].astype(x.dtype),
                   padding=conv_ops.get_padding(kernel_size, d),
                   dilation=d, g=g, precision=precision, quant=quant)
        xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
        xt = _conv(xt, _kernel(c2, WN_AXES_CONV1D, dtype),
                   c2["b"].astype(x.dtype),
                   padding=conv_ops.get_padding(kernel_size, 1),
                   g=g, precision=precision, quant=quant)
        x = xt + x
    return x


def init_resblock2(key, channels: int, kernel_size: int,
                   dilations: tuple[int, ...]) -> dict:
    keys = jax.random.split(key, len(dilations))
    return {
        "convs": [_wn_conv1d_init(keys[i], kernel_size, channels, channels)
                  for i in range(len(dilations))],
    }


def apply_resblock2(p: dict, x: jnp.ndarray, kernel_size: int,
                    dilations: tuple[int, ...], precision=None,
                    dtype=None, g: int = 1, quant: bool = False) -> jnp.ndarray:
    """ResBlock2 (reference models.py:47-66)."""
    for c, d in zip(p["convs"], dilations):
        xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
        xt = _conv(xt, _kernel(c, WN_AXES_CONV1D, dtype),
                   c["b"].astype(x.dtype),
                   padding=conv_ops.get_padding(kernel_size, d),
                   dilation=d, g=g, precision=precision, quant=quant)
        x = xt + x
    return x


def _mrf_stage_fused(stage_rbs, x, cfg: VocoderModelConfig, g: int, dtype):
    """Serving path: whole MRF stack in one Pallas kernel
    (ops/fused_mrf.py) — one HBM round trip instead of ~36. Engages for
    weight-norm-folded ResBlock1 params on folded (g > 1) stages; returns
    None (caller runs the unfused composition) otherwise."""
    if not cfg.fused_mrf or cfg.resblock != "1" or g <= 1:
        return None
    if _quant_stage(cfg, g):
        return None  # int8 path supersedes the (perf-neutral) fused kernel
    if any("v" in c for rb in stage_rbs
           for name in ("convs1", "convs2") for c in rb[name]):
        return None  # training params (weight norm live) — needs grads
    from parrot_tts_tpu.ops import fused_mrf

    flat, plan = fused_mrf.pack_mrf(
        stage_rbs, g, cfg.resblock_kernel_sizes,
        cfg.resblock_dilation_sizes, dtype)
    return fused_mrf.mrf_fused(x, flat, plan)


def init_generator(key, cfg: VocoderModelConfig) -> dict:
    n_ups = len(cfg.upsample_rates)
    keys = jax.random.split(key, 4 + n_ups + n_ups * len(cfg.resblock_kernel_sizes))
    ki = iter(keys)

    params: dict = {
        "conv_pre": _wn_conv1d_init(next(ki), 7, cfg.model_in_dim,
                                    cfg.upsample_initial_channel),
        "ups": [],
        "resblocks": [],
    }
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        cin = cfg.upsample_initial_channel // (2 ** i)
        cout = cfg.upsample_initial_channel // (2 ** (i + 1))
        params["ups"].append(_wn_convt1d_init(next(ki), k, cin, cout))
        ch = cout
        for rk, rd in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            if cfg.resblock == "1":
                params["resblocks"].append(init_resblock1(next(ki), ch, rk, rd))
            else:
                params["resblocks"].append(init_resblock2(next(ki), ch, rk, rd))
    params["conv_post"] = _wn_conv1d_init(next(ki), 7, ch, 1)
    return params


def apply_generator(params: dict, x: jnp.ndarray, cfg: VocoderModelConfig,
                    precision=None, lane_target: int = 128) -> jnp.ndarray:
    """Generator forward (reference models.py:96-111). x: (B, T, model_in_dim)
    -> waveform (B, T*320, 1).

    When cfg.fold_tail is set, the lane-starved tail stages (C < lane_target)
    run in a space-to-depth folded layout (ops/folded.py) so every conv keeps
    the MXU full: the first sub-128-channel stage folds right after its
    (plain) upsample, and each later transposed conv grows the fold factor by
    its stride without ever leaving the folded layout. Numerically the same
    network up to fp reassociation.
    """
    nk = len(cfg.resblock_kernel_sizes)
    apply_rb = apply_resblock1 if cfg.resblock == "1" else apply_resblock2
    dtype = jnp.dtype(cfg.dtype)
    x = x.astype(dtype)

    x = conv_ops.conv1d(x, _kernel(params["conv_pre"], WN_AXES_CONV1D, dtype),
                        params["conv_pre"]["b"].astype(dtype), padding=3,
                        precision=precision)
    g = 1
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        cout = cfg.upsample_initial_channel // (2 ** (i + 1))
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        up = params["ups"][i]
        if g > 1:
            x = folded_ops.folded_conv_transpose1d(
                x, _kernel(up, WN_AXES_CONV_T1D, dtype),
                up["b"].astype(dtype), g_in=g, stride=u,
                padding=(k - u) // 2, precision=precision,
                quant=_quant_stage(cfg, g))
            g *= u
        else:
            x = conv_ops.conv_transpose1d(
                x, _kernel(up, WN_AXES_CONV_T1D, dtype), up["b"].astype(dtype),
                stride=u, padding=(k - u) // 2, precision=precision,
                quant=_quant_stage(cfg, 1))
            want = max(1, lane_target // cout) if cfg.fold_tail else 1
            if want > 1 and x.shape[1] % want == 0:
                x = folded_ops.fold(x, want)       # free reshape
                g = want
        stage_rbs = params["resblocks"][i * nk:(i + 1) * nk]
        y = _mrf_stage_fused(stage_rbs, x, cfg, g, dtype)
        if y is not None:
            x = y
        else:
            acc = None
            for j in range(nk):
                y = apply_rb(stage_rbs[j], x, cfg.resblock_kernel_sizes[j],
                             cfg.resblock_dilation_sizes[j],
                             precision=precision, dtype=dtype, g=g,
                             quant=_quant_stage(cfg, g))
                acc = y if acc is None else acc + y
            x = acc / nk
    # final leaky uses torch's DEFAULT slope 0.01 (reference models.py:107)
    x = jax.nn.leaky_relu(x, 0.01)
    x = _conv(x, _kernel(params["conv_post"], WN_AXES_CONV1D, dtype),
              params["conv_post"]["b"].astype(dtype), padding=3, g=g,
              precision=precision)
    if g > 1:
        x = folded_ops.unfold(x, g)                # free reshape
    return jnp.tanh(x).astype(jnp.float32)


# ---------------------------------------------------------------------------
# CodeGenerator: unit + speaker conditioning (reference models.py:122-169)
# ---------------------------------------------------------------------------


def init_code_generator(key, cfg: VocoderModelConfig) -> dict:
    kg, kd, ks = jax.random.split(key, 3)
    params = init_generator(kg, cfg)
    params["dict"] = init_ops.embedding(
        kd, (cfg.num_embeddings, cfg.embedding_dim))
    if cfg.multispkr:
        params["spkr"] = init_ops.embedding(
            ks, (cfg.num_speakers, cfg.embedding_dim))
    return params


def upsample_cond(signal: jnp.ndarray, max_frames: int) -> jnp.ndarray:
    """Nearest-repeat upsample of a conditioning feature to the code frame
    axis — the reference ``CodeGenerator._upsample`` (models.py:131-150).

    Accepts (B, C, Tc), (B, C) or (B,) and returns (B, C, max_frames).
    Like the reference, the condition length must divide ``max_frames``
    (models.py:145-147 raises on any remainder)."""
    if signal.ndim == 1:
        signal = signal.reshape(-1, 1, 1)
    elif signal.ndim == 2:
        signal = signal[:, :, None]
    elif signal.ndim != 3:
        raise ValueError(f"condition must be rank 1-3, got {signal.shape}")
    b, c, tc = signal.shape
    rep = max_frames // tc
    if rep * tc != max_frames:
        raise NotImplementedError(
            "Padding condition signal - misalignment between condition "
            f"features: {tc} frames into {max_frames}")
    return jnp.repeat(signal, rep, axis=-1)


def apply_code_generator(params: dict, code: jnp.ndarray,
                         spkr: jnp.ndarray | None, cfg: VocoderModelConfig,
                         precision=None,
                         extra_feats: dict | None = None) -> jnp.ndarray:
    """code: (B, T) int unit ids; spkr: (B,) or (B,1) int speaker ids.
    Returns (B, T*320, 1) waveform in [-1, 1].

    The reference nearest-repeat-upsamples the (B, 1) speaker embedding over
    T frames and concats channels (models.py:132-168).

    ``extra_feats`` maps names to conditioning arrays ((B, C, Tc), (B, C) or
    (B,)); each is upsample-concatenated like the reference's generic kwarg
    loop (models.py:160-166), in sorted-name order for determinism. The
    reference loop skips the ``f0`` key — its ``h.get('f0')`` gate
    (models.py:126) is stored but never consumed, a vestige of the
    speech-resynthesis upstream whose f0 quantizer this reference dropped.
    We give the gate its obvious meaning: with ``cfg.f0`` set, an ``f0``
    feature IS concatenated (the functional form of the dormant capability);
    with ``cfg.f0`` unset (every reference config) the key is skipped
    exactly as the reference does. ``model_in_dim`` must count every
    concatenated channel."""
    x = jnp.take(params["dict"], code, axis=0)              # (B, T, E)
    if cfg.multispkr:
        if spkr is None:
            raise ValueError("multispeaker model needs spkr ids")
        spkr = spkr.reshape(spkr.shape[0])
        s = jnp.take(params["spkr"], spkr, axis=0)          # (B, E)
        s = jnp.broadcast_to(s[:, None, :], x.shape)
        x = jnp.concatenate([x, s], axis=-1)                # (B, T, 2E)
    if extra_feats:
        t = x.shape[1]
        for name in sorted(extra_feats):
            if name in ("spkr", "code") or (name == "f0" and not cfg.f0):
                continue                    # reference skip list models.py:163
            feat = upsample_cond(jnp.asarray(extra_feats[name],
                                             jnp.float32), t)
            x = jnp.concatenate([x, jnp.swapaxes(feat, 1, 2)], axis=-1)
    return apply_generator(params, x, cfg, precision=precision)


def fold_params(params: dict) -> dict:
    """Collapse every {g, v} into a plain kernel {"w"} for inference —
    the functional remove_weight_norm (reference models.py:113-119,
    utils/vocoder/inference.py:137)."""

    def fold(p, axes):
        out = {"w": wn_resolve(p, axes), "b": p["b"]}
        return out

    folded = dict(params)
    folded["conv_pre"] = fold(params["conv_pre"], WN_AXES_CONV1D)
    folded["conv_post"] = fold(params["conv_post"], WN_AXES_CONV1D)
    folded["ups"] = [fold(p, WN_AXES_CONV_T1D) for p in params["ups"]]
    folded["resblocks"] = []
    for rb in params["resblocks"]:
        frb = {}
        for name in ("convs1", "convs2", "convs"):
            if name in rb:
                frb[name] = [fold(c, WN_AXES_CONV1D) for c in rb[name]]
        folded["resblocks"].append(frb)
    return folded
