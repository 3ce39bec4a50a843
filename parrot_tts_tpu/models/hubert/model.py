"""HuBERT encoder for TPU-native unit extraction.

The reference extracts HuBERT units by shelling out to fairseq
(`/root/reference/utils/hubert_extraction/hubert_api.py:16-31`): one wav at a
time, CPU/GPU, layer-11 features, then sklearn k-means predict
(`extractor.py:15-18`). Here the same encoder runs as a jittable JAX function
over *batched, length-bucketed* wavs, with exact parity to per-utterance
processing:

* the conv frontend is position-local, so frames inside the valid length are
  untouched by padding;
* the only non-local frontend op — GroupNorm over time in the first conv
  layer — uses MASKED statistics, reproducing exact-length stats;
* padded frame positions are zeroed before the positional conv (zeros are
  exactly what an exact-length conv pads with) and masked out of attention.

Inference-only: HuBERT *training* is out of scope here as in the reference
(it consumes a released fairseq checkpoint, `extractor.py:37-40`).

Layout: (B, T, C) channels-last throughout; attention and FFN matmuls hit the
MXU; the conv frontend lowers to strided NWC convs.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from parrot_tts_tpu.core.config import HubertConfig
from parrot_tts_tpu.ops.conv import conv1d

NEG_INF = float(np.finfo(np.float32).min)


# ---------------------------------------------------------------------------
# valid-length bookkeeping (torch conv with no padding: L' = (L - k)//s + 1)
# ---------------------------------------------------------------------------


def feat_extract_output_length(cfg: HubertConfig, n_samples):
    """Frame count the conv frontend yields for a wav of `n_samples`.

    Works on ints and on (traced) integer arrays.
    """
    n = n_samples
    for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
        n = (n - k) // s + 1
    return n


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _linear(key, d_in, d_out):
    # torch nn.Linear default init: U(-1/sqrt(d_in), 1/sqrt(d_in))
    bound = 1.0 / math.sqrt(d_in)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (d_in, d_out), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (d_out,), jnp.float32, -bound, bound),
    }


def _ln(d):
    return {"scale": jnp.ones((d,), jnp.float32),
            "bias": jnp.zeros((d,), jnp.float32)}


def init_hubert(key, cfg: HubertConfig) -> dict:
    """Random init (tests / fine-tuning stubs); real use converts a torch
    checkpoint via models/hubert/convert.py."""
    keys = iter(jax.random.split(key, 64 + 8 * cfg.n_layer))
    params: dict = {"conv_layers": []}
    c_in = 1
    for i, (c_out, k) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel)):
        layer = {"w": jax.random.normal(next(keys), (k, c_in, c_out),
                                        jnp.float32) * 0.02}
        if cfg.conv_bias or cfg.feat_extract_norm == "layer":
            layer["b"] = jnp.zeros((c_out,), jnp.float32)
        if (cfg.feat_extract_norm == "group" and i == 0) or (
                cfg.feat_extract_norm == "layer"):
            layer["norm"] = _ln(c_out)
        params["conv_layers"].append(layer)
        c_in = c_out
    params["fp_ln"] = _ln(cfg.conv_dim[-1])
    params["fp_proj"] = _linear(next(keys), cfg.conv_dim[-1], cfg.d_model)
    # positional conv stored folded (weight norm folded at convert time)
    k = cfg.pos_conv_kernel
    params["pos_conv"] = {
        "w": jax.random.normal(
            next(keys), (k, cfg.d_model // cfg.pos_conv_groups, cfg.d_model),
            jnp.float32) * 0.02,
        "b": jnp.zeros((cfg.d_model,), jnp.float32),
    }
    params["enc_ln"] = _ln(cfg.d_model)
    params["layers"] = []
    d, f = cfg.d_model, cfg.ffn_dim
    for _ in range(cfg.n_layer):
        params["layers"].append({
            "q": _linear(next(keys), d, d), "k": _linear(next(keys), d, d),
            "v": _linear(next(keys), d, d), "o": _linear(next(keys), d, d),
            "attn_ln": _ln(d),
            "fc1": _linear(next(keys), d, f), "fc2": _linear(next(keys), f, d),
            "final_ln": _ln(d),
        })
    return params


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------


def _layer_norm(x, p, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _masked_group_norm(x, p, valid, eps=1e-5):
    """torch GroupNorm(C, C): per-channel stats over time — computed over the
    VALID frames only so padded batches match exact-length processing.

    x: (B, T, C); valid: (B, T) bool.
    """
    m = valid[..., None].astype(x.dtype)
    n = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
    mu = jnp.sum(x * m, axis=1, keepdims=True) / n
    var = jnp.sum(jnp.square(x - mu) * m, axis=1, keepdims=True) / n
    return ((x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]) * m


def masked_wav_layer_norm(wav, n_samples, eps=1e-5):
    """F.layer_norm(x, x.shape) over the valid samples of each padded wav
    (reference hubert_api.py:55-56, task.cfg.normalize)."""
    t = wav.shape[-1]
    valid = jnp.arange(t)[None, :] < n_samples[:, None]
    m = valid.astype(wav.dtype)
    n = jnp.maximum(jnp.sum(m, axis=-1, keepdims=True), 1.0)
    mu = jnp.sum(wav * m, axis=-1, keepdims=True) / n
    var = jnp.sum(jnp.square(wav - mu) * m, axis=-1, keepdims=True) / n
    return (wav - mu) * jax.lax.rsqrt(var + eps) * m


def _attention(x, lp, n_head, key_mask, eps, precision=None):
    """Post-LN HF/fairseq MHA with biases. key_mask: (B, T) True=valid."""
    b, t, d = x.shape
    dh = d // n_head
    scale = 1.0 / math.sqrt(dh)

    def proj(p):
        return (x @ p["w"] + p["b"]).reshape(b, t, n_head, dh).transpose(
            0, 2, 1, 3)

    q = proj(lp["q"]) * scale
    k = proj(lp["k"])
    v = proj(lp["v"])
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, precision=precision)
    s = jnp.where(key_mask[:, None, None, :], s, NEG_INF)
    a = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", a, v, precision=precision)
    o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
    return o @ lp["o"]["w"] + lp["o"]["b"]


def apply_hubert(
    params: dict,
    wav: jnp.ndarray,
    n_samples: jnp.ndarray,
    cfg: HubertConfig,
    *,
    output_layer: int | None = None,
    precision=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Features of transformer layer `output_layer` (1-based, fairseq
    `extract_features(output_layer=...)` semantics, hubert_api.py:63-68).

    Args:
      wav: (B, S) float32, zero-padded to the bucket length.
      n_samples: (B,) int32 true sample counts.

    Returns:
      (features (B, T, D), n_frames (B,) int32). Frames >= n_frames[i] are
      garbage and must be masked by the caller.
    """
    out_layer = cfg.output_layer if output_layer is None else output_layer
    if not 1 <= out_layer <= cfg.n_layer:
        raise ValueError(f"output_layer {out_layer} not in [1, {cfg.n_layer}]")
    eps = cfg.layer_norm_eps
    compute_dtype = jnp.dtype(cfg.dtype)

    if cfg.normalize_input:
        wav = masked_wav_layer_norm(wav, n_samples)

    # ---- conv frontend (per-layer valid lengths for masked group norm)
    x = wav[..., None].astype(compute_dtype)
    n_valid = n_samples
    for i, (k, s) in enumerate(zip(cfg.conv_kernel, cfg.conv_stride)):
        lp = params["conv_layers"][i]
        x = conv1d(x, lp["w"].astype(compute_dtype),
                   lp.get("b"), stride=s, precision=precision)
        n_valid = (n_valid - k) // s + 1
        if cfg.feat_extract_norm == "group" and i == 0:
            valid = jnp.arange(x.shape[1])[None, :] < n_valid[:, None]
            x = _masked_group_norm(x, lp["norm"], valid, eps)
        elif cfg.feat_extract_norm == "layer":
            x = _layer_norm(x, lp["norm"], eps)
        x = jax.nn.gelu(x, approximate=False)
    n_frames = n_valid

    # ---- feature projection
    x = _layer_norm(x, params["fp_ln"], eps)
    x = x @ params["fp_proj"]["w"].astype(compute_dtype) + params["fp_proj"]["b"]

    # ---- zero padded frames (== the zeros an exact-length pos conv pads
    # with), positional conv, encoder layer norm
    frame_mask = jnp.arange(x.shape[1])[None, :] < n_frames[:, None]
    x = jnp.where(frame_mask[..., None], x, 0.0)
    pc = params["pos_conv"]
    pos = conv1d(x, pc["w"].astype(compute_dtype), pc["b"],
                 padding=cfg.pos_conv_kernel // 2, groups=cfg.pos_conv_groups,
                 precision=precision)
    if cfg.pos_conv_kernel % 2 == 0:  # HF SamePadLayer: drop trailing frame
        pos = pos[:, :-1, :]
    x = x + jax.nn.gelu(pos, approximate=False)
    x = _layer_norm(x, params["enc_ln"], eps)

    # ---- post-LN transformer layers 1..out_layer
    for lp in params["layers"][:out_layer]:
        attn = _attention(x, lp, cfg.n_head, frame_mask, eps,
                          precision=precision)
        x = _layer_norm(x + attn, lp["attn_ln"], eps)
        h = jax.nn.gelu(x @ lp["fc1"]["w"].astype(compute_dtype)
                        + lp["fc1"]["b"], approximate=False)
        h = h @ lp["fc2"]["w"].astype(compute_dtype) + lp["fc2"]["b"]
        x = _layer_norm(x + h, lp["final_ln"], eps)

    return x.astype(jnp.float32), n_frames


# ---------------------------------------------------------------------------
# k-means quantizer (reference: joblib sklearn k-means, extractor.py:13,17)
# ---------------------------------------------------------------------------


def kmeans_predict(feats: jnp.ndarray, centers: jnp.ndarray,
                   precision=None) -> jnp.ndarray:
    """argmin_c ||x - c||^2 as one MXU matmul: (B, T, D) x (K, D) -> (B, T).

    Matches sklearn `KMeans.predict` (euclidean argmin; sklearn breaks ties
    by lowest index, as argmin does).
    """
    x2 = jnp.sum(jnp.square(feats), axis=-1, keepdims=True)
    c2 = jnp.sum(jnp.square(centers), axis=-1)
    xc = jnp.einsum("...d,kd->...k", feats, centers, precision=precision)
    d2 = x2 - 2.0 * xc + c2
    return jnp.argmin(d2, axis=-1).astype(jnp.int32)
