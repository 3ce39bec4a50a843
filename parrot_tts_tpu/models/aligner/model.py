"""CTC forced-aligner model: 3x(conv5+ReLU+BatchNorm) -> BiLSTM -> linear.

Reference: `/root/reference/utils/aligner/model.py:5-61`. The BiLSTM is a
`jax.lax.scan` over time (offline tool — scan throughput is fine, SURVEY.md
§2b); BatchNorm running statistics are explicit state threaded through apply,
matching torch BatchNorm1d train/eval semantics. Gate packing follows torch
LSTM order (i, f, g, o) so reference checkpoints convert directly.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from parrot_tts_tpu.core.config import AlignerModelConfig
from parrot_tts_tpu.ops import conv as conv_ops
from parrot_tts_tpu.ops import init as init_ops


class BatchNormState(NamedTuple):
    mean: jnp.ndarray
    var: jnp.ndarray


def _bn_init(dim: int):
    params = {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}
    state = BatchNormState(mean=jnp.zeros((dim,)), var=jnp.ones((dim,)))
    return params, state


def batch_norm(x: jnp.ndarray, params: dict, state: BatchNormState, *,
               train: bool, momentum: float = 0.1, eps: float = 1e-5):
    """torch BatchNorm1d over (B, T, C) feature dim C. Returns (y, new_state)."""
    if train:
        mean = jnp.mean(x, axis=(0, 1))
        var = jnp.var(x, axis=(0, 1))
        n = x.shape[0] * x.shape[1]
        unbiased = var * n / max(n - 1, 1)
        new_state = BatchNormState(
            mean=(1 - momentum) * state.mean + momentum * mean,
            var=(1 - momentum) * state.var + momentum * unbiased,
        )
    else:
        mean, var = state.mean, state.var
        new_state = state
    y = (x - mean) * jax.lax.rsqrt(var + eps) * params["scale"] + params["bias"]
    return y, new_state


def _lstm_cell(carry, x_t, w_ih, w_hh, b):
    h, c = carry
    gates = x_t @ w_ih + h @ w_hh + b
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c = f * c + i * g
    h = o * jnp.tanh(c)
    return (h, c), h


def lstm(x: jnp.ndarray, p: dict, reverse: bool = False) -> jnp.ndarray:
    """Unidirectional LSTM over (B, T, In) -> (B, T, H) via lax.scan.
    p: w_ih (In, 4H), w_hh (H, 4H), b (4H,) = b_ih + b_hh."""
    b_sz = x.shape[0]
    h_dim = p["w_hh"].shape[0]
    init = (jnp.zeros((b_sz, h_dim), x.dtype), jnp.zeros((b_sz, h_dim), x.dtype))
    xs = jnp.swapaxes(x, 0, 1)                       # (T, B, In)
    if reverse:
        xs = jnp.flip(xs, axis=0)
    _, hs = jax.lax.scan(
        lambda c, xt: _lstm_cell(c, xt, p["w_ih"], p["w_hh"], p["b"]), init, xs)
    if reverse:
        hs = jnp.flip(hs, axis=0)
    return jnp.swapaxes(hs, 0, 1)


def bilstm(x: jnp.ndarray, p_fw: dict, p_bw: dict) -> jnp.ndarray:
    """Both LSTM directions in ONE scan: (B, T, In) -> (B, T, 2H).

    Two independent `lstm()` calls run 2T sequential cells because XLA
    executes the scans back-to-back on one stream; the cells are tiny
    (512-dim matvecs), so the aligner step is latency-bound on the chain
    length, not MXU-bound. Stacking the directions on a leading axis —
    inputs (T, 2, B, In) with the backward direction time-flipped, weights
    (2, In, 4H) — turns each step into one batched einsum and halves the
    sequential chain to T cells. Same math as torch's bidirectional LSTM
    (reference utils/aligner/model.py:23, batch_first + flip), identical
    to `lstm(x, fw), lstm(x, bw, reverse=True)` up to fp reassociation."""
    b_sz = x.shape[0]
    h_dim = p_fw["w_hh"].shape[0]
    xs = jnp.swapaxes(x, 0, 1)                       # (T, B, In)
    xs2 = jnp.stack([xs, jnp.flip(xs, axis=0)], axis=1)   # (T, 2, B, In)
    w_ih = jnp.stack([p_fw["w_ih"], p_bw["w_ih"]])   # (2, In, 4H)
    w_hh = jnp.stack([p_fw["w_hh"], p_bw["w_hh"]])   # (2, H, 4H)
    bias = jnp.stack([p_fw["b"], p_bw["b"]])[:, None, :]  # (2, 1, 4H)

    def cell(carry, x_t):
        h, c = carry                                 # (2, B, H)
        gates = (jnp.einsum("dbi,dif->dbf", x_t, w_ih)
                 + jnp.einsum("dbh,dhf->dbf", h, w_hh) + bias)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((2, b_sz, h_dim), x.dtype),
            jnp.zeros((2, b_sz, h_dim), x.dtype))
    _, hs = jax.lax.scan(cell, init, xs2)            # (T, 2, B, H)
    fw = jnp.swapaxes(hs[:, 0], 0, 1)                # (B, T, H)
    bw = jnp.swapaxes(jnp.flip(hs[:, 1], axis=0), 0, 1)
    return jnp.concatenate([fw, bw], axis=-1)


def init_aligner(key, cfg: AlignerModelConfig):
    """Returns (params, state). Conv stack is bias-free (reference
    model.py:9-11); LSTM/linear use torch-default uniform init."""
    keys = jax.random.split(key, 8)
    params: dict[str, Any] = {"convs": [], "bns": []}
    state: dict[str, Any] = {"bns": []}
    dims = [cfg.n_mels, cfg.conv_dim, cfg.conv_dim]
    for i, cin in enumerate(dims):
        params["convs"].append({
            "w": init_ops.kaiming_uniform(
                keys[i], (5, cin, cfg.conv_dim), cin * 5)})
        bn_p, bn_s = _bn_init(cfg.conv_dim)
        params["bns"].append(bn_p)
        state["bns"].append(bn_s)

    h = cfg.lstm_dim
    for name, kk in (("lstm_fw", keys[3]), ("lstm_bw", keys[4])):
        k1, k2, k3, k4 = jax.random.split(kk, 4)
        params[name] = {
            "w_ih": init_ops.uniform_fan_in(k1, (cfg.conv_dim, 4 * h), h),
            "w_hh": init_ops.uniform_fan_in(k2, (h, 4 * h), h),
            "b": (init_ops.uniform_fan_in(k3, (4 * h,), h)
                  + init_ops.uniform_fan_in(k4, (4 * h,), h)),
        }
    params["lin"] = {
        "w": init_ops.kaiming_uniform(keys[5], (2 * h, cfg.num_symbols), 2 * h),
        "b": init_ops.uniform_fan_in(keys[6], (cfg.num_symbols,), 2 * h),
    }
    return params, state


def apply_aligner(params: dict, state: dict, mel: jnp.ndarray, *,
                  train: bool = False):
    """mel: (B, T, n_mels) -> (logits (B, T, num_symbols), new_state)."""
    x = mel
    new_bns = []
    for conv, bn_p, bn_s in zip(params["convs"], params["bns"], state["bns"]):
        x = conv_ops.conv1d(x, conv["w"], padding=2)
        x = jax.nn.relu(x)
        x, bn_s = batch_norm(x, bn_p, bn_s, train=train)
        new_bns.append(bn_s)
    x = bilstm(x, params["lstm_fw"], params["lstm_bw"])
    logits = x @ params["lin"]["w"] + params["lin"]["b"]
    return logits, {"bns": new_bns}


def params_from_torch(sd) -> tuple[dict, dict]:
    """Convert a reference `Aligner.state_dict()` (utils/aligner/model.py)."""
    import numpy as np

    def _np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    params: dict[str, Any] = {"convs": [], "bns": []}
    state: dict[str, Any] = {"bns": []}
    for i in range(3):
        params["convs"].append({"w": jnp.asarray(
            conv_ops.from_torch_conv1d(_np(sd[f"convs.{i}.conv.weight"])))})
        params["bns"].append({
            "scale": jnp.asarray(_np(sd[f"convs.{i}.bnorm.weight"])),
            "bias": jnp.asarray(_np(sd[f"convs.{i}.bnorm.bias"])),
        })
        state["bns"].append(BatchNormState(
            mean=jnp.asarray(_np(sd[f"convs.{i}.bnorm.running_mean"])),
            var=jnp.asarray(_np(sd[f"convs.{i}.bnorm.running_var"])),
        ))
    for name, suffix in (("lstm_fw", ""), ("lstm_bw", "_reverse")):
        params[name] = {
            "w_ih": jnp.asarray(_np(sd[f"rnn.weight_ih_l0{suffix}"]).T),
            "w_hh": jnp.asarray(_np(sd[f"rnn.weight_hh_l0{suffix}"]).T),
            "b": jnp.asarray(_np(sd[f"rnn.bias_ih_l0{suffix}"])
                             + _np(sd[f"rnn.bias_hh_l0{suffix}"])),
        }
    params["lin"] = {
        "w": jnp.asarray(_np(sd["lin.weight"]).T),
        "b": jnp.asarray(_np(sd["lin.bias"])),
    }
    return params, state
