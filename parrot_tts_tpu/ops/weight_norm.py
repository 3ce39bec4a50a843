"""Weight/spectral normalization as explicit (g, v) parameter decompositions.

The reference wraps nearly every vocoder conv in `torch.nn.utils.weight_norm`
(`/root/reference/utils/vocoder/models.py:7,17-28,175,231`) and the first MSD
scale in `spectral_norm` (`models.py:231,257`). In a functional framework the
reparameterization lives in the param pytree: a weight-normed kernel is the
dict {"g": ..., "v": ...}; `resolve` computes w = g * v / ||v|| inside the
compiled step (XLA fuses it into the conv), and `fold` collapses it for fast
inference — the analog of `remove_weight_norm` (reference models.py:113-119,
utils/vocoder/inference.py:137).

Norm-axis convention: torch computes the norm per-slice of dim 0 OF THE TORCH
LAYOUT. In our native layouts that is:
  conv1d          (K, I, O): torch dim0 = O  -> norm over axes (0, 1)
  conv_transpose  (K, I, O): torch dim0 = I  -> norm over axes (0, 2)
  conv2d       (Kh, Kw, I, O): torch dim0 = O -> norm over axes (0, 1, 2)
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

WN_AXES_CONV1D = (0, 1)
WN_AXES_CONV_T1D = (0, 2)
WN_AXES_CONV2D = (0, 1, 2)


def wn_init(w: jnp.ndarray, axes: tuple[int, ...]) -> dict:
    """Decompose an initialized kernel into {"g", "v"} with w == resolve(...)."""
    g = jnp.sqrt(jnp.sum(w * w, axis=axes, keepdims=True))
    return {"g": g, "v": w}


def wn_resolve(p: dict, axes: tuple[int, ...], eps: float = 0.0) -> jnp.ndarray:
    """w = g * v / ||v||, matching torch._weight_norm."""
    v = p["v"]
    norm = jnp.sqrt(jnp.sum(v * v, axis=axes, keepdims=True) + eps)
    return p["g"] * v / norm


def wn_fold(p: dict, axes: tuple[int, ...]) -> jnp.ndarray:
    """Collapse (g, v) to a plain kernel (remove_weight_norm parity)."""
    return wn_resolve(p, axes)


def is_weight_normed(p: Any) -> bool:
    return isinstance(p, dict) and set(p.keys()) >= {"g", "v"}


# ---------------------------------------------------------------------------
# Spectral norm (MSD first scale) — power iteration state carried explicitly
# ---------------------------------------------------------------------------


def sn_init(w: jnp.ndarray, key) -> dict:
    """Spectral-norm param: {"w": kernel, "u", "v": singular vector estimates}.

    torch reshapes the kernel to (dim0, -1) of the TORCH layout before the
    power iteration and stores BOTH u and v as buffers; at eval it computes
    sigma = u^T W v from the stored pair without any recompute. For our
    native conv1d layout (K, I, O) torch dim0 = O.
    """
    ku, kv = jax.random.split(key)
    mat = _to_mat(w)
    u = jax.random.normal(ku, (mat.shape[0],), w.dtype)
    u = u / (jnp.linalg.norm(u) + 1e-12)
    v = jax.random.normal(kv, (mat.shape[1],), w.dtype)
    v = v / (jnp.linalg.norm(v) + 1e-12)
    return {"w": w, "u": u, "sn_v": v}


def _to_mat(w: jnp.ndarray) -> jnp.ndarray:
    """Native conv layout (..., O) -> torch-style (O, -1) matrix.

    torch's (O, I, K) flattens as I-major then K; our (K, I, O) must be
    permuted to (O, I, K) before reshape to match element order."""
    perm = (w.ndim - 1,) + tuple(range(1, w.ndim - 1)) + (0,)
    return jnp.transpose(w, perm).reshape(w.shape[-1], -1)


def sn_resolve(p: dict, n_power_iterations: int = 1, update: bool = True,
               eps: float = 1e-12) -> tuple[jnp.ndarray, dict]:
    """Return (w / sigma, new_state). With update=True run torch's power
    iteration (v = normalize(W^T u); u = normalize(W v)); with update=False
    (eval) use the stored u, v unchanged — exact torch semantics."""
    w = p["w"]
    u, v = p["u"], p["sn_v"]
    mat = _to_mat(w)
    if update:
        for _ in range(n_power_iterations):
            v = mat.T @ u
            v = v / (jnp.linalg.norm(v) + eps)
            u = mat @ v
            u = u / (jnp.linalg.norm(u) + eps)
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
    sigma = jnp.dot(u, mat @ v)
    return w / sigma, {**p, "u": u, "sn_v": v}
