"""Multi-head attention matching torch.nn.MultiheadAttention semantics.

The reference TTE wraps `nn.MultiheadAttention(d_model, n_head, bias=False,
batch_first=True)` behind an extra bias-free qkv Linear and a trailing wo
Linear (`/root/reference/modules/fft.py:41-59`) — i.e. queries/keys/values are
projected TWICE (qkv then MHA's own in_proj) and outputs twice (out_proj then
wo). That quirk is load-bearing for unit-exact parity (SURVEY.md §7), so the
op exposes the inner MHA exactly; the double projection lives in the FFT
block module.

Layout: (B, T, D) with D on lanes. At reference scale (T <= 3500, d_head 128)
XLA's fused softmax-attention is already MXU-bound; a Pallas flash-attention
path can slot in behind the same signature for longer sequences.
"""

from __future__ import annotations

import contextlib
import math

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")

# Trace-time precision override for the flash kernel (Mosaic lowers only
# DEFAULT/HIGHEST dot precision). Set via flash_precision(...) by callers
# that wrap surrounding code in an unsupported ambient precision — e.g.
# the selective-high decode mode's 3-pass-bf16 decoder context
# (models/tte/parrot.py). Keying off the GLOBAL jax config instead would
# silently change every model's attention when a user sets
# jax_default_matmul_precision="high" for unrelated reasons.
_FLASH_PRECISION_OVERRIDE: str | None = None


@contextlib.contextmanager
def flash_precision(precision: str):
    global _FLASH_PRECISION_OVERRIDE
    prev = _FLASH_PRECISION_OVERRIDE
    _FLASH_PRECISION_OVERRIDE = precision
    try:
        yield
    finally:
        _FLASH_PRECISION_OVERRIDE = prev


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    in_proj: jnp.ndarray,
    out_proj: jnp.ndarray,
    n_head: int,
    *,
    key_padding_mask: jnp.ndarray | None = None,
    dropout_p: float = 0.0,
    dropout_rng: jax.Array | None = None,
    deterministic: bool = True,
    precision=None,
    force_xla: bool = False,
) -> jnp.ndarray:
    """torch F.multi_head_attention_forward with bias-free projections.

    Args:
      q, k, v: (B, T, D).
      in_proj: (D, 3D) packed projection, native (in, out) layout —
        `from_torch_linear(in_proj_weight)` of torch's (3D, D).
      out_proj: (D, D) native layout.
      key_padding_mask: (B, T) bool, True = IGNORE that key (torch
        convention; the reference passes `~src_mask`, modules/parrot.py:97).
    """
    b, t, d = q.shape
    if d % n_head:
        raise ValueError(f"d_model {d} % n_head {n_head} != 0")
    d_head = d // n_head

    wq, wk, wv = jnp.split(in_proj, 3, axis=1)
    qp = jnp.einsum("btd,de->bte", q, wq, precision=precision)
    kp = jnp.einsum("btd,de->bte", k, wk, precision=precision)
    vp = jnp.einsum("btd,de->bte", v, wv, precision=precision)

    def heads(x):
        return x.reshape(b, -1, n_head, d_head).transpose(0, 2, 1, 3)

    qp, kp, vp = heads(qp), heads(kp), heads(vp)     # (B, H, T, dh)
    scale = 1.0 / math.sqrt(d_head)

    if not force_xla and _use_flash(t, d_head, dropout_p, deterministic):
        ctx = (jax.default_matmul_precision(_FLASH_PRECISION_OVERRIDE)
               if _FLASH_PRECISION_OVERRIDE is not None
               else contextlib.nullcontext())
        with ctx:
            if dropout_p > 0.0 and not deterministic:
                out = _flash_attention_dropout(qp, kp, vp, key_padding_mask,
                                               scale, dropout_p, dropout_rng)
            else:
                out = _flash_attention(qp, kp, vp, key_padding_mask, scale)
    else:
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", qp, kp, precision=precision) * scale
        if key_padding_mask is not None:
            scores = jnp.where(key_padding_mask[:, None, None, :], NEG_INF,
                               scores)

        attn = jax.nn.softmax(scores, axis=-1)
        if dropout_p > 0.0 and not deterministic:
            keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_p,
                                        attn.shape)
            attn = jnp.where(keep, attn / (1.0 - dropout_p), 0.0)

        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vp, precision=precision)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
    return jnp.einsum("btd,de->bte", out, out_proj, precision=precision)


def _use_flash(t: int, d_head: int, dropout_p: float,
               deterministic: bool) -> bool:
    """Flash-attention path: TPU backend + MXU-aligned shapes. Deterministic
    passes use the stock Pallas kernel; training-with-attention-dropout (the
    reference recipe, modules/fft.py:49) uses ops/flash_dropout.py, which
    regenerates the keep-mask from a counter PRNG in fwd and bwd."""
    return flash_available(t, d_head)


def flash_available(t: int, d_head: int) -> bool:
    """True when attention at this shape will run a Pallas flash kernel
    (training AND inference). Callers use this to skip FFT-block remat:
    flash never materializes the (B, H, T, T) scores whose backward saves
    motivated remat, and the measured no-remat flash step is 3.2x the
    rematerialized XLA step at T=3584 (PERF.md round 2b)."""
    if d_head % 128 or t % 128 or t < 512:
        return False
    return jax.default_backend() == "tpu"


def _flash_attention_dropout(qp, kp, vp, key_padding_mask, scale,
                             dropout_p, dropout_rng):
    from parrot_tts_tpu.ops import flash_dropout as fd

    b, _, t, _ = qp.shape
    if key_padding_mask is not None:
        bias = jnp.where(key_padding_mask, fd.NEG_BIAS, 0.0).astype(
            jnp.float32)
    else:
        bias = jnp.zeros((b, t), jnp.float32)
    seed = jax.lax.bitcast_convert_type(
        jax.random.bits(dropout_rng, (1,), jnp.uint32), jnp.int32)
    blk = fd.pick_block(t)
    return fd.flash_attention_dropout(qp, kp, vp, bias, seed, dropout_p,
                                      scale, blk, blk)


def _flash_attention(qp, kp, vp, key_padding_mask, scale):
    """Pallas flash attention (jax stock TPU kernel) with the torch
    key_padding_mask expressed as segment ids: valid tokens are segment 1,
    pads segment 0 — valid queries attend exactly the unmasked keys, pad
    queries attend only pads (their outputs are zeroed downstream)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    t = qp.shape[2]
    seg = None
    if key_padding_mask is not None:
        ids = (~key_padding_mask).astype(jnp.int32)
        seg = SegmentIds(q=ids, kv=ids)
    # the block must DIVIDE t (kernel grid constraint) — min(512, t) crashed
    # at t=768 on hardware; caught by scripts/tpu_parity_check.py round 3
    from parrot_tts_tpu.ops.flash_dropout import pick_block

    blk = pick_block(t)
    sizes = BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk, block_k_dkv=blk,
        block_q_dkv=blk, block_k_major_dq=blk, block_k_dq=blk,
        block_q_dq=blk,
    )
    return flash_attention(qp, kp, vp, segment_ids=seg, sm_scale=scale,
                           causal=False, block_sizes=sizes)
