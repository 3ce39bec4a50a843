"""Flash attention with attention-weight dropout (Pallas TPU kernel).

The reference TTE trains `nn.MultiheadAttention(..., dropout=0.1)` — dropout
on the attention WEIGHTS (`/root/reference/modules/fft.py:49`). JAX's stock
Pallas flash kernel has no dropout, so round-1 training fell back to the XLA
path, which materializes (B, H, T, T) score tensors; at the 3584-frame
decoder bucket that is ~616 MB of HBM traffic per layer direction and the
measured bottleneck (PERF.md). This kernel runs the online-softmax loop with
dropout applied inside the tile, using the TPU's counter PRNG reseeded per
(batch*head, q-block, k-block) tile so the forward and both backward passes
regenerate the identical keep-mask without ever materializing it.

Math (per row; M = keep mask, p = dropout prob, c = 1/(1-p)):
    S  = scale * Q K^T + bias          bias = 0 / -1e30 key-padding mask
    P  = softmax(S)                    denominator over UNdropped probs
    Pd = M . P * c
    O  = Pd V
Backward, with D = rowsum(dO . O):
    dV = Pd^T dO
    dP = M . (dO V^T) * c
    dS = P . (dP - D)     [rowsum(P.dP) = rowsum(Pd.(dO V^T)) = dO.O = D]
    dQ = scale dS K        dK = scale dS^T Q

Tiling: 4D grids (B, H, outer-block, inner-block) with the online state
(m, l, acc) carried in VMEM scratch across the innermost ("arbitrary")
grid dimension — VMEM stays O(block^2) at any T (full-row K/V residency
overflowed VMEM at T=3584 f32). Matmul operands are cast to bf16 (f32
accumulation), matching the XLA default-precision path of the rest of the
model. The log-sum-exp residual is stored lane-replicated (B, H, T, 128)
to satisfy Mosaic block-shape alignment.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIAS = -1e30
_COMPUTE = jnp.bfloat16


def _threshold(dropout_p: float) -> int:
    """uint32 threshold: bits < threshold are DROPPED; P(drop) ~= dropout_p
    to 2^-32."""
    return min(int(round(dropout_p * 2.0**32)), 2**32 - 1)


def _keep_mask(seed_ref, bh, qi, ki, n_q, n_k, shape, dropout_p):
    """Regenerate the keep mask for tile (bh, qi, ki). Seeding is the ONLY
    state — forward/dq/dkv kernels calling with equal indices get equal
    masks. Mosaic caps prng_seed at 2 values, so the tile coordinate is
    folded into one unique int32 (row-major over (bh, qi, ki))."""
    tile = (bh * n_q + qi) * n_k + ki
    pltpu.prng_seed(seed_ref[0], tile)
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return bits >= jnp.uint32(_threshold(dropout_p))


def _dot(a, b, dims):
    return jax.lax.dot_general(a.astype(_COMPUTE), b.astype(_COMPUTE), dims,
                               preferred_element_type=jnp.float32)


_NT = (((1,), (1,)), ((), ()))   # a @ b.T   (contract last with last)
_NN = (((1,), (0,)), ((), ()))   # a @ b
_TN = (((0,), (0,)), ((), ()))   # a.T @ b

_SEMANTICS = ("parallel", "parallel", "parallel", "arbitrary")


def _interpret() -> bool:
    """Interpret mode off-TPU so CPU tests exercise the same code path
    (interpret PRNG is unsupported on this JAX: dropout_p > 0 requires a
    real TPU)."""
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# forward: grid (B, H, n_q, n_k), online state in scratch
# ---------------------------------------------------------------------------


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr, *, scale, dropout_p, n_q, n_k):
    b, h = pl.program_id(0), pl.program_id(1)
    qi, ki = pl.program_id(2), pl.program_id(3)
    bh = b * pl.num_programs(1) + h
    inv_keep = 1.0 / (1.0 - dropout_p) if dropout_p > 0.0 else 1.0

    @pl.when(ki == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, NEG_BIAS)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]                                   # (bq, dh)
    bq = q.shape[0]
    kblk = k_ref[0, 0]                                # (bk, dh)
    s = _dot(q, kblk, _NT) * scale                    # (bq, bk) f32
    s = s + bias_ref[0, 0][None, :]

    m = m_scr[:, 0:1]
    m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m - m_new)
    l_scr[...] = l_scr[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
    if dropout_p > 0.0:
        keep = _keep_mask(seed_ref, bh, qi, ki, n_q, n_k,
                          (bq, kblk.shape[0]), dropout_p)
        p = jnp.where(keep, p, 0.0) * inv_keep
    acc_scr[...] = acc_scr[...] * alpha + _dot(p, v_ref[0, 0], _NN)
    m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(ki == n_k - 1)
    def _():
        l = l_scr[:, 0:1]
        o_ref[0, 0] = (acc_scr[...] / l).astype(o_ref.dtype)
        # lse replicated over 128 lanes (Mosaic block-shape alignment)
        lse_ref[0, 0] = jnp.broadcast_to(m_scr[:, 0:1] + jnp.log(l),
                                         (bq, 128))


def _forward(q, k, v, bias, seed, dropout_p, sm_scale, block_q, block_k):
    bsz, heads, t, dh = q.shape
    n_q, n_k = t // block_q, t // block_k
    bias3 = bias.reshape(bsz, 1, t)
    kern = functools.partial(_fwd_kernel, scale=sm_scale,
                             dropout_p=dropout_p, n_q=n_q, n_k=n_k)
    o, lse = pl.pallas_call(
        kern,
        grid=(bsz, heads, n_q, n_k),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, block_q, dh),
                         lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_k, dh),
                         lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_k, dh),
                         lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b, h, i, j: (b, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, dh),
                         lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, 128),
                         lambda b, h, i, j: (b, h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((bsz, heads, t, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),   # running max
            pltpu.VMEM((block_q, 128), jnp.float32),   # running denom
            pltpu.VMEM((block_q, dh), jnp.float32),    # output acc
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=_SEMANTICS),
        interpret=_interpret(),
    )(seed, q, k, v, bias3)
    return o, lse


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _dq_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, do_ref,
               lse_ref, dq_ref, dq_scr, *, scale, dropout_p, n_q, n_k):
    b, h = pl.program_id(0), pl.program_id(1)
    qi, ki = pl.program_id(2), pl.program_id(3)
    bh = b * pl.num_programs(1) + h
    inv_keep = 1.0 / (1.0 - dropout_p) if dropout_p > 0.0 else 1.0

    @pl.when(ki == 0)
    def _():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)
    bq = q.shape[0]
    lse = lse_ref[0, 0][:, 0:1]
    di = jnp.sum(do * o_ref[0, 0].astype(jnp.float32), axis=1,
                 keepdims=True)
    kblk = k_ref[0, 0]
    s = _dot(q, kblk, _NT) * scale
    s = s + bias_ref[0, 0][None, :]
    p = jnp.exp(s - lse)                              # true softmax probs
    dpd = _dot(do, v_ref[0, 0], _NT)                  # dO V^T
    if dropout_p > 0.0:
        keep = _keep_mask(seed_ref, bh, qi, ki, n_q, n_k,
                          (bq, kblk.shape[0]), dropout_p)
        dpd = jnp.where(keep, dpd, 0.0) * inv_keep
    ds = p * (dpd - di)
    dq_scr[...] = dq_scr[...] + _dot(ds, kblk, _NN) * scale

    @pl.when(ki == n_k - 1)
    def _():
        dq_ref[0, 0] = dq_scr[...].astype(dq_ref.dtype)


def _dkv_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, do_ref,
                lse_ref, dk_ref, dv_ref, dk_scr, dv_scr, *, scale,
                dropout_p, n_q, n_k):
    b, h = pl.program_id(0), pl.program_id(1)
    ki, qi = pl.program_id(2), pl.program_id(3)
    bh = b * pl.num_programs(1) + h
    inv_keep = 1.0 / (1.0 - dropout_p) if dropout_p > 0.0 else 1.0

    @pl.when(qi == 0)
    def _():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    kblk = k_ref[0, 0]                                # (bk, dh)
    vblk = v_ref[0, 0]
    bias = bias_ref[0, 0][None, :]                    # (1, bk) this k block
    q = q_ref[0, 0]                                   # (bq, dh)
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0][:, 0:1]
    di = jnp.sum(do * o_ref[0, 0].astype(jnp.float32), axis=1,
                 keepdims=True)

    s = _dot(q, kblk, _NT) * scale + bias
    p = jnp.exp(s - lse)                              # (bq, bk)
    dpd = _dot(do, vblk, _NT)
    if dropout_p > 0.0:
        keep = _keep_mask(seed_ref, bh, qi, ki, n_q, n_k,
                          (q.shape[0], kblk.shape[0]), dropout_p)
        pd = jnp.where(keep, p, 0.0) * inv_keep
        dpd = jnp.where(keep, dpd, 0.0) * inv_keep
    else:
        pd = p
    dv_scr[...] = dv_scr[...] + _dot(pd, do, _TN)     # Pd^T dO
    ds = p * (dpd - di)
    dk_scr[...] = dk_scr[...] + _dot(ds, q, _TN) * scale   # dS^T Q

    @pl.when(qi == n_q - 1)
    def _():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _backward(q, k, v, bias, seed, o, lse, do, dropout_p, sm_scale,
              block_q, block_k):
    bsz, heads, t, dh = q.shape
    n_q, n_k = t // block_q, t // block_k
    bias3 = bias.reshape(bsz, 1, t)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=sm_scale, dropout_p=dropout_p,
                          n_q=n_q, n_k=n_k),
        grid=(bsz, heads, n_q, n_k),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, block_q, dh),
                         lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_k, dh),
                         lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_k, dh),
                         lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b, h, i, j: (b, 0, j)),
            pl.BlockSpec((1, 1, block_q, dh),
                         lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, dh),
                         lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, 128),
                         lambda b, h, i, j: (b, h, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, dh),
                               lambda b, h, i, j: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, dh), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=_SEMANTICS),
        interpret=_interpret(),
    )(seed, q, k, v, bias3, o, do, lse)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=sm_scale, dropout_p=dropout_p,
                          n_q=n_q, n_k=n_k),
        grid=(bsz, heads, n_k, n_q),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, block_q, dh),
                         lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_k, dh),
                         lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_k, dh),
                         lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b, h, i, j: (b, 0, i)),
            pl.BlockSpec((1, 1, block_q, dh),
                         lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_q, dh),
                         lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_q, 128),
                         lambda b, h, i, j: (b, h, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_k, dh),
                         lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_k, dh),
                         lambda b, h, i, j: (b, h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, dh), jnp.float32),
            pltpu.VMEM((block_k, dh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=_SEMANTICS),
        interpret=_interpret(),
    )(seed, q, k, v, bias3, o, do, lse)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom-VJP entry
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def flash_attention_dropout(q, k, v, bias, seed, dropout_p, sm_scale,
                            block_q, block_k):
    """Flash attention with attention-weight dropout.

    Args:
      q, k, v: (B, H, T, dh), T % block == 0, dh % 128 == 0.
      bias: (B, T) f32 additive key bias (0 valid / NEG_BIAS masked).
      seed: (1,) int32 — dropout stream id for this call.
      dropout_p, sm_scale: static floats; block_q, block_k: static ints.
    """
    o, _ = _forward(q, k, v, bias, seed, dropout_p, sm_scale, block_q,
                    block_k)
    return o


def _fwd_rule(q, k, v, bias, seed, dropout_p, sm_scale, block_q, block_k):
    o, lse = _forward(q, k, v, bias, seed, dropout_p, sm_scale, block_q,
                      block_k)
    return o, (q, k, v, bias, seed, o, lse)


def _bwd_rule(dropout_p, sm_scale, block_q, block_k, res, do):
    q, k, v, bias, seed, o, lse = res
    dq, dk, dv = _backward(q, k, v, bias, seed, o, lse, do, dropout_p,
                           sm_scale, block_q, block_k)
    return dq, dk, dv, None, None


flash_attention_dropout.defvjp(_fwd_rule, _bwd_rule)


def dump_keep_mask(bsz: int, heads: int, t: int, seed, dropout_p: float,
                   block_q: int, block_k: int):
    """Materialize the exact (B, H, T, T) keep-mask the kernels regenerate
    tile-by-tile — test oracle only (TPU backend; the compiled PRNG is the
    thing under test). int32 1=keep."""
    n_q, n_k = t // block_q, t // block_k

    def kern(seed_ref, out_ref):
        b, h = pl.program_id(0), pl.program_id(1)
        qi, ki = pl.program_id(2), pl.program_id(3)
        bh = b * pl.num_programs(1) + h
        keep = _keep_mask(seed_ref, bh, qi, ki, n_q, n_k,
                          (block_q, block_k), dropout_p)
        out_ref[0, 0] = keep.astype(jnp.int32)

    return pl.pallas_call(
        kern,
        grid=(bsz, heads, n_q, n_k),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, 1, block_q, block_k),
                               lambda b, h, i, j: (b, h, i, j)),
        out_shape=jax.ShapeDtypeStruct((bsz, heads, t, t), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=_SEMANTICS),
        interpret=_interpret(),
    )(seed)


def pick_block(t: int) -> int:
    for blk in (512, 256, 128):
        if t % blk == 0:
            return blk
    raise ValueError(f"sequence length {t} not a multiple of 128")
