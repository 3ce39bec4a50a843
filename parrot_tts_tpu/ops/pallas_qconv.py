"""Hand Pallas int8 conv + matmul kernels for the quantized serving path.

Outcome (PERF.md 4a/4b — the round-3 motivation for this kernel was an
overhead artifact and is RETRACTED): the marginal-cost harness showed XLA
already delivers the int8 MXU rate (332 TOP/s dot_general = 1.70x bf16;
dyn-int8 convs at 98-211 TOP/s, at/near the relevant HBM/MXU bounds), and
this hand kernel, though exact on-chip, measures 61 TOP/s at the
folded-tail shape — SLOWER than XLA's lowering. It is kept as tested
infrastructure and a recorded negative result, NOT wired into serving.
Design notes below are left as written for the record.

Kernel design (serving shapes: B=64, T<=10k rows, Ci/Co multiples of 128):
  * grid (B, Co/BN, T'/BT); the whole (Tp, Ci) activation row of one batch
    element stays VMEM-resident across its T tiles (<=1.3 MB int8 at every
    call site), so the K tap reads are VMEM re-reads, not HBM re-reads —
    the K-fold activation re-read is where XLA's im2col-style lowering
    burns bandwidth;
  * taps unrolled: acc(int32) += dot(x[t0+j*d : +BT, :], w[j]) on the MXU,
    j static — dilation costs nothing (static slice offsets);
  * epilogue fused: y = acc * scale[b,co] + bias[co], optional leaky-relu
    (written max(y, a*y): bf16 vector cmpf crashes the Mosaic compile
    helper), cast to the serving dtype — so the downstream elementwise
    work that XLA used to fuse into the conv does not become an extra HBM
    round trip.

Scales arrive pre-combined as (B, Co) = s_x[b] * s_w[co] (per-batch-row
dynamic activation scales x per-out-channel weight scales, the ops/quant.py
scheme — batched serving stays batch-invariant).

Reference hot loop: `/root/reference/utils/vocoder/models.py:13-44,95-111`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _conv_kernel(x_ref, w_ref, s_ref, b_ref, o_ref, *, k: int, d: int,
                 bt: int, slab: int, leaky: float | None):
    # ONE aligned dynamic read covering every tap (unaligned dynamic-start
    # slices crash the Mosaic compile helper — scripts/diag_mosaic_int8.py),
    # then static in-register slices per tap, concatenated along lanes into
    # a single (bt, k*ci) x (k*ci, co) dot — one deep MXU contraction
    # instead of k shallow ci-deep ones (measured 2x marginal cost,
    # scripts/exp_marginal_cost.py).
    t0 = pl.program_id(2) * bt
    xs_all = x_ref[0, pl.ds(t0, slab), :]
    ci = xs_all.shape[1]
    if k == 1:
        cat = xs_all if slab == bt else jax.lax.slice(
            xs_all, (0, 0), (bt, ci))
    else:
        cat = jnp.concatenate(
            [jax.lax.slice(xs_all, (j * d, 0), (j * d + bt, ci))
             for j in range(k)], axis=1)
    acc = jax.lax.dot_general(
        cat, w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = (acc.astype(jnp.float32) * s_ref[0, 0, :][None, :]
         + b_ref[0, 0, :][None, :])
    if leaky is not None:
        y = jnp.maximum(y, leaky * y)
    o_ref[0] = y.astype(o_ref.dtype)


def supported(x_shape, w_shape) -> bool:
    """Pallas path covers Ci, Co multiples of 128 (every quantized call
    site: the fold keeps g*C == 128 at the tail, unfolded stages are
    128-512 channels, packed upsample kernels emit u*Co >= 128)."""
    _, _, ci = x_shape
    _, wci, co = w_shape
    return ci == wci and ci % 128 == 0 and co % 128 == 0


@functools.partial(
    jax.jit,
    static_argnames=("pads", "rhs_dilation", "out_dtype", "leaky",
                     "block_t", "block_n", "interpret"))
def int8_conv_nwc_pallas(
    xq: jnp.ndarray,
    wq: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    *,
    pads: tuple[int, int],
    rhs_dilation: int = 1,
    out_dtype=jnp.bfloat16,
    leaky: float | None = None,
    block_t: int = 256,
    block_n: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Stride-1 NWC conv on PRE-quantized int8 operands.

    xq: (B, T, Ci) int8; wq: (K, Ci, Co) int8; scale: (B, Co) f32 combined
    dequant scales; bias: (Co,) f32 or None. Returns
    (B, T + pl + pr - d*(K-1), Co) in out_dtype. Semantics match
    ops/quant.py int8_conv_nwc's conv_general_dilated exactly (int32
    accumulation; dequant epilogue)."""
    b, t, ci = xq.shape
    k, wci, co = wq.shape
    assert ci == wci and ci % 128 == 0 and co % 128 == 0, (xq.shape, wq.shape)
    d = rhs_dilation
    pl_, pr_ = pads
    t_out = t + pl_ + pr_ - d * (k - 1)
    assert t_out > 0

    # bn must DIVIDE co (the channel grid dim floors): largest 128-multiple
    # divisor of co that fits block_n — co=384 with block_n=256 would
    # otherwise leave channels 256..383 unwritten (reviewed bug)
    bn = min(block_n, co)
    while co % bn:
        bn -= 128
    bt = min(block_t, max(32, -(-t_out // 32) * 32))
    n_t = -(-t_out // bt)
    # the kernel reads an aligned slab of bt + d*(k-1) rows per tile
    # (rounded to the int8 sublane quantum)
    slab = -(-(bt + d * (k - 1)) // 32) * 32
    # pad T so the LAST tile's slab read stays in bounds
    t_padded = (n_t - 1) * bt + slab
    xp = jnp.pad(xq, ((0, 0), (pl_, t_padded - t - pl_), (0, 0)))

    if bias is None:
        bias = jnp.zeros((co,), jnp.float32)
    # scale/bias carried as (B, 1, Co)/(1, 1, Co): Mosaic wants the last
    # two block dims divisible by (8, 128) or equal to the array dims — a
    # (1, bn) block over (B, Co) violates the sublane rule, (1, 1, bn)
    # over (B, 1, Co) doesn't
    bias3 = bias.astype(jnp.float32).reshape(1, 1, co)
    assert scale.shape == (b, co), scale.shape
    scale3 = scale.astype(jnp.float32).reshape(b, 1, co)

    kernel = functools.partial(_conv_kernel, k=k, d=d, bt=bt, slab=slab,
                               leaky=leaky)
    # tap-major weight rows match the kernel's lane concat order
    w2 = wq.reshape(k * ci, co)
    return pl.pallas_call(
        kernel,
        grid=(b, co // bn, n_t),
        in_specs=[
            pl.BlockSpec((1, t_padded, ci), lambda bb, n, tt: (bb, 0, 0)),
            pl.BlockSpec((k * ci, bn), lambda bb, n, tt: (0, n)),
            pl.BlockSpec((1, 1, bn), lambda bb, n, tt: (bb, 0, n)),
            pl.BlockSpec((1, 1, bn), lambda bb, n, tt: (0, 0, n)),
        ],
        out_specs=pl.BlockSpec((1, bt, bn), lambda bb, n, tt: (bb, tt, n)),
        out_shape=jax.ShapeDtypeStruct((b, t_out, co), out_dtype),
        interpret=interpret,
    )(xp, w2, scale3, bias3)


# ---------------------------------------------------------------------------
# rate microkernels: plain tiled matmuls, int8 vs bf16, to measure the MXU
# int8 rate with Mosaic in control of the lowering (scripts/exp_pallas_int8)


def _mm_kernel(a_ref, b_ref, o_ref, *, acc_dtype):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += jax.lax.dot_general(
        a_ref[:], b_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=acc_dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "interpret"))
def matmul_pallas(a: jnp.ndarray, b: jnp.ndarray, *, bm: int = 512,
                  bn: int = 512, bk: int = 1024,
                  interpret: bool = False) -> jnp.ndarray:
    """(M, K) @ (K, N), K-blocked with VMEM-revisited accumulation (the
    output block index ignores the k grid axis, so Mosaic keeps it
    resident across the k steps). int8 operands accumulate in int32,
    floats in f32."""
    m, k = a.shape
    k2, n = b.shape
    assert k == k2 and m % bm == 0 and n % bn == 0 and k % bk == 0
    acc = jnp.int32 if a.dtype == jnp.int8 else jnp.float32
    return pl.pallas_call(
        functools.partial(_mm_kernel, acc_dtype=acc),
        grid=(m // bm, n // bn, k // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), acc),
        interpret=interpret,
    )(a, b)
