"""Fused MRF (multi-receptive-field) residual stack — Pallas TPU kernel.

The vocoder generator's hot loop is the MRF stack after each upsample
(reference `utils/vocoder/models.py:13-44,100-106`): 3 ResBlocks (kernel
sizes 3/7/11), each a sequential chain of 3 (dilated conv, plain conv)
pairs with leaky-relus and residual adds, summed and averaged. That is 18
convolutions per stage, and XLA executes each as its own fusion: every conv
round-trips the full activation tensor through HBM. At the folded tail
(ops/folded.py; stage 5 runs (B, 10000, 128) bf16 ~ 164 MB per tensor at
batch 64) those ~36 HBM transfers, not MXU time, are the measured residual
cost (PERF.md roofline: 42% MFU, HBM-bound).

This kernel computes the ENTIRE stack — 18 block-packed convs + leaky-relus
+ residual adds + the 3-way average — on a VMEM-resident tile of the folded
sequence: one DMA read of the tile (+halo), one write of the result. The
host pads the sequence by `halo` zeros on both sides first, so every
program DMAs a fixed-size strip with no edge cases, and the zeros reproduce
'same'-conv semantics at the true sequence ends exactly.

Correctness of tiling a sequential conv chain: convs on the strip zero-pad
at the strip edges; for interior tiles those zeros are wrong, but the
contamination advances at most pl (left) / pr (right) rows per conv, so the
cumulative garbage depth is bounded by `halo` = max over branches of the
chain's one-sided receptive field — it never reaches the central tb rows
that are written out.

Weights arrive pre-packed in the folded block-Toeplitz form
(`ops/folded.py::fold_conv1d_kernel`), so numerics match the unfused folded
path up to f32-accumulation order.

Serving-path only (training differentiates through the unfused composition;
this kernel defines no VJP).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parrot_tts_tpu.ops import folded as folded_ops

LRELU_SLOPE = 0.1


def _leaky_relu(x):
    """leaky_relu via max(x, slope*x) (valid for 0 <= slope <= 1) — the
    select/cmpf form crashes Mosaic's bf16 vector lowering."""
    return jnp.maximum(x, jnp.asarray(LRELU_SLOPE, x.dtype) * x)


@dataclass(frozen=True)
class MRFPlan:
    """Static description of one stage's fused stack.

    pairs[b] = tuple of ((pl1, pr1), (pl2, pr2)) per (dilated, plain) conv
    pair in branch b. halo = max over branches of the chain's one-sided
    receptive field in folded rows, rounded up to 8 sublanes.
    """
    n_branch: int
    pairs: tuple
    halo: int


def pack_mrf(resblocks: list[dict], g: int, kernel_sizes, dilation_sizes,
             dtype) -> tuple[list[jnp.ndarray], MRFPlan]:
    """Pack a stage's ResBlock1 params (already weight-norm folded —
    serving path) into folded block kernels + biases, flattened in kernel
    traversal order: for each branch, for each pair: w1, b1, w2, b2."""
    flat: list[jnp.ndarray] = []
    pairs = []
    halo = 0
    for rb, k, dils in zip(resblocks, kernel_sizes, dilation_sizes):
        chain = 0
        branch_pads = []
        for c1, c2, d in zip(rb["convs1"], rb["convs2"], dils):
            pad1 = (k - 1) * d // 2
            w1, (pl1, pr1) = folded_ops.fold_conv1d_kernel(
                c1["w"], dilation=d, pad_left=pad1, g=g)
            pad2 = (k - 1) // 2
            w2, (pl2, pr2) = folded_ops.fold_conv1d_kernel(
                c2["w"], dilation=1, pad_left=pad2, g=g)
            flat += [w1.astype(dtype), jnp.tile(c1["b"], g).astype(dtype),
                     w2.astype(dtype), jnp.tile(c2["b"], g).astype(dtype)]
            branch_pads.append(((pl1, pr1), (pl2, pr2)))
            chain += max(pl1, pr1) + max(pl2, pr2)
        pairs.append(tuple(branch_pads))
        halo = max(halo, chain)
    halo = -(-halo // 8) * 8
    return flat, MRFPlan(n_branch=len(resblocks), pairs=tuple(pairs),
                         halo=halo)


def _strip_conv(x, w, b, pl_, pr_):
    """'Same' conv on the full strip: y[t] = sum_kappa x[t + kappa - pl] @
    w[kappa] + b, zeros beyond the strip."""
    lp = x.shape[0]
    kb = w.shape[0]
    co = w.shape[2]
    xp = jnp.concatenate([
        jnp.zeros((pl_, x.shape[1]), x.dtype), x,
        jnp.zeros((pr_, x.shape[1]), x.dtype)], axis=0)
    acc = jnp.zeros((lp, co), jnp.float32)
    for kappa in range(kb):
        acc = acc + jax.lax.dot_general(
            xp[kappa:kappa + lp], w[kappa],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return (acc + b.astype(jnp.float32)[None, :]).astype(x.dtype)


def _mrf_kernel(*refs, plan: MRFPlan, tb: int, t_total: int):
    halo = plan.halo
    x_hbm = refs[0]
    w_refs = refs[1:-3]
    o_ref, strip_ref, sem = refs[-3], refs[-2], refs[-1]
    b, i = pl.program_id(0), pl.program_id(1)

    # DMA the (tb + 2*halo, C) strip from the halo-padded HBM array
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * tb, tb + 2 * halo), :], strip_ref, sem)
    dma.start()
    dma.wait()
    x = strip_ref[...]

    # rows of the strip outside the true sequence must stay ZERO through
    # the whole chain — each reference conv zero-pads its own input at the
    # sequence ends, while conv biases would otherwise turn the halo rows
    # nonzero and leak inward through later convs
    lp = tb + 2 * halo
    grow = jax.lax.broadcasted_iota(jnp.int32, (lp, 1), 0) + i * tb - halo
    valid = jnp.logical_and(grow >= 0, grow < t_total).astype(x.dtype)

    wi = iter(w_refs)
    acc = jnp.zeros(x.shape, jnp.float32)
    for br in range(plan.n_branch):
        y = x
        for (pl1, pr1), (pl2, pr2) in plan.pairs[br]:
            w1, b1, w2, b2 = (next(wi)[...] for _ in range(4))
            t = _leaky_relu(y)
            t = _strip_conv(t, w1, b1, pl1, pr1)
            t = t * valid
            t = _leaky_relu(t)
            t = _strip_conv(t, w2, b2, pl2, pr2)
            t = t * valid
            y = y + t
        acc = acc + y.astype(jnp.float32)
    out = (acc * (1.0 / plan.n_branch)).astype(o_ref.dtype)
    o_ref[0] = out[halo:halo + tb, :]


def _pick_tb(t: int, halo: int) -> int | None:
    """Largest divisor of t that is a multiple of 8 sublanes, >= 4*halo
    (halo overhead <= ~50% compute), and <= 4096 rows (VMEM)."""
    best = None
    for tb in range(8, min(t, 4096) + 1, 8):
        if t % tb == 0 and tb >= 4 * halo:
            best = tb
    return best


def mrf_fused(x: jnp.ndarray, flat_weights: list[jnp.ndarray],
              plan: MRFPlan) -> jnp.ndarray | None:
    """Run the fused stack. x: (B, Tb, C) folded activations. Returns None
    if no suitable tile size exists (caller falls back to the unfused
    path)."""
    bsz, t, c = x.shape
    tb = _pick_tb(t, plan.halo)
    if tb is None:
        return None
    n_blocks = t // tb
    halo = plan.halo
    xp = jnp.pad(x, ((0, 0), (halo, halo), (0, 0)))

    kern = functools.partial(_mrf_kernel, plan=plan, tb=tb, t_total=t)
    return pl.pallas_call(
        kern,
        grid=(bsz, n_blocks),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat_weights],
        out_specs=pl.BlockSpec((1, tb, c), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tb + 2 * halo, c), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=jax.default_backend() != "tpu",
    )(xp, *flat_weights)
