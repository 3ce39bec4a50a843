"""Probe: folded (space-to-depth) formulation of the MSD's strided GROUPED
convs — the candidate fix for the 49.5 ms MSD backward (exp_msd_bisect:
cost ~ T across scales; grouped convs contract only ci/g=8..64 of 128
lanes).

Scheme (generalizes ops/folded.py's _fold_plan to stride + groups): fold
time by f (f % stride == 0), output folds by f_out = f/stride; within one
channel group the conv becomes a stride-1 block conv with kernel
  Wb[q, r*cig+ci, p*cog+co] = sum_j [q*f + r == s*p + j - Pl] w[j, ci, co]
i.e. contraction depth f*cig (=128 when f chosen as 128/cig) and output
width f_out*cog per group, at Kb*f_out*s/k ~= 2x FLOP inflation. Group-
major channel layout keeps feature_group_count semantics; the probe pays
an explicit relayout transpose per conv (the real chain can absorb it
into the neighbor kernels' channel order).

Validates numerics vs the grouped conv oracle, then times grad marginals
(N-copies-in-one-jit, PERF.md 4a methodology) at the MSD layer shapes.

Run: JAX_PLATFORMS=cpu for numerics only; on TPU for timing.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from parrot_tts_tpu.ops import conv as conv_ops  # noqa: E402

B = 16
# (ci, co, k, stride, groups, pad, T_in) — MSD scale-0 layers 1..4
LAYERS = (
    (128, 128, 41, 2, 4, 20, 8960),
    (128, 256, 41, 2, 16, 20, 4480),
    (256, 512, 41, 4, 16, 20, 2240),
    (512, 1024, 41, 4, 16, 20, 560),
)


def fold_plan_strided(k: int, stride: int, pad_left: int, f: int):
    """q, r tables for o = stride*p + j - pad_left over p in [0, f_out)."""
    f_out = f // stride
    p = np.arange(f_out)[:, None]
    j = np.arange(k)[None, :]
    o = stride * p + j - pad_left
    q = o // f
    r = o - f * q
    qmin, qmax = int(q.min()), int(q.max())
    kb = qmax - qmin + 1
    return kb, qmin, q - qmin, r, f_out


def build_folded_kernel(w: np.ndarray, stride: int, pad_left: int, f: int):
    """w (k, cig, cog) one group -> Wb (Kb, f*cig, f_out*cog)."""
    k, cig, cog = w.shape
    kb, qmin, q, r, f_out = fold_plan_strided(k, stride, pad_left, f)
    wb = np.zeros((kb, f * cig, f_out * cog), w.dtype)
    for p in range(f_out):
        for j in range(k):
            wb[q[p, j], r[p, j] * cig:(r[p, j] + 1) * cig,
               p * cog:(p + 1) * cog] += w[j]
    return wb, (-qmin, qmin + kb - 1)


def grouped_ref(x, w, s, g, pad):
    return conv_ops.conv1d(x, w, None, stride=s, padding=pad, groups=g)


def main():
    on_tpu = jax.default_backend() == "tpu"
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    for ci, co, k, s, g, pad, t in LAYERS:
        cig, cog = ci // g, co // g
        f = max(s, 128 // cig)       # contraction f*cig >= 128
        while f % s:
            f += 1
        f_out = f // s
        kb, qmin, _, _, _ = fold_plan_strided(k, s, pad, f)
        pl, pr = -qmin, qmin + kb - 1

        x = (rng.standard_normal((B, t, ci)) * 0.1).astype(np.float32)
        w = (rng.standard_normal((k, cig, co)) * 0.05).astype(np.float32)

        # fold + group-major relayout: (B,T,ci)->(B,T/f,f,g,cig)->(B,T/f,g,f,cig)
        def to_folded(xa):
            b_, t_, _ = xa.shape
            xf = xa.reshape(b_, t_ // f, f, g, cig)
            return jnp.transpose(xf, (0, 1, 3, 2, 4)).reshape(
                b_, t_ // f, g * f * cig)

        # per-group folded kernels, concatenated on the OUT dim (WIO with
        # feature_group_count=g wants in-dim = f*cig, out = g*f_out*cog)
        wbs = []
        for gi in range(g):
            wb, _ = build_folded_kernel(
                w[:, :, gi * cog:(gi + 1) * cog], s, pad, f)
            wbs.append(wb)
        wb_all = np.concatenate(wbs, axis=2)  # (Kb, f*cig, g*f_out*cog)

        def folded_conv(xa, wba):
            xg = to_folded(xa)
            yf = jax.lax.conv_general_dilated(
                xg, wba, window_strides=(1,), padding=((pl, pr),),
                dimension_numbers=("NWC", "WIO", "NWC"),
                feature_group_count=g)
            # back to time-major unfolded (B, T/s, co) for comparison
            b_, tb_, _ = yf.shape
            y5 = yf.reshape(b_, tb_, g, f_out, cog)
            return jnp.transpose(y5, (0, 1, 3, 2, 4)).reshape(
                b_, tb_ * f_out, g * cog)

        want = np.asarray(grouped_ref(jnp.asarray(x), jnp.asarray(w),
                                      s, g, pad))
        got = np.asarray(folded_conv(jnp.asarray(x), jnp.asarray(wb_all)))
        # torch/XLA same-pad strided conv output length
        n = min(want.shape[1], got.shape[1])
        err = np.abs(want[:, :n] - got[:, :n]).max() / (
            np.abs(want).max() + 1e-9)
        print(f"ci{ci} co{co} s{s} g{g} f{f} Kb{kb} "
              f"out {want.shape[1]} vs {got.shape[1]}: rel_err={err:.2e} "
              f"(inflation {kb * f_out * s / k:.2f}x)", flush=True)

        if not on_tpu:
            continue

        # grad marginals: N copies in one jit
        x16 = jnp.asarray(x, jnp.bfloat16)
        w16 = jnp.asarray(w, jnp.bfloat16)
        wb16 = jnp.asarray(wb_all, jnp.bfloat16)
        gflops = 2 * B * (t // s) * k * cig * co / 1e9

        def timeit(fn, *args, iters=10):
            def _sync(o):
                return float(jnp.sum(jax.tree_util.tree_leaves(o)[0]
                                     .astype(jnp.float32)))
            for _ in range(2):
                _sync(fn(*args))
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(iters)]
            _sync(outs[-1])
            return (time.perf_counter() - t0) / iters * 1e3

        def marginal(makef, *args):
            times = {}
            for nrep in (1, 4):
                def fn(*a, nrep=nrep):
                    outs = []
                    for i in range(nrep):
                        outs.append(makef(i, *a))
                    return jnp.stack(outs).sum()
                times[nrep] = timeit(jax.jit(fn), *args)
            return (times[4] - times[1]) / 3

        def g_loss(i, xa, wa):
            xi = jnp.roll(xa, i, axis=1)
            return jnp.max(grouped_ref(xi, wa, s, g, pad)
                           .astype(jnp.float32))

        def f_loss(i, xa, wba):
            xi = jnp.roll(xa, i, axis=1)
            return jnp.max(folded_conv(xi, wba).astype(jnp.float32))

        # consume the FULL grad via max (slicing one element lets XLA DCE
        # most of the dW computation — the PERF.md 4a gotcha)
        mg = marginal(lambda i, xa, wa: jnp.max(jnp.abs(jax.grad(
            lambda w_: g_loss(i, xa, w_))(wa).astype(jnp.float32))),
            x16, w16)
        mf = marginal(lambda i, xa, wba: jnp.max(jnp.abs(jax.grad(
            lambda w_: f_loss(i, xa, w_))(wba).astype(jnp.float32))),
            x16, wb16)
        print(f"    dW marginal: grouped {mg:6.2f} ms "
              f"({gflops * 3 / mg:6.1f} TF/s-equiv)  folded {mf:6.2f} ms "
              f"-> {mg / mf:.2f}x", flush=True)


if __name__ == "__main__":
    import warnings

    warnings.filterwarnings("ignore")
    main()
