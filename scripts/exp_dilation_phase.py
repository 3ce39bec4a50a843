"""Experiment: dilation-phase decomposition vs folded dilated conv.

VERDICT r2 suggested lowering d-dilated convs via phase decomposition
(d stride-sliced plain convs, zero FLOP inflation) instead of the folded
block-Toeplitz form (inflation ~(g + d(k-1))/k). The catch this experiment
quantifies: in the folded layout the phase split is NOT a free reshape —
it is a (T/d, d) transpose, an HBM round trip whose cost rivals the MXU
savings. Cost model (PERF.md r2c numbers, v5e: 148 TFLOP/s executed MXU
rate, ~800 GB/s HBM):

    per conv, per frame:  MXU saved = dMACs*2/148e12
                          HBM added = 8*T_s*C_s/800e9  (2 transposes)

At stage-5 shapes (T_s=320/frame, C=16, g=8) the biggest saver (k=11, d=5)
saves ~44 ns/frame of MXU and pays ~50 ns/frame of HBM — net ~zero, and
every other conv is worse. This script MEASURES that on the chip: the
current folded dilated conv vs transpose -> phase-major folded conv ->
transpose-back, at the three folded stages' shapes.

Usage: python scripts/exp_dilation_phase.py
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
from parrot_tts_tpu.ops import folded as folded_ops  # noqa: E402


def phase_major_conv(xf, w, *, g, d, k):
    """d-dilated conv on a g-folded (B, Tb, g*C) input via phase-major
    decomposition: unfold -> (B, T/d, d, C) -> transpose -> per-phase plain
    conv (dilation 1) refolded by g -> transpose back -> refold."""
    b, tb, gc = xf.shape
    c = gc // g
    t = tb * g
    pad = conv_ops.get_padding(k, d)
    x = folded_ops.unfold(xf, g)                       # free
    xp = x.reshape(b, t // d, d, c).transpose(0, 2, 1, 3)   # HBM transpose
    xp = xp.reshape(b * d, t // d, c)
    xpf = folded_ops.fold(xp, g)                        # free
    # same-length plain conv with pad (k-1)/2*? -> pad//d = (k-1)/2
    y = folded_ops.folded_conv1d(xpf, w, None, g=g, padding=pad // d,
                                 dilation=1)
    y = folded_ops.unfold(y, g)                         # free
    y = y.reshape(b, d, t // d, c).transpose(0, 2, 1, 3)    # HBM transpose
    return folded_ops.fold(y.reshape(b, t, c), g)       # free


def timeit(fn, *args, iters=20):
    jfn = jax.jit(fn)
    for _ in range(3):
        float(jnp.sum(jfn(*args)))
    t0 = time.perf_counter()
    outs = [jfn(*args) for _ in range(iters)]
    float(jnp.sum(outs[-1]))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    batch, codes = 64, 250
    print(f"backend: {jax.default_backend()}")
    # (stage, C, g, T_per_frame) for the three folded V1 tail stages
    stages = [(3, 64, 2, 80), (4, 32, 4, 160), (5, 16, 8, 320)]
    burn = True
    for (si, c, g, tpf) in stages:
        t = tpf * codes
        xf = jnp.asarray(rng.standard_normal(
            (batch, t // g, g * c)).astype(np.float32), jnp.bfloat16)
        for k, d in ((11, 5), (7, 5), (11, 3), (3, 5)):
            if (t // d) % g or t % d:
                continue
            w = jnp.asarray(rng.standard_normal(
                (k, c, c)).astype(np.float32) * 0.1, jnp.bfloat16)
            pad = conv_ops.get_padding(k, d)

            ms_folded = timeit(
                lambda xf, w: folded_ops.folded_conv1d(
                    xf, w, None, g=g, padding=pad, dilation=d), xf, w)
            ms_phase = timeit(
                lambda xf, w: phase_major_conv(xf, w, g=g, d=d, k=k), xf, w)
            if burn:                 # relay warm-up artifact on first config
                burn = False
                ms_folded = timeit(
                    lambda xf, w: folded_ops.folded_conv1d(
                        xf, w, None, g=g, padding=pad, dilation=d), xf, w)
            print(f"stage {si} (C={c}, g={g}, T={t}): k={k} d={d}  "
                  f"folded {ms_folded:.2f} ms | phase-major {ms_phase:.2f} ms"
                  f" | ratio {ms_phase/ms_folded:.2f}x")


if __name__ == "__main__":
    main()
