"""Experiment: where does the GAN discriminator time go, and can the MSD
grouped convs be folded onto full lanes?

The GAN step is ~131 ms at reference config with the discriminator stacks
in its hot loop (PERF.md 3d). MSD uses grouped 1D convs with 8-64
channels per group (reference models.py:231-236) — lane-starved on the
MXU for the same reason the vocoder tail was (C < 128 on the lane dim).
The vocoder fix was the space-to-depth fold; for a GROUPED conv the fold
applies per group: (T, Cg) -> (T/f, f*Cg) with f*Cg = 128, block-Toeplitz
per group, and k=41 is long enough that the FLOP inflation is tiny
(Kb*f/k ~ 1.1 at Cg=64).

Sections:
  1. time apply_mpd vs apply_msd separately (fwd, batch 16 x 8960, f32
     and bf16)
  2. time each MSD conv layer as-is vs a folded-grouped lowering
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

from parrot_tts_tpu.models.vocoder import discriminator as disc  # noqa: E402
from parrot_tts_tpu.ops import conv as conv_ops  # noqa: E402
from parrot_tts_tpu.ops import folded as folded_ops  # noqa: E402


def timeit(fn, *args, iters=10):
    jfn = jax.jit(fn)
    for _ in range(3):
        float(jnp.sum(jfn(*args)))
    t0 = time.perf_counter()
    outs = [jfn(*args) for _ in range(iters)]
    float(jnp.sum(outs[-1]))
    return (time.perf_counter() - t0) / iters * 1e3


def grouped_conv_folded(x, w, *, stride, padding, groups, fold):
    """Grouped conv1d with each group's channels folded by `fold` so the
    per-group contraction fills f*Cg lanes. Exact same outputs (up to fp
    reassociation) as conv1d(..., groups=groups) for stride 1; stride>1
    is handled by folding the output phase into channels then slicing."""
    b, t, cin = x.shape
    k, cg, cout = w.shape            # cg = cin/groups
    co_g = cout // groups
    # per-group fold: (B, T, G, Cg) -> (B, T/f, G, f*Cg) needs a
    # transpose unless G is outermost... do it group-major instead:
    # x (B, T, G*Cg): slice each group (free), fold (free), conv, concat.
    outs = []
    for g_i in range(groups):
        xg = x[:, :, g_i * cg:(g_i + 1) * cg]
        wg = w[:, :, g_i * co_g:(g_i + 1) * co_g]
        xf = folded_ops.fold(xg, fold)
        yf = folded_ops.folded_conv1d(xf, wg, None, g=fold, padding=padding)
        y = folded_ops.unfold(yf, fold)
        if stride > 1:
            y = y[:, ::stride]
        outs.append(y)
    return jnp.concatenate(outs, axis=-1)


def main():
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}")
    b, t = 16, 8960
    y = jnp.asarray(rng.standard_normal((b, t, 1)).astype(np.float32) * 0.3)

    kp, ks = jax.random.split(jax.random.key(0))
    mpd_p = disc.init_mpd(kp)
    msd_p = disc.init_msd(ks)

    def mpd_fwd(p):
        rs, gs, _, _ = disc.apply_mpd(p, y, y)
        return sum(jnp.sum(s) for s in rs + gs)

    def msd_fwd(p):
        rs, gs, _, _, _ = disc.apply_msd(p, y, y, update_sn=False)
        return sum(jnp.sum(s) for s in rs + gs)

    burn = timeit(mpd_fwd, mpd_p)
    ms_mpd = timeit(mpd_fwd, mpd_p)
    ms_msd = timeit(msd_fwd, msd_p)
    print(f"MPD fwd pair: {ms_mpd:.2f} ms | MSD fwd pair: {ms_msd:.2f} ms")

    # per-layer MSD conv timing: as-is grouped vs folded-grouped
    print("MSD conv layers (one scale, batch 16, T=8960):")
    x = jnp.asarray(rng.standard_normal((b, t, 1)).astype(np.float32))
    for (ci, co, k, s, g, pad) in disc._MSD_LAYERS:
        cg = ci // g
        w = jnp.asarray(rng.standard_normal((k, cg, co)).astype(np.float32)
                        * 0.05)
        xin = jnp.asarray(rng.standard_normal((b, t, ci)).astype(np.float32))
        ms_plain = timeit(
            lambda xx, ww: jnp.sum(conv_ops.conv1d(
                xx, ww, None, stride=s, padding=pad, groups=g)), xin, w)
        line = (f"  ci={ci:4d} co={co:4d} k={k} s={s} g={g:2d}: "
                f"grouped {ms_plain:6.2f} ms")
        if g > 1 and cg < 128:
            fold = max(1, 128 // cg)
            if t % fold == 0:
                ms_folded = timeit(
                    lambda xx, ww: jnp.sum(grouped_conv_folded(
                        xx, ww, stride=s, padding=pad, groups=g, fold=fold)),
                    xin, w)
                line += f" | folded(f={fold}) {ms_folded:6.2f} ms"
        print(line, flush=True)


if __name__ == "__main__":
    main()
