"""Bisect the 49.5 ms MSD param-grad (41% of the GAN step) with WHOLE-graph
timings only (per-layer probes drown in the ~1.5 ms per-call overhead,
scripts/exp_msd_layers.py).

Variants, each ONE jit:
  1. full MSD grad (reproduces exp_gan_backward's 49.5 ms)
  2. per-scale grads (which of the 3 scales dominates)
  3. scale-0 grad with spectral-norm update off (SN cost)
  4. real+fake stacked into one batch-32 pass (halves conv count)
  5. f32 discriminator A/B (is bf16 helping or hurting the backward?)

Run on TPU: python scripts/exp_msd_bisect.py
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
from parrot_tts_tpu.models.vocoder import losses  # noqa: E402
from parrot_tts_tpu.ops import conv as conv_ops  # noqa: E402

B, SEG = 16, 8960


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timeit(fn, *args, iters=15):
    for _ in range(3):
        _sync(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    _sync(outs[-1])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((B, SEG, 1)) * 0.2, jnp.float32)
    y_hat = jnp.asarray(rng.standard_normal((B, SEG, 1)) * 0.2, jnp.float32)
    msd_p = disc.init_msd(jax.random.key(0))
    ddt = jnp.bfloat16

    def rec(name, ms):
        print(f"{name:<46} {ms:8.2f} ms", flush=True)

    def msd_loss(p, dtype, update_sn=True):
        s_rs, s_gs, _, _, _ = disc.apply_msd(p, y, y_hat,
                                             update_sn=update_sn,
                                             dtype=dtype)
        return losses.discriminator_loss(s_rs, s_gs)[0]

    rec("full MSD grad bf16",
        timeit(jax.jit(jax.grad(lambda p: msd_loss(p, ddt))), msd_p))
    rec("full MSD grad f32",
        timeit(jax.jit(jax.grad(lambda p: msd_loss(p, None))), msd_p))
    rec("full MSD grad bf16, SN update off",
        timeit(jax.jit(jax.grad(lambda p: msd_loss(p, ddt, False))), msd_p))

    # per-scale: scale i sees the i-times avg-pooled inputs
    ys, yhs = y, y_hat
    for i in range(3):
        if i:
            ys = conv_ops.avg_pool1d(ys, 4, 2, 2)
            yhs = conv_ops.avg_pool1d(yhs, 4, 2, 2)
        pi = msd_p["discriminators"][i]
        yi, yhi = ys, yhs

        def one_scale(p, yi=yi, yhi=yhi, i=i):
            s_r, _, p2 = disc.apply_discriminator_s(p, yi, update_sn=True,
                                                    dtype=ddt)
            s_g, _, _ = disc.apply_discriminator_s(p2, yhi, update_sn=True,
                                                   dtype=ddt)
            return (jnp.mean((1.0 - s_r.astype(jnp.float32)) ** 2)
                    + jnp.mean(s_g.astype(jnp.float32) ** 2))
        rec(f"scale {i} grad (T={yi.shape[1]})",
            timeit(jax.jit(jax.grad(one_scale)), pi))

        def one_scale_stacked(p, yi=yi, yhi=yhi):
            both = jnp.concatenate([yi, yhi], axis=0)
            s, _, _ = disc.apply_discriminator_s(p, both, update_sn=True,
                                                 dtype=ddt)
            s = s.astype(jnp.float32)
            s_r, s_g = s[:B], s[B:]
            return (jnp.mean((1.0 - s_r) ** 2) + jnp.mean(s_g ** 2))
        rec(f"scale {i} grad, real+fake stacked",
            timeit(jax.jit(jax.grad(one_scale_stacked)), pi))


if __name__ == "__main__":
    import warnings

    warnings.filterwarnings("ignore")
    main()
