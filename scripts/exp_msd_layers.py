"""MSD grouped-conv backward: per-layer attribution + rewrite A/Bs.

exp_gan_backward measured MSD param-grad at 49.5 ms vs its 9.1 ms forward
(41% of the whole 120 ms GAN step); MPD's grad is 8.6 ms. The MSD is 7
conv1d layers, k=41, groups 4/16, strides 2/4, T from 8960 down. This
script times fwd / d(params) / d(input) per layer at the scale-0 shapes
(batch 16, bf16) and A/Bs rewrites of the worst layer:

  a) feature_group_count conv (current)
  b) per-group unrolled convs (g small dense convs)
  c) dense conv with block-diagonal weights (only where g*flops is sane)

Run on TPU: python scripts/exp_msd_layers.py
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
LAYERS = (  # (ci, co, k, stride, groups, pad) reference models.py:236-244
    (1, 128, 15, 1, 1, 7),
    (128, 128, 41, 2, 4, 20),
    (128, 256, 41, 2, 16, 20),
    (256, 512, 41, 4, 16, 20),
    (512, 1024, 41, 4, 16, 20),
    (1024, 1024, 41, 1, 16, 20),
    (1024, 1024, 5, 1, 1, 2),
)


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


def grouped(x, w, s, g, pad):
    return conv_ops.conv1d(x, w, None, stride=s, padding=pad, groups=g)


def unrolled(x, w, s, g, pad):
    # g separate dense convs over channel slices
    ci = x.shape[-1]
    cig = ci // g
    cog = w.shape[-1] // g
    outs = []
    for gi in range(g):
        xg = x[:, :, gi * cig:(gi + 1) * cig]
        wg = w[:, :, gi * cog:(gi + 1) * cog]
        outs.append(conv_ops.conv1d(xg, wg, None, stride=s, padding=pad))
    return jnp.concatenate(outs, axis=-1)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    t = 8960
    for li, (ci, co, k, s, g, pad) in enumerate(LAYERS):
        x = jnp.asarray(rng.standard_normal((B, t, ci)) * 0.1, jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, ci // g, co)) * 0.05,
                        jnp.bfloat16)
        flops = 2 * B * (t // s) * k * (ci // g) * co

        fwd = timeit(jax.jit(lambda x, w: grouped(x, w, s, g, pad)), x, w)
        dw = timeit(jax.jit(jax.grad(
            lambda w, x: jnp.sum(grouped(x, w, s, g, pad)
                                 .astype(jnp.float32)))), w, x)
        dx = timeit(jax.jit(jax.grad(
            lambda x, w: jnp.sum(grouped(x, w, s, g, pad)
                                 .astype(jnp.float32)))), x, w)
        print(f"L{li} ci{ci:4d} co{co:4d} k{k} s{s} g{g:2d} T{t:5d}: "
              f"fwd {fwd:6.2f}  dW {dw:6.2f}  dX {dx:6.2f} ms "
              f"(fwd {flops/fwd/1e9:5.1f} TF/s)", flush=True)

        if g > 1:
            try:
                dwu = timeit(jax.jit(jax.grad(
                    lambda w, x: jnp.sum(unrolled(x, w, s, g, pad)
                                         .astype(jnp.float32)))), w, x)
                print(f"    unrolled-groups dW: {dwu:6.2f} ms", flush=True)
            except Exception as e:
                print(f"    unrolled dW FAILED: {str(e)[:100]}", flush=True)
        t = t // s  # next layer's input length


if __name__ == "__main__":
    import warnings

    warnings.filterwarnings("ignore")
    main()
