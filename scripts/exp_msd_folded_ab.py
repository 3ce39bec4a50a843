"""A/B: whole-MSD param-grad, folded vs grouped conv path (bf16, stacked),
at the training shapes — did the 2-3x per-layer dW wins survive the full
graph (transposes, per-step kernel packing, dX)?"""

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

    def msd_loss(p, folded):
        s_rs, s_gs, _, _, _ = disc.apply_msd(
            p, y, y_hat, update_sn=True, dtype=ddt, stacked=True,
            folded=folded)
        return losses.discriminator_loss(s_rs, s_gs)[0]

    for folded in (False, True):
        g = timeit(jax.jit(jax.grad(
            lambda p: msd_loss(p, folded))), msd_p)
        f = timeit(jax.jit(lambda p: msd_loss(p, folded)), msd_p)
        print(f"folded={folded}: fwd {f:7.2f} ms   grad {g:7.2f} ms",
              flush=True)

    # input-side grad (the G-step's cotangent path through the MSD)
    for folded in (False, True):

        def loss_wrt_yhat(yh, folded=folded):
            s_rs, s_gs, _, _, _ = disc.apply_msd(
                msd_p, y, yh, update_sn=True, dtype=ddt, stacked=True,
                folded=folded)
            return losses.generator_loss(s_gs)[0]
        g = timeit(jax.jit(jax.grad(loss_wrt_yhat)), y_hat)
        print(f"folded={folded}: dX (cotangent) {g:7.2f} ms", flush=True)


if __name__ == "__main__":
    import warnings

    warnings.filterwarnings("ignore")
    main()
