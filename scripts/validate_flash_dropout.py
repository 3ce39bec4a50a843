"""TPU validation + A/B bench for ops/flash_dropout.py (run solo: only one
process may attach to the TPU — see PERF.md methodology).

1. Exactness: dump the kernel's tile-regenerated keep-mask
   (`dump_keep_mask`), feed the SAME mask to an XLA oracle, and compare
   forward output and all three input grads. This proves the fwd/dq/dkv
   kernels regenerate identical dropout masks from the counter PRNG.
2. A/B: fwd+bwd wall time of the dropout-flash path vs the XLA O(T^2) path
   at the TTE reference training shapes (d_model 256, 2 heads, dh 128),
   including the 3584-frame long bucket PERF.md flagged.

Usage: python scripts/validate_flash_dropout.py
"""

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from parrot_tts_tpu.ops import flash_dropout as fd  # noqa: E402

P_DROP = 0.1


def oracle_with_mask(q, k, v, bias, keep, p):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (1.0 / np.sqrt(q.shape[-1]))
    s = s + bias[:, None, None, :]
    a = jax.nn.softmax(s, -1)
    a = jnp.where(keep.astype(bool), a, 0.0) / (1.0 - p)
    return jnp.einsum("bhqk,bhkd->bhqd", a, v)


def check_exactness():
    rng = np.random.default_rng(0)
    b, h, t, d = 2, 2, 512, 128
    blk = 256
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
               for _ in range(3))
    kpm = np.zeros((b, t), bool)
    kpm[0, 400:] = True
    bias = jnp.where(jnp.asarray(kpm), fd.NEG_BIAS, 0.0).astype(jnp.float32)
    seed = jnp.array([1234], jnp.int32)
    scale = 1.0 / np.sqrt(d)

    keep = fd.dump_keep_mask(b, h, t, seed, P_DROP, blk, blk)
    frac = float(jnp.mean(keep.astype(jnp.float32)))
    print(f"keep fraction: {frac:.4f} (target {1-P_DROP:.4f})")
    assert abs(frac - (1 - P_DROP)) < 5e-3

    def loss_kernel(q, k, v):
        o = fd.flash_attention_dropout(q, k, v, bias, seed, P_DROP, scale,
                                       blk, blk)
        return jnp.sum(jnp.sin(o)), o

    def loss_oracle(q, k, v):
        o = oracle_with_mask(q, k, v, bias, keep, P_DROP)
        return jnp.sum(jnp.sin(o)), o

    (lk, ok), gk = jax.value_and_grad(loss_kernel, argnums=(0, 1, 2),
                                      has_aux=True)(q, k, v)
    (lo, oo), go = jax.value_and_grad(loss_oracle, argnums=(0, 1, 2),
                                      has_aux=True)(q, k, v)
    err_o = float(jnp.max(jnp.abs(ok - oo)))
    print(f"fwd max err vs same-mask oracle: {err_o:.2e}")
    assert err_o < 2e-2, "forward mismatch — mask regeneration differs"
    for name, a, bb in zip("qkv", gk, go):
        ref = float(jnp.max(jnp.abs(bb)))
        err = float(jnp.max(jnp.abs(a - bb)))
        print(f"d{name} max err: {err:.2e}  (ref max {ref:.2e})")
        assert err < 3e-2 * max(1.0, ref), f"d{name} mismatch"
    print("exactness: OK — fwd/dq/dkv regenerate the identical mask")


def bench_ab():
    from parrot_tts_tpu.ops import attention as attn_ops

    rng = np.random.default_rng(0)
    d_model, n_head = 256, 2
    in_proj = jnp.asarray(
        rng.standard_normal((d_model, 3 * d_model)).astype(np.float32) * 0.05)
    out_proj = jnp.asarray(
        rng.standard_normal((d_model, d_model)).astype(np.float32) * 0.05)

    # The first timed queue of a process measures ~60 ms/iter regardless of
    # shape (relay warm-up beyond the per-config compile warmups); burn one
    # throwaway config so the recorded numbers are steady-state.
    configs = [(6, 512), (6, 512), (6, 1024), (6, 3584)]
    burn_in = True
    for b, t in configs:
        x = jnp.asarray(
            rng.standard_normal((b, t, d_model)).astype(np.float32))
        kpm = np.zeros((b, t), bool)
        kpm[:, int(t * 0.9):] = True
        kpm_j = jnp.asarray(kpm)
        key = jax.random.key(0)

        def run(force_xla):
            def loss(x, rng_key):
                y = attn_ops.multi_head_attention(
                    x, x, x, in_proj, out_proj, n_head,
                    key_padding_mask=kpm_j, dropout_p=P_DROP,
                    dropout_rng=rng_key, deterministic=False,
                    force_xla=force_xla)
                return jnp.sum(y * y)

            g = jax.jit(jax.grad(loss))
            # warmup w/ fetch; then queue iters, fetch last (PERF.md barrier)
            for _ in range(2):
                float(jnp.sum(g(x, key)))
            n = 20
            t0 = time.perf_counter()
            outs = [g(x, jax.random.fold_in(key, i)) for i in range(n)]
            float(jnp.sum(outs[-1]))
            return (time.perf_counter() - t0) / n * 1e3

        ms_flash = run(False)
        ms_xla = run(True)
        if burn_in:
            burn_in = False
            continue
        print(f"B={b} T={t}: fwd+bwd flash-dropout {ms_flash:.2f} ms | "
              f"XLA {ms_xla:.2f} ms | speedup {ms_xla/ms_flash:.2f}x")


if __name__ == "__main__":
    assert jax.default_backend() == "tpu", "run on the TPU"
    check_exactness()
    bench_ab()
