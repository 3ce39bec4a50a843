"""TTE decoder-stack backward attribution (VERDICT r4 #6).

PERF.md 4c stops at "dec stack grad 3.25 ms isolated, 39% MFU"; this
splits that region into its three sublayer families at the reference
bucket (B=6, T=512, d=256, conv filter 1024 k=(9,1), 2 heads, head 1000),
each measured by the MARGINAL method (N independent op copies inside one
jit, slope fitted — single-op timings carry ~1.3 ms relay dispatch cost,
PERF.md 4a):

  * attention sublayer fwd+bwd (the real training path: flash-dropout
    kernel when available, per-block remat off);
  * conv-FFN sublayer fwd+bwd (LN + k=9 conv 256->1024 + relu + k=1 conv
    1024->256 + residual) — the suspected starved dW shape;
  * output head fwd+bwd ((B,T,256) x (256,1000));
  * whole decoder stack grad for cross-checking the sum.

Run on TPU: python scripts/exp_tte_dec_bwd.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from parrot_tts_tpu.models.tte import fft  # noqa: E402


def _sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, *args, iters=15):
    for _ in range(3):
        _sync(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    _sync(outs[-1])
    return (time.perf_counter() - t0) / iters * 1e3


def marginal(build, ns=(2, 8, 16)):
    """build(n) -> (jitted fn, args). Returns (slope ms, intercept ms)."""
    ts = {}
    for n in ns:
        fn, args = build(n)
        ts[n] = timeit(fn, *args)
    ks = sorted(ts)
    slope = (ts[ks[-1]] - ts[ks[0]]) / (ks[-1] - ks[0])
    return slope, ts[ks[0]] - slope * ks[0], ts


B, T, D, NF, NH = 6, 512, 256, 1024, 2
K1, K2 = 9, 1
HEAD = 1000


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    report = {}

    def rec(name, slope, intercept, ts, flops):
        tfs = flops / (slope * 1e-3) / 1e12 if slope > 0 else float("inf")
        print(f"{name:<38} marginal {slope:7.3f} ms  ({tfs:6.1f} TF/s)  "
              f"intercept {intercept:5.2f} ms  raw={ts}", flush=True)
        report[name] = {"marginal_ms": round(slope, 4),
                        "tflops_s": round(tfs, 1),
                        "intercept_ms": round(intercept, 2)}

    # ---- conv-FFN sublayer fwd+bwd
    ffn_flops_fwd = 2 * B * T * (K1 * D * NF + K2 * NF * D)
    ffn_flops = 3 * ffn_flops_fwd          # dx + dw ~ 2x fwd

    def build_ffn(n):
        p = {
            "w1": jnp.asarray(rng.standard_normal((n, K1, D, NF)) * 0.02,
                              jnp.float32),
            "b1": jnp.zeros((n, NF), jnp.float32),
            "w2": jnp.asarray(rng.standard_normal((n, K2, NF, D)) * 0.02,
                              jnp.float32),
            "b2": jnp.zeros((n, D), jnp.float32),
            "x": jnp.asarray(rng.standard_normal((n, B, T, D)),
                             jnp.float32),
        }

        def loss(w1, b1, w2, b2, x):
            from parrot_tts_tpu.ops import conv as conv_ops

            c = conv_ops.conv1d(x, w1, b1, padding=(K1 - 1) // 2)
            c = jax.nn.relu(c)
            c = conv_ops.conv1d(c, w2, b2, padding=0)
            return jnp.sum((x + c) ** 2)

        def f(p):
            tot = 0.0
            for i in range(n):
                g = jax.grad(loss, argnums=(0, 2, 4))(
                    p["w1"][i], p["b1"][i], p["w2"][i], p["b2"][i],
                    p["x"][i])
                tot += sum(jnp.max(jnp.abs(t)) for t in g)
            return tot

        return jax.jit(f), (p,)

    s, i0, ts = marginal(build_ffn)
    rec("conv-FFN fwd+bwd (per block)", s, i0, ts, ffn_flops)

    # ---- attention sublayer fwd+bwd (real path: qkv proj + MHA with
    # dropout + out proj; flash-dropout kernel engages on TPU at T=512)
    attn_flops_fwd = 2 * B * T * (D * 3 * D + D * D * 2 + D * D) \
        + 2 * 2 * B * NH * T * T * (D // NH)
    attn_flops = 3 * attn_flops_fwd

    def build_attn(n):
        keys = jax.random.split(jax.random.key(0), n)
        params = [fft.init_fft_block(jax.random.key(100 + i), D, NF,
                                     (K1, K2))
                  for i in range(n)]
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *params)
        x = jnp.asarray(rng.standard_normal((n, B, T, D)), jnp.float32)

        def attn_only(p, xi, key):
            from parrot_tts_tpu.ops import attention as attn_ops

            a = p["attn"]
            h = fft.layer_norm(xi, p["attn_norm"]["scale"],
                               p["attn_norm"]["bias"])
            q, k, v = jnp.split(jnp.einsum("btd,de->bte", h, a["qkv"]),
                                3, axis=-1)
            y = attn_ops.multi_head_attention(
                q, k, v, a["in_proj"], a["out_proj"], NH,
                dropout_p=0.1, dropout_rng=key, deterministic=False)
            y = jnp.einsum("btd,de->bte", y, a["wo"])
            return jnp.sum((xi + y) ** 2)

        def f(stacked, x, keys):
            tot = 0.0
            for i in range(n):
                p_i = jax.tree_util.tree_map(lambda t: t[i], stacked)
                g = jax.grad(attn_only, argnums=(0, 1))(p_i, x[i], keys[i])
                tot += sum(jnp.max(jnp.abs(t))
                           for t in jax.tree_util.tree_leaves(g))
            return tot

        return jax.jit(f), (stacked, x, keys)

    s, i0, ts = marginal(build_attn)
    rec("attention sublayer fwd+bwd (per block)", s, i0, ts, attn_flops)

    # ---- head fwd+bwd
    head_flops = 3 * 2 * B * T * D * HEAD

    def build_head(n):
        w = jnp.asarray(rng.standard_normal((n, D, HEAD)) * 0.02,
                        jnp.float32)
        x = jnp.asarray(rng.standard_normal((n, B, T, D)), jnp.float32)

        def loss(wi, xi):
            return jnp.sum(jnp.einsum("btd,dc->btc", xi, wi) ** 2)

        def f(w, x):
            tot = 0.0
            for i in range(n):
                g = jax.grad(loss, argnums=(0, 1))(w[i], x[i])
                tot += sum(jnp.max(jnp.abs(t)) for t in g)
            return tot

        return jax.jit(f), (w, x)

    s, i0, ts = marginal(build_head)
    rec("head (256x1000) fwd+bwd", s, i0, ts, head_flops)

    # ---- dW-only for the k=9 conv (the starved-shape suspect): contrast
    # the conv-expressed dW against an explicit im2col matmul dW
    dw_flops = 2 * B * T * K1 * D * NF

    def build_dw_conv(n):
        x = jnp.asarray(rng.standard_normal((n, B, T, D)), jnp.float32)
        ct = jnp.asarray(rng.standard_normal((n, B, T, NF)), jnp.float32)

        def dw(xi, ci):
            def loss(w):
                from parrot_tts_tpu.ops import conv as conv_ops

                return jnp.sum(conv_ops.conv1d(
                    xi, w, padding=(K1 - 1) // 2) * ci)
            return jax.grad(loss)(jnp.zeros((K1, D, NF), jnp.float32))

        def f(x, ct):
            tot = 0.0
            for i in range(n):
                tot += jnp.max(jnp.abs(dw(x[i], ct[i])))
            return tot

        return jax.jit(f), (x, ct)

    s, i0, ts = marginal(build_dw_conv)
    rec("k=9 conv dW (conv-expressed)", s, i0, ts, dw_flops)

    def build_dw_im2col(n):
        x = jnp.asarray(rng.standard_normal((n, B, T, D)), jnp.float32)
        ct = jnp.asarray(rng.standard_normal((n, B, T, NF)), jnp.float32)
        pad = (K1 - 1) // 2

        def dw(xi, ci):
            xp = jnp.pad(xi, ((0, 0), (pad, pad), (0, 0)))
            # patches (B, T, K1, D) via static shifted slices
            cols = jnp.stack([xp[:, j:j + T] for j in range(K1)], axis=2)
            return jnp.einsum("btkd,btf->kdf", cols, ci)

        def f(x, ct):
            tot = 0.0
            for i in range(n):
                tot += jnp.max(jnp.abs(dw(x[i], ct[i])))
            return tot

        return jax.jit(f), (x, ct)

    s, i0, ts = marginal(build_dw_im2col)
    rec("k=9 conv dW (explicit im2col matmul)", s, i0, ts, dw_flops)

    # ---- whole 4-block decoder stack grad, marginal (cross-check vs the
    # 3.25 ms single-shot from exp_tte_roofline: how much of that was
    # dispatch floor?)
    stack_flops = 4 * (ffn_flops + attn_flops) + head_flops

    def build_stack(n):
        stacks = []
        for i in range(n):
            blocks = [fft.init_fft_block(jax.random.key(1000 + 4 * i + j),
                                         D, NF, (K1, K2))
                      for j in range(4)]
            stacks.append(jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *blocks))
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *stacks)
        head_w = jnp.asarray(rng.standard_normal((n, D, HEAD)) * 0.02,
                             jnp.float32)
        x = jnp.asarray(rng.standard_normal((n, B, T, D)), jnp.float32)
        keys = jax.random.split(jax.random.key(7), n)

        def stack_loss(p4, hw, xi, key):
            h = xi
            for j in range(4):
                pj = jax.tree_util.tree_map(lambda t: t[j], p4)
                h = fft.apply_fft_block(
                    pj, h, kernel_sizes=(K1, K2), n_head=NH,
                    dropout_p=0.1, dropout_rng=jax.random.fold_in(key, j),
                    deterministic=False)
            return jnp.sum(jnp.einsum("btd,dc->btc", h, hw) ** 2)

        def f(stacked, head_w, x, keys):
            tot = 0.0
            for i in range(n):
                p_i = jax.tree_util.tree_map(lambda t: t[i], stacked)
                g = jax.grad(stack_loss, argnums=(0, 1, 2))(
                    p_i, head_w[i], x[i], keys[i])
                tot += sum(jnp.max(jnp.abs(t))
                           for t in jax.tree_util.tree_leaves(g))
            return tot

        return jax.jit(f), (stacked, head_w, x, keys)

    s, i0, ts = marginal(build_stack, ns=(1, 2, 4))
    rec("4-block decoder stack + head grad", s, i0, ts, stack_flops)

    print(json.dumps(report))


if __name__ == "__main__":
    import warnings

    warnings.filterwarnings("ignore")
    main()
