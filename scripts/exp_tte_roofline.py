"""TTE train-step roofline: executed-FLOP attribution per component
(VERDICT r3 #4 — the r2c treatment that redirected vocoder optimization,
applied to the 26.6%-MFU train step).

Decomposes the reference-bucket micro step (B=6, S=128, T=512, d=256,
nf=1024, 4+4 layers, 1000-way head) into:
  full step = fwd + bwd + optimizer
  fwd       = enc stack + dec stack + head/loss + durpred/LR + misc
and times each piece as its own jit at the real shapes. Also times the
mixed-precision A/B candidate (bf16 compute, f32 master params + loss):
default-precision f32 matmuls on TPU do NOT run at the bf16 MXU rate, so
if the step is MXU-bound the cast is the first lever.

Run on TPU: python scripts/exp_tte_roofline.py
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

from parrot_tts_tpu.core.config import (TTEModelConfig,  # noqa: E402
                                        TTETrainConfig,
                                        TransformerStackConfig)
from parrot_tts_tpu.models.tte import fft, parrot  # noqa: E402
from parrot_tts_tpu.train import tte as tte_train  # noqa: E402

B, S, T, D, NF = 6, 128, 512, 256, 1024
GRAD_ACC = 4


def _sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def timeit(fn, *args, iters=30):
    for _ in range(3):
        _sync(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    _sync(outs[-1])
    return (time.perf_counter() - t0) / iters * 1e3


def make_batch(cfg, rng):
    src_lens = rng.integers(S - 16, S + 1, size=B)
    durs = np.zeros((B, S), np.int32)
    for i, n in enumerate(src_lens):
        d = rng.integers(2, 7, size=n)
        scale = min(1.0, T / max(1, d.sum()))
        durs[i, :n] = np.maximum(1, (d * scale).astype(np.int32))
    tgt_lens = durs.sum(axis=1)
    return {
        "phones": jnp.asarray(rng.integers(2, cfg.vocab_size, size=(B, S))
                              .astype(np.int32)),
        "duration": jnp.asarray(durs),
        "codes": jnp.asarray(rng.integers(0, cfg.hubert_codes, size=(B, T))
                             .astype(np.int32)),
        "src_mask": jnp.asarray(np.arange(S)[None] < src_lens[:, None]),
        "tgt_mask": jnp.asarray(np.arange(T)[None] < tgt_lens[:, None]),
        "speaker": jnp.asarray(rng.integers(0, cfg.n_speaker, size=(B,))
                               .astype(np.int32)),
    }


def flops_block(b, t):
    attn_proj = 2 * b * t * 8 * D * D          # qkv + in_proj(3) + out + wo
    attn_sc = 2 * 2 * b * t * t * D            # scores + attn@V
    conv = 2 * b * t * D * NF * 9 + 2 * b * t * NF * D
    return attn_proj + attn_sc + conv


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    cfg = TTEModelConfig(
        d_model=D, conv_n_filter=NF, conv_kernel_sizes=(9, 1), max_len=3500,
        encoder=TransformerStackConfig(n_layer=4, n_head=2, dropout_p=0.1),
        decoder=TransformerStackConfig(n_layer=4, n_head=2, dropout_p=0.1),
        dur_n_filter=256, dur_kernel_size=3, dur_dropout_p=0.5,
        hubert_codes=1000, n_speaker=10, vocab_size=100, pad_idx=0)
    tcfg = TTETrainConfig(batch_size=B, grad_acc_steps=GRAD_ACC,
                          warmup_steps=2000, total_steps=50_000)
    rng = np.random.default_rng(0)
    batch = make_batch(cfg, rng)
    key = jax.random.key(1)
    state = tte_train.init_state(jax.random.key(0), cfg, tcfg)
    # COPY: the full-step chain below donates state's buffers
    params = jax.tree_util.tree_map(jnp.copy, state.params)

    report: dict = {}

    def rec(name, ms, flops=None):
        line = f"{name:<34} {ms:7.3f} ms"
        if flops:
            line += f"  {flops/ms/1e9:7.1f} TF/s  mfu={flops/ms/1e9/197:.1%}"
        print(line, flush=True)
        report[name] = {"ms": round(ms, 3),
                        **({"tflops": round(flops / ms / 1e9, 1)}
                           if flops else {})}

    fwd_flops = (cfg.encoder.n_layer * flops_block(B, S)
                 + cfg.decoder.n_layer * flops_block(B, T)
                 + 2 * B * T * D * cfg.hubert_codes)
    step_flops = 3 * fwd_flops

    # 1. full micro step (donated state chains on device)
    def full(state):
        s, m = tte_train.train_step(state, batch, key, cfg, tcfg, T)
        return s
    st = state
    for _ in range(3):
        st = full(st)
    _sync(st.params)
    t0 = time.perf_counter()
    for _ in range(30):
        st = full(st)
    _sync(st.params)
    rec("full train_step", (time.perf_counter() - t0) / 30 * 1e3, step_flops)

    # 2. grad only (no optimizer)
    gradf = jax.jit(lambda p, b_, r: jax.grad(
        tte_train.loss_fn, has_aux=True)(p, b_, cfg, T, r, False))
    rec("grad (fwd+bwd, no optimizer)", timeit(gradf, params, batch, key),
        step_flops)

    # 3. forward only (training mode: dropout on)
    fwdf = jax.jit(lambda p, b_, r: tte_train.loss_fn(p, b_, cfg, T, r,
                                                      False)[0])
    rec("forward+loss (dropout on)", timeit(fwdf, params, batch, key),
        fwd_flops)
    fwdd = jax.jit(lambda p, b_: tte_train.loss_fn(p, b_, cfg, T, None,
                                                   True)[0])
    rec("forward+loss (deterministic)", timeit(fwdd, params, batch),
        fwd_flops)

    # 4. FFT stacks in isolation (fwd and grad), enc & dec shapes
    lp = params["encoder_layers"][0]
    for label, t_len, n_layer in (("enc stack 4L  (6,128)", S, 4),
                                  ("dec stack 4L  (6,512)", T, 4)):
        x = jnp.asarray(rng.standard_normal((B, t_len, D)), jnp.float32)
        pad = jnp.zeros((B, t_len), bool)

        def stack(p, x):
            h = x
            for _ in range(n_layer):
                h = fft.apply_fft_block(
                    p, h, kernel_sizes=(9, 1), n_head=2,
                    key_padding_mask=pad, dropout_p=0.0,
                    deterministic=True)
            return h
        fl = n_layer * flops_block(B, t_len)
        rec(f"{label} fwd", timeit(jax.jit(stack), lp, x), fl)
        gf = jax.jit(jax.grad(lambda p, x: jnp.sum(stack(p, x))))
        rec(f"{label} grad", timeit(gf, lp, x), 3 * fl)

    # 5. conv-FFN alone at dec shape (the dominant nominal-FLOP block part)
    from parrot_tts_tpu.ops import conv as conv_ops

    xc = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)

    def ffn(p, x):
        c = conv_ops.conv1d(x, p["conv1"]["w"], p["conv1"]["b"], padding=4)
        c = jax.nn.relu(c)
        return conv_ops.conv1d(c, p["conv2"]["w"], p["conv2"]["b"], padding=0)
    ffn_fl = 2 * B * T * D * NF * 10
    rec("conv-FFN (6,512) fwd", timeit(jax.jit(ffn), lp, xc), ffn_fl)
    rec("conv-FFN (6,512) grad",
        timeit(jax.jit(jax.grad(lambda p, x: jnp.sum(ffn(p, x)))), lp, xc),
        3 * ffn_fl)

    # 6. attention alone at dec shape
    def attn(p, x):
        a = p["attn"]
        q, k, v = jnp.split(jnp.einsum("btd,de->bte", x, a["qkv"]), 3, -1)
        from parrot_tts_tpu.ops import attention as attn_ops
        y = attn_ops.multi_head_attention(q, k, v, a["in_proj"],
                                          a["out_proj"], 2,
                                          key_padding_mask=pad)
        return jnp.einsum("btd,de->bte", y, a["wo"])
    pad = jnp.zeros((B, T), bool)
    at_fl = 2 * B * T * 8 * D * D + 4 * B * T * T * D
    rec("attention (6,512) fwd", timeit(jax.jit(attn), lp, xc), at_fl)
    rec("attention (6,512) grad",
        timeit(jax.jit(jax.grad(lambda p, x: jnp.sum(attn(p, x)))), lp, xc),
        3 * at_fl)

    # 7. head + CE at dec shape
    hw, hb = params["head"]["w"], params["head"]["b"]

    def headloss(w, b_, x):
        logits = jnp.einsum("btd,dc->btc", x, w) + b_
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return -jnp.mean(logp[..., 0])
    hd_fl = 2 * B * T * D * cfg.hubert_codes
    rec("head+CE (6,512) fwd", timeit(jax.jit(headloss), hw, hb, xc), hd_fl)
    rec("head+CE (6,512) grad",
        timeit(jax.jit(jax.grad(headloss, argnums=(0, 2))), hw, hb, xc),
        3 * hd_fl)

    # 8. A/B candidate: bf16-compute grad (f32 master params, loss in f32)
    def loss_bf16(p, b_, r):
        pb = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, p)
        return tte_train.loss_fn(pb, b_, cfg, T, r, False)
    grad_bf = jax.jit(lambda p, b_, r: jax.grad(
        loss_bf16, has_aux=True)(p, b_, r))
    rec("grad bf16-compute A/B", timeit(grad_bf, params, batch, key),
        step_flops)

    print(json.dumps(report))


if __name__ == "__main__":
    import warnings

    warnings.filterwarnings("ignore")
    main()
