"""Settle the int8 MXU rate question at the HARDWARE level (VERDICT r3 #1).

Historical note: round 3 believed XLA missed the int8 rate (exp_int8_micro
single-op timings); PERF.md 4a RETRACTED that — the readings were dominated
by ~1.3 ms fixed relay dispatch cost, and the true marginal int8 rate
through plain XLA is 332 TOP/s (1.70x bf16). This experiment, built before
the retraction, puts Mosaic in control of the lowering:

  1. rate control: Pallas tiled matmul, int8 vs bf16, MXU-friendly shape —
     does the chip execute int8 dots at 2x when the kernel asks directly?
  2. serving shapes: the Pallas int8 conv kernel (ops/pallas_qconv.py) vs
     the shipped XLA paths (bf16 conv; dynamic-quant int8 conv) at the
     real quantized call-site shapes (B=64, 250 codes).

Run on the TPU: timings use the queue-ahead + single-readback pattern
(PERF.md methodology; the axon relay adds ~26 ms per fetch)."""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from parrot_tts_tpu.ops import pallas_qconv as pq  # noqa: E402
from parrot_tts_tpu.ops import quant as quant_ops  # noqa: E402


def _sync(x):
    # block_until_ready returns early through the axon relay; a scalar
    # readback is the reliable completion barrier (PERF.md methodology)
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, *args, iters=20):
    for _ in range(3):
        _sync(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    _sync(outs[-1])
    return (time.perf_counter() - t0) / iters * 1e3


def xla_conv(x, w, pads, d, pe):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=(pads,), rhs_dilation=(d,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=pe)


def main():
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}", flush=True)

    # ---- 1. rate control: tiled matmul, Mosaic lowering
    m, k, n = 8192, 4096, 4096
    mm_flops = 2 * m * k * n
    a32 = rng.standard_normal((m, k)).astype(np.float32)
    b32 = rng.standard_normal((k, n)).astype(np.float32)
    a16, b16 = jnp.asarray(a32, jnp.bfloat16), jnp.asarray(b32, jnp.bfloat16)
    aq = jnp.asarray(np.clip(np.round(a32 * 30), -127, 127), jnp.int8)
    bq = jnp.asarray(np.clip(np.round(b32 * 30), -127, 127), jnp.int8)

    for bm, bn, bk in [(512, 512, 1024), (256, 512, 2048), (512, 1024, 512),
                       (1024, 512, 512)]:
        try:
            ms16 = timeit(lambda a, b: pq.matmul_pallas(a, b, bm=bm, bn=bn,
                                                        bk=bk), a16, b16)
            ms8 = timeit(lambda a, b: pq.matmul_pallas(a, b, bm=bm, bn=bn,
                                                       bk=bk), aq, bq)
            print(f"pallas mm bm{bm} bn{bn} bk{bk}: bf16 {ms16:6.2f} ms "
                  f"({mm_flops/ms16/1e9:6.1f} TF/s)  int8 {ms8:6.2f} ms "
                  f"({mm_flops/ms8/1e9:6.1f} TOP/s)  ratio "
                  f"{ms16/ms8:.2f}x", flush=True)
        except Exception as e:
            print(f"pallas mm bm{bm} bn{bn} bk{bk}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)

    # XLA controls at the same shape
    msx16 = timeit(jax.jit(lambda a, b: jnp.dot(a, b)), a16, b16)
    msx8 = timeit(jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)), aq, bq)
    print(f"xla mm:            bf16 {msx16:6.2f} ms "
          f"({mm_flops/msx16/1e9:6.1f} TF/s)  int8 {msx8:6.2f} ms "
          f"({mm_flops/msx8/1e9:6.1f} TOP/s)", flush=True)

    # ---- 2. serving conv shapes (B=64, 250 codes)
    shapes = [
        # (label, B, T, Ci, Co, K, d)
        ("mrf C=256 k3 d1  T=1250", 64, 1250, 256, 256, 3, 1),
        ("mrf C=256 k11 d5 T=1250", 64, 1250, 256, 256, 11, 5),
        ("ups 256->4*128   T=1250", 64, 1250, 256, 512, 2, 1),
        ("mrf C=128 k3 d1  T=5000", 64, 5000, 128, 128, 3, 1),
        ("folded tail k3   T=10000", 64, 10000, 128, 128, 3, 1),
        ("folded tail k7   T=10000", 64, 10000, 128, 128, 7, 1),
    ]
    for label, b, t, ci, co, kk, d in shapes:
        pads = (d * (kk - 1) // 2, d * (kk - 1) - d * (kk - 1) // 2)
        flops = 2 * b * t * kk * ci * co
        x32 = rng.standard_normal((b, t, ci)).astype(np.float32) * 0.3
        w32 = rng.standard_normal((kk, ci, co)).astype(np.float32) * 0.05
        x16, w16 = jnp.asarray(x32, jnp.bfloat16), jnp.asarray(w32, jnp.bfloat16)
        xq, sx = quant_ops.quantize_per_row(jnp.asarray(x32))
        wq, sw = quant_ops.quantize_per_out_channel(jnp.asarray(w32))
        scale = (sx[:, 0, 0:1] * sw[None, :]).astype(jnp.float32)
        xq, wq = jax.device_put(xq), jax.device_put(wq)

        ms_bf = timeit(jax.jit(
            lambda a, w: xla_conv(a, w, pads, d, None)), x16, w16)
        ms_dyn = timeit(jax.jit(
            lambda a, w: quant_ops.int8_conv_nwc(a, w, None, pads=pads,
                                                 rhs_dilation=d)),
            jnp.asarray(x32, jnp.bfloat16), jnp.asarray(w32))
        row = (f"{label}: xla-bf16 {ms_bf:6.2f} ms "
               f"({flops/ms_bf/1e9:6.1f} TF/s)  xla-dyn8 {ms_dyn:6.2f}")
        try:
            ms_pl = timeit(lambda a, w, s: pq.int8_conv_nwc_pallas(
                a, w, s, pads=pads, rhs_dilation=d), xq, wq, scale)
            row += (f"  PALLAS-int8 {ms_pl:6.2f} ms "
                    f"({flops/ms_pl/1e9:6.1f} TOP/s)  "
                    f"vs bf16 {ms_bf/ms_pl:.2f}x vs dyn {ms_dyn/ms_pl:.2f}x")
            # numerics guard on-chip
            want = np.asarray(xla_conv(xq, wq, pads, d, jnp.int32)
                              ).astype(np.float64) * np.asarray(
                scale)[:, None, :]
            got = np.asarray(pq.int8_conv_nwc_pallas(
                xq, wq, scale, pads=pads, rhs_dilation=d,
                out_dtype=jnp.float32))
            rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
            row += f"  rel_err={rel:.1e}"
        except Exception as e:
            row += f"  PALLAS FAILED {type(e).__name__}: {str(e)[:160]}"
        print(row, flush=True)


if __name__ == "__main__":
    main()
