"""Vocoder serving roofline analysis on the attached TPU chip.

Reports, for the full-size V1 CodeGenerator serving config (bf16, folded
weight norm, folded tail):
  - analytic FLOPs/audio-second of the topology
  - ms/batch and audio-s/s/chip, sync (per-iter readback) AND async
    (queue N iters, one readback) — the async number is steady-state
    serving throughput; the sync number buys a ~26 ms relay RTT per call
  - achieved TFLOP/s and MFU vs the chip's peak
  - per-stage cumulative timing (partial forwards)

Usage: python scripts/perf_vocoder.py [--batch 64] [--codes 250]
"""

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def conv_flops(t_out: int, c_in: int, c_out: int, k: int) -> int:
    return 2 * t_out * c_in * c_out * k


def generator_flops(cfg, t_codes: int) -> int:
    """Analytic MAC*2 count of one generator forward (conv layers; the
    elementwise/embedding traffic is negligible)."""
    total = 0
    t = t_codes
    ch = cfg.upsample_initial_channel
    total += conv_flops(t, cfg.model_in_dim, ch, 7)          # conv_pre
    for i, (u, k) in enumerate(zip(cfg.upsample_rates,
                                   cfg.upsample_kernel_sizes)):
        cout = cfg.upsample_initial_channel // (2 ** (i + 1))
        t *= u
        # transposed conv, polyphase-counted: every output sample touches
        # k/u taps of the input on average
        total += conv_flops(t, ch, cout, max(1, k // u))
        ch = cout
        for rk, dil in zip(cfg.resblock_kernel_sizes,
                           cfg.resblock_dilation_sizes):
            # ResBlock1: len(dil) dilated convs + len(dil) unit convs
            total += 2 * len(dil) * conv_flops(t, ch, ch, rk)
    total += conv_flops(t, ch, 1, 7)                         # conv_post
    return total


def generator_flops_executed(cfg, t_codes: int) -> int:
    """EXECUTED MAC*2 count of the serving lowering — counts the folded
    block-Toeplitz kernels' structured zeros (ops/folded.py inflation
    ~ dilation for dilated convs, ~g/k for small kernels) and the
    polyphase transposed-conv packing. The gap between this and
    `generator_flops` is the price paid for full MXU lane occupancy at
    C < 128."""
    from parrot_tts_tpu.ops.conv import _polyphase_plan
    from parrot_tts_tpu.ops.folded import _fold_plan

    def folded_conv_flops(t_rows, ci, co, k, dil, g):
        if g == 1:
            return conv_flops(t_rows, ci, co, k)
        pad = (k - 1) * dil // 2
        kb, _, _ = _fold_plan(k, dil, pad, g)
        return conv_flops(t_rows // g, g * ci, g * co, kb)

    total = 0
    t = t_codes
    ch = cfg.upsample_initial_channel
    total += conv_flops(t, cfg.model_in_dim, ch, 7)
    g = 1
    lane_target = 128
    for i, (u, k) in enumerate(zip(cfg.upsample_rates,
                                   cfg.upsample_kernel_sizes)):
        cout = cfg.upsample_initial_channel // (2 ** (i + 1))
        t *= u
        _, _, _, pad_left, q_len = _polyphase_plan(k, u, (k - u) // 2)
        if g > 1:
            # folded transposed conv: polyphase kernel folded by g
            kb, _, _ = _fold_plan(q_len, 1, pad_left, g)
            total += conv_flops(t // (g * u), g * ch, g * u * cout, kb)
            g *= u
        else:
            total += conv_flops(t // u, ch, u * cout, q_len)
            if cfg.fold_tail:
                want = max(1, lane_target // cout)
                if want > 1:
                    g = want
        ch = cout
        for rk, dil in zip(cfg.resblock_kernel_sizes,
                           cfg.resblock_dilation_sizes):
            for d in dil:
                total += folded_conv_flops(t, ch, ch, rk, d, g)   # dilated
                total += folded_conv_flops(t, ch, ch, rk, 1, g)   # plain
    if g == 1:
        total += conv_flops(t, ch, 1, 7)
    else:
        kb, _, _ = _fold_plan(7, 1, 3, g)
        total += conv_flops(t // g, g * ch, g * 1, kb)
    return total


PEAK_BF16_TFLOPS = {
    # public peak bf16 TFLOP/s per chip
    "TPU v4": 275.0,
    "TPU v5e": 197.0,
    "TPU v5 lite": 197.0,
    "TPU v5p": 459.0,
    "TPU v6e": 918.0,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--codes", type=int, default=250)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--fused-mrf", action="store_true",
                    help="A/B: enable the fused MRF Pallas kernel "
                         "(default off; measured neutral — see PERF.md)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from parrot_tts_tpu.core.config import VocoderModelConfig
    from parrot_tts_tpu.models.vocoder import generator as gen

    cfg = dataclasses.replace(VocoderModelConfig(), dtype="bfloat16",
                              fused_mrf=args.fused_mrf)
    sr = 16_000
    hop = cfg.total_upsample
    audio_s = args.batch * args.codes * hop / sr

    params = gen.fold_params(gen.init_code_generator(jax.random.key(0), cfg))
    rng = np.random.default_rng(0)
    code = jnp.asarray(rng.integers(0, cfg.num_embeddings,
                                    size=(args.batch, args.codes), dtype=np.int64
                                    ).astype(np.int32))
    spkr = jnp.asarray(rng.integers(0, cfg.num_speakers,
                                    size=(args.batch,)).astype(np.int32))

    @jax.jit
    def synth(params, code, spkr):
        return jnp.sum(gen.apply_code_generator(params, code, spkr, cfg))

    for _ in range(3):
        _ = float(synth(params, code, spkr))

    # sync: one readback per iteration (pays relay RTT every call)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        _ = float(synth(params, code, spkr))
    sync_dt = (time.perf_counter() - t0) / args.iters

    # async: queue all, then drain readbacks in order — device executes
    # back-to-back; steady-state serving pipeline
    t0 = time.perf_counter()
    outs = [synth(params, code, spkr) for _ in range(args.iters)]
    for o in outs:
        _ = float(o)
    async_dt = (time.perf_counter() - t0) / args.iters

    flops = generator_flops(cfg, args.codes) * args.batch
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "unknown")
    peak = next((v for k, v in PEAK_BF16_TFLOPS.items()
                 if k.lower() in str(kind).lower()), None)

    flops_exec = generator_flops_executed(cfg, args.codes) * args.batch
    result = {
        "device_kind": str(kind),
        "batch": args.batch, "codes": args.codes,
        "flops_per_batch": flops,
        "flops_per_audio_second": round(flops / audio_s),
        "executed_flops_per_batch": flops_exec,
        "fold_inflation": round(flops_exec / flops, 3),
        "sync_ms_per_batch": round(sync_dt * 1e3, 2),
        "async_ms_per_batch": round(async_dt * 1e3, 2),
        "sync_audio_s_per_s": round(audio_s / sync_dt, 1),
        "async_audio_s_per_s": round(audio_s / async_dt, 1),
        "achieved_tflops_async": round(flops / async_dt / 1e12, 2),
        "executed_tflops_async": round(flops_exec / async_dt / 1e12, 2),
    }
    if peak:
        result["peak_bf16_tflops"] = peak
        result["mfu_async_pct"] = round(100 * flops / async_dt / 1e12 / peak,
                                        2)
        result["executed_mfu_pct"] = round(
            100 * flops_exec / async_dt / 1e12 / peak, 2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    import warnings

    warnings.filterwarnings("ignore")
    main()
