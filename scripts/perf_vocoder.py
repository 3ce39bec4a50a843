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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from parrot_tts_tpu.core.config import VocoderModelConfig
    from parrot_tts_tpu.models.vocoder import generator as gen

    cfg = dataclasses.replace(VocoderModelConfig(), dtype="bfloat16")
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

    result = {
        "device_kind": str(kind),
        "batch": args.batch, "codes": args.codes,
        "flops_per_batch": flops,
        "flops_per_audio_second": round(flops / audio_s),
        "sync_ms_per_batch": round(sync_dt * 1e3, 2),
        "async_ms_per_batch": round(async_dt * 1e3, 2),
        "sync_audio_s_per_s": round(audio_s / sync_dt, 1),
        "async_audio_s_per_s": round(audio_s / async_dt, 1),
        "achieved_tflops_async": round(flops / async_dt / 1e12, 2),
    }
    if peak:
        result["peak_bf16_tflops"] = peak
        result["mfu_async_pct"] = round(100 * flops / async_dt / 1e12 / peak,
                                        2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    import warnings

    warnings.filterwarnings("ignore")
    main()
