"""Vocoder GAN training benchmark: reference-config steps/s on one chip.

The reference's single most expensive compute is the 800k-step vocoder GAN
run (`/root/reference/utils/vocoder/train.py:252-253`); it instruments
seconds/batch in its hot loop (`train.py:116-124,172-180`) but records no
numbers. This bench measures the TPU cost: full-size V1 CodeGenerator +
MPD + MSD, one compiled D+G step (train/vocoder.py), segment 8960 samples,
global batch 16 (reference config.json), on-device GT loss mel.

Reports steps/s, executed TFLOP/s (XLA cost analysis), a wall-clock cost
split (G fwd / loss-mel / D fwd / full-step residual = backwards+optims),
and the projected chip-hours for the full 800k-step production run.
Prints ONE JSON line on stdout.

A/B levers: --disc-bf16 (discriminator compute in bf16), --gen-bf16
(generator compute in bf16).
"""

import argparse
import json
import sys
import time

import numpy as np


def timed(fn, *args, iters=10, warmup=3, fetch=float):
    """Steady-state timing: queue all iterations, fetch once (PERF.md
    methodology — the relay's block_until_ready returns early, so a scalar
    readback is the only reliable completion barrier)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
        _ = fetch(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    for o in outs:
        _ = fetch(o)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--disc-bf16", action="store_true")
    ap.add_argument("--gen-bf16", action="store_true")
    ap.add_argument("--no-split", action="store_true",
                    help="skip the component cost split")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from parrot_tts_tpu.core.config import (MelConfig, VocoderModelConfig,
                                            VocoderTrainConfig)
    from parrot_tts_tpu.models.vocoder import discriminator as disc
    from parrot_tts_tpu.models.vocoder import generator as gen
    from parrot_tts_tpu.train import vocoder as voc_train

    mcfg = VocoderModelConfig(
        dtype="bfloat16" if args.gen_bf16 else "float32")
    tcfg = VocoderTrainConfig(
        batch_size=args.batch,
        disc_dtype="bfloat16" if args.disc_bf16 else "float32")
    mel_cfg = MelConfig()
    steps_per_epoch = 1000
    b, seg, hop = args.batch, tcfg.segment_size, tcfg.code_hop_size

    rng = np.random.default_rng(0)
    batch = {
        "audio": jnp.asarray(
            (rng.standard_normal((b, seg)) * 0.2).astype(np.float32)),
        "code": jnp.asarray(rng.integers(
            0, mcfg.num_embeddings, size=(b, seg // hop)).astype(np.int32)),
        "spkr": jnp.asarray(rng.integers(
            0, mcfg.num_speakers, size=(b,)).astype(np.int32)),
    }
    state = voc_train.init_state(jax.random.key(0), mcfg, tcfg,
                                 steps_per_epoch)

    def step(state):
        return voc_train.train_step(state, batch, mcfg, tcfg, mel_cfg,
                                    steps_per_epoch)

    # steady-state full-step timing: chain donated states, fetch at the end
    for _ in range(3):
        state, metrics = step(state)
        _ = float(metrics["loss_gen_all"])
    t0 = time.perf_counter()
    last = None
    for _ in range(args.iters):
        state, metrics = step(state)
        last = metrics["loss_gen_all"]
    _ = float(last)
    step_s = (time.perf_counter() - t0) / args.iters
    steps_per_s = 1.0 / step_s

    # executed FLOPs of the whole compiled step (XLA cost analysis)
    tflops = None
    try:
        compiled = voc_train.train_step.lower(
            state, batch, mcfg, tcfg, mel_cfg, steps_per_epoch).compile()
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        if cost and "flops" in cost:
            tflops = cost["flops"] / step_s / 1e12
    except Exception:
        pass

    detail = {
        "batch": b, "segment": seg,
        "disc_dtype": tcfg.disc_dtype, "gen_dtype": mcfg.dtype,
        "ms_per_step": round(step_s * 1e3, 2),
        "audio_s_trained_per_s": round(b * seg / 16_000 * steps_per_s, 1),
        "chip_hours_800k_steps": round(800_000 * step_s / 3600, 2),
    }
    if tflops is not None:
        detail["executed_tflops"] = round(tflops, 1)

    if not args.no_split:
        params = state.gen_params
        mpd_p, msd_p = state.mpd_params, state.msd_params
        ddt = (jnp.bfloat16 if tcfg.disc_dtype == "bfloat16" else None)
        y = batch["audio"][:, :, None]

        @jax.jit
        def g_fwd(params):
            return jnp.sum(gen.apply_code_generator(
                params, batch["code"], batch["spkr"], mcfg))

        @jax.jit
        def loss_mel(audio):
            return jnp.sum(voc_train._mel(audio, mel_cfg))

        @jax.jit
        def d_fwd(mpd_p, msd_p):
            f_rs, f_gs, _, _ = disc.apply_mpd(mpd_p, y, y, dtype=ddt)
            s_rs, s_gs, _, _, _ = disc.apply_msd(msd_p, y, y,
                                                 update_sn=False, dtype=ddt)
            return (sum(jnp.sum(s) for s in f_rs + f_gs)
                    + sum(jnp.sum(s) for s in s_rs + s_gs))

        detail["split_ms"] = {
            "g_fwd": round(timed(g_fwd, params) * 1e3, 2),
            "loss_mel_fwd": round(timed(loss_mel, batch["audio"]) * 1e3, 2),
            "d_fwd_pair": round(timed(d_fwd, mpd_p, msd_p) * 1e3, 2),
            "full_step": round(step_s * 1e3, 2),
        }

    print(json.dumps({
        "metric": "vocoder_gan_train_steps_per_second_per_chip",
        "value": round(steps_per_s, 3),
        "unit": "steps/s/chip",
        "vs_baseline": round(steps_per_s, 3),
        "detail": detail,
    }))


if __name__ == "__main__":
    import warnings

    warnings.filterwarnings("ignore")
    try:
        main()
    except Exception as e:
        print(json.dumps({
            "metric": "vocoder_gan_train_steps_per_second_per_chip",
            "value": 0.0, "unit": "steps/s/chip", "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}"[:200],
        }))
        sys.exit(0)
