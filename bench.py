"""Headline benchmark: vocoder synthesis audio-s/s/chip + TTE train steps/s.

Vocoder: the full-size unit HiFi-GAN V1 CodeGenerator (reference
utils/vocoder/config.json topology: 512 initial channels, x320 upsample,
~14M params) with folded weight norm — the serving configuration
(reference utils/vocoder/inference.py:137 removes weight norm too).
TTE: the reference-config training step (see bench_tte.run).

The reference publishes no numbers (BASELINE.md); it instruments RTF
(real-time factor) per utterance (utils/vocoder/inference.py:65-74).
`vs_baseline` therefore reports throughput relative to REAL-TIME synthesis
(RTF^-1): 1.0 would mean the chip generates audio exactly as fast as it
plays; higher is better.

Prints one JSON line per metric; the HEADLINE (vocoder synthesis) line is
LAST. The TTE result is also embedded in the headline's detail so a
single-line parser still records both.
"""

import json
import os
import sys
import time

import numpy as np


def run_vocoder(quant: str = "none", tte_result: dict | None = None) -> dict:
    import dataclasses

    import jax
    import jax.numpy as jnp

    from parrot_tts_tpu.core.config import VocoderModelConfig
    from parrot_tts_tpu.models.vocoder import generator as gen

    # reference V1 topology; bf16 serving precision (max waveform deviation
    # vs f32 measured at ~9e-4, about -40 dB — parity tests stay f32).
    # quant="int8"/"int8-tail" additionally runs conv stacks int8: the
    # measured marginal int8 rate is 1.7x bf16 (332 TOP/s, PERF.md 4a) and
    # activation HBM bytes halve; fidelity bounds in tpu_parity_check.py.
    cfg = dataclasses.replace(VocoderModelConfig(), dtype="bfloat16",
                              quant=quant)
    sr = 16_000
    hop = cfg.total_upsample             # 320
    batch, code_len = 64, 250            # 64 x 5.0 s utterances per batch
    audio_seconds_per_batch = batch * code_len * hop / sr

    key = jax.random.key(0)
    params = gen.init_code_generator(key, cfg)
    params = gen.fold_params(params)     # serving path: weight norm folded

    rng = np.random.default_rng(0)
    code = jnp.asarray(rng.integers(0, cfg.num_embeddings,
                                    size=(batch, code_len)).astype(np.int32))
    spkr = jnp.asarray(rng.integers(0, cfg.num_speakers,
                                    size=(batch,)).astype(np.int32))

    if quant == "int8-static":
        # static activation scales: calibrate once on the bench batch
        # (models/vocoder/generator_staticq.py)
        from parrot_tts_tpu.models.vocoder import generator_staticq as sq

        qscales = sq.calibrate_qscales(params, code, spkr, cfg)

        @jax.jit
        def synth(params, code, spkr):
            y = sq.apply_code_generator_staticq(params, code, spkr,
                                                qscales, cfg)
            return jnp.sum(y)
    else:
        @jax.jit
        def synth(params, code, spkr):
            y = gen.apply_code_generator(params, code, spkr, cfg)
            # scalar checksum: the host readback below is the only reliable
            # completion barrier on this platform (block_until_ready returns
            # early through the axon relay)
            return jnp.sum(y)

    # compile + session warmup (first fetch pays the relay handshake)
    for _ in range(3):
        _ = float(synth(params, code, spkr))

    # steady-state serving pipeline: queue all batches, then drain the
    # checksums in order. The device executes back-to-back; a per-iteration
    # readback would instead bill one ~27 ms relay round trip per batch
    # (measured sync-vs-async in scripts/perf_vocoder.py, PERF.md).
    iters = 10
    t0 = time.perf_counter()
    outs = [synth(params, code, spkr) for _ in range(iters)]
    for o in outs:
        _ = float(o)
    dt = time.perf_counter() - t0

    audio_seconds_per_second = audio_seconds_per_batch * iters / dt
    out = {
        "metric": "vocoder_synth_audio_seconds_per_second_per_chip",
        "value": round(audio_seconds_per_second, 2),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(audio_seconds_per_second, 2),
        "detail": {"batch": batch, "code_len": code_len,
                   "dtype": cfg.dtype, "quant": quant},
    }
    if tte_result is not None:
        out["detail"]["tte_train"] = {
            "micro_steps_per_s": tte_result.get("value"),
            **tte_result.get("detail", {}),
        }
    return out


def main():
    # headline serving config decided by hardware measurement (rounds 3-5,
    # VALIDATION.md / PERF.md r5): quant="int8-static" — static per-channel
    # activation scales calibrated once per checkpoint, conv inputs int8
    # across stage boundaries, residual carriers bf16. Same-process A/B
    # (scripts/exp_staticq_ab.py): bf16 4785 / dynamic int8 5367 /
    # int8-static 7417 audio-s/s (+38%), at SNR 34.0 dB and mel-L1 0.2375
    # vs f32 — matching bf16's own fidelity (35.0 dB / 0.2387). The win is
    # the per-call absmax reduction passes vanishing + int8 inter-stage
    # HBM traffic + the real 1.70x int8 MXU rate (PERF.md 4a).
    quant = os.environ.get("BENCH_QUANT", "int8-static")
    if "--quant" in sys.argv:
        quant = sys.argv[sys.argv.index("--quant") + 1]

    # TTE training metric first (its line precedes the headline)
    tte_result = None
    if os.environ.get("BENCH_SKIP_TTE", "") != "1":
        try:
            import bench_tte

            tte_result = bench_tte.run()
            print(json.dumps(tte_result))
        except Exception as e:
            print(json.dumps({
                "metric": "tte_train_micro_steps_per_second_per_chip",
                "value": 0.0, "unit": "steps/s/chip", "vs_baseline": 0.0,
                "error": f"{type(e).__name__}: {e}"[:200],
            }))

    # headline LAST: vocoder synthesis
    print(json.dumps(run_vocoder(quant, tte_result)))


if __name__ == "__main__":
    # keep stdout clean for the JSON lines
    import warnings

    warnings.filterwarnings("ignore")
    try:
        main()
    except Exception as e:  # degraded but parseable record
        print(json.dumps({
            "metric": "vocoder_synth_audio_seconds_per_second_per_chip",
            "value": 0.0, "unit": "audio-s/s/chip", "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}"[:200],
        }))
        sys.exit(0)
