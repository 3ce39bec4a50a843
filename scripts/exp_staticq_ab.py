"""Static-int8 serving variants: one-process A/B (throughput + fidelity).

Variants at the bench config (full V1, batch 64 x 250 codes, bf16 base):
  * bf16 (no quant)            — round-2 baseline path
  * int8 dynamic               — per-row absmax every conv (r3 headline)
  * int8-static residuals-bf16 — conv inputs int8, carriers bf16 (default)
  * int8-static all-int8       — every materialization int8

Fidelity is measured against the f32 forward on a SEPARATE batch from the
calibration batch (honest serving setting). Throughput uses the queued
steady-state pattern (PERF.md methodology).

Run on TPU: python scripts/exp_staticq_ab.py
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from parrot_tts_tpu.core.config import VocoderModelConfig  # noqa: E402
from parrot_tts_tpu.models.vocoder import generator as gen  # noqa: E402
from parrot_tts_tpu.models.vocoder import generator_staticq as sq  # noqa: E402


def _mel_l1(a, b):
    from parrot_tts_tpu.ops.stft import mel_spectrogram

    ma = np.asarray(mel_spectrogram(jnp.asarray(a)))
    mb = np.asarray(mel_spectrogram(jnp.asarray(b)))
    return float(np.mean(np.abs(ma - mb)))


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    batch, code_len, sr, hop = 64, 250, 16_000, 320
    audio_s = batch * code_len * hop / sr
    base = dataclasses.replace(VocoderModelConfig(), dtype="bfloat16")
    params = gen.fold_params(gen.init_code_generator(jax.random.key(0), base))
    code = jnp.asarray(rng.integers(0, base.num_embeddings,
                                    size=(batch, code_len)).astype(np.int32))
    spkr = jnp.asarray(rng.integers(0, base.num_speakers,
                                    size=(batch,)).astype(np.int32))
    # fidelity batch + calibration batch (DIFFERENT draws)
    frng = np.random.default_rng(2)
    fcode = jnp.asarray(frng.integers(0, base.num_embeddings,
                                      size=(2, 96)).astype(np.int32))
    fspkr = jnp.asarray(frng.integers(0, base.num_speakers,
                                      size=(2,)).astype(np.int32))
    ccode = jnp.asarray(frng.integers(0, base.num_embeddings,
                                      size=(4, 120)).astype(np.int32))
    cspkr = jnp.asarray(frng.integers(0, base.num_speakers,
                                      size=(4,)).astype(np.int32))

    cfg32 = VocoderModelConfig()
    w32 = np.asarray(jax.jit(lambda p, c, s: gen.apply_code_generator(
        p, c, s, cfg32))(params, fcode, fspkr))[..., 0]

    out = {}
    first = True

    def run_variant(name, synth_fn, fid_fn):
        nonlocal first
        for _ in range(3):
            float(synth_fn(code, spkr))
        n = 10
        t0 = time.perf_counter()
        outs = [synth_fn(code, spkr) for _ in range(n)]
        for o in outs:
            float(o)
        dt = (time.perf_counter() - t0) / n
        if first:                 # relay warm-up burn
            first = False
            return run_variant(name, synth_fn, fid_fn)
        w = fid_fn()
        snr = 10 * np.log10(float((w32 ** 2).mean())
                            / max(float(((w32 - w) ** 2).mean()), 1e-20))
        rec = {"ms_per_batch": round(dt * 1e3, 2),
               "audio_s_per_s": round(audio_s / dt, 1),
               "snr_db_vs_f32": round(snr, 1),
               "mel_l1_vs_f32": round(_mel_l1(w32, w), 4)}
        out[name] = rec
        print(f"  {name:<26} {rec['ms_per_batch']:7.2f} ms  "
              f"{rec['audio_s_per_s']:7.1f} audio-s/s  "
              f"SNR {rec['snr_db_vs_f32']:5.1f} dB  "
              f"mel-L1 {rec['mel_l1_vs_f32']:.4f}", flush=True)

    # bf16 + dynamic int8
    for name, over in (("bf16", {}), ("int8_dynamic", {"quant": "int8"})):
        cfg = dataclasses.replace(base, **over)
        f = jax.jit(lambda p, c, s, cfg=cfg: jnp.sum(
            gen.apply_code_generator(p, c, s, cfg)))
        ffid = jax.jit(lambda p, c, s, cfg=cfg: gen.apply_code_generator(
            p, c, s, cfg))
        run_variant(name, lambda c, s, f=f: f(params, c, s),
                    lambda ffid=ffid: np.asarray(
                        ffid(params, fcode, fspkr))[..., 0])

    # static variants
    cfgq = dataclasses.replace(base, quant="int8-static")
    for name, res8 in (("int8_static_bf16res", False),
                       ("int8_static_all", True)):
        qs = sq.calibrate_qscales(params, ccode, cspkr, cfgq,
                                  residual_int8=res8)
        f = jax.jit(lambda p, c, s, qs=qs, r=res8: jnp.sum(
            sq.apply_code_generator_staticq(p, c, s, qs, cfgq,
                                            residual_int8=r)))
        ffid = jax.jit(lambda p, c, s, qs=qs, r=res8:
                       sq.apply_code_generator_staticq(
                           p, c, s, qs, cfgq, residual_int8=r))
        run_variant(name, lambda c, s, f=f: f(params, c, s),
                    lambda ffid=ffid: np.asarray(
                        ffid(params, fcode, fspkr))[..., 0])

    print(json.dumps(out))


if __name__ == "__main__":
    import warnings

    warnings.filterwarnings("ignore")
    main()
