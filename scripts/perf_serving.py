"""End-to-end serving benchmark: text -> waveform through the joint
TTE + vocoder pipeline (infer/serving.py::ParrotTTS) at reference scale.

Measures, for a batch of mixed-length sentences: wall seconds, generated
audio seconds, audio-s/s/chip, RTF — the full-pipeline analog of the
reference's per-utterance RTF instrumentation
(utils/vocoder/inference.py:65-74) which covered only the vocoder.

Usage: python scripts/perf_serving.py [--n 64]
"""

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

WORDS = ("the quick brown fox jumps over a lazy dog and sings ringing "
         "songs near shining rivers while gentle winds move golden fields "
         "of tall grass under warm evening light").split()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--exact",
                    choices=("full", "selective", "selective-high",
                             "hybrid", "off"),
                    default="selective-high",
                    help="TTE decode precision mode (A/B: 'selective' runs "
                         "the decoder stack at default precision; 'hybrid' "
                         "decodes fast and re-decodes near-tie samples "
                         "exactly — both gated by tpu_parity_check)")
    ap.add_argument("--quant", default=None,
                    help="vocoder quant override (e.g. int8-static)")
    args = ap.parse_args()
    exact = {"full": True, "selective": "selective",
             "selective-high": "selective-high", "hybrid": "hybrid",
             "off": False}[args.exact]

    import jax

    from parrot_tts_tpu.core.config import (TTEModelConfig,
                                            TransformerStackConfig,
                                            VocoderModelConfig)
    from parrot_tts_tpu.infer.serving import ParrotTTS
    from parrot_tts_tpu.models.tte import parrot
    from parrot_tts_tpu.models.vocoder import generator as gen
    from parrot_tts_tpu.text.cleaners import CLEANERS
    from parrot_tts_tpu.text.tokenizer import DFATokenizer

    symbols = sorted({c for w in WORDS for c in w} | {" "})
    tokenizer = DFATokenizer(symbols)
    tte_cfg = TTEModelConfig(
        d_model=256, conv_n_filter=1024, conv_kernel_sizes=(9, 1),
        max_len=3500,
        encoder=TransformerStackConfig(n_layer=4, n_head=2, dropout_p=0.1),
        decoder=TransformerStackConfig(n_layer=4, n_head=2, dropout_p=0.1),
        dur_n_filter=256, dur_kernel_size=3, dur_dropout_p=0.5,
        hubert_codes=1000, n_speaker=10, vocab_size=len(tokenizer),
        pad_idx=tokenizer.pad_idx)
    voc_cfg = dataclasses.replace(VocoderModelConfig(), dtype="bfloat16")
    if args.quant:
        voc_cfg = dataclasses.replace(voc_cfg, quant=args.quant)

    tte_params = parrot.init_parrot(jax.random.key(0), tte_cfg)
    # bias an untrained duration head to ~5 frames/token (a realistic
    # speech rate) so the decode lengths look like production
    import jax.numpy as jnp

    tte_params["duration_predictor"]["proj"]["b"] = jnp.asarray(
        [float(np.log(5.0))])
    voc_params = gen.init_code_generator(jax.random.key(1), voc_cfg)

    engine = ParrotTTS(tte_params, tte_cfg, voc_params, voc_cfg,
                       tokenizer, CLEANERS["english_cleaners"], exact=exact)

    rng = np.random.default_rng(0)
    texts = [" ".join(rng.choice(WORDS, size=int(rng.integers(8, 28))))
             for _ in range(args.n)]
    speakers = [int(s) for s in rng.integers(0, 10, size=args.n)]

    _ = engine.tts(texts[:4], speakers[:4])        # compile + warmup
    _ = engine.tts(texts, speakers)                # warm all buckets
    t0 = time.perf_counter()
    wavs = engine.tts(texts, speakers)
    dt = time.perf_counter() - t0
    audio_s = sum(len(w) for w in wavs) / 16_000

    print(json.dumps({
        "n_texts": args.n,
        "exact": args.exact,
        "wall_s": round(dt, 3),
        "audio_seconds": round(audio_s, 1),
        "audio_s_per_s": round(audio_s / dt, 1),
        "rtf": round(dt / audio_s, 5),
        "stats": engine.last_stats,
    }))


if __name__ == "__main__":
    import warnings

    warnings.filterwarnings("ignore")
    main()
