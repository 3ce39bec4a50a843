"""End-to-end demo: text -> cleaned chars -> TTE units -> HiFi-GAN waveform.

Script equivalent of the reference `demo.ipynb` (cells 9 -> 11 -> 13):
clean + tokenize text, greedy-decode HuBERT units with the TTE, synthesize
all N speakers' voices from the unit sequence with the CodeGenerator.

Usage (with trained checkpoints):
  python examples/demo.py --text "hello world" \
      --tte-ckpt runs/TTE/ckpt --alignment-path runs/aligner \
      --vocoder-ckpt runs/vocoder/ckpt --out-dir demo_out [--all-speakers]

Without checkpoints it runs with randomly initialized tiny models as a
smoke test (audio will be noise).
"""

import argparse
import dataclasses
import json
from pathlib import Path

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--text", default="hello world, this is a test.")
    p.add_argument("--tte-ckpt")
    p.add_argument("--alignment-path")
    p.add_argument("--vocoder-ckpt")
    p.add_argument("--out-dir", default="demo_out")
    p.add_argument("--speaker", type=int, default=0)
    p.add_argument("--all-speakers", action="store_true",
                   help="voice-convert: synthesize every vocoder speaker "
                        "(demo.ipynb cell 13)")
    args = p.parse_args()

    import jax

    from parrot_tts_tpu.core.checkpoint import CheckpointManager
    from parrot_tts_tpu.core.config import TTEModelConfig, VocoderModelConfig
    from parrot_tts_tpu.infer.synthesize import (VocoderSynthesizer,
                                                 synthesize_text)
    from parrot_tts_tpu.models.tte import parrot
    from parrot_tts_tpu.models.vocoder import generator as gen
    from parrot_tts_tpu.text.cleaners import english_cleaners
    from parrot_tts_tpu.text.tokenizer import DFATokenizer

    if args.tte_ckpt and args.alignment_path:
        tokenizer = DFATokenizer.from_alignment_path(args.alignment_path)
        tte_cfg = TTEModelConfig(vocab_size=len(tokenizer), n_speaker=10)
        tte_params = CheckpointManager(args.tte_ckpt).restore()["params"]
    else:
        print("[demo] no TTE checkpoint given - using random tiny model")
        symbols = sorted(set(english_cleaners(args.text))) or ["a"]
        tokenizer = DFATokenizer([s for s in symbols if s != " "] + [" "])
        from parrot_tts_tpu.core.config import TransformerStackConfig

        tte_cfg = TTEModelConfig(
            d_model=32, conv_n_filter=64, max_len=512,
            encoder=TransformerStackConfig(n_layer=1, n_head=2),
            decoder=TransformerStackConfig(n_layer=1, n_head=2),
            dur_n_filter=8, hubert_codes=1000,
            vocab_size=len(tokenizer), n_speaker=10)
        tte_params = parrot.init_parrot(jax.random.key(0), tte_cfg)

    voc_cfg = VocoderModelConfig()
    if args.vocoder_ckpt:
        state = CheckpointManager(args.vocoder_ckpt).restore()
        voc_params = state["gen_params"] if "gen_params" in state else state
    else:
        print("[demo] no vocoder checkpoint given - using random model")
        voc_params = gen.init_code_generator(jax.random.key(1), voc_cfg)
    synth = VocoderSynthesizer(voc_params, voc_cfg)

    out_dir = Path(args.out_dir)
    speakers = range(voc_cfg.num_speakers) if args.all_speakers else [args.speaker]
    from parrot_tts_tpu.data.audio_io import write_wav

    for spk in speakers:
        wav = synthesize_text(
            args.text, tte_params=tte_params, tte_cfg=tte_cfg,
            tokenizer=tokenizer, synthesizer=synth,
            cleaner=english_cleaners, speaker_id=min(spk, tte_cfg.n_speaker - 1),
            vocoder_speaker_id=spk)
        path = out_dir / f"demo_spk{spk}.wav"
        write_wav(path, wav, synth.sample_rate)
        print(f"[demo] wrote {path} ({len(wav) / synth.sample_rate:.2f}s, "
              f"RTF={synth.last_rtf:.3f})")


if __name__ == "__main__":
    main()
