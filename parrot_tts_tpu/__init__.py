"""parrot_tts_tpu — a TPU-native (JAX/XLA/Pallas) two-stage text-to-speech framework.

Re-designed from scratch with the capabilities of parrot-tts/Parrot-TTS
(EACL 2024): a FastSpeech2-style text-to-embedding (TTE) transformer that maps
character tokens to discrete HuBERT units, and a unit-conditioned HiFi-GAN
vocoder that renders 16 kHz waveforms, plus the offline supervision tools
(CTC forced aligner, monotonic-path duration extraction, HuBERT unit
ingestion) and a data-parallel pjit training/serving runtime.

Layout:
  core/     typed configs, device mesh + sharding, PRNG, checkpointing, metrics
  ops/      jit-able compute ops (STFT/mel, convs, attention, length regulator,
            weight norm, CTC) with Pallas fast paths and XLA fallbacks
  models/   tte/ (FFT-block transformer), vocoder/ (HiFi-GAN G+MPD+MSD),
            aligner/ (conv+BiLSTM CTC model)
  text/     cleaners, tokenizers, symbol inventories (host-side, dependency-free)
  data/     manifest parsing, static-shape bucketing/collation, segment crop,
            async host->device prefetch
  train/    data-parallel compiled train steps + optimizer/schedule stacks
  infer/    batched TTE decode + vocoder synthesis from the compiled graphs
  pipeline/ the 10-step offline pipeline as composable stages
"""

__version__ = "0.1.0"
