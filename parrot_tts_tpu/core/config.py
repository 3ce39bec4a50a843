"""Typed configuration tree for every stage of the pipeline.

The reference scatters configuration over per-stage YAML/JSON/argparse
(`/root/reference/utils/TTE/TTE_config.yaml`, `utils/vocoder/config.json`,
`utils/aligner/aligner_train_config.yaml`) and even rewrites YAML with `sed`
(`utils/aligner/train.sh:17-19`). Here everything is one typed dataclass tree;
loaders accept the reference's own file formats so existing configs keep
working.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Sequence


def _filter_kwargs(cls, d: dict) -> dict:
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in d.items() if k in names}


# ---------------------------------------------------------------------------
# TTE (text-to-embedding) stage — reference: utils/TTE/TTE_config.yaml
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TransformerStackConfig:
    n_layer: int = 4
    n_head: int = 2
    dropout_p: float = 0.1


@dataclass(frozen=True)
class TTEModelConfig:
    """FFT-block transformer (reference `transformer:` + `duration_predictor:`)."""

    d_model: int = 256
    conv_n_filter: int = 1024
    conv_kernel_sizes: tuple[int, int] = (9, 1)
    max_len: int = 3500
    encoder: TransformerStackConfig = field(default_factory=TransformerStackConfig)
    decoder: TransformerStackConfig = field(default_factory=TransformerStackConfig)
    # duration predictor (reference modules/duration.py:26-48)
    dur_n_filter: int = 256
    dur_kernel_size: int = 3
    dur_dropout_p: float = 0.5
    # data/head
    hubert_codes: int = 1000
    n_speaker: int = 1
    vocab_size: int = 100
    pad_idx: int = 0
    # Reproduce reference quirks bit-for-bit (SURVEY.md §7 "hard parts"):
    #   pe[seqlen] broadcast instead of pe[:seqlen]     (modules/fft.py:17-19)
    #   double QKV projection through an extra qkv/wo   (modules/fft.py:48-57)
    #   duration-predictor conv2 hardcoded padding=1    (modules/duration.py:34)
    #   inference tgt_mask `ids <= length` off-by-one   (modules/data.py:18)
    reference_compat: bool = True
    # rematerialize FFT blocks in the training backward pass (saves the
    # (B, H, T, T) attention-weight tensors at long decoder lengths)
    remat: bool = True
    # only remat stacks whose sequence length reaches this: short buckets
    # fit in HBM without recompute (bench_tte: remat costs ~an extra
    # forward, ~25% of step time, for nothing at T<=512)
    remat_min_len: int = 1024
    # compute dtype for matmuls (params stay float32)
    dtype: str = "float32"

    @classmethod
    def from_reference_yaml(cls, cfg: dict, vocab_size: int, n_speaker: int,
                            pad_idx: int = 0) -> "TTEModelConfig":
        t = cfg["transformer"]
        d = cfg["duration_predictor"]
        return cls(
            d_model=t["d_model"],
            conv_n_filter=t["conv_n_filter"],
            conv_kernel_sizes=tuple(t["conv_kernel_sizes"]),
            max_len=t["max_len"],
            encoder=TransformerStackConfig(**_filter_kwargs(TransformerStackConfig, t["encoder"])),
            decoder=TransformerStackConfig(**_filter_kwargs(TransformerStackConfig, t["decoder"])),
            dur_n_filter=d["n_filter"],
            dur_kernel_size=d["kernel_size"],
            dur_dropout_p=d["dropout_p"],
            hubert_codes=cfg["preprocess"]["hubert_codes"],
            vocab_size=vocab_size,
            n_speaker=n_speaker,
            pad_idx=pad_idx,
        )


@dataclass(frozen=True)
class TTETrainConfig:
    """Reference `optimizer:` + `train:` sections of TTE_config.yaml."""

    init_lr: float = 1e-4
    betas: tuple[float, float] = (0.9, 0.98)
    weight_decay: float = 0.0
    warmup_steps: int = 2000
    total_steps: int = 50_000
    log_every: int = 10
    val_every: int = 1000
    save_every: int = 1000
    batch_size: int = 6
    grad_acc_steps: int = 4
    grad_clip: float = 1.0
    seed: int = 42
    # static-shape bucketing (jit requirement; reference pads per-batch
    # dynamically). Multiples of 128 keep the flash-attention path eligible.
    src_buckets: tuple[int, ...] = (128, 256)
    tgt_buckets: tuple[int, ...] = (512, 1024, 2048, 3584)

    @classmethod
    def from_reference_yaml(cls, cfg: dict) -> "TTETrainConfig":
        o, t = cfg["optimizer"], cfg["train"]
        return cls(
            init_lr=o["init_lr"], betas=tuple(o["betas"]),
            weight_decay=o["weight_decay"],
            warmup_steps=t["warmup_steps"], total_steps=t["total_steps"],
            log_every=t["log_every"], val_every=t["val_every"],
            save_every=t["save_every"], batch_size=t["batch_size"],
            grad_acc_steps=t["grad_acc_steps"], grad_clip=t["grad_clip"],
        )


# ---------------------------------------------------------------------------
# Vocoder stage — reference: utils/vocoder/config.json
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class MelConfig:
    """STFT/mel parameters (vocoder loss mel; reference config.json:24-35)."""

    n_fft: int = 1024
    num_mels: int = 80
    sampling_rate: int = 16_000
    hop_size: int = 256
    win_size: int = 1024
    fmin: float = 0.0
    fmax: float | None = 8000.0
    # torch.stft-style centering: False with manual (n_fft-hop)/2 reflect pad
    # (reference utils/vocoder/dataset.py:55-60)
    center: bool = False


@dataclass(frozen=True)
class VocoderModelConfig:
    """Unit HiFi-GAN V1 (reference config.json + utils/vocoder/models.py)."""

    resblock: str = "1"
    upsample_rates: tuple[int, ...] = (5, 4, 4, 2, 2)
    upsample_kernel_sizes: tuple[int, ...] = (11, 8, 8, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: tuple[tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    num_embeddings: int = 1000       # HuBERT codebook size
    embedding_dim: int = 128
    model_in_dim: int = 256          # code emb + speaker emb concat
    multispkr: str | None = "_"
    num_speakers: int = 10           # reference hardcodes nn.Embedding(10, ...) models.py:130
    # f0 conditioning gate (reference models.py:126 stores h.get('f0') but
    # never consumes it — the forward's kwarg-concat loop skips the key,
    # models.py:163; dormant in every reference config). When set, an `f0`
    # extra feature is upsample-concatenated into the generator input
    # (extract with ops/f0.estimate_f0, pool with f0_to_code_rate) and
    # model_in_dim must count its channel.
    f0: bool = False
    dtype: str = "float32"
    # run tail stages (C < 128) in the space-to-depth folded layout so every
    # conv keeps full MXU lanes (ops/folded.py); numerically equivalent up
    # to fp reassociation
    fold_tail: bool = True
    # serving path: compute each folded MRF stack in one Pallas kernel
    # (one HBM round trip instead of ~36; ops/fused_mrf.py). Measured
    # perf-NEUTRAL at batch 64 (64.1 vs 63.1 ms/batch): the folded tail is
    # MXU-bound at ~75% of peak on EXECUTED FLOPs (block-Toeplitz inflation
    # 1.81x — see PERF.md round 2c), so removing HBM round trips buys
    # nothing. Kept as tested infrastructure; off by default.
    fused_mrf: bool = False
    # int8 serving path (ops/quant.py): "none" | "int8-tail" | "int8".
    # Measured mechanism (PERF.md 3b): the gain is halved activation HBM
    # bytes AND the real int8 MXU rate (332 TOP/s = 1.70x bf16 marginal;
    # PERF.md 4a — round-3's "int8 runs at bf16 speed" reading was
    # overhead-polluted and retracted). +12.6% end-to-end.
    # "int8-tail" quantizes only the folded
    # (lane-packed) stages; "int8" also quantizes the unfolded MRF stages
    # and upsamples (per-batch-row dynamic activation scales);
    # "int8-static" additionally makes the activation scales STATIC
    # (calibrated once per checkpoint) so the per-call absmax passes
    # vanish and inter-stage tensors cross HBM as int8
    # (models/vocoder/generator_staticq.py, PERF.md r5). conv_pre
    # and conv_post always stay in `dtype` (embedding head / waveform
    # tail are fidelity-critical). Serving-only:
    # the quantized path defines no custom VJP. Fidelity bounds are
    # measured on hardware like the bf16 path's (scripts/tpu_parity_check).
    quant: str = "none"

    @property
    def total_upsample(self) -> int:
        r = 1
        for u in self.upsample_rates:
            r *= u
        return r  # 320 == code_hop_size

    @classmethod
    def from_reference_json(cls, h: dict) -> "VocoderModelConfig":
        return cls(
            resblock=str(h["resblock"]),
            upsample_rates=tuple(h["upsample_rates"]),
            upsample_kernel_sizes=tuple(h["upsample_kernel_sizes"]),
            upsample_initial_channel=h["upsample_initial_channel"],
            resblock_kernel_sizes=tuple(h["resblock_kernel_sizes"]),
            resblock_dilation_sizes=tuple(tuple(d) for d in h["resblock_dilation_sizes"]),
            num_embeddings=h["num_embeddings"],
            embedding_dim=h["embedding_dim"],
            model_in_dim=h.get("model_in_dim", 128),
            multispkr=h.get("multispkr"),
            f0=bool(h.get("f0")),
        )


@dataclass(frozen=True)
class VocoderTrainConfig:
    """Reference config.json training keys + train.py optimizer setup."""

    batch_size: int = 16
    learning_rate: float = 2e-4
    adam_b1: float = 0.8
    adam_b2: float = 0.99
    lr_decay: float = 0.999          # ExponentialLR gamma, per epoch
    seed: int = 1234
    segment_size: int = 8960
    code_hop_size: int = 320
    training_epochs: int = 2000
    checkpoint_interval: int = 10_000
    summary_interval: int = 100
    # discriminator compute dtype (params stay f32; loss reductions are f32
    # regardless). bfloat16 halves the D-side MXU time of the GAN step —
    # measured lever in bench_gan.py.
    disc_dtype: str = "float32"
    validation_interval: int = 1000

    @classmethod
    def from_reference_json(cls, h: dict) -> "VocoderTrainConfig":
        return cls(**_filter_kwargs(cls, h))


# ---------------------------------------------------------------------------
# HuBERT unit extraction — reference: utils/hubert_extraction/
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class HubertConfig:
    """HuBERT encoder for on-TPU unit extraction.

    The reference shells out to fairseq mHuBERT base
    (`/root/reference/utils/hubert_extraction/hubert_api.py:16-31`,
    layer-11 features + joblib k-means 1000, `extractor.py:12-13`). Defaults
    here are the base topology that checkpoint uses (identical to HF
    `HubertModel` base: 7-layer conv frontend, 12-layer post-LN transformer).
    """

    # conv feature extractor (wav 16 kHz -> 50 Hz frames, hop 320)
    conv_dim: tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    # "group": GroupNorm(C, C) after conv 0 only (base); "layer": per-conv
    # channel LayerNorm (large-style extractors)
    feat_extract_norm: str = "group"
    # transformer encoder (post-LN, HF do_stable_layer_norm=False)
    d_model: int = 768
    n_layer: int = 12
    n_head: int = 12
    ffn_dim: int = 3072
    layer_norm_eps: float = 1e-5
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    # task.cfg.normalize — wav-level layer norm (False for base checkpoints,
    # hubert_api.py:55-56 gates on it)
    normalize_input: bool = False
    sample_rate: int = 16_000
    # extraction defaults (extractor.py:12, hubert_api.py:17)
    output_layer: int = 11
    max_chunk: int = 1_600_000
    n_units: int = 1000
    dtype: str = "float32"

    @property
    def frame_hop(self) -> int:
        r = 1
        for s in self.conv_stride:
            r *= s
        return r  # 320 samples per frame

    @property
    def receptive_field(self) -> int:
        rf, hop = 1, 1
        for k, s in zip(self.conv_kernel, self.conv_stride):
            rf += (k - 1) * hop
            hop *= s
        return rf  # 400 samples


# ---------------------------------------------------------------------------
# Aligner stage — reference: utils/aligner/aligner_train_config.yaml
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class AlignerAudioConfig:
    """librosa mel for the aligner (reference utils/aligner/audio.py:30-42)."""

    sample_rate: int = 16_000
    n_filters: int = 1024            # n_fft
    n_mels: int = 80
    win_length: int = 1024
    hop_length: int = 320            # == HuBERT unit hop
    fmin: float = 0.0
    fmax: float = 8000.0
    power: float = 1.0


@dataclass(frozen=True)
class AlignerModelConfig:
    """conv x3 -> BiLSTM -> linear (reference utils/aligner/model.py:24-48)."""

    n_mels: int = 80
    conv_dim: int = 512
    lstm_dim: int = 512
    num_symbols: int = 100           # len(symbols) + 1 (CTC blank at 0)


@dataclass(frozen=True)
class AlignerTrainConfig:
    learning_rate: float = 1e-4
    batch_size: int = 16
    epochs: int = 450
    plot_steps: int = 1000
    checkpoint_steps: int = 10_000
    grad_clip: float = 1.0
    mel_bucket_sizes: tuple[int, ...] = (256, 512, 1024, 2048)
    token_bucket_sizes: tuple[int, ...] = (64, 128, 256, 512)


# ---------------------------------------------------------------------------
# Mesh / parallelism
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout. Reference parallelism is DP-only (SURVEY.md §2c);
    a `model` axis is kept so larger-than-HBM configs can shard tensors."""

    data_axis: str = "data"
    model_axis: str = "model"
    model_parallel_size: int = 1


@dataclass(frozen=True)
class PipelineConfig:
    """Top-level bundle for an end-to-end run."""

    root_path: str = "runs/TTE"
    alignment_path: str = "runs/aligner"
    hubert_path: str = "runs/hubert_extraction/hubert.txt"
    val_size: int = 100
    speaker_method: str = "_"        # '_' multispeaker | 'single'
    tte_model: TTEModelConfig = field(default_factory=TTEModelConfig)
    tte_train: TTETrainConfig = field(default_factory=TTETrainConfig)
    mel: MelConfig = field(default_factory=MelConfig)
    vocoder_model: VocoderModelConfig = field(default_factory=VocoderModelConfig)
    vocoder_train: VocoderTrainConfig = field(default_factory=VocoderTrainConfig)
    aligner_audio: AlignerAudioConfig = field(default_factory=AlignerAudioConfig)
    aligner_model: AlignerModelConfig = field(default_factory=AlignerModelConfig)
    aligner_train: AlignerTrainConfig = field(default_factory=AlignerTrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)


# ---------------------------------------------------------------------------
# Loaders for the reference's file formats
# ---------------------------------------------------------------------------


def load_reference_tte_yaml(path: str | Path) -> dict:
    import yaml

    with open(path) as f:
        return yaml.safe_load(f)


def load_reference_vocoder_json(path: str | Path) -> dict:
    with open(path) as f:
        return json.load(f)


def to_json(cfg: Any) -> str:
    """Serialize any config dataclass (for saving alongside checkpoints)."""
    return json.dumps(dataclasses.asdict(cfg), indent=2, default=str)


def aligner_configs_to_json(model_cfg: "AlignerModelConfig",
                            train_cfg: "AlignerTrainConfig") -> str:
    """Model + train config for the aligner checkpoint dir (the reference
    embeds the config inside the checkpoint dict, utils/aligner/
    trainer.py:77-88; here it lives in config.json next to the ckpts so the
    extract-durations CLI can rebuild the restore template)."""
    return json.dumps({"model": dataclasses.asdict(model_cfg),
                       "train": dataclasses.asdict(train_cfg)}, indent=2)


def aligner_configs_from_json(text: str):
    d = json.loads(text)
    t = dict(d["train"])
    for k in ("mel_bucket_sizes", "token_bucket_sizes"):
        if k in t and t[k] is not None:
            t[k] = tuple(t[k])
    return (AlignerModelConfig(**d["model"]), AlignerTrainConfig(**t))


def vocoder_config_from_json(text: str) -> VocoderModelConfig:
    """Round-trip of to_json(VocoderModelConfig) — loads the config.json that
    pipeline/train_vocoder.py saves next to checkpoints, restoring the
    tuple-typed fields JSON flattens to lists."""
    d = json.loads(text)
    d = {k: v for k, v in d.items()
         if k in {f.name for f in dataclasses.fields(VocoderModelConfig)}}
    for k in ("upsample_rates", "upsample_kernel_sizes",
              "resblock_kernel_sizes"):
        if k in d:
            d[k] = tuple(d[k])
    if "resblock_dilation_sizes" in d:
        d["resblock_dilation_sizes"] = tuple(
            tuple(x) for x in d["resblock_dilation_sizes"])
    return VocoderModelConfig(**d)
