"""Vocoder GAN data pipeline: audio+code manifests -> fixed segment batches.

Replaces the reference `CodeDataset` (`/root/reference/utils/vocoder/
dataset.py:145-254`): load + peak-normalize x0.95, trim audio to code
alignment, repeat-pad short clips, LCM-aligned random segment crop of
`segment_size` samples, per-item ground-truth loss mel. Segments are a fixed
8960 samples so every batch is one static shape — ideal for jit. The GT loss
mel is computed ON DEVICE in the train step here (the reference computes it
per-item on CPU with num_workers=0, a known bottleneck — SURVEY.md §3.3);
the host pipeline ships only raw segments and codes.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Iterator

import numpy as np

from parrot_tts_tpu.data.audio_io import load_normalized
from parrot_tts_tpu.data.manifest import parse_speaker, read_manifest


@dataclass
class VocoderItem:
    audio_path: Path
    code: np.ndarray         # (Tc,) int32
    speaker_id: int


class VocoderDataset:
    def __init__(self, manifest_path: str | Path, *, segment_size: int = 8960,
                 code_hop_size: int = 320, multispkr: str | None = "_",
                 speaker_ids: dict[str, int] | None = None):
        self.segment_size = segment_size
        self.code_hop_size = code_hop_size
        self.multispkr = multispkr

        entries = read_manifest(manifest_path)
        speakers = sorted({parse_speaker(e["audio"], multispkr or "single")
                           for e in entries}) if multispkr else []
        # reference sorts the observed speaker set (dataset.py:168-175)
        self.spkr_to_id = (speaker_ids if speaker_ids is not None
                           else {s: i for i, s in enumerate(speakers)})
        self.items = [
            VocoderItem(
                audio_path=Path(e["audio"]),
                code=np.asarray([int(c) for c in e["hubert"].split(" ")],
                                np.int32),
                speaker_id=(self.spkr_to_id[parse_speaker(
                    e["audio"], multispkr)] if multispkr else 0),
            )
            for e in entries
        ]

    def __len__(self):
        return len(self.items)

    def load_item(self, idx: int, rng: np.random.Generator,
                  split: bool = True) -> dict:
        """One (code segment, audio segment) pair, reference __getitem__
        semantics (dataset.py:204-246)."""
        it = self.items[idx]
        audio, sr = load_normalized(it.audio_path)

        # trim to code alignment (dataset.py:220-224)
        code_len = min(len(audio) // self.code_hop_size, len(it.code))
        code = it.code[:code_len]
        audio = audio[: code_len * self.code_hop_size]

        # repeat-pad short clips (dataset.py:226-228)
        while len(audio) < self.segment_size:
            audio = np.concatenate([audio, audio])
            code = np.concatenate([code, code])

        if split:
            audio, code = self._sample_interval(audio, code, rng)
        return {"audio": audio.astype(np.float32), "code": code,
                "spkr": it.speaker_id, "filename": str(it.audio_path)}

    def _sample_interval(self, audio: np.ndarray, code: np.ndarray,
                         rng: np.random.Generator):
        """LCM-aligned random crop (reference _sample_interval,
        dataset.py:182-202): the crop start is aligned so the audio window
        covers an integer number of code frames."""
        seq_len = self.segment_size
        n = len(audio)
        hop = self.code_hop_size        # lcm(1, hop) == hop
        max_start = n // hop - seq_len // hop
        start_step = int(rng.integers(0, max_start + 1))
        a0 = start_step * hop
        c0 = start_step
        return (audio[a0 : a0 + seq_len],
                code[c0 : c0 + seq_len // hop])


class VocoderLoader:
    """Deterministic epoch iterator with per-host sharding; fixed shapes.

    Batch semantics match ``BucketedLoader`` (data/tte_data.py): `batch_size`
    is the GLOBAL batch; it must divide by `process_count`, and every host
    derives the identical global schedule from the shared seed, then takes
    its contiguous `batch_size / process_count` slice of each global batch
    (the reference divides its global batch across DDP workers the same way,
    `utils/vocoder/train.py:279`)."""

    def __init__(self, dataset: VocoderDataset, batch_size: int,
                 seed: int = 1234, shuffle: bool = True,
                 process_index: int = 0, process_count: int = 1,
                 with_f0: bool = False,
                 f0_kwargs: dict | None = None):
        if batch_size % process_count != 0:
            raise ValueError(
                f"global batch_size={batch_size} must be divisible by "
                f"process_count={process_count} (each host takes an equal "
                f"slice of every global batch)")
        self.ds = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.shuffle = shuffle
        self.process_index = process_index
        self.process_count = process_count
        # opt-in f0 conditioning track per batch — the reference's dormant
        # get_yaapt_f0 path (dataset.py:25-41), made functional: one batched
        # static-shape NCCF jit call per batch, pooled to code rate so the
        # generator's upsample-concat aligns (models.py:131-150).
        # f0_kwargs forwards extractor params (rate=, f0_min=, f0_max=, ...)
        # for corpora that are not 16 kHz / speech-band defaults.
        self.with_f0 = with_f0
        self.f0_kwargs = dict(f0_kwargs or {})

    def batches(self, epoch: int = 0) -> Iterator[dict]:
        rng = np.random.default_rng(self.seed + epoch)
        order = np.arange(len(self.ds))
        if self.shuffle:
            rng.shuffle(order)
        if 0 < len(order) < self.batch_size:
            # tiny datasets: cycle indices so one static-shape batch exists.
            # Accepted bias: repeats are NOT duplicate gradients — each
            # occurrence draws an independent random segment crop below
            # (load_item advances rng), i.e. sampling with replacement.
            order = np.resize(order, self.batch_size)
        local = self.batch_size // self.process_count
        n_full = len(order) // self.batch_size
        for b in range(n_full):
            idxs = order[b * self.batch_size : (b + 1) * self.batch_size]
            idxs = idxs[self.process_index * local
                        : (self.process_index + 1) * local]
            items = [self.ds.load_item(i, rng) for i in idxs]
            batch = {
                "audio": np.stack([it["audio"] for it in items]),
                "code": np.stack([it["code"] for it in items]),
                "spkr": np.asarray([it["spkr"] for it in items], np.int32),
                "filenames": [it["filename"] for it in items],
            }
            if self.with_f0:
                from parrot_tts_tpu.ops.f0 import estimate_f0, f0_to_code_rate
                track = estimate_f0(batch["audio"], **self.f0_kwargs)
                # frames_per_code = code hop / f0 hop (both in samples)
                rate = self.f0_kwargs.get("rate", 16000)
                f0_hop = int(rate * self.f0_kwargs.get(
                    "frame_space_ms", 5.0) / 1000.0)
                batch["f0"] = np.asarray(
                    f0_to_code_rate(track, batch["code"].shape[1],
                                    frames_per_code=max(
                                        1, self.ds.code_hop_size // f0_hop)),
                    np.float32)
            yield batch
