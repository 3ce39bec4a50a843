"""TTE data pipeline: manifests -> static-shape bucketed batches.

Replaces the reference's torch Dataset + dynamic pad-collate
(`/root/reference/modules/data.py:63-119`). jit needs static shapes, so
samples are padded to (src_bucket, tgt_bucket) pairs; bucket boundaries are
fixed in config so every host compiles identical programs (multi-host
requirement, SURVEY.md §7). Mask/padding semantics match the reference
collate: phones padded with pad_idx, codes with the 1000 pad code (=
CE ignore_index), durations with 0; masks are True=valid.
"""

from __future__ import annotations

import bisect
from dataclasses import dataclass
from pathlib import Path
from typing import Iterator

import numpy as np

from parrot_tts_tpu.data.manifest import read_manifest, read_speaker_map
from parrot_tts_tpu.text.tokenizer import DFATokenizer


@dataclass
class TTESample:
    id: str
    speaker: int
    phones: np.ndarray       # (S,) int32
    codes: np.ndarray        # (T,) int32
    duration: np.ndarray     # (S,) int32
    audio: str = ""          # manifest audio path (reference keeps it so
                             # inference.py:61-62 can record true durations)


class TTEDataset:
    """Parses {split}.txt + speakers.json + aligner symbols
    (reference modules/data.py:63-100)."""

    def __init__(self, root_path: str | Path, alignment_path: str | Path,
                 split: str = "train", hubert_codes: int = 1000):
        root = Path(root_path)
        self.tokenizer = DFATokenizer.from_alignment_path(alignment_path)
        self.speaker_map = read_speaker_map(root / "speakers.json")
        self.code_pad_idx = hubert_codes
        self.samples: list[TTESample] = []
        for d in read_manifest(root / f"{split}.txt"):
            phones = self.tokenizer.tokenize_text(d["characters"])
            codes = [int(c) for c in d["hubert"].split(" ")]
            durs = [int(c) for c in d["duration"].split(" ")]
            self.samples.append(TTESample(
                id=Path(d["audio"]).stem,
                speaker=self.speaker_map[d["speaker"]],
                phones=np.asarray(phones, np.int32),
                codes=np.asarray(codes, np.int32),
                duration=np.asarray(durs, np.int32),
                audio=d["audio"],
            ))

    def __len__(self):
        return len(self.samples)

    @property
    def src_pad_idx(self) -> int:
        return self.tokenizer.pad_idx

    @property
    def vocab_size(self) -> int:
        return len(self.tokenizer)


def pick_bucket(buckets: tuple[int, ...], length: int) -> int:
    """Smallest bucket >= length (the largest bucket caps/crops)."""
    i = bisect.bisect_left(buckets, length)
    return buckets[min(i, len(buckets) - 1)]


def collate(samples: list[TTESample], src_len: int, tgt_len: int,
            src_pad_idx: int, code_pad_idx: int,
            sample_weight: list[float] | None = None) -> dict:
    """Fixed-shape batch (reference collate_fn semantics, data.py:102-119).

    sample_weight: per-sample loss weights (default all 1.0). The loader
    sets 0.0 on rows that only repeat an earlier sample to keep the batch
    shape static, so those rows contribute nothing to the loss — matching
    the reference, whose last partial batch is simply smaller."""
    b = len(samples)
    phones = np.full((b, src_len), src_pad_idx, np.int32)
    codes = np.full((b, tgt_len), code_pad_idx, np.int32)
    duration = np.zeros((b, src_len), np.int32)
    src_mask = np.zeros((b, src_len), bool)
    tgt_mask = np.zeros((b, tgt_len), bool)
    speaker = np.zeros((b,), np.int32)
    ids = []
    for i, s in enumerate(samples):
        ns, nt = min(len(s.phones), src_len), min(len(s.codes), tgt_len)
        phones[i, :ns] = s.phones[:ns]
        codes[i, :nt] = s.codes[:nt]
        # beam-search durations (extract-durations --method beam) may be
        # shorter than the token sequence when the best path never visits
        # trailing tokens; zero-pad the tail like the reference's
        # pad_sequence instead of broadcasting (which would raise)
        nd = min(len(s.duration), ns)
        duration[i, :nd] = s.duration[:nd]
        src_mask[i, :ns] = True
        tgt_mask[i, :nt] = True
        speaker[i] = s.speaker
        ids.append(s.id)
    weight = (np.ones((b,), np.float32) if sample_weight is None
              else np.asarray(sample_weight, np.float32))
    return {
        "ids": ids, "phones": phones, "codes": codes, "duration": duration,
        "src_mask": src_mask, "tgt_mask": tgt_mask, "speaker": speaker,
        "sample_weight": weight,
    }


class BucketedLoader:
    """Length-bucketed batching with per-epoch deterministic shuffling.

    Grouping by bucket both bounds the number of distinct compiled shapes
    (len(src_buckets) x len(tgt_buckets) max) and minimizes pad waste — the
    TPU replacement for the reference's BinnedLengthSampler idea
    (utils/aligner/dataset.py:38-63).
    """

    def __init__(self, dataset: TTEDataset, batch_size: int,
                 src_buckets: tuple[int, ...], tgt_buckets: tuple[int, ...],
                 seed: int = 42, shuffle: bool = True,
                 drop_last: bool = False,
                 process_index: int = 0, process_count: int = 1):
        if batch_size % process_count != 0:
            raise ValueError(
                f"global batch_size={batch_size} must be divisible by "
                f"process_count={process_count} (each host takes an equal "
                f"slice of every global batch)")
        self.ds = dataset
        self.batch_size = batch_size
        self.src_buckets = src_buckets
        self.tgt_buckets = tgt_buckets
        self.seed = seed
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.process_index = process_index
        self.process_count = process_count

    def batches(self, epoch: int = 0) -> Iterator[dict]:
        """Multi-host: every host derives the identical batch schedule from
        the shared seed (bucket boundaries and batch order must agree across
        hosts or pjit programs diverge — SURVEY.md §7), then takes its
        process_index-strided slice of each GLOBAL batch."""
        by_bucket: dict[tuple[int, int], list[int]] = {}
        for i, s in enumerate(self.ds.samples):
            key = (pick_bucket(self.src_buckets, len(s.phones)),
                   pick_bucket(self.tgt_buckets, len(s.codes)))
            by_bucket.setdefault(key, []).append(i)

        rng = np.random.default_rng(self.seed + epoch)
        groups = sorted(by_bucket.items())
        all_batches = []
        for (src_len, tgt_len), idxs in groups:
            idxs = np.asarray(idxs)
            if self.shuffle:
                rng.shuffle(idxs)
            for off in range(0, len(idxs), self.batch_size):
                chunk = idxs[off : off + self.batch_size]
                if self.drop_last and len(chunk) < self.batch_size:
                    continue
                all_batches.append((src_len, tgt_len, chunk))
        if self.shuffle:
            rng.shuffle(all_batches)

        local = self.batch_size // self.process_count
        for src_len, tgt_len, chunk in all_batches:
            idxs = list(chunk)
            # keep shapes static: pad short batches by repeating sample 0,
            # but zero those rows' loss weight (repeating with weight 1
            # would double-count the repeated sample's gradient; the
            # reference's last partial batch is simply smaller)
            weights = [1.0] * len(idxs)
            while len(idxs) < self.batch_size:
                idxs.append(idxs[0])
                weights.append(0.0)
            if self.process_count > 1:
                sl = slice(self.process_index * local,
                           (self.process_index + 1) * local)
                idxs, weights = idxs[sl], weights[sl]
            samples = [self.ds.samples[i] for i in idxs]
            yield collate(samples, src_len, tgt_len,
                          self.ds.src_pad_idx, self.ds.code_pad_idx,
                          sample_weight=weights)


def shard_for_host(indices: np.ndarray, process_index: int,
                   process_count: int) -> np.ndarray:
    """Per-host manifest shard (multi-host input pipeline; the analog of
    DistributedSampler, reference utils/vocoder/train.py:97-100)."""
    return indices[process_index::process_count]
