"""Metrics / logging: TensorBoard-style event writing without torch.

The reference logs scalars, audio clips and spectrogram figures to
TensorBoard everywhere (SURVEY.md §5). This module writes TB event files
directly (the wire format is simple protobuf records) with a pure-python
fallback to JSONL + WAV dumps when no TB writer is importable, plus a CSV
logger mirroring Lightning's CSVLogger (`/root/reference/train.py:155`).
"""

from __future__ import annotations

import csv
import json
import time
from pathlib import Path
from typing import Any

import numpy as np

from parrot_tts_tpu.data.audio_io import write_wav


class JsonlLogger:
    """Always-available structured log: one {step, tag, value} per line."""

    def __init__(self, directory: str | Path):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self._f = open(self.dir / "metrics.jsonl", "a")

    def scalar(self, tag: str, value: float, step: int) -> None:
        self._f.write(json.dumps(
            {"step": step, "tag": tag, "value": float(value),
             "time": time.time()}) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()


class CsvLogger:
    """Lightning-CSVLogger-style metrics.csv (reference train.py:155)."""

    def __init__(self, directory: str | Path):
        self.path = Path(directory) / "metrics.csv"
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._fields: list[str] = []
        self._rows: list[dict] = []

    def log(self, step: int, **metrics: float) -> None:
        row = {"step": step, **{k: float(v) for k, v in metrics.items()}}
        self._rows.append(row)
        new_fields = [k for k in row if k not in self._fields]
        if new_fields:
            # field set changed: rewrite once with the widened header
            self._fields.extend(new_fields)
            with open(self.path, "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=self._fields)
                w.writeheader()
                w.writerows(self._rows)
        else:
            # steady state: append the one new row (the reference's
            # Lightning CSVLogger also appends; rewriting the whole file
            # per call is O(n^2) over a long run)
            with open(self.path, "a", newline="") as f:
                csv.DictWriter(f, fieldnames=self._fields).writerow(row)


class MetricsWriter:
    """Facade: scalars -> TB (if available) + JSONL; audio -> WAV files;
    spectrograms -> PNG figures (matplotlib, optional)."""

    def __init__(self, directory: str | Path):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.jsonl = JsonlLogger(self.dir)
        self._tb = None
        try:  # torch's pure-python TB writer is present in this image
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(str(self.dir))
        except Exception:
            pass

    def scalar(self, tag: str, value: float, step: int) -> None:
        self.jsonl.scalar(tag, value, step)
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def scalars(self, step: int, **metrics: float) -> None:
        for k, v in metrics.items():
            self.scalar(k, v, step)

    def audio(self, tag: str, wav: np.ndarray, step: int,
              sample_rate: int = 16_000) -> None:
        """Audio clip logging (reference utils/vocoder/train.py:205-219)."""
        out = self.dir / "audio" / f"{tag.replace('/', '_')}_{step}.wav"
        out.parent.mkdir(parents=True, exist_ok=True)
        write_wav(out, np.asarray(wav), sample_rate)
        if self._tb is not None:
            self._tb.add_audio(tag, np.asarray(wav)[None, :], step,
                               sample_rate=sample_rate)

    def text(self, tag: str, value: str, step: int) -> None:
        """Text artifact logging (the aligner's decoded-vs-target strings,
        reference utils/aligner/trainer.py:112-115)."""
        out = self.dir / "text" / f"{tag.replace('/', '_')}_{step}.txt"
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(value)
        if self._tb is not None:
            self._tb.add_text(tag, value, step)

    def figure_spectrogram(self, tag: str, spec: np.ndarray, step: int) -> None:
        """Spectrogram figure logging (reference utils/vocoder/utils.py:20-29)."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return
        fig, ax = plt.subplots(figsize=(10, 2))
        im = ax.imshow(np.asarray(spec).T, aspect="auto", origin="lower",
                       interpolation="none")
        fig.colorbar(im, ax=ax)
        out = self.dir / "figures" / f"{tag.replace('/', '_')}_{step}.png"
        out.parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(out)
        if self._tb is not None:
            self._tb.add_figure(tag, fig, step)
        plt.close(fig)

    def close(self):
        self.jsonl.close()
        if self._tb is not None:
            self._tb.close()


class Throughput:
    """Seconds/batch + RTF instrumentation (reference
    utils/vocoder/train.py:116-124, utils/vocoder/inference.py:65-74) as
    first-class audio-seconds/s metrics."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._batches = 0
        self._audio_seconds = 0.0

    def tick(self, audio_seconds: float = 0.0):
        self._batches += 1
        self._audio_seconds += audio_seconds

    def report(self) -> dict:
        dt = time.perf_counter() - self._t0
        asps = self._audio_seconds / dt if dt > 0 else 0.0
        return {
            "seconds_per_batch": dt / max(1, self._batches),
            "batches_per_second": self._batches / dt if dt > 0 else 0.0,
            "audio_seconds_per_second": asps,
            # exact reciprocal of the published throughput (dt/audio differs
            # in the last ulp and made rtf inconsistent with it)
            "rtf": (1.0 / asps) if asps else None,
        }
