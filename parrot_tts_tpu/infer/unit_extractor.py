"""Batched TPU HuBERT unit extraction.

Replaces the reference's one-wav-at-a-time CPU loop
(`/root/reference/utils/hubert_extraction/extractor.py:56-81`,
`hubert_api.py:49-68`) with length-bucketed batches on device: encoder
forward + k-means argmin compile once per bucket; codes stream back to host.
Outputs are exactly the reference's (per-utterance) results: the encoder is
masked so padding never leaks into valid frames (models/hubert/model.py).

Very long wavs use the reference's chunking rule verbatim: slices of
`max_chunk` samples encoded independently and concatenated
(hubert_api.py:60-69) — k-means is per-frame, so predicting per chunk equals
predicting on concatenated features.
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Iterable, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from parrot_tts_tpu.core.config import HubertConfig
from parrot_tts_tpu.models.hubert import model as hubert_model


def _default_buckets(cfg: HubertConfig) -> tuple[int, ...]:
    # 1..40 s in 2.56 s (128-frame) steps, hop 320: static shapes with
    # <= 2.56 s padding waste, MXU-aligned frame counts
    step = 128 * cfg.frame_hop
    return tuple(step * i for i in range(1, 16)) + (cfg.max_chunk,)


class UnitExtractor:
    """wav -> HuBERT codes, batched per length bucket.

    API mirrors the reference `HubertInference`
    (extractor.py:10-23: `get_codes_from_path`, `get_codes`).
    """

    def __init__(self, params: dict, cfg: HubertConfig,
                 km_centers: np.ndarray, *, output_layer: int | None = None,
                 buckets: Sequence[int] | None = None, batch_size: int = 8):
        self.params = params
        self.cfg = cfg
        self.output_layer = (cfg.output_layer if output_layer is None
                             else output_layer)
        if not 1 <= self.output_layer <= cfg.n_layer:
            raise ValueError(f"output_layer {self.output_layer} not in "
                             f"[1, {cfg.n_layer}]")
        self.centers = jnp.asarray(km_centers, jnp.float32)
        self.buckets = tuple(sorted(buckets or _default_buckets(cfg)))
        self.batch_size = batch_size

    @functools.lru_cache(maxsize=None)
    def _compiled(self, bucket_len: int):
        cfg, layer = self.cfg, self.output_layer

        @jax.jit
        def run(params, centers, wav, n_samples):
            # full-f32 matmuls: extraction is offline and the codes feed TTE
            # training as labels — default TPU matmul precision perturbs
            # features enough to flip nearest-centroid argmin on near-ties
            with jax.default_matmul_precision("highest"):
                feats, n_frames = hubert_model.apply_hubert(
                    params, wav, n_samples, cfg, output_layer=layer)
                codes = hubert_model.kmeans_predict(feats, centers)
            return codes, n_frames

        return run

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def _prepare_batch(self, wavs: Sequence[np.ndarray]):
        """Host side of a batch launch: pad to the bucket and start the
        host->device transfer. Safe to call from an upload thread — this
        is the ~10 MB synchronous cost that must overlap device compute
        (PERF.md 3e: the upload was 57% of the streaming gap)."""
        lens = np.array([len(w) for w in wavs], np.int32)
        bucket = self._bucket(int(lens.max()))
        batch = np.zeros((len(wavs), bucket), np.float32)
        for i, w in enumerate(wavs):
            batch[i, : len(w)] = w
        return bucket, jax.device_put(batch), jax.device_put(lens)

    def _launch_batch(self, wavs: Sequence[np.ndarray]):
        """Enqueue one device call for wavs sharing a bucket; returns
        device arrays (NOT fetched) so callers can pipeline."""
        bucket, dev_batch, dev_lens = self._prepare_batch(wavs)
        return self._compiled(bucket)(
            self.params, self.centers, dev_batch, dev_lens)

    @staticmethod
    def _fetch_batch(launched) -> list[np.ndarray]:
        codes, n_frames = launched
        codes = np.asarray(codes)
        n_frames = np.asarray(n_frames)
        return [codes[i, : n_frames[i]] for i in range(codes.shape[0])]

    def _codes_batch(self, wavs: Sequence[np.ndarray]) -> list[np.ndarray]:
        """One device call for wavs sharing a bucket."""
        return self._fetch_batch(self._launch_batch(wavs))

    def get_codes(self, wav: np.ndarray) -> np.ndarray:
        """Codes for one wav, chunked at max_chunk like the reference."""
        wav = np.asarray(wav, np.float32)
        chunks = [wav[s: s + self.cfg.max_chunk]
                  for s in range(0, max(len(wav), 1), self.cfg.max_chunk)]
        outs = [self._codes_batch([c])[0] for c in chunks]
        return np.concatenate(outs) if len(outs) > 1 else outs[0]

    def get_codes_from_path(self, wav_path: str | Path) -> np.ndarray:
        from parrot_tts_tpu.data.audio_io import read_wav

        wav, sr = read_wav(wav_path)
        if sr != self.cfg.sample_rate:
            raise ValueError(
                f"{wav_path}: sample rate {sr} != {self.cfg.sample_rate} "
                "(the reference resamples via librosa; resample offline)")
        return self.get_codes(wav)

    def codes_for_wavs(self, wavs: Iterable[np.ndarray],
                       upload_thread: bool = True,
                       defer_readback: bool = False) -> list[np.ndarray]:
        """Batched: group by bucket, preserve order.

        Pipelined: a window of batches is enqueued ahead of the in-order
        code readbacks so the device computes batch i+1..i+k while the
        host drains batch i — a corpus pass pays ~max(compute, readback)
        per batch instead of their sum (the relay round trip was measured
        at ~70% of the streaming time, PERF.md 3e).

        defer_readback=True keeps every batch's codes on device and drains
        them in one pass AFTER all compute is enqueued (one bulk fetch per
        corpus shard instead of one per batch). Code outputs are small
        (~128 KB int32 per batch) so holding them does not pressure HBM;
        use for offline corpus extraction where per-utterance streaming
        latency does not matter (PERF.md 4f/5: tightens the device-bound
        measurement by removing interleaved relay round trips)."""
        wavs = [np.asarray(w, np.float32) for w in wavs]
        order: dict[int, list[int]] = {}
        for i, w in enumerate(wavs):
            if len(w) > self.cfg.max_chunk:
                order.setdefault(-1, []).append(i)   # chunked path, solo
            else:
                order.setdefault(self._bucket(len(w)), []).append(i)
        out: list[np.ndarray | None] = [None] * len(wavs)

        jobs = []
        for bucket, idxs in order.items():
            if bucket == -1:
                for i in idxs:
                    out[i] = self.get_codes(wavs[i])
                continue
            for s in range(0, len(idxs), self.batch_size):
                jobs.append(idxs[s: s + self.batch_size])

        # two-stage pipeline: an upload thread pads + device_puts batch
        # i+1..i+k while the main thread launches compute and drains
        # readbacks in order — the corpus pass pays
        # ~max(compute, upload, readback) per batch instead of their sum
        import concurrent.futures as cf

        window = 4
        inflight: list[tuple[list[int], object]] = []
        if not upload_thread:
            # inline uploads (launch-ahead window only)
            for grp in jobs:
                inflight.append((grp,
                                 self._launch_batch([wavs[i] for i in grp])))
                if not defer_readback and len(inflight) >= window:
                    done_grp, launched = inflight.pop(0)
                    for i, c in zip(done_grp, self._fetch_batch(launched)):
                        out[i] = c
            for done_grp, launched in inflight:
                for i, c in zip(done_grp, self._fetch_batch(launched)):
                    out[i] = c
            return out  # type: ignore[return-value]
        with cf.ThreadPoolExecutor(max_workers=1) as uploader:
            preps = [uploader.submit(
                self._prepare_batch, [wavs[i] for i in grp])
                for grp in jobs[:window]]
            for gi, grp in enumerate(jobs):
                bucket, dev_batch, dev_lens = preps[gi].result()
                if gi + window < len(jobs):
                    preps.append(uploader.submit(
                        self._prepare_batch,
                        [wavs[i] for i in jobs[gi + window]]))
                inflight.append((grp, self._compiled(bucket)(
                    self.params, self.centers, dev_batch, dev_lens)))
                if not defer_readback and len(inflight) >= window:
                    done_grp, launched = inflight.pop(0)
                    for i, c in zip(done_grp, self._fetch_batch(launched)):
                        out[i] = c
            for done_grp, launched in inflight:
                for i, c in zip(done_grp, self._fetch_batch(launched)):
                    out[i] = c
        return out  # type: ignore[return-value]
