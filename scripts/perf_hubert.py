"""HuBERT unit-extraction throughput: audio-s/s/chip at reference scale.

The reference extracts units one wav at a time through fairseq mHuBERT base
(`/root/reference/utils/hubert_extraction/hubert_api.py:49-68`) — the
whole-corpus pass that feeds both TTE and vocoder preprocessing. Here the
extraction runs as length-bucketed batches on the TPU
(infer/unit_extractor.py); this script measures:

  * streaming throughput of the production `UnitExtractor.codes_for_wavs`
    path (includes per-batch host readback of the codes), and
  * device-bound throughput (queued jit calls, final fetch) to show the
    readback overhead,

at mHuBERT-base scale (7-conv frontend, 12-layer d=768 transformer,
k-means 1000) with random params — throughput does not depend on weights.

Usage: python scripts/perf_hubert.py [--batch 16] [--seconds 10]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from parrot_tts_tpu.core.config import HubertConfig  # noqa: E402
from parrot_tts_tpu.infer.unit_extractor import UnitExtractor  # noqa: E402
from parrot_tts_tpu.models.hubert import model as hubert_model  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=10.0,
                    help="per-utterance length")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    cfg = HubertConfig()
    sr = 16_000
    rng = np.random.default_rng(0)
    params = hubert_model.init_hubert(jax.random.key(0), cfg)
    centers = rng.standard_normal((1000, cfg.d_model)).astype(np.float32)

    n = int(args.seconds * sr)
    wavs = [(rng.standard_normal(n) * 0.1).astype(np.float32)
            for _ in range(args.batch)]
    audio_s = args.batch * n / sr

    ex = UnitExtractor(params, cfg, centers, output_layer=11,
                       batch_size=args.batch)

    # warmup (compile + relay session)
    codes = ex.codes_for_wavs(wavs)
    assert len(codes) == args.batch and all(len(c) > 0 for c in codes)

    # 1) production streaming path (codes fetched per batch)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        ex.codes_for_wavs(wavs)
    dt_stream = (time.perf_counter() - t0) / args.iters

    # 1b) corpus pass: ONE codes_for_wavs over iters x batch wavs — the
    # launch-ahead window pipelines device compute under the readbacks;
    # A/B the upload thread (PERF.md 4f: threaded device_put can contend
    # with dispatch on the relay lock)
    corpus = wavs * args.iters
    t0 = time.perf_counter()
    codes_all = ex.codes_for_wavs(corpus)
    dt_corpus = (time.perf_counter() - t0) / args.iters
    assert len(codes_all) == len(corpus)
    t0 = time.perf_counter()
    ex.codes_for_wavs(corpus, upload_thread=False)
    dt_corpus_inline = (time.perf_counter() - t0) / args.iters

    # 1c) readback-free corpus mode (r5, PERF.md 4f qualification): codes
    # stay on device until one bulk drain at the end — tightens the
    # "device-bound" bound with a REAL corpus path (uploads included)
    t0 = time.perf_counter()
    codes_defer = ex.codes_for_wavs(corpus, defer_readback=True)
    dt_corpus_defer = (time.perf_counter() - t0) / args.iters
    assert all(np.array_equal(a, b)
               for a, b in zip(codes_defer, codes_all))

    # 2) device-bound: queue all batches, fetch last (PERF.md methodology)
    bucket = ex._bucket(n)
    batch = np.zeros((args.batch, bucket), np.float32)
    for i, w in enumerate(wavs):
        batch[i, : len(w)] = w
    lens = jnp.asarray(np.full((args.batch,), n, np.int32))
    batch_j = jnp.asarray(batch)
    run = ex._compiled(bucket)
    _ = np.asarray(run(ex.params, ex.centers, batch_j, lens)[0])
    t0 = time.perf_counter()
    outs = [run(ex.params, ex.centers, batch_j, lens) for _ in range(args.iters)]
    _ = np.asarray(outs[-1][0])
    dt_dev = (time.perf_counter() - t0) / args.iters

    print(json.dumps({
        "metric": "hubert_extraction_audio_seconds_per_second_per_chip",
        # headline = the PRODUCTION path (threaded uploads, the
        # codes_for_wavs default) — not best-of-modes
        "value": round(audio_s / dt_corpus, 1),
        "unit": "audio-s/s/chip",
        "detail": {
            "batch": args.batch, "utt_seconds": args.seconds,
            "bucket_samples": bucket,
            "corpus_pipelined_audio_s_per_s": round(audio_s / dt_corpus, 1),
            "corpus_inline_upload_audio_s_per_s": round(
                audio_s / dt_corpus_inline, 1),
            "corpus_defer_readback_audio_s_per_s": round(
                audio_s / dt_corpus_defer, 1),
            "per_call_audio_s_per_s": round(audio_s / dt_stream, 1),
            "device_bound_audio_s_per_s": round(audio_s / dt_dev, 1),
            "ms_per_batch_streaming": round(dt_stream * 1e3, 1),
            "ms_per_batch_device": round(dt_dev * 1e3, 1),
            "matmul_precision": "highest (code-exactness vs oracle)",
        },
    }))


if __name__ == "__main__":
    main()
