"""Batched TTE inference: manifest -> predicted HuBERT units.

Reference: `/root/reference/inference.py` — batch-1 val loop writing
{'audio','hubert','duration'} dict lines to predictions.txt. Here decode runs
BATCHED through the compiled graph in static buckets (outputs are provably
identical to batch-1 decode — see the padding discipline in models/tte/fft.py
and tests/test_tte_parity.py), then unpadded host-side.
"""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from parrot_tts_tpu.core.config import TTEModelConfig
from parrot_tts_tpu.data.audio_io import duration_seconds
from parrot_tts_tpu.data.tte_data import TTEDataset, pick_bucket
from parrot_tts_tpu.models.tte import parrot


def predict_units(
    params,
    dataset: TTEDataset,
    model_cfg: TTEModelConfig,
    *,
    batch_size: int = 16,
    src_buckets: tuple[int, ...] = (64, 128, 192, 256),
    out_len_per_token: int = 16,
) -> list[dict]:
    """Greedy-decode every sample; returns [{'audio','hubert','duration'}]
    manifest entries (duration = true audio seconds when the wav exists,
    reference inference.py:61-62)."""
    import jax

    results: list[dict | None] = [None] * len(dataset)

    by_bucket: dict[int, list[int]] = {}
    for i, s in enumerate(dataset.samples):
        by_bucket.setdefault(pick_bucket(src_buckets, len(s.phones)), []).append(i)

    infer = jax.jit(parrot.infer_codes,
                    static_argnames=("cfg", "out_len"))

    for s_len, idxs in sorted(by_bucket.items()):
        out_len = min(s_len * out_len_per_token, model_cfg.max_len)
        for off in range(0, len(idxs), batch_size):
            chunk = idxs[off : off + batch_size]
            b = len(chunk)
            phones = np.zeros((b, s_len), np.int32)
            src_mask = np.zeros((b, s_len), bool)
            speaker = np.zeros((b,), np.int32)
            for j, gi in enumerate(chunk):
                s = dataset.samples[gi]
                n = min(len(s.phones), s_len)
                phones[j, :n] = s.phones[:n]
                src_mask[j, :n] = True
                speaker[j] = s.speaker
            batch = {
                "phones": jnp.asarray(phones),
                "src_mask": jnp.asarray(src_mask),
                "speaker": jnp.asarray(speaker),
            }
            codes, mask = infer(params, batch, cfg=model_cfg, out_len=out_len)
            codes, mask = np.asarray(codes), np.asarray(mask)
            for j, gi in enumerate(chunk):
                units = codes[j][mask[j]].tolist()
                results[gi] = {"hubert": " ".join(map(str, units))}
    return [r if r is not None else {} for r in results]


def write_predictions(
    params,
    dataset: TTEDataset,
    model_cfg: TTEModelConfig,
    out_path: str | Path,
    *,
    audio_paths: list[str] | None = None,
    **kwargs,
) -> Path:
    """predictions.txt in the reference format (inference.py:70-72)."""
    out_path = Path(out_path)
    preds = predict_units(params, dataset, model_cfg, **kwargs)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with open(out_path, "w") as f:
        for i, (s, p) in enumerate(zip(dataset.samples, preds)):
            audio = (audio_paths[i] if audio_paths else f"{s.id}.wav")
            try:
                dur = duration_seconds(audio)
            except Exception:
                dur = len(s.codes) * 320 / 16000.0
            f.write(str({"audio": audio, "hubert": p.get("hubert", ""),
                         "duration": dur}) + "\n")
    return out_path
