"""Batched TTE inference: manifest -> predicted HuBERT units.

Reference: `/root/reference/inference.py` — batch-1 val loop writing
{'audio','hubert','duration'} dict lines to predictions.txt. Here decode runs
BATCHED through the compiled graph in static buckets (outputs are provably
identical to batch-1 decode — see the padding discipline in models/tte/fft.py
and tests/test_tte_parity.py), then unpadded host-side.
"""

from __future__ import annotations

import warnings
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from parrot_tts_tpu.core.config import TTEModelConfig
from parrot_tts_tpu.data.audio_io import duration_seconds
from parrot_tts_tpu.data.tte_data import TTEDataset, pick_bucket
from parrot_tts_tpu.models.tte import parrot


def max_decode_len(model_cfg: TTEModelConfig) -> int:
    """Largest usable decoder bucket = the PE table's padded row count
    (models/tte/parrot.py::pos_table)."""
    return -(-model_cfg.max_len // 128) * 128


def decode_buckets(
    infer,
    params,
    model_cfg: TTEModelConfig,
    samples: list[tuple[np.ndarray, int]],
    plan: list[tuple[int, int, list[int]]],
    *,
    batch_size: int,
    exact: bool | str = True,
    mesh=None,
    margin_threshold: float = 0.5,
) -> list[np.ndarray]:
    """Run greedy decode over a (s_len, out_len, indices) bucket plan,
    re-decoding any sample whose predicted total duration overflows its
    out_len bucket in a larger one — the reference's dynamic shapes never
    truncate (modules/duration.py:6-24), so neither may the bucketed path.

    samples: (phone_ids, speaker) per item. Returns unit arrays per item.

    mesh: optional `jax.sharding.Mesh` — batches shard over the `data`
    axis and the identical compiled program runs SPMD (params must already
    be replicated on the mesh; computation follows the input sharding).
    Rows are repeat-padded to a multiple of the data-axis size; outputs
    are fetched globally, so the retry plan is derived identically on
    every host.

    exact="hybrid": decode with the fast "selective" mode (f32 lengths —
    exact by the hardware gate — and a 1-pass-bf16 decoder) while reading
    back each sample's min top-2 logit margin; samples whose margin falls
    below `margin_threshold` (where an argmax flip is possible) are
    re-decoded in the unit-exact "selective-high" mode. MEASURED AND
    REFUTED as a throughput lever (PERF.md 5b): at production decode
    lengths every ~500-frame sample carries a near-tie (on-chip min
    margins 0.000-0.003), so any safe threshold flags ~100% of samples
    and hybrid decodes everything twice — STRICTLY SLOWER than
    "selective-high" (224 vs 275 audio-s/s end-to-end). It IS unit-exact
    by the hardware gate; kept as tested infrastructure, not a serving
    recommendation.
    """
    from parrot_tts_tpu.core import mesh as meshlib

    hybrid = exact == "hybrid"
    fast_exact = "selective" if hybrid else exact
    flagged: dict[tuple[int, int], list[int]] = {}

    cap = max_decode_len(model_cfg)
    results: list[np.ndarray | None] = [None] * len(samples)
    n_data = 1 if mesh is None else mesh.shape[mesh.axis_names[0]]
    pending = list(plan)
    while pending:
        s_len, out_len, idxs = pending.pop(0)
        retry: dict[tuple[int, int], list[int]] = {}
        for off in range(0, len(idxs), batch_size):
            chunk = idxs[off : off + batch_size]
            b = len(chunk)
            b_pad = meshlib.pad_rows_to_multiple(b, n_data)
            phones = np.zeros((b_pad, s_len), np.int32)
            src_mask = np.zeros((b_pad, s_len), bool)
            speaker = np.zeros((b_pad,), np.int32)
            for j, gi in enumerate(chunk):
                seq, spk = samples[gi]
                n = min(len(seq), s_len)
                phones[j, :n] = seq[:n]
                src_mask[j, :n] = True
                speaker[j] = spk
            for j in range(b, b_pad):   # filler rows: repeat row 0
                phones[j], src_mask[j] = phones[0], src_mask[0]
                speaker[j] = speaker[0]
            raw = {"phones": phones, "src_mask": src_mask,
                   "speaker": speaker}
            if mesh is not None:
                import jax

                if jax.process_count() > 1:
                    sl = meshlib.local_rows(b_pad)
                    raw = {k: v[sl] for k, v in raw.items()}
                batch = meshlib.shard_batch(mesh, raw)
            else:
                batch = {k: jnp.asarray(v) for k, v in raw.items()}
            if hybrid:
                codes, mask, total, margin = infer(
                    params, batch, cfg=model_cfg, out_len=out_len,
                    exact=fast_exact, with_margin=True)
                margin = meshlib.fetch(margin)
            else:
                codes, mask, total = infer(params, batch, cfg=model_cfg,
                                           out_len=out_len, exact=fast_exact)
            codes = meshlib.fetch(codes)
            mask = meshlib.fetch(mask)
            total = meshlib.fetch(total)
            for j, gi in enumerate(chunk):
                if total[j] > out_len and out_len < cap:
                    need = min(-(-int(total[j]) // 128) * 128, cap)
                    retry.setdefault((s_len, need), []).append(gi)
                else:
                    if total[j] > out_len:
                        warnings.warn(
                            f"sample {gi}: predicted duration {int(total[j])}"
                            f" frames exceeds the model's positional-table "
                            f"cap {cap}; output truncated")
                    results[gi] = codes[j][mask[j]].astype(np.int32)
                    if hybrid and margin[j] < margin_threshold:
                        flagged.setdefault((s_len, out_len), []).append(gi)
        for (rs, rt), ridx in sorted(retry.items()):
            pending.append((rs, rt, ridx))

    if hybrid and flagged:
        # exact re-decode of the near-tie samples only (the hybrid's
        # correctness pass); overwrites their fast results
        exact_plan = [(s, t, idxs) for (s, t), idxs in sorted(flagged.items())]
        exact_results = decode_buckets(
            infer, params, model_cfg, samples, exact_plan,
            batch_size=batch_size, exact="selective-high", mesh=mesh)
        for idxs in flagged.values():
            for gi in idxs:
                results[gi] = exact_results[gi]
    return results  # type: ignore[return-value]


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

    by_bucket: dict[int, list[int]] = {}
    for i, s in enumerate(dataset.samples):
        by_bucket.setdefault(pick_bucket(src_buckets, len(s.phones)), []).append(i)

    infer = jax.jit(parrot.infer_codes,
                    static_argnames=("cfg", "out_len", "exact", "with_margin"))

    cap = max_decode_len(model_cfg)
    plan = [(s_len, min(s_len * out_len_per_token, cap), idxs)
            for s_len, idxs in sorted(by_bucket.items())]
    samples = [(s.phones, s.speaker) for s in dataset.samples]
    units = decode_buckets(infer, params, model_cfg, samples, plan,
                           batch_size=batch_size)
    return [{"hubert": " ".join(map(str, u.tolist()))} if u is not None
            else {} for u in units]


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
    missing = 0
    with open(out_path, "w") as f:
        for i, (s, p) in enumerate(zip(dataset.samples, preds)):
            # real manifest path (the reference records true audio
            # durations from it, inference.py:61-62)
            audio = (audio_paths[i] if audio_paths
                     else (s.audio or f"{s.id}.wav"))
            try:
                dur = duration_seconds(audio)
            except Exception:
                missing += 1
                dur = len(s.codes) * 320 / 16000.0
            f.write(str({"audio": audio, "hubert": p.get("hubert", ""),
                         "duration": dur}) + "\n")
    if missing:
        warnings.warn(
            f"{missing}/{len(dataset.samples)} audio files were unreadable; "
            "their 'duration' fields fall back to GT-code-count seconds")
    return out_path
