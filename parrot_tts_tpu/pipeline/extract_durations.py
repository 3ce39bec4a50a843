"""Duration extraction driver: batched posteriors -> native monotonic DP.

Reference: `/root/reference/utils/aligner/extract_durations.py` — phase A
dumps per-item softmax posteriors from batched model inference; phase B maps
dijkstra over items with a process Pool. Here phase A runs through the jitted
aligner in length buckets, and phase B uses the C++ DP kernel across a thread
pool (the kernel releases no GIL-bound python work).
"""

from __future__ import annotations

import concurrent.futures as cf
from pathlib import Path

import numpy as np

from parrot_tts_tpu.data.aligner_data import AlignerDataset
from parrot_tts_tpu.ops.monotonic_align import (extract_durations,
                                                extract_durations_beam)
from parrot_tts_tpu.train.aligner import posteriors as posteriors_fn


def extract_all_durations(
    data_dir: str | Path,
    params,
    bn_state,
    *,
    batch_size: int = 8,
    max_workers: int = 8,
    method: str = "dijkstra",
    beam_width: int = 10,
) -> dict:
    """Writes outputs/durations/<stem>.npy per item (reference layout,
    utils/aligner/paths.py). Returns {'items': n}.

    method: 'dijkstra' (native monotonic DP, the reference default) or
    'beam' (k-best beam search, reference Extractor's alternative —
    utils/aligner/extract_durations.py:35-36, config key durations.method).
    """
    if method not in ("dijkstra", "beam"):
        raise ValueError(f"unknown duration extraction method: {method!r}")
    import jax.numpy as jnp

    data_dir = Path(data_dir)
    out_dir = data_dir / "outputs" / "durations"
    out_dir.mkdir(parents=True, exist_ok=True)

    ds = AlignerDataset(data_dir)
    order = np.argsort([n for (_, n, _) in ds.index])  # length-sorted batches

    jobs = []
    with cf.ThreadPoolExecutor(max_workers=max_workers) as pool:
        for off in range(0, len(order), batch_size):
            idxs = order[off : off + batch_size]
            items = [ds.load(i) for i in idxs]
            max_t = max(len(m) for m, _ in items)
            # pad to a multiple of 64 frames to bound recompiles
            max_t = ((max_t + 63) // 64) * 64
            mel = np.zeros((len(items), max_t, items[0][0].shape[1]),
                           np.float32)
            for i, (m, _) in enumerate(items):
                mel[i, : len(m)] = m
            post = np.asarray(posteriors_fn(params, bn_state,
                                            jnp.asarray(mel)))
            for i, gi in enumerate(idxs):
                stem, n_frames, _ = ds.index[gi]
                tokens = items[i][1]
                p = post[i, :n_frames]
                jobs.append(pool.submit(_extract_one, out_dir, stem, tokens,
                                        p, method, beam_width))
        done = sum(1 for j in jobs if j.result() is not None)
    return {"items": done}


def _extract_one(out_dir: Path, stem: str, tokens: np.ndarray,
                 post: np.ndarray, method: str = "dijkstra",
                 beam_width: int = 10):
    tokens = np.asarray(tokens, np.int64)
    if method == "beam":
        durs_list, _ = extract_durations_beam(tokens, post, beam_width)
        durs = durs_list[0]
    else:
        durs = extract_durations(tokens, post)
    np.save(out_dir / f"{stem}.npy", durs)
    return stem
