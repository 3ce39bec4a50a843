"""Async host->device prefetch.

The reference overlaps input with compute via torch DataLoader workers
(`/root/reference/train.py:127,135`) — except the vocoder, which runs
num_workers=0 and stalls on CPU mel (`utils/vocoder/train.py:99`). Here a
small double-buffered iterator device_puts batch N+1 (sharded over the mesh
data axis) while step N runs, and a thread pool hides file IO.
"""

from __future__ import annotations

import threading
from queue import Queue
from typing import Any, Callable, Iterator

import jax

from parrot_tts_tpu.core import mesh as meshlib


def device_prefetch(batch_iter: Iterator[dict], mesh=None,
                    skip_keys: tuple[str, ...] = ("ids", "filenames"),
                    depth: int = 2, batch_axis: int = 0) -> Iterator[dict]:
    """Yield device-resident batches one step ahead of compute.

    batch_axis=1 for stacked micro-batch pytrees (K, B, ...) headed to
    train_step_k: the DP shard lands on B, not on the micro-step axis."""

    def put(batch: dict) -> dict:
        arrays = {k: v for k, v in batch.items() if k not in skip_keys}
        host = {k: batch[k] for k in skip_keys if k in batch}
        if mesh is not None:
            arrays = meshlib.shard_batch(mesh, arrays, batch_axis)
        else:
            arrays = jax.tree_util.tree_map(jax.device_put, arrays)
        return {**arrays, **host}

    buf: list[dict] = []
    for batch in batch_iter:
        buf.append(put(batch))
        if len(buf) >= depth:
            yield buf.pop(0)
    yield from buf


def threaded_loader(make_iter: Callable[[], Iterator[Any]],
                    queue_size: int = 4) -> Iterator[Any]:
    """Run a (CPU-bound IO) batch iterator in a background thread."""
    q: Queue = Queue(maxsize=queue_size)
    _END = object()

    def worker():
        try:
            for item in make_iter():
                q.put(item)
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        yield item
