"""Device mesh + sharding layer.

The reference's only distribution strategy is NCCL data-parallel DDP
(`/root/reference/utils/vocoder/train.py:34-40`, Lightning `strategy="auto"`
`/root/reference/train.py:158-161`). The TPU-native equivalent is a
`jax.sharding.Mesh` with a `data` axis (and an optional `model` axis for
headroom); XLA emits the gradient all-reduces from NamedSharding constraints —
there is no hand-written collective layer to port.
"""

from __future__ import annotations

import contextlib
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    devices: list | None = None,
    model_parallel_size: int = 1,
    data_axis: str = DATA_AXIS,
    model_axis: str = MODEL_AXIS,
) -> Mesh:
    """Build a (data, model) mesh over all (or given) devices.

    With ``model_parallel_size == 1`` this degenerates to pure DP — the
    reference's configuration (SURVEY.md §2c). Device order follows
    `jax.devices()` so the data axis rides ICI within a slice.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % model_parallel_size != 0:
        raise ValueError(
            f"{n} devices not divisible by model_parallel_size={model_parallel_size}"
        )
    grid = np.asarray(devices).reshape(n // model_parallel_size, model_parallel_size)
    return Mesh(grid, (data_axis, model_axis))


def data_sharding(mesh: Mesh, ndim: int = 1,
                  batch_axis: int = 0) -> NamedSharding:
    """Shard the batch dim (default leading) over `data`, replicate the
    rest. batch_axis=1 covers stacked micro-batch pytrees (K, B, ...)
    fed to train_step_k."""
    dims: list = [None] * ndim
    if ndim > batch_axis:
        dims[batch_axis] = mesh.axis_names[0]
    return NamedSharding(mesh, P(*dims))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, batch_axis: int = 0) -> Any:
    """Device-put a host batch pytree with the batch dim sharded over `data`.

    Single-process: `batch` is the GLOBAL batch and is split across the
    mesh's devices. Multi-process (jax.distributed): `batch` is this
    host's LOCAL slice of the global batch (what the loaders yield with
    process_index/process_count set) and is assembled into the global
    sharded array via make_array_from_process_local_data — device_put
    alone would treat each host's slice as the whole global batch and
    silently drop every other host's samples.

    batch_axis=1 shards stacked micro-batch pytrees (K, B, ...) on B;
    per-sample 1-D arrays of size K (none currently) would be mis-sharded,
    so every leaf must carry the (K, B, ...) layout."""

    def _put(x):
        arr = np.asarray(x)
        sharding = data_sharding(mesh, arr.ndim, batch_axis)
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sharding, arr)
        return jax.device_put(arr, sharding)

    return jax.tree_util.tree_map(_put, batch)


def shard_params(mesh: Mesh, params: Any) -> Any:
    """Replicate a param pytree across the mesh (DP). A future `model` axis
    rule set can partition large tensors here instead."""
    return jax.device_put(params, replicated(mesh))


def fetch(arr) -> np.ndarray:
    """Read a (possibly mesh-sharded) device array back as the full global
    numpy value. Fully-addressable arrays (single process, or any array
    not sharded across hosts) use plain np.asarray — calling
    process_allgather on those would STACK a new leading process axis and
    corrupt the result. Only a global array with non-addressable shards
    needs the allgather; the synthesis outputs this is used on (codes,
    waveforms) are small next to HBM, and serving callers need the full
    batch to unpad per-utterance results."""
    addressable = getattr(arr, "is_fully_addressable", True)
    if jax.process_count() > 1 and not addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(arr))
    return np.asarray(arr)


def pad_rows_to_multiple(n: int, multiple: int) -> int:
    """Rows a batch must grow to so the leading dim shards evenly."""
    return -(-n // multiple) * multiple


def local_rows(global_rows: int) -> slice:
    """This host's contiguous block of a global batch's rows (the slice
    convention `shard_batch` + the loaders share: process-major contiguous
    blocks). global_rows must divide evenly by process_count."""
    loc = global_rows // jax.process_count()
    return slice(jax.process_index() * loc, (jax.process_index() + 1) * loc)


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n_data = mesh.shape[mesh.axis_names[0]]
    if global_batch % n_data != 0:
        raise ValueError(f"global batch {global_batch} % data axis {n_data} != 0")
    return global_batch // n_data


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host runtime init (`jax.distributed`), the analog of the
    reference's `init_process_group(nccl, env://)`. No-op on single host."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )


@contextlib.contextmanager
def maybe_mesh(mesh: Mesh | None):
    if mesh is None:
        yield
    else:
        with mesh:
            yield
