"""Parallelism layer — re-exports the mesh/sharding module.

The distribution strategy lives in `core/mesh.py` (data-parallel mesh with
an optional model axis, XLA-emitted collectives; SURVEY.md §2c/§2d). This
package name mirrors the conventional layout for discoverability.
"""

from parrot_tts_tpu.core.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    create_mesh,
    data_sharding,
    initialize_distributed,
    local_batch_size,
    replicated,
    shard_batch,
    shard_params,
)
