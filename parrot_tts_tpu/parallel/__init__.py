"""Parallelism layer.

Data parallelism (the reference's only strategy, SURVEY.md §2c) lives in
`core/mesh.py` and is re-exported here; `parallel.tensor` adds the
model-axis partition rules for tensor-parallel layouts beyond reference
scale.
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
from parrot_tts_tpu.parallel.tensor import (  # noqa: F401
    TTE_RULES,
    partition_specs,
    shard_params_tp,
)
