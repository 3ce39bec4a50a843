"""Tensor-parallel partition rules for the `model` mesh axis.

The reference has no TP (SURVEY.md §2c — its models are ~15M params), but the
sharding layer keeps the capability so >HBM configs shard without code
changes. Rules are (path-regex -> PartitionSpec) pairs applied to the param
pytree; anything unmatched replicates. Under GSPMD the rules only place
memory — XLA derives the matching collectives (all-gather/reduce-scatter on
the `model` axis) from the shardings, so a TP run computes exactly what the
replicated run computes (asserted in tests/test_mesh.py).

Layout follows the Megatron split for the transformer blocks: QKV and FFN
up-projections column-parallel, attention out-projection and FFN
down-projection row-parallel, so each block needs one all-reduce per
sub-layer and activations stay sharded in between.
"""

from __future__ import annotations

import re
from typing import Any, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from parrot_tts_tpu.core.mesh import MODEL_AXIS

# (path regex, spec builder). Paths look like "encoder_layers/0/attn/qkv".
TTE_RULES: tuple[tuple[str, P], ...] = (
    # attention: column-parallel packed projections, row-parallel outputs
    (r".*/attn/qkv$", P(None, MODEL_AXIS)),
    (r".*/attn/in_proj$", P(None, MODEL_AXIS)),
    (r".*/attn/out_proj$", P(MODEL_AXIS, None)),
    (r".*/attn/wo$", P(MODEL_AXIS, None)),
    # conv FFN: up-projection sharded on filters, down-projection on input
    (r".*layers/\d+/conv1/w$", P(None, None, MODEL_AXIS)),
    (r".*layers/\d+/conv1/b$", P(MODEL_AXIS)),
    (r".*layers/\d+/conv2/w$", P(None, MODEL_AXIS, None)),
    # 1000-way head: column-parallel (vocab-sharded logits)
    (r"^head/w$", P(None, MODEL_AXIS)),
    (r"^head/b$", P(MODEL_AXIS)),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if isinstance(p, jax.tree_util.DictKey):
            parts.append(str(p.key))
        elif isinstance(p, jax.tree_util.SequenceKey):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def partition_specs(params: Any,
                    rules: Sequence[tuple[str, P]] = TTE_RULES) -> Any:
    """PartitionSpec pytree for `params`: first matching rule wins,
    default replicate."""

    def spec_for(path, leaf):
        name = _path_str(path)
        for pat, spec in rules:
            if re.match(pat, name):
                return spec
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params_tp(mesh: Mesh, params: Any,
                    rules: Sequence[tuple[str, P]] = TTE_RULES) -> Any:
    """Place a param pytree on the mesh under the TP rules (replicated over
    `data`, partitioned over `model` where a rule matches)."""
    specs = partition_specs(params, rules)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)
