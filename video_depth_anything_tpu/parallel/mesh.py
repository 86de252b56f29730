"""Device mesh construction and parameter partition rules.

The reference has no distributed code at all (SURVEY.md §2.6) — this layer
is net-new, designed for TPU pod slices:

* mesh axes ``('data', 'model')``: frame windows / training clips shard over
  ``data`` (the sliding-window loop is embarrassingly parallel once window
  inputs are index-resolved, see ``inference.pipeline``); the ViT shards
  Megatron-style over ``model`` for vitl at high resolution.
* partition rules are regex → PartitionSpec over flattened param paths;
  GSPMD propagates activation shardings from the param shardings inside
  ``jit`` and inserts the ICI collectives.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

# Megatron-style ViT tensor parallelism: column-parallel qkv/fc1 (shard the
# output features), row-parallel proj/fc2 (shard the input features) — one
# all-reduce per block, riding ICI.
TP_RULES: Sequence[Tuple[str, PS]] = (
    (r"pretrained/block_\d+/attn/qkv/kernel", PS(None, "model")),
    (r"pretrained/block_\d+/attn/qkv/bias", PS("model")),
    (r"pretrained/block_\d+/attn/proj/kernel", PS("model", None)),
    (r"pretrained/block_\d+/mlp/fc1/kernel", PS(None, "model")),
    (r"pretrained/block_\d+/mlp/fc1/bias", PS("model")),
    (r"pretrained/block_\d+/mlp/fc2/kernel", PS("model", None)),
    # temporal-module FF is the fattest head matmul; same column/row split
    (r"head/motion_\d+/block_\d+/ff/proj/kernel", PS(None, "model")),
    (r"head/motion_\d+/block_\d+/ff/proj/bias", PS("model")),
    (r"head/motion_\d+/block_\d+/ff/out/kernel", PS("model", None)),
)


def create_mesh(
    data: Optional[int] = None, model: int = 1, devices=None
) -> Mesh:
    """Build a ``('data', 'model')`` mesh; ``data`` defaults to
    ``n_devices // model``."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def _flat_path(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def param_partition_specs(params, rules: Sequence[Tuple[str, PS]] = TP_RULES):
    """Pytree of PartitionSpec for ``params``: first matching rule wins,
    default replicated."""

    def spec_for(path, leaf):
        name = _flat_path(path)
        for pat, ps in rules:
            if re.search(pat, name):
                return ps
        return PS()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params, mesh: Mesh, rules=TP_RULES):
    """Device-put params with their partition specs over ``mesh``."""
    specs = param_partition_specs(params, rules)
    return jax.tree.map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs
    )


def tp_mesh(model_parallel: int) -> Mesh:
    """('data':1, 'model':N) mesh over the first N local devices — the
    streaming pipelines' TP layout (sequential modes have no data axis to
    shard; TP is how spare chips accelerate them)."""
    return create_mesh(
        data=1, model=model_parallel, devices=jax.devices()[:model_parallel]
    )


def replicate(x, mesh: Mesh):
    """Replicate an input over ``mesh`` so committed sharded params and
    inputs live on the same device set."""
    return jax.device_put(x, NamedSharding(mesh, PS()))
