"""Parameter-sharding policies (FSDP-equivalent NamedShardings).

The reference wraps `SwinTransformerBlock`s in torch FSDP
(`train.py:142-146`, `model.py:38-46`). The TPU-native analog needs no
wrapping: each parameter leaf gets a `NamedSharding` that splits its largest
divisible axis over the `fsdp` mesh axis, and XLA's SPMD partitioner
materializes/gathers shards around each use. Applied uniformly to every leaf
(not just attention blocks) — on TPU there is no per-module wrapping cost.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import FSDP_AXIS


def fsdp_spec(
    shape, fsdp_size: int, min_size: int = 2**12, exclude_axes: tuple = ()
) -> P:
    """PartitionSpec sharding the largest fsdp-divisible axis, else replicated.

    Tiny leaves (biases, norm scales) stay replicated — sharding them would
    cost more collective latency than the bytes saved. `exclude_axes` keeps
    named axes out of consideration: scan-stacked `layers_scan` leaves must
    never shard their leading group axis, which `lax.scan` slices one group
    per iteration — sharding it would turn every scan step into a cross-
    device gather instead of one up-front all-gather of the weight shard.
    """
    if fsdp_size <= 1 or int(np.prod(shape)) < min_size:
        return P()
    order = sorted(
        (i for i in range(len(shape)) if i not in exclude_axes),
        key=lambda i: -shape[i],
    )
    for axis in order:
        if shape[axis] % fsdp_size == 0:
            spec = [None] * len(shape)
            spec[axis] = FSDP_AXIS
            return P(*spec)
    return P()


def _is_scan_stacked(path) -> bool:
    """True when a tree_map_with_path key path crosses a `layers_scan`
    subtree (DictKey in params/opt-moment dicts, GetAttrKey on dataclasses)."""
    return any(
        getattr(k, "key", None) == "layers_scan"
        or getattr(k, "name", None) == "layers_scan"
        for k in path
    )


def fsdp_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for params under the mesh's fsdp axis.

    Leaves under a `layers_scan` subtree (scan-compressed group stacks,
    models/scan_stack.py) exclude their leading group axis from sharding:
    the non-group axes carry the per-layer weight geometry the partitioner
    can all-gather once per use, exactly like the unrolled layout.
    """
    fsdp_size = mesh.shape.get(FSDP_AXIS, 1)
    return jax.tree_util.tree_map_with_path(
        lambda path, p: NamedSharding(
            mesh,
            fsdp_spec(
                p.shape,
                fsdp_size,
                exclude_axes=(0,) if _is_scan_stacked(path) else (),
            ),
        ),
        params,
    )


def place_params(params: Any, mesh: Mesh) -> Any:
    """Device-put params with FSDP shardings (replicated when fsdp == 1)."""
    sh = fsdp_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, sh)
