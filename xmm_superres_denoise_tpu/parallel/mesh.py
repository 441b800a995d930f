"""Device-mesh construction and sharding helpers.

The TPU-native replacement for the reference's Lightning strategy plumbing
(`train.py:141-155`, `config/config.py:45-48`): a `jax.sharding.Mesh` with a
`data` axis (DDP equivalent) and an optional `fsdp` axis (FSDP equivalent —
parameters sharded over it via NamedSharding, XLA inserting the all-gathers),
with gradient/metric reduction done by `lax.psum` inside `shard_map` instead
of NCCL all-reduce.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"


def make_mesh(
    data: Union[int, str] = "auto",
    fsdp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data[, fsdp]) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == "auto":
        if n % fsdp:
            raise ValueError(f"{n} devices not divisible by fsdp={fsdp}")
        data = n // fsdp
    total = data * fsdp
    if total > n:
        raise ValueError(f"Mesh {data}x{fsdp} needs {total} devices, have {n}")
    arr = np.array(devices[:total]).reshape(data, fsdp)
    return Mesh(arr, (DATA_AXIS, FSDP_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch pytree with the batch axis sharded over `data`."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def pad_batch_to_devices(batch_np, n: int):
    """Pad a host batch (numpy pytree, leading batch axis) so B % n == 0.

    Returns (padded_batch, valid_count). Padding repeats the last sample; the
    eval path weights metric updates by valid_count so padding never skews
    aggregates.
    """
    import numpy as _np

    leaves = jax.tree_util.tree_leaves(batch_np)
    b = leaves[0].shape[0]
    if b % n == 0:
        return batch_np, b
    pad = n - b % n

    def _pad(x):
        reps = _np.repeat(x[-1:], pad, axis=0)
        return _np.concatenate([x, reps], axis=0)

    return jax.tree_util.tree_map(_pad, batch_np), b
