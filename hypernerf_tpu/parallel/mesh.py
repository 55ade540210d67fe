"""Data-parallel device mesh.

The reference's only parallelism is fairscale sharded DDP behind
PyTorch-Lightning (/root/reference/train.py:229). The TPU-native equivalent is
a 1-D ``jax.sharding.Mesh`` over a ``('data',)`` axis: ray batches are sharded
across chips, parameters are replicated, and gradient synchronization is a
``lax.pmean`` over ICI emitted inside the shard_map'd train step — no backend
code, no NCCL.

Model size here (~1M params) makes TP/PP pointless (SURVEY.md §2.5): the
scaling axis is rays x samples, which data parallelism covers completely.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'


def create_mesh(devices: Optional[Sequence] = None,
                num_devices: Optional[int] = None) -> Mesh:
    """A 1-D data-parallel mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def replicate(mesh: Mesh, tree):
    """Put a pytree on the mesh fully replicated."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, tree):
    """Put a pytree on the mesh sharded along the leading (batch) axis."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.device_put(tree, sharding)
