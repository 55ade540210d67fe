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


def _put(tree, sharding, from_process_local: bool):
    """device_put on one host; process-local assembly on a multi-host pod.

    ``jax.device_put`` requires every target device to be addressable, so on
    a multi-host pod (parallel/distributed.py) the dataset buffers must be
    assembled with ``jax.make_array_from_process_local_data`` instead: every
    process holds the full host array (the LLFF/Blender loaders read the
    whole scene on each host), passes it with an explicit ``global_shape``,
    and JAX maps each addressable device onto its slice — full rows for a
    replicated P() sharding, the device's sub-batch for P('data').
    """
    if not from_process_local:
        return jax.device_put(tree, sharding)

    def put_leaf(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape=x.shape)

    return jax.tree_util.tree_map(put_leaf, tree)


def replicate(mesh: Mesh, tree):
    """Put a pytree on the mesh fully replicated (multi-host aware)."""
    sharding = NamedSharding(mesh, P())
    return _put(tree, sharding, jax.process_count() > 1)


def shard_batch(mesh: Mesh, tree):
    """Put a pytree on the mesh sharded along the leading (batch) axis.

    On a multi-host pod every process passes the identical full batch and
    receives only its devices' shards (make_array_from_process_local_data
    with global_shape == local shape).
    """
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return _put(tree, sharding, jax.process_count() > 1)
