"""One rank of the 2-process CPU cluster test (tests/test_distributed.py).

Exercises the REAL multi-host code paths on a single machine: the
``maybe_initialize_distributed()`` env hook (parallel/distributed.py —
the TPU-native replacement for the reference's per-rank DDP launch,
/root/reference/train.py:224-232), and the ``jax.process_count() > 1``
branches of ``parallel.mesh._put`` (``make_array_from_process_local_data``
assembly for both replicated and batch-sharded buffers). Runs one
explicit-batch sharded train step over the global 2-device mesh; rank 0
writes the loss + updated params for the parent test to compare against
a single-process step on the identical global batch.

Usage (launched by the test with HYPERNERF_COORDINATOR /
HYPERNERF_NUM_PROCESSES / HYPERNERF_PROCESS_ID in the env):

    python tests/distributed_worker.py /path/to/out.npz
"""

import os
import sys


def main():
    out_path = sys.argv[1]
    # One local CPU device per process -> a global mesh of 2.
    os.environ['XLA_FLAGS'] = ('--xla_force_host_platform_device_count=1 '
                               + os.environ.get('XLA_FLAGS', ''))
    import jax
    jax.config.update('jax_platforms', 'cpu')

    from hypernerf_tpu.parallel.distributed import (is_primary_host,
                                                    maybe_initialize_distributed)
    assert maybe_initialize_distributed(), 'HYPERNERF_COORDINATOR not set'
    assert jax.process_count() == 2, jax.process_count()

    import numpy as np

    from hypernerf_tpu.configs import NerfConfig, TrainConfig
    from hypernerf_tpu.models.nerf import NerfModel
    from hypernerf_tpu.parallel.mesh import (create_mesh, replicate,
                                             shard_batch)
    from hypernerf_tpu.training.optimizers import get_optimizer
    from hypernerf_tpu.training.train_state import (create_train_state,
                                                    make_train_step)
    from tests.dist_util import TINY_KWARGS, smooth_ray_batch

    cfg = NerfConfig(**TINY_KWARGS)
    tc = TrainConfig(batch_size=64, lr=1e-3)
    mesh = create_mesh()
    assert mesh.devices.size == 2, mesh.devices
    model = NerfModel(cfg)
    tx = get_optimizer(tc, steps_per_epoch=100)
    rays, rgbs = smooth_ray_batch(64)
    state = create_train_state(model, tx, tc, jax.random.PRNGKey(0),
                               rays[:8])
    # Both hit the multi-host assembly path (process_count() == 2).
    state = replicate(mesh, state)
    b_rays = shard_batch(mesh, rays)
    b_rgbs = shard_batch(mesh, rgbs)
    step_fn = make_train_step(model, tx, cfg, tc, mesh, explicit_batch=True)
    state, metrics = step_fn(state, b_rays, b_rgbs, jax.random.PRNGKey(1))

    loss = float(np.asarray(metrics['loss'].addressable_data(0)))
    if is_primary_host():
        leaves = [np.asarray(leaf.addressable_data(0))
                  for leaf in jax.tree.leaves(state.params)]
        np.savez(out_path, loss=np.float64(loss),
                 **{f'p{i}': leaf for i, leaf in enumerate(leaves)})
    # Let rank 0 finish its write before the cluster tears down.
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices('done')


if __name__ == '__main__':
    main()
