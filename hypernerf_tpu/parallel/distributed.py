"""Multi-host initialization hook.

Single-host v4-8-class hardware is the design target (the reference's
multi-GPU ceiling is one node, SURVEY.md §2.5), but the sharded train step is
written against a global mesh, so scaling to multi-host TPU pods is a matter
of initializing jax.distributed and building the mesh over all processes'
devices — gradients then psum over ICI within a slice and DCN across slices,
with no train-step changes.

Activate by setting HYPERNERF_COORDINATOR (address:port), plus
HYPERNERF_NUM_PROCESSES / HYPERNERF_PROCESS_ID when not on a managed TPU
runtime that provides them automatically.
"""

from __future__ import annotations

import os


def maybe_initialize_distributed() -> bool:
    """Initialize jax.distributed from env vars; returns True if initialized."""
    coordinator = os.environ.get('HYPERNERF_COORDINATOR')
    if not coordinator:
        return False
    import jax
    kwargs = {'coordinator_address': coordinator}
    if 'HYPERNERF_NUM_PROCESSES' in os.environ:
        kwargs['num_processes'] = int(os.environ['HYPERNERF_NUM_PROCESSES'])
    if 'HYPERNERF_PROCESS_ID' in os.environ:
        kwargs['process_id'] = int(os.environ['HYPERNERF_PROCESS_ID'])
    jax.distributed.initialize(**kwargs)
    return True


def is_primary_host() -> bool:
    import jax
    return jax.process_index() == 0
