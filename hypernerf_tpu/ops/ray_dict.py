"""Ray-dict plumbing: flat (B, 8|9) ray tensors <-> structured ray dicts.

Capability parity with /root/reference/hypernerf/model_utils.py:365-461, as
jit-safe jnp functions. Differences by design:

* Per-ray near/far columns are kept and honored (the reference reads then
  discards them, model_utils.py:389-390, so non-NDC scenes silently rendered
  with the model's NDC near/far).
* Batch chunk/append/concat are pytree one-liners — under the TPU design the
  model takes the whole megabatch in one jit call, so these only serve the
  tiled full-image renderer and API compatibility.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

METADATA_KEYS = ('warp', 'camera', 'appearance', 'time')


def prepare_ray_dict(rays: jnp.ndarray) -> dict:
    """Convert a flat ray tensor into the model's rays_dict.

    Args:
      rays: (..., 8) or (..., 9) — origin(3), direction(3), near, far
        [, image index]. Higher-rank input is flattened to (N, C).

    Returns:
      {'origins', 'directions', 'viewdirs': None, 'near', 'far',
       'metadata': {warp/camera/appearance/time: (N, 1) int32}}.
    """
    if rays.ndim > 2:
        rays = rays.reshape(-1, rays.shape[-1])
    use_meta = rays.shape[-1] == 9
    if use_meta:
        idx = rays[:, 8:9].astype(jnp.int32)
    else:
        idx = jnp.zeros((rays.shape[0], 1), jnp.int32)
    metadata = {k: idx for k in METADATA_KEYS}
    return {
        'origins': rays[:, 0:3],
        'directions': rays[:, 3:6],
        'viewdirs': None,
        'near': rays[:, 6],
        'far': rays[:, 7],
        'metadata': metadata,
    }


def extract_rays_batch(rays: dict, start: int, end: int) -> dict:
    """Slice a ray dict along the batch axis (static indices)."""
    return jax.tree.map(lambda x: x[start:end], rays)


def concat_ray_batch(batches: list) -> dict:
    """Concatenate a list of result dicts along the batch axis."""
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *batches)


def append_batch(all_ret, batch):
    """Append one result batch (None-initialized accumulator supported)."""
    if all_ret is None:
        return batch
    return concat_ray_batch([all_ret, batch])
