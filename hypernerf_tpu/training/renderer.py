"""Full-image rendering: device-side tiling instead of a Python chunk loop.

The reference renders images with a host-side Python loop over chunks
(/root/reference/train.py:108-111, eval.py:92-95), re-launching a kernel per
chunk. Here the whole image's rays go to the device once and a ``lax.map``
over fixed-size tiles runs *inside* one jit-compiled call — one compilation
per image geometry, zero host round-trips.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from hypernerf_tpu.models.nerf import NerfModel
from hypernerf_tpu.ops.ray_dict import prepare_ray_dict

# Per-ray outputs kept from each tile (weights/points dropped to bound HBM).
_KEEP = ('rgb', 'depth', 'med_depth', 'acc')


def make_render_fn(model: NerfModel, chunk: int = 8192):
    """Build a jitted tiled renderer: (params, rays (N, 8|9)) -> dict.

    N must be padded to a multiple of ``chunk`` by the caller (or use
    ``render_rays``). One compilation per distinct (N, chunk).
    """

    @jax.jit
    def render(params, rays):
        n, c = rays.shape
        tiles = rays.reshape(n // chunk, chunk, c)

        def render_tile(tile):
            out = model.apply({'params': params}, prepare_ray_dict(tile),
                              deterministic=True, return_weights=False)
            return {level: {k: v for k, v in res.items() if k in _KEEP}
                    for level, res in out.items()}

        out = jax.lax.map(render_tile, tiles)
        return jax.tree.map(lambda x: x.reshape(n, *x.shape[2:]), out)

    return render


def render_rays(render_fn, params, rays: np.ndarray, chunk: int
                ) -> Dict[str, Dict[str, np.ndarray]]:
    """Render an arbitrary ray array, handling padding, returning numpy."""
    n = rays.shape[0]
    pad = (-n) % chunk
    if pad:
        rays = np.concatenate([rays, np.repeat(rays[-1:], pad, axis=0)], 0)
    out = render_fn(params, jnp.asarray(rays))
    out = jax.device_get(out)
    if pad:
        out = jax.tree.map(lambda x: x[:n], out)
    return out


class ImageRenderer:
    """Convenience wrapper caching the jitted render fn per chunk size."""

    def __init__(self, model: NerfModel, chunk: int = 8192):
        self.model = model
        self.chunk = chunk
        self._render_fn = make_render_fn(model, chunk)

    def __call__(self, params, rays: np.ndarray):
        return render_rays(self._render_fn, params, rays, self.chunk)
