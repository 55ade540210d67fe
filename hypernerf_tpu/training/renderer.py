"""Full-image rendering: device-side tiling instead of a Python chunk loop.

The reference renders images with a host-side Python loop over chunks
(/root/reference/train.py:108-111, eval.py:92-95), re-launching a kernel per
chunk. Here the whole image's rays go to the device once and a ``lax.map``
over fixed-size tiles runs *inside* one jit-compiled call — one compilation
per image geometry, zero host round-trips.

With a multi-device ``mesh``, the tile loop is ``shard_map``-ed over the
``('data',)`` axis: each chip renders its contiguous slice of rays and the
results are gathered — the TPU equivalent of the reference's per-rank val
replication (train.py:85), except the ranks split one image instead of
duplicating it.

``extra_params`` (posenc annealing alphas) are threaded through to the model
so validation/eval render the SAME function being trained mid-anneal (the
reference passes all-None alphas, train.py:102-107).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from hypernerf_tpu.models.nerf import NerfModel
from hypernerf_tpu.ops.ray_dict import prepare_ray_dict
from hypernerf_tpu.parallel.mesh import DATA_AXIS

# Per-ray outputs kept from each tile (weights/points dropped to bound HBM).
_KEEP = ('rgb', 'depth', 'med_depth', 'acc')


def quantize_rgb_u8(rgb):
    """Device-side uint8 quantization, bit-identical to the host
    ``utils.visualization.to_uint8`` (clip to [0,1], scale, TRUNCATE): the
    PNG bytes eval.py writes are unchanged, but the host readback of a
    504x378 frame shrinks 4x (the remote-tunnel transfer dominates
    secs/frame, BENCHMARKS.md render modes)."""
    return (jnp.clip(rgb, 0.0, 1.0) * 255.0).astype(jnp.uint8)


def make_render_fn(model: NerfModel, chunk: int = 8192, mesh=None,
                   keep=_KEEP, levels=None, quantize=False):
    """Build a jitted tiled renderer.

    Returns render(params, rays (N, 8|9), extra_params, occupancy_grid=None)
    -> dict. N must be padded to a multiple of ``chunk * n_devices`` by the
    caller (or use ``render_rays``). One compilation per distinct (N, chunk).

    ``occupancy_grid``: pass a grid-trained model's (G, G, G) grid so
    val/eval sample through the same grid-guided coarse distribution the
    model was trained with (replicated across shards).

    ``keep`` / ``levels`` / ``quantize`` bound the host readback (the
    tunnel transfer is the render-latency tail): only the named per-ray
    outputs / levels are returned, and with ``quantize`` the rgb comes
    back as uint8 (see ``quantize_rgb_u8`` — PNG-identical).
    """

    def render_slice(params, rays, extra_params, occupancy_grid):
        n, c = rays.shape
        tiles = rays.reshape(n // chunk, chunk, c)

        def render_tile(tile):
            out = model.apply({'params': params}, prepare_ray_dict(tile),
                              extra_params=extra_params,
                              deterministic=True, return_weights=False,
                              occupancy_grid=occupancy_grid)
            out = {level: {k: v for k, v in res.items() if k in keep}
                   for level, res in out.items()
                   if levels is None or level in levels}
            if quantize:
                for res in out.values():
                    if 'rgb' in res:
                        res['rgb'] = quantize_rgb_u8(res['rgb'])
            return out

        out = jax.lax.map(render_tile, tiles)
        return jax.tree.map(lambda x: x.reshape(n, *x.shape[2:]), out)

    def _build(with_grid: bool):
        fn = render_slice if with_grid else (
            lambda params, rays, extra_params: render_slice(
                params, rays, extra_params, None))
        if mesh is not None and mesh.devices.size > 1:
            in_specs = (P(), P(DATA_AXIS), P()) + ((P(),) if with_grid
                                                   else ())
            fn = shard_map(fn, mesh=mesh, in_specs=in_specs,
                           out_specs=P(DATA_AXIS), check_vma=False)
        return jax.jit(fn)

    fns = {}

    def render(params, rays, extra_params, occupancy_grid=None):
        with_grid = occupancy_grid is not None
        if with_grid not in fns:
            fns[with_grid] = _build(with_grid)
        args = (params, rays, extra_params) + (
            (occupancy_grid,) if with_grid else ())
        return fns[with_grid](*args)

    return render


def render_rays(render_fn, params, rays: np.ndarray, pad_to: int,
                extra_params: Optional[dict] = None,
                occupancy_grid=None, device_get: bool = True
                ) -> Dict[str, Dict[str, np.ndarray]]:
    """Render an arbitrary ray array, handling padding, returning numpy.

    ``device_get=False`` returns device arrays WITHOUT blocking the host —
    the async-val path: the caller keeps dispatching train steps and reads
    the result back once the device has long finished it (trainer.fit).
    """
    n = rays.shape[0]
    pad = (-n) % pad_to
    if pad:
        rays = np.concatenate([rays, np.repeat(rays[-1:], pad, axis=0)], 0)
    out = render_fn(params, jnp.asarray(rays), extra_params or {},
                    occupancy_grid)
    if device_get:
        out = jax.device_get(out)
    if pad:
        out = jax.tree.map(lambda x: x[:n], out)
    return out


class ImageRenderer:
    """Convenience wrapper caching the jitted render fn.

    With a mesh, tiles are sharded over its data axis (pass the training
    mesh); without one, rendering is single-device.
    """

    def __init__(self, model: NerfModel, chunk: int = 8192, mesh=None,
                 keep=_KEEP, levels=None, quantize=False):
        self.model = model
        self.chunk = chunk
        self.mesh = mesh
        self.n_shards = mesh.devices.size if mesh is not None else 1
        self._render_fn = make_render_fn(model, chunk, mesh, keep=keep,
                                         levels=levels, quantize=quantize)

    def __call__(self, params, rays: np.ndarray,
                 extra_params: Optional[dict] = None,
                 occupancy_grid=None, device_get: bool = True):
        return render_rays(self._render_fn, params, rays,
                           self.chunk * self.n_shards, extra_params,
                           occupancy_grid, device_get=device_get)
