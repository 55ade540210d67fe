"""Tests for ray-dict plumbing (ops/ray_dict.py)."""

import jax.numpy as jnp
import numpy as np

from hypernerf_tpu.ops.ray_dict import (append_batch, concat_ray_batch,
                                        extract_rays_batch, prepare_ray_dict)
from tests.conftest import make_rays


def test_prepare_ray_dict_with_metadata():
    rays = make_rays(6, with_idx=True, near=0.3, far=2.5)
    rd = prepare_ray_dict(jnp.asarray(rays))
    assert rd['origins'].shape == (6, 3)
    assert rd['directions'].shape == (6, 3)
    assert rd['viewdirs'] is None
    np.testing.assert_allclose(np.asarray(rd['near']), 0.3)
    np.testing.assert_allclose(np.asarray(rd['far']), 2.5)
    for key in ('warp', 'camera', 'appearance', 'time'):
        assert rd['metadata'][key].shape == (6, 1)
        assert rd['metadata'][key].dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(rd['metadata']['time'])[:, 0],
                                  rays[:, 8].astype(np.int32))


def test_prepare_ray_dict_without_metadata():
    rays = make_rays(4, with_idx=False)
    rd = prepare_ray_dict(jnp.asarray(rays))
    np.testing.assert_array_equal(np.asarray(rd['metadata']['warp']), 0)


def test_prepare_ray_dict_flattens_higher_rank():
    rays = make_rays(6, with_idx=True).reshape(2, 3, 9)
    rd = prepare_ray_dict(jnp.asarray(rays))
    assert rd['origins'].shape == (6, 3)


def test_extract_concat_append_roundtrip():
    rays = make_rays(8, with_idx=True)
    rd = prepare_ray_dict(jnp.asarray(rays))
    # viewdirs is None; tree ops must tolerate it (None is not a pytree leaf).
    a = extract_rays_batch(rd, 0, 4)
    b = extract_rays_batch(rd, 4, 8)
    assert a['origins'].shape == (4, 3)
    merged = concat_ray_batch([a, b])
    np.testing.assert_array_equal(np.asarray(merged['origins']),
                                  np.asarray(rd['origins']))
    acc = append_batch(None, a)
    acc = append_batch(acc, b)
    np.testing.assert_array_equal(np.asarray(acc['metadata']['time']),
                                  np.asarray(rd['metadata']['time']))
