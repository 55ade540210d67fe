"""Tests for the full NerfModel (models/nerf.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypernerf_tpu.models.nerf import NerfModel
from hypernerf_tpu.ops.ray_dict import prepare_ray_dict
from tests.conftest import make_rays, tiny_nerf_config


def _init_and_apply(cfg, rays=None, **apply_kwargs):
    model = NerfModel(cfg)
    rays = make_rays(6) if rays is None else rays
    rd = prepare_ray_dict(jnp.asarray(rays))
    key = jax.random.PRNGKey(0)
    rngs = {'params': key, 'sampling': key, 'sigma_noise': key}
    variables = model.init(rngs, rd)
    out = model.apply(variables, rd,
                      rngs={'sampling': key, 'sigma_noise': key},
                      **apply_kwargs)
    return model, variables, out


@pytest.mark.parametrize('slice_method', ['none', 'axis_aligned_plane',
                                          'bendy_sheet'])
@pytest.mark.parametrize('use_warp', [True, False])
def test_forward_shapes_all_slice_methods(slice_method, use_warp):
    cfg = tiny_nerf_config(hyper_slice_method=slice_method, use_warp=use_warp)
    _, _, out = _init_and_apply(cfg)
    assert set(out) == {'coarse', 'fine'}
    for level, n_s in (('coarse', 8), ('fine', 16)):
        assert out[level]['rgb'].shape == (6, 3)
        assert out[level]['depth'].shape == (6,)
        assert out[level]['med_depth'].shape == (6,)
        assert out[level]['acc'].shape == (6,)
        assert out[level]['weights'].shape == (6, n_s)
        for v in out[level].values():
            assert np.isfinite(np.asarray(v)).all()


def test_coarse_only_when_no_fine_samples():
    cfg = tiny_nerf_config(num_fine_samples=0)
    model = NerfModel(cfg)
    rd = prepare_ray_dict(jnp.asarray(make_rays(4)))
    key = jax.random.PRNGKey(0)
    variables = model.init({'params': key, 'sampling': key}, rd)
    out = model.apply(variables, rd, rngs={'sampling': key})
    assert 'fine' not in out
    # No fine MLP parameters exist.
    assert 'nerf_fine' not in variables['params']


def test_warped_points_have_hyper_dims():
    cfg = tiny_nerf_config(hyper_slice_method='bendy_sheet',
                           hyper_slice_out_dim=4)
    _, _, out = _init_and_apply(cfg, return_points=True)
    assert out['coarse']['warped_points'].shape == (6, 8, 3 + 4)
    assert out['coarse']['points'].shape == (6, 8, 3)
    assert out['coarse']['med_points'].shape == (6, 1, 7)

    # axis_aligned_plane: hyper coords are the GLO embedding itself.
    cfg = tiny_nerf_config(hyper_slice_method='axis_aligned_plane', glo_dim=8)
    _, _, out = _init_and_apply(cfg, return_points=True)
    assert out['coarse']['warped_points'].shape == (6, 8, 3 + 8)


def test_deterministic_eval_is_repeatable():
    cfg = tiny_nerf_config(noise_std=1.0)
    model = NerfModel(cfg)
    rd = prepare_ray_dict(jnp.asarray(make_rays(5)))
    key = jax.random.PRNGKey(0)
    variables = model.init({'params': key, 'sampling': key,
                            'sigma_noise': key}, rd)
    out1 = model.apply(variables, rd, deterministic=True)
    out2 = model.apply(variables, rd, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out1['fine']['rgb']),
                                  np.asarray(out2['fine']['rgb']))


def test_stratified_draws_differ_across_rngs():
    cfg = tiny_nerf_config()
    model = NerfModel(cfg)
    rd = prepare_ray_dict(jnp.asarray(make_rays(5)))
    key = jax.random.PRNGKey(0)
    variables = model.init({'params': key, 'sampling': key}, rd)
    o1 = model.apply(variables, rd, rngs={'sampling': jax.random.PRNGKey(1)})
    o2 = model.apply(variables, rd, rngs={'sampling': jax.random.PRNGKey(2)})
    assert np.abs(np.asarray(o1['fine']['rgb'])
                  - np.asarray(o2['fine']['rgb'])).max() > 0


def test_per_ray_near_far_honored():
    cfg = tiny_nerf_config(num_fine_samples=0, use_warp=False,
                           hyper_slice_method='none')
    model = NerfModel(cfg)
    rays = make_rays(4, near=0.5, far=3.0)
    rd = prepare_ray_dict(jnp.asarray(rays))
    key = jax.random.PRNGKey(0)
    variables = model.init({'params': key, 'sampling': key}, rd)
    out = model.apply(variables, rd, deterministic=True, return_points=True)
    z_first = np.asarray(out['coarse']['points'])[:, 0]
    z_last = np.asarray(out['coarse']['points'])[:, -1]
    o = np.asarray(rays[:, :3])
    d = np.asarray(rays[:, 3:6])
    np.testing.assert_allclose(z_first, o + 0.5 * d, atol=1e-5)
    np.testing.assert_allclose(z_last, o + 3.0 * d, atol=1e-5)


def test_nerf_embed_conditions():
    cfg = tiny_nerf_config(use_nerf_embed=True, use_alpha_condition=True,
                           use_rgb_condition=True)
    _, variables, out = _init_and_apply(cfg)
    assert out['fine']['rgb'].shape == (6, 3)


def test_share_glo_false_builds_separate_embeddings():
    cfg = tiny_nerf_config(share_glo=False, use_nerf_embed=True,
                           use_alpha_condition=True)
    _, variables, out = _init_and_apply(cfg)
    params = variables['params']
    assert 'warp_embed' in params
    assert 'hyper_embed' in params  # separate hyper table
    assert 'nerf_embed' in params
    assert out['fine']['rgb'].shape == (6, 3)


def test_se3_warp_field_end_to_end():
    cfg = tiny_nerf_config(warp_field_type='se3')
    _, _, out = _init_and_apply(cfg)
    assert np.isfinite(np.asarray(out['fine']['rgb'])).all()


def test_nerfies_embed_with_annealing():
    cfg = tiny_nerf_config(use_original_embed=False)
    extra = {'nerf_alpha': jnp.float32(10.0), 'warp_alpha': jnp.float32(4.0),
             'hyper_alpha': jnp.float32(1.0),
             'hyper_sheet_alpha': jnp.float32(1.0)}
    _, _, out = _init_and_apply(cfg, extra_params=extra)
    assert np.isfinite(np.asarray(out['fine']['rgb'])).all()


def test_gradients_are_finite():
    cfg = tiny_nerf_config()
    model = NerfModel(cfg)
    rays = make_rays(4)
    rd = prepare_ray_dict(jnp.asarray(rays))
    key = jax.random.PRNGKey(0)
    variables = model.init({'params': key, 'sampling': key,
                            'sigma_noise': key}, rd)
    target = jnp.ones((4, 3)) * 0.5

    def loss_fn(params):
        out = model.apply({'params': params}, rd,
                          rngs={'sampling': key, 'sigma_noise': key})
        return (jnp.mean((out['coarse']['rgb'] - target) ** 2)
                + jnp.mean((out['fine']['rgb'] - target) ** 2))

    grads = jax.grad(loss_fn)(variables['params'])
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # Warp embed/field receive gradient signal.
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    warp_grads = [np.abs(np.asarray(g)).sum() for path, g in flat
                  if 'warp' in jax.tree_util.keystr(path)]
    assert sum(warp_grads) > 0


def test_render_opts_filtering():
    cfg = tiny_nerf_config(num_fine_samples=8)
    model = NerfModel(cfg)
    rd = prepare_ray_dict(jnp.asarray(make_rays(4)))
    key = jax.random.PRNGKey(0)
    variables = model.init({'params': key, 'sampling': key,
                            'sigma_noise': key}, rd)
    out = model.apply(variables, rd, deterministic=True,
                      render_opts={'dust_threshold': 1e9})
    # Infinite dust threshold kills all fine density -> zero acc.
    np.testing.assert_allclose(np.asarray(out['fine']['acc']), 0.0, atol=1e-6)
