"""Unit tests for ray sampling (ops/sampling.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from hypernerf_tpu.ops.sampling import (piecewise_constant_pdf,
                                        sample_along_rays, sample_pdf)


def _rays(n=4):
    rs = np.random.RandomState(1)
    origins = jnp.asarray(rs.randn(n, 3).astype(np.float32) * 0.1)
    dirs = rs.randn(n, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return origins, jnp.asarray(dirs)


def test_sample_along_rays_deterministic_linspace():
    origins, dirs = _rays()
    z, pts = sample_along_rays(jax.random.PRNGKey(0), origins, dirs, 8,
                               near=1.0, far=5.0,
                               use_stratified_sampling=False,
                               use_linear_disparity=False)
    assert z.shape == (4, 8) and pts.shape == (4, 8, 3)
    np.testing.assert_allclose(np.asarray(z[0]), np.linspace(1, 5, 8),
                               rtol=1e-6)
    # points = o + z * d
    np.testing.assert_allclose(
        np.asarray(pts), np.asarray(origins)[:, None] +
        np.asarray(z)[..., None] * np.asarray(dirs)[:, None], rtol=1e-5)


def test_sample_along_rays_stratified_in_bins():
    origins, dirs = _rays()
    z, _ = sample_along_rays(jax.random.PRNGKey(0), origins, dirs, 32,
                             near=1.0, far=5.0,
                             use_stratified_sampling=True,
                             use_linear_disparity=False)
    z = np.asarray(z)
    assert (z >= 1.0 - 1e-5).all() and (z <= 5.0 + 1e-5).all()
    assert (np.diff(z, axis=-1) > -1e-5).all()  # sorted (bins are disjoint)
    # Jitter actually happened.
    base = np.linspace(1, 5, 32)
    assert np.abs(z - base).max() > 1e-3


def test_sample_along_rays_linear_disparity():
    origins, dirs = _rays()
    z, _ = sample_along_rays(jax.random.PRNGKey(0), origins, dirs, 9,
                             near=1.0, far=9.0,
                             use_stratified_sampling=False,
                             use_linear_disparity=True)
    disp = 1.0 / np.asarray(z[0])
    np.testing.assert_allclose(disp, np.linspace(1.0, 1.0 / 9.0, 9), rtol=1e-5)


def test_sample_along_rays_per_ray_near_far():
    origins, dirs = _rays(2)
    near = jnp.asarray([1.0, 2.0])
    far = jnp.asarray([3.0, 8.0])
    z, _ = sample_along_rays(jax.random.PRNGKey(0), origins, dirs, 4,
                             near=near, far=far,
                             use_stratified_sampling=False,
                             use_linear_disparity=False)
    np.testing.assert_allclose(np.asarray(z[0]), np.linspace(1, 3, 4), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(z[1]), np.linspace(2, 8, 4), rtol=1e-6)


def test_piecewise_constant_pdf_concentrates_mass():
    # All the weight in bin 2 of 4 -> all samples inside that bin.
    bins = jnp.asarray(np.tile(np.linspace(0, 4, 5), (3, 1)).astype(np.float32))
    weights = jnp.asarray(np.tile(np.array([0., 0., 1., 0.]), (3, 1)).astype(np.float32))
    samples = piecewise_constant_pdf(jax.random.PRNGKey(0), bins, weights,
                                     64, use_stratified_sampling=True)
    s = np.asarray(samples)
    assert s.shape == (3, 64)
    # eps smoothing leaks a tiny bit of mass; the overwhelming majority of
    # samples must land in [2, 3].
    frac_in_bin = ((s >= 2.0) & (s <= 3.0)).mean()
    assert frac_in_bin > 0.95


def test_piecewise_constant_pdf_uniform_deterministic():
    bins = jnp.asarray(np.linspace(0, 1, 9)[None].repeat(2, 0).astype(np.float32))
    weights = jnp.ones((2, 8), jnp.float32)
    samples = piecewise_constant_pdf(jax.random.PRNGKey(0), bins, weights,
                                     17, use_stratified_sampling=False)
    # Uniform weights + linspace u -> evenly spaced samples over [0, 1].
    np.testing.assert_allclose(np.asarray(samples[0]), np.linspace(0, 1, 17),
                               atol=1e-5)


def test_piecewise_constant_pdf_stops_gradient():
    bins = jnp.asarray(np.linspace(0, 1, 5)[None].astype(np.float32))

    def f(w):
        return piecewise_constant_pdf(jax.random.PRNGKey(0), bins, w, 8,
                                      use_stratified_sampling=False).sum()

    g = jax.grad(f)(jnp.ones((1, 4), jnp.float32))
    np.testing.assert_allclose(np.asarray(g), 0.0)


def test_sample_pdf_merges_and_sorts():
    origins, dirs = _rays(2)
    z_vals = jnp.asarray(np.tile(np.linspace(1, 5, 8), (2, 1)).astype(np.float32))
    mids = 0.5 * (z_vals[:, 1:] + z_vals[:, :-1])
    weights = jnp.ones((2, 6), jnp.float32)
    z_all, pts = sample_pdf(jax.random.PRNGKey(0), mids, weights, origins,
                            dirs, z_vals, 16, use_stratified_sampling=True)
    assert z_all.shape == (2, 24) and pts.shape == (2, 24, 3)
    z_np = np.asarray(z_all)
    assert (np.diff(z_np, axis=-1) >= 0).all()
    # The original coarse z values are all present in the union.
    for zc in np.asarray(z_vals)[0]:
        assert np.isclose(z_np[0], zc, atol=1e-6).any()
