"""Unit tests for volume rendering (ops/rendering.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from hypernerf_tpu.ops.rendering import (compute_depth_index,
                                         compute_depth_map,
                                         compute_opaqueness_mask,
                                         filter_sigma, noise_regularize,
                                         volumetric_rendering)


def _brute_force_composite(rgb, sigma, z_vals, dirs, white, infinity,
                           eps=1e-5):
    """Loop-based compositing oracle mirroring the published math."""
    b, s, _ = rgb.shape
    out_rgb = np.zeros((b, 3))
    out_depth = np.zeros(b)
    out_acc = np.zeros(b)
    weights = np.zeros((b, s))
    for i in range(b):
        dnorm = np.linalg.norm(dirs[i])
        trans = 1.0
        for j in range(s):
            delta = (z_vals[i, j + 1] - z_vals[i, j]) if j + 1 < s else (
                1e7 if infinity else 1e-7)
            delta *= dnorm
            alpha = 1.0 - np.exp(-sigma[i, j] * delta)
            weights[i, j] = alpha * trans
            out_rgb[i] += weights[i, j] * rgb[i, j]
            out_depth[i] += weights[i, j] * z_vals[i, j]
            trans *= (1.0 - alpha + eps)
        out_acc[i] = weights[i].sum() if not infinity else weights[i, :-1].sum()
        if white:
            out_rgb[i] += 1.0 - weights[i].sum()
    return out_rgb, out_depth, out_acc, weights


def _random_inputs(b=5, s=9, seed=0):
    rs = np.random.RandomState(seed)
    rgb = rs.rand(b, s, 3).astype(np.float32)
    sigma = (rs.rand(b, s) * 3).astype(np.float32)
    z_vals = np.sort(rs.rand(b, s) * 4 + 1, axis=-1).astype(np.float32)
    dirs = rs.randn(b, 3).astype(np.float32)
    return rgb, sigma, z_vals, dirs


def test_volumetric_rendering_matches_brute_force():
    rgb, sigma, z_vals, dirs = _random_inputs()
    for white in (False, True):
        for infinity in (True, False):
            out = volumetric_rendering(
                jnp.asarray(rgb), jnp.asarray(sigma), jnp.asarray(z_vals),
                jnp.asarray(dirs), use_white_background=white,
                sample_at_infinity=infinity)
            want_rgb, want_depth, want_acc, want_w = _brute_force_composite(
                rgb, sigma, z_vals, dirs, white, infinity)
            np.testing.assert_allclose(np.asarray(out['rgb']), want_rgb,
                                       rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(np.asarray(out['depth']), want_depth,
                                       rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(np.asarray(out['acc']), want_acc,
                                       rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(np.asarray(out['weights']), want_w,
                                       rtol=1e-4, atol=1e-6)


def test_opaque_wall_renders_its_color():
    # A single opaque sample: the ray color is that sample's color.
    b, s = 2, 6
    rgb = np.zeros((b, s, 3), np.float32)
    rgb[:, 3] = [0.2, 0.5, 0.9]
    sigma = np.zeros((b, s), np.float32)
    sigma[:, 3] = 1e6
    z_vals = np.tile(np.linspace(1, 2, s), (b, 1)).astype(np.float32)
    dirs = np.tile(np.array([0, 0, 1.0], np.float32), (b, 1))
    out = volumetric_rendering(jnp.asarray(rgb), jnp.asarray(sigma),
                               jnp.asarray(z_vals), jnp.asarray(dirs),
                               use_white_background=False)
    np.testing.assert_allclose(np.asarray(out['rgb']),
                               np.tile([0.2, 0.5, 0.9], (b, 1)), atol=1e-3)
    np.testing.assert_allclose(np.asarray(out['med_depth']),
                               z_vals[:, 3], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out['acc']), 1.0, atol=1e-3)


def test_median_depth_helpers():
    weights = jnp.asarray([[0.1, 0.2, 0.3, 0.4],
                           [0.6, 0.1, 0.1, 0.1]], jnp.float32)
    mask = np.asarray(compute_opaqueness_mask(weights))
    np.testing.assert_array_equal(mask, [[0, 0, 1, 0], [1, 0, 0, 0]])
    np.testing.assert_array_equal(np.asarray(compute_depth_index(weights)),
                                  [2, 0])
    z = jnp.asarray([[1., 2., 3., 4.]] * 2)
    np.testing.assert_allclose(np.asarray(compute_depth_map(weights, z)),
                               [3.0, 1.0])


def test_noise_regularize_gating():
    raw = jnp.zeros((4, 8, 1))
    key = jax.random.PRNGKey(0)
    # Active: stratified + noise_std > 0 + key present.
    noisy = noise_regularize(key, raw, 1.0, True)
    assert np.abs(np.asarray(noisy)).max() > 0
    # Inactive paths return unchanged.
    for args in ((None, raw, 1.0, True), (key, raw, 0.0, True),
                 (key, raw, None, True), (key, raw, 1.0, False)):
        np.testing.assert_array_equal(np.asarray(noise_regularize(*args)),
                                      np.asarray(raw))


def test_filter_sigma():
    points = jnp.asarray(np.mgrid[0:2, 0:2, 0:2].T.reshape(-1, 3),
                         jnp.float32)[None]
    sigma = jnp.ones((1, 8), jnp.float32) * 0.5
    assert filter_sigma(points, sigma, None) is sigma
    out = np.asarray(filter_sigma(points, sigma, {'dust_threshold': 0.6}))
    np.testing.assert_allclose(out, 0.0)
    out = np.asarray(filter_sigma(points, sigma, {'dust_threshold': 0.4}))
    np.testing.assert_allclose(out, 0.5)
    box = {'bounding_box': (-0.5, 0.5, -0.5, 0.5, -0.5, 0.5)}
    out = np.asarray(filter_sigma(points, sigma, box))
    assert out.sum() == 0.5  # only the origin point survives
