"""Fused compositing kernel parity vs the jnp reference path.

The kernel must reproduce sigmoid/softplus(+noise) followed by
ops.rendering.volumetric_rendering — outputs and gradients — for both
sample_at_infinity settings, white background, and with/without noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypernerf_tpu.ops.pallas.fused_composite import (CompositeSpec,
                                                      fused_composite)
from hypernerf_tpu.ops.rendering import volumetric_rendering

B, S = 24, 16


def _reference(packed, z, dirs, noise, white, infinity):
    rgb = jax.nn.sigmoid(packed[:, :3].reshape(B, S, 3))
    a_raw = packed[:, 3].reshape(B, S)
    if noise is not None:
        a_raw = a_raw + noise
    sigma = jax.nn.softplus(a_raw)
    return volumetric_rendering(rgb, sigma, z, dirs,
                                use_white_background=white,
                                sample_at_infinity=infinity)


def _inputs(seed=0, with_noise=False):
    rs = np.random.RandomState(seed)
    packed = jnp.asarray(
        np.concatenate([rs.randn(B * S, 4), np.zeros((B * S, 4))], -1),
        jnp.float32)
    z = jnp.asarray(np.sort(rs.rand(B, S) * 4 + 1, axis=-1), jnp.float32)
    dirs = jnp.asarray(rs.randn(B, 3), jnp.float32)
    noise = (jnp.asarray(rs.randn(B, S), jnp.float32) * 0.7
             if with_noise else None)
    return packed, z, dirs, noise


@pytest.mark.parametrize('white,infinity,with_noise', [
    (False, True, False),
    (False, False, False),
    (True, True, False),
    (False, True, True),
])
def test_fused_composite_parity(white, infinity, with_noise):
    packed, z, dirs, noise = _inputs(with_noise=with_noise)
    spec = CompositeSpec(samples=S, rays_per_tile=8,
                         use_white_background=white,
                         sample_at_infinity=infinity,
                         has_noise=with_noise, interpret=True)

    def loss_k(packed, z, dirs, noise):
        out = fused_composite(spec, packed, z, dirs, noise)
        return (jnp.sum(out['rgb'] * 1.3) + jnp.sum(out['depth'] * 0.4)
                + jnp.sum(out['acc'] * 0.2)
                + jnp.sum(out['weights'] * 0.05)), out

    def loss_r(packed, z, dirs, noise):
        out = _reference(packed, z, dirs, noise, white, infinity)
        return (jnp.sum(out['rgb'] * 1.3) + jnp.sum(out['depth'] * 0.4)
                + jnp.sum(out['acc'] * 0.2)
                + jnp.sum(out['weights'] * 0.05)), out

    argnums = (0, 1, 2) + ((3,) if with_noise else ())
    (vk, ok), gk = jax.value_and_grad(loss_k, argnums=argnums,
                                      has_aux=True)(packed, z, dirs, noise)
    (vr, orf), gr = jax.value_and_grad(loss_r, argnums=argnums,
                                       has_aux=True)(packed, z, dirs, noise)

    for key in ('rgb', 'depth', 'med_depth', 'acc', 'weights'):
        np.testing.assert_allclose(np.asarray(ok[key]),
                                   np.asarray(orf[key]),
                                   rtol=2e-5, atol=2e-6, err_msg=key)
    assert abs(float(vk - vr)) < 1e-3
    for name, a, b in zip(['packed', 'z', 'dirs', 'noise'], gk, gr):
        scale = max(float(jnp.max(jnp.abs(b))), 1e-6)
        err = float(jnp.max(jnp.abs(a - b))) / scale
        assert err < 2e-5, (name, err)


def test_fused_composite_ray_padding():
    """B not a multiple of rays_per_tile: outputs must match unpadded."""
    packed, z, dirs, noise = _inputs()
    spec_a = CompositeSpec(samples=S, rays_per_tile=8, interpret=True)
    spec_b = CompositeSpec(samples=S, rays_per_tile=16, interpret=True)
    out_a = fused_composite(spec_a, packed, z, dirs)
    out_b = fused_composite(spec_b, packed, z, dirs)  # pads 24 -> 32 rays
    for key in ('rgb', 'depth', 'acc', 'weights'):
        np.testing.assert_allclose(np.asarray(out_a[key]),
                                   np.asarray(out_b[key]),
                                   rtol=1e-6, err_msg=key)


@pytest.mark.parametrize('n_fine', [S, 2 * S],
                         ids=['pow2-total', 'nonpow2-total'])
def test_fused_fine_sampling_matches_sample_pdf(n_fine):
    """In-kernel hierarchical sampling (fine_samples > 0): z_union must
    match ops.sampling.sample_pdf on the kernel's own weights, for sorted
    stratified u and for deterministic linspace u. n_fine = 2*S makes the
    total 48 — the reference-default 1:2 coarse:fine ratio (opt.py:23)
    whose union is NOT a power of two, exercising the in-kernel
    sentinel-padded merge (CompositeSpec.union_width)."""
    from hypernerf_tpu.ops.sampling import sample_pdf, sorted_uniform

    packed, z, dirs, noise = _inputs()
    spec = CompositeSpec(samples=S, rays_per_tile=8, has_noise=False,
                         fine_samples=n_fine, interpret=True)
    key = jax.random.PRNGKey(7)
    for u, strat in ((sorted_uniform(key, B, n_fine), True),
                     (jnp.broadcast_to(jnp.linspace(0.0, 1.0, n_fine),
                                       (B, n_fine)), False)):
        out = fused_composite(spec, packed, z, dirs, u=u)
        ref = _reference(packed, z, dirs, None, False, True)
        np.testing.assert_allclose(np.asarray(out['weights']),
                                   np.asarray(ref['weights']), atol=1e-6)
        z_mid = 0.5 * (z[:, 1:] + z[:, :-1])
        origins = jnp.zeros((B, 3))
        want_z, _ = sample_pdf(key, z_mid, ref['weights'][:, 1:-1],
                               origins, dirs, z, n_fine,
                               use_stratified_sampling=strat)
        diff = np.abs(np.asarray(out['z_union']) - np.asarray(want_z))
        if strat:
            # Training path: u edges have measure zero -> tight agreement.
            assert diff.max() <= 2e-5, diff.max()
        else:
            # Deterministic linspace includes u=1.0 exactly: a one-ulp
            # cumsum difference legitimately flips that u's CDF bracket
            # (kernel shift-scan vs XLA cumsum), moving ONE sample by at
            # most a bin. Everything off the knife edge must be tight.
            bin_w = float(np.max(np.diff(np.asarray(z), axis=-1)))
            assert (diff > 2e-5).mean() <= 0.01, (diff > 2e-5).mean()
            assert diff.max() <= bin_w, (diff.max(), bin_w)


def test_fused_fine_sampling_gradients_unaffected():
    """fine_samples must not change the compositing gradients, and the
    union depths carry no gradient (reference detach semantics)."""
    from hypernerf_tpu.ops.sampling import sorted_uniform

    packed, z, dirs, _ = _inputs()
    u = sorted_uniform(jax.random.PRNGKey(3), B, S)
    base = CompositeSpec(samples=S, rays_per_tile=8, interpret=True)
    with_f = base._replace(fine_samples=S)

    def loss(spec, use_u):
        def f(p):
            kw = dict(u=u) if use_u else {}
            out = fused_composite(spec, p, z, dirs, **kw)
            l = jnp.sum(out['rgb']) + jnp.sum(out['weights'] * 0.1)
            if 'z_union' in out:
                l = l + 0.0 * jnp.sum(out['z_union'])  # dead by design
            return l
        return jax.grad(f)(packed)

    g0 = loss(base, False)
    g1 = loss(with_f, True)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), atol=1e-6)
