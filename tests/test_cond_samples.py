"""Ray-native kernel path (cond_samples) parity vs the per-point path.

In ray mode the kernels take rgb/alpha conditions, the GLO embed, and the
ray geometry (origins/directions + per-sample z) as per-RAY rows; sample
positions o + z*d are computed in VMEM and all per-ray gradients are
reduced in-kernel. This must be numerically equivalent (up to fp32
accumulation order in the per-ray sums) to the per-point path fed
materialized broadcasts and precomputed points.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypernerf_tpu.ops.pallas.fused_level import FusedLevelSpec, fused_level
from hypernerf_tpu.ops.pallas.fused_mlp import (FusedMLPSpec, fused_nerf_mlp,
                                                _expand_rays, _reduce_rays)

S, R, E = 8, 16, 8
P = R * S


def _mk_mlp(rs, sizes):
    return [(jnp.asarray(rs.randn(i, o), jnp.float32) * 0.2,
             jnp.asarray(rs.randn(o), jnp.float32) * 0.1) for i, o in sizes]


def _field_pairs(rs, fs):
    sizes = []
    for i in range(fs.depth):
        ic = fs.enc_ch if i == 0 else fs.width
        if i > 0 and (i - 1) in fs.skips:
            ic += fs.enc_ch
        sizes.append((ic, fs.width))
    sizes.append((fs.width + (fs.enc_ch if (fs.depth - 1) in fs.skips else 0),
                  fs.out_ch))
    return _mk_mlp(rs, sizes)


def _tmpl_pairs(rs, ts):
    sizes = []
    tw = ts.trunk_width
    for i in range(ts.trunk_depth):
        ic = ts.in_ch if i == 0 else tw
        if i > 0 and (i - 1) in ts.skips:
            ic += ts.in_ch
        sizes.append((ic, tw))
    sizes.append((tw + (ts.in_ch if (ts.trunk_depth - 1) in ts.skips else 0),
                  tw))
    sizes.append((tw, tw // 2))
    sizes.append((tw // 2, 1))
    rin = tw // 2 + ts.rgb_cond_ch
    for j in range(ts.rgb_depth):
        ic = rin if j == 0 else ts.rgb_width
        if j > 0 and (j - 1) in ts.skips:
            ic += rin
        sizes.append((ic, ts.rgb_width))
    sizes.append((ts.rgb_width
                  + (rin if (ts.rgb_depth - 1) in ts.skips else 0), 3))
    return _mk_mlp(rs, sizes)


def test_expand_reduce_rays_exact():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(16, 128) * 100, jnp.float32)
    np.testing.assert_array_equal(np.asarray(_expand_rays(x, 16)),
                                  np.asarray(x))
    np.testing.assert_array_equal(np.asarray(_reduce_rays(x, 16)),
                                  np.asarray(x))
    x2 = x[:2]
    np.testing.assert_array_equal(np.asarray(_expand_rays(x2, 16)),
                                  np.asarray(jnp.repeat(x2, 8, 0)))
    np.testing.assert_allclose(np.asarray(_reduce_rays(x, 2)),
                               np.asarray(x.reshape(2, 8, 128).sum(1)),
                               rtol=1e-6)


@pytest.fixture(scope='module')
def level_setup():
    rs = np.random.RandomState(0)
    spec = FusedLevelSpec(
        embed_ch=E, warp_depth=2, warp_width=128, warp_freq=4,
        hyper_depth=2, hyper_width=64, hyper_sheet_freq=3, hyper_out=4,
        xyz_freq=4, hyper_freq=2, trunk_depth=2, trunk_width=128,
        rgb_depth=1, rgb_width=64, rgb_cond_ch=27, skips=(0,),
        tile=32, bwd_tile=16, tmpl_bwd_tile=16,
        interpret=True, compute_dtype='float32')
    pairs = (_field_pairs(rs, spec.warp_fs), _field_pairs(rs, spec.hyper_fs),
             _tmpl_pairs(rs, spec.tmpl_fs))
    origins = jnp.asarray(rs.randn(R, 3) * 0.1, jnp.float32)
    dirs = jnp.asarray(rs.randn(R, 3), jnp.float32)
    z = jnp.asarray(rs.rand(R, S) * 4 + 1, jnp.float32)
    emb = jnp.asarray(rs.randn(R, E), jnp.float32)
    cond = jnp.asarray(rs.randn(R, 27), jnp.float32)
    return spec, pairs, origins, dirs, z, emb, cond


def _relmax(a, b):
    return float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-6))


@pytest.mark.parametrize('split_bwd', [True, False])
def test_fused_level_cond_samples_parity(level_setup, split_bwd):
    spec, pairs, origins, dirs, z, emb, cond = level_setup
    wp, hp, tp = pairs

    def f_pt(origins, dirs, z, emb, cond, wp, hp, tp):
        pts = (origins[:, None, :] + z[..., None] * dirs[:, None, :])
        out = fused_level(spec._replace(split_bwd=split_bwd),
                          pts.reshape(P, 3), jnp.repeat(emb, S, 0),
                          jnp.repeat(cond, S, 0), None, wp, hp, tp)
        return jnp.sum(out['rgb'] * 1.7) + jnp.sum(out['alpha'] * 0.9)

    def f_ray(origins, dirs, z, emb, cond, wp, hp, tp):
        out = fused_level(spec._replace(cond_samples=S, split_bwd=split_bwd),
                          None, emb, cond, None, wp, hp, tp,
                          origins=origins, directions=dirs, z_vals=z)
        return jnp.sum(out['rgb'] * 1.7) + jnp.sum(out['alpha'] * 0.9)

    args = (origins, dirs, z, emb, cond, wp, hp, tp)
    v0, g0 = jax.value_and_grad(f_pt, argnums=tuple(range(8)))(*args)
    v1, g1 = jax.value_and_grad(f_ray, argnums=tuple(range(8)))(*args)
    assert _relmax(v0[None], v1[None]) < 1e-6
    # Ray-geometry grads sum S per-point fp32 values in a different order
    # (one-hot matmul vs XLA reduce) — allow accumulation-order noise.
    names = ['origins', 'dirs', 'z', 'emb', 'cond']
    for k, name in enumerate(names):
        for a, b in zip(jax.tree.leaves(g0[k]), jax.tree.leaves(g1[k])):
            assert _relmax(a, b) < 1e-4, name
    # Weight grads also see the one-rounding difference between XLA's fused
    # multiply-add for o + z*d and the kernel's mul+add.
    for k in range(5, 8):  # warp / hyper / template weight grads
        for a, b in zip(jax.tree.leaves(g0[k]), jax.tree.leaves(g1[k])):
            assert _relmax(a, b) < 1e-4


@pytest.mark.parametrize('pipe_fwd', [False, True])
def test_fused_level_cond_samples_pipelined_matches_split(level_setup,
                                                          pipe_fwd):
    """Pipelined backward (and optionally forward) in the ray-native mode:
    same tile size as the split backward, so per-ray reductions and dW
    accumulation order are identical — results must match exactly."""
    spec, pairs, origins, dirs, z, emb, cond = level_setup
    wp, hp, tp = pairs

    def f(spec_v, origins, dirs, z, emb, cond, wp, hp, tp):
        out = fused_level(spec_v._replace(cond_samples=S),
                          None, emb, cond, None, wp, hp, tp,
                          origins=origins, directions=dirs, z_vals=z)
        return jnp.sum(out['rgb'] * 1.7) + jnp.sum(out['alpha'] * 0.9)

    args = (origins, dirs, z, emb, cond, wp, hp, tp)
    nums = tuple(range(8))
    v_split, g_split = jax.value_and_grad(
        lambda *a: f(spec, *a), argnums=nums)(*args)
    spec_p = spec._replace(pipelined_bwd=True, pipelined_fwd=pipe_fwd)
    v_pipe, g_pipe = jax.value_and_grad(
        lambda *a: f(spec_p, *a), argnums=nums)(*args)
    np.testing.assert_allclose(float(v_split), float(v_pipe), rtol=1e-7)
    for a, b in zip(jax.tree.leaves(g_split), jax.tree.leaves(g_pipe)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_fused_mlp_cond_samples_parity():
    rs = np.random.RandomState(1)
    spec = FusedMLPSpec(
        in_ch=3 + 2 * 3 * 4 + 4 + 2 * 4 * 2,  # posenc(3,4) ++ posenc(4,2)
        trunk_depth=2, trunk_width=128, rgb_depth=1, rgb_width=64,
        skips=(0,), rgb_cond_ch=27, tile=32, bwd_tile=16,
        interpret=True, compute_dtype='float32',
        enc_segments=((3, 4), (4, 2)))
    pairs = _tmpl_pairs(rs, spec)
    x = jnp.asarray(rs.randn(P, 7), jnp.float32)
    cond = jnp.asarray(rs.randn(R, 27), jnp.float32)

    def f(spec, x, cond, pairs):
        out = fused_nerf_mlp(spec, x, cond, None, pairs)
        return jnp.sum(out['rgb'] * 1.3) + jnp.sum(out['alpha'] * 0.7)

    v0, g0 = jax.value_and_grad(f, argnums=(1, 2, 3))(
        spec, x, jnp.repeat(cond, S, 0), pairs)
    v1, g1 = jax.value_and_grad(f, argnums=(1, 2, 3))(
        spec._replace(cond_samples=S), x, cond, pairs)
    assert float(jnp.abs(v0 - v1)) == 0.0
    assert _relmax(g0[0], g1[0]) < 1e-6
    assert _relmax(g0[1].reshape(R, S, 27).sum(1), g1[1]) < 1e-5
    for a, b in zip(jax.tree.leaves(g0[2]), jax.tree.leaves(g1[2])):
        assert _relmax(a, b) < 1e-6
