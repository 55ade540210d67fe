"""Fused Pallas NerfMLP vs the jnp reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypernerf_tpu.models.modules import NerfMLP
from hypernerf_tpu.ops.pallas.fused_mlp import (FusedMLPSpec, fused_nerf_mlp,
                                                nerf_mlp_params_to_list)


def _setup(alpha_cond_ch=0, trunk_depth=3, rgb_depth=2, skips=(1,),
           in_ch=21, rgb_cond_ch=11, seed=0):
    mlp = NerfMLP(trunk_depth=trunk_depth, trunk_width=32,
                  rgb_branch_depth=rgb_depth, rgb_branch_width=16,
                  skips=skips)
    rs = np.random.RandomState(seed)
    B, S = 4, 8
    x = jnp.asarray(rs.randn(B, S, in_ch).astype(np.float32))
    rgbc = jnp.asarray(rs.randn(B, rgb_cond_ch).astype(np.float32))
    alphac = (jnp.asarray(rs.randn(B, alpha_cond_ch).astype(np.float32))
              if alpha_cond_ch else None)
    params = mlp.init(jax.random.PRNGKey(0), x, alpha_condition=alphac,
                      rgb_condition=rgbc)['params']
    spec = FusedMLPSpec(
        in_ch=in_ch, trunk_depth=trunk_depth, trunk_width=32,
        rgb_depth=rgb_depth, rgb_width=16, skips=skips,
        rgb_cond_ch=rgb_cond_ch, alpha_cond_ch=alpha_cond_ch,
        tile=8, interpret=True, compute_dtype='float32')
    return mlp, spec, params, x, rgbc, alphac


def _flatten_conds(x, rgbc, alphac):
    B, S, C = x.shape
    x_flat = x.reshape(B * S, C)
    rgbc_flat = jnp.broadcast_to(rgbc[:, None, :],
                                 (B, S, rgbc.shape[-1])).reshape(B * S, -1)
    alphac_flat = None
    if alphac is not None:
        alphac_flat = jnp.broadcast_to(
            alphac[:, None, :], (B, S, alphac.shape[-1])).reshape(B * S, -1)
    return x_flat, rgbc_flat, alphac_flat


@pytest.mark.parametrize('alpha_cond_ch', [0, 5])
def test_fused_forward_matches_reference(alpha_cond_ch):
    mlp, spec, params, x, rgbc, alphac = _setup(alpha_cond_ch)
    ref = mlp.apply({'params': params}, x, alpha_condition=alphac,
                    rgb_condition=rgbc)
    pairs = nerf_mlp_params_to_list(params)
    x_flat, rgbc_flat, alphac_flat = _flatten_conds(x, rgbc, alphac)
    got = fused_nerf_mlp(spec, x_flat, rgbc_flat, alphac_flat, pairs)
    B, S, _ = x.shape
    np.testing.assert_allclose(np.asarray(got['rgb']).reshape(B, S, 3),
                               np.asarray(ref['rgb']), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got['alpha']).reshape(B, S, 1),
                               np.asarray(ref['alpha']), rtol=1e-4, atol=1e-5)


def test_fused_forward_unaligned_rows():
    """P not a multiple of the tile is padded internally."""
    mlp, spec, params, x, rgbc, alphac = _setup()
    pairs = nerf_mlp_params_to_list(params)
    x_flat, rgbc_flat, _ = _flatten_conds(x, rgbc, None)
    # Drop 3 rows -> P=29, tile=8.
    got = fused_nerf_mlp(spec, x_flat[:29], rgbc_flat[:29], None, pairs)
    ref = fused_nerf_mlp(spec, x_flat, rgbc_flat, None, pairs)
    np.testing.assert_allclose(np.asarray(got['rgb']),
                               np.asarray(ref['rgb'])[:29], rtol=1e-5)


@pytest.mark.parametrize('alpha_cond_ch', [0, 5])
def test_fused_backward_matches_reference(alpha_cond_ch):
    mlp, spec, params, x, rgbc, alphac = _setup(alpha_cond_ch)
    pairs = nerf_mlp_params_to_list(params)
    x_flat, rgbc_flat, alphac_flat = _flatten_conds(x, rgbc, alphac)
    B, S, _ = x.shape
    target_rgb = jnp.asarray(
        np.random.RandomState(7).randn(B * S, 3).astype(np.float32))

    def loss_fused(pairs, x_flat, rgbc_flat, alphac_flat):
        out = fused_nerf_mlp(spec, x_flat, rgbc_flat, alphac_flat, pairs)
        return (jnp.mean((out['rgb'] - target_rgb) ** 2)
                + jnp.mean(out['alpha'] ** 2))

    def loss_ref(params, x, rgbc, alphac):
        out = mlp.apply({'params': params}, x, alpha_condition=alphac,
                        rgb_condition=rgbc)
        rgb = out['rgb'].astype(jnp.float32).reshape(B * S, 3)
        alpha = out['alpha'].astype(jnp.float32)
        return (jnp.mean((rgb - target_rgb) ** 2)
                + jnp.mean(alpha ** 2))

    args = (x_flat, rgbc_flat) + ((alphac_flat,) if alphac_flat is not None
                                  else (None,))
    gf = jax.grad(loss_fused, argnums=(0, 1, 2) + ((3,) if alphac is not None
                                                   else ()))(pairs, *args)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2) + ((3,) if alphac is not None
                                                 else ()))(params, x, rgbc,
                                                           alphac)

    # Weight gradients.
    from hypernerf_tpu.ops.pallas.fused_mlp import list_to_nerf_mlp_params
    got_tree = list_to_nerf_mlp_params(gf[0], params)
    flat_got = jax.tree_util.tree_flatten_with_path(got_tree)[0]
    flat_ref = dict((jax.tree_util.keystr(p), v) for p, v in
                    jax.tree_util.tree_flatten_with_path(gr[0])[0])
    for path, v in flat_got:
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(np.asarray(v), np.asarray(flat_ref[key]),
                                   rtol=1e-3, atol=1e-5, err_msg=key)

    # Input gradient.
    np.testing.assert_allclose(np.asarray(gf[1]).reshape(B, S, -1),
                               np.asarray(gr[1]), rtol=1e-3, atol=1e-5)
    # rgb condition gradient: fused gives per-sample; reference per-ray.
    d_rgbc_per_ray = np.asarray(gf[2]).reshape(B, S, -1).sum(1)
    np.testing.assert_allclose(d_rgbc_per_ray, np.asarray(gr[2]),
                               rtol=1e-3, atol=1e-5)
    if alphac is not None:
        d_ac_per_ray = np.asarray(gf[3]).reshape(B, S, -1).sum(1)
        np.testing.assert_allclose(d_ac_per_ray, np.asarray(gr[3]),
                                   rtol=1e-3, atol=1e-5)


def test_fused_reference_config_shapes():
    """The real model dimensions (trunk 8x256, rgb 4x128, skip at 4)."""
    mlp, spec, params, x, rgbc, alphac = _setup(
        alpha_cond_ch=0, trunk_depth=8, rgb_depth=4, skips=(4,),
        in_ch=115, rgb_cond_ch=39)
    # Recreate with the proper widths.
    mlp = NerfMLP()
    rs = np.random.RandomState(1)
    B, S = 2, 8
    x = jnp.asarray(rs.randn(B, S, 115).astype(np.float32))
    rgbc = jnp.asarray(rs.randn(B, 39).astype(np.float32))
    params = mlp.init(jax.random.PRNGKey(0), x, rgb_condition=rgbc)['params']
    spec = FusedMLPSpec(in_ch=115, tile=8, interpret=True)
    ref = mlp.apply({'params': params}, x, rgb_condition=rgbc)
    pairs = nerf_mlp_params_to_list(params)
    x_flat, rgbc_flat, _ = _flatten_conds(x, rgbc, None)
    got = fused_nerf_mlp(spec, x_flat, rgbc_flat, None, pairs)
    np.testing.assert_allclose(np.asarray(got['rgb']).reshape(B, S, 3),
                               np.asarray(ref['rgb']), rtol=5e-2, atol=5e-2)


def test_fused_with_in_kernel_posenc():
    """Raw-points mode: posenc happens inside the kernel (enc_segments)."""
    from hypernerf_tpu.ops.posenc import posenc_orig
    mlp = NerfMLP(trunk_depth=3, trunk_width=32, rgb_branch_depth=2,
                  rgb_branch_width=16, skips=(1,))
    rs = np.random.RandomState(0)
    B, S = 4, 8
    pts = jnp.asarray(rs.randn(B, S, 7).astype(np.float32) * 0.5)
    rgbc = jnp.asarray(rs.randn(B, 11).astype(np.float32))
    x_enc = jnp.concatenate([posenc_orig(pts[..., :3], 4),
                             posenc_orig(pts[..., 3:], 2)], -1)
    in_ch = x_enc.shape[-1]
    params = mlp.init(jax.random.PRNGKey(0), x_enc,
                      rgb_condition=rgbc)['params']
    spec = FusedMLPSpec(
        in_ch=in_ch, trunk_depth=3, trunk_width=32, rgb_depth=2,
        rgb_width=16, skips=(1,), rgb_cond_ch=11, alpha_cond_ch=0,
        tile=8, interpret=True, compute_dtype='float32',
        enc_segments=((3, 4), (4, 2)))
    pairs = nerf_mlp_params_to_list(params)
    pts_flat = pts.reshape(B * S, 7)
    rgbc_flat = jnp.broadcast_to(rgbc[:, None, :], (B, S, 11)).reshape(-1, 11)

    ref = mlp.apply({'params': params}, x_enc, rgb_condition=rgbc)
    got = fused_nerf_mlp(spec, pts_flat, rgbc_flat, None, pairs)
    np.testing.assert_allclose(np.asarray(got['rgb']).reshape(B, S, 3),
                               np.asarray(ref['rgb']), rtol=1e-4, atol=1e-5)

    # Gradients (params and raw points, through the in-kernel posenc VJP).
    tgt = jnp.asarray(np.random.RandomState(5).randn(B * S, 3), jnp.float32)

    def loss_fused(pairs, pts_flat):
        out = fused_nerf_mlp(spec, pts_flat, rgbc_flat, None, pairs)
        return jnp.mean((out['rgb'] - tgt) ** 2) + jnp.mean(out['alpha'] ** 2)

    def loss_ref(params, pts):
        feat = jnp.concatenate([posenc_orig(pts[..., :3], 4),
                                posenc_orig(pts[..., 3:], 2)], -1)
        out = mlp.apply({'params': params}, feat, rgb_condition=rgbc)
        rgb = out['rgb'].reshape(B * S, 3)
        return jnp.mean((rgb - tgt) ** 2) + jnp.mean(out['alpha'] ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1))(pairs, pts_flat)
    gr = jax.grad(loss_ref, argnums=(0, 1))(params, pts)
    np.testing.assert_allclose(np.asarray(gf[1]).reshape(B, S, 7),
                               np.asarray(gr[1]), rtol=1e-3, atol=1e-5)
    from hypernerf_tpu.ops.pallas.fused_mlp import list_to_nerf_mlp_params
    got_tree = list_to_nerf_mlp_params(gf[0], params)
    for (pa, va), (pb, vb) in zip(
            jax.tree_util.tree_flatten_with_path(got_tree)[0],
            jax.tree_util.tree_flatten_with_path(gr[0])[0]):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                   rtol=1e-3, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(pa))


def test_fused_with_wide_hyper_dims():
    """axis_aligned_plane-style hyper coords (8ch > the min raw padding)."""
    from hypernerf_tpu.ops.posenc import posenc_orig
    mlp = NerfMLP(trunk_depth=2, trunk_width=32, rgb_branch_depth=2,
                  rgb_branch_width=16, skips=(1,))
    rs = np.random.RandomState(2)
    B, S = 2, 8
    pts = jnp.asarray(rs.randn(B, S, 11).astype(np.float32) * 0.5)  # 3+8
    rgbc = jnp.asarray(rs.randn(B, 11).astype(np.float32))
    x_enc = jnp.concatenate([posenc_orig(pts[..., :3], 4),
                             posenc_orig(pts[..., 3:], 2)], -1)
    params = mlp.init(jax.random.PRNGKey(0), x_enc,
                      rgb_condition=rgbc)['params']
    spec = FusedMLPSpec(
        in_ch=x_enc.shape[-1], trunk_depth=2, trunk_width=32, rgb_depth=2,
        rgb_width=16, skips=(1,), rgb_cond_ch=11, alpha_cond_ch=0,
        tile=8, interpret=True, compute_dtype='float32',
        enc_segments=((3, 4), (8, 2)))
    pairs = nerf_mlp_params_to_list(params)
    pts_flat = pts.reshape(B * S, 11)
    rgbc_flat = jnp.broadcast_to(rgbc[:, None, :], (B, S, 11)).reshape(-1, 11)
    ref = mlp.apply({'params': params}, x_enc, rgb_condition=rgbc)
    got = fused_nerf_mlp(spec, pts_flat, rgbc_flat, None, pairs)
    np.testing.assert_allclose(np.asarray(got['rgb']).reshape(B, S, 3),
                               np.asarray(ref['rgb']), rtol=1e-4, atol=1e-5)
    # Gradient w.r.t. the wide raw input flows.
    g = jax.grad(lambda p: fused_nerf_mlp(
        spec, p, rgbc_flat, None, pairs)['rgb'].sum())(pts_flat)
    assert np.isfinite(np.asarray(g)).all()
    assert g.shape == (B * S, 11)
