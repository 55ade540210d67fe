"""Fully fused level kernel vs the composed jnp modules (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from hypernerf_tpu.models.modules import MLP, HyperSheetMLP, NerfMLP
from hypernerf_tpu.models.warping import TranslationField
from hypernerf_tpu.ops.pallas.fused_field import mlp_params_to_list
from hypernerf_tpu.ops.pallas.fused_level import FusedLevelSpec, fused_level
from hypernerf_tpu.ops.pallas.fused_mlp import nerf_mlp_params_to_list
from hypernerf_tpu.ops.posenc import posenc_orig

B, S, E, H = 3, 8, 8, 4
SPEC = FusedLevelSpec(
    embed_ch=E,
    warp_depth=2, warp_width=16, warp_freq=4,
    hyper_depth=2, hyper_width=16, hyper_sheet_freq=3, hyper_out=H,
    xyz_freq=4, hyper_freq=2,
    trunk_depth=3, trunk_width=32, rgb_depth=2, rgb_width=16,
    rgb_cond_ch=11, alpha_cond_ch=0, skips=(1,),
    tile=8, bwd_tile=8, tmpl_bwd_tile=8, interpret=True,
    compute_dtype='float32')


def _setup(seed=0):
    rs = np.random.RandomState(seed)
    pts = jnp.asarray(rs.randn(B, S, 3).astype(np.float32) * 0.4)
    embed = jnp.asarray(rs.randn(B, E).astype(np.float32) * 0.2)
    rgbc = jnp.asarray(rs.randn(B, 11).astype(np.float32))

    warp = TranslationField(depth=2, width=16, n_freq=4, skips=(1,))
    hyper = HyperSheetMLP(out_ch=H, depth=2, width=16, n_freq=3, skips=(1,))
    tmpl = NerfMLP(trunk_depth=3, trunk_width=32, rgb_branch_depth=2,
                   rgb_branch_width=16, skips=(1,))

    embed_b = jnp.broadcast_to(embed[:, None, :], (B, S, E))
    wp = warp.init(jax.random.PRNGKey(0), pts, embed_b)['params']
    hp = hyper.init(jax.random.PRNGKey(1), pts, embed_b)['params']
    feat = jnp.concatenate([posenc_orig(pts, 4),
                            posenc_orig(jnp.zeros((B, S, H)), 2)], -1)
    tp = tmpl.init(jax.random.PRNGKey(2), feat, rgb_condition=rgbc)['params']
    return pts, embed, rgbc, (warp, wp), (hyper, hp), (tmpl, tp)


def _reference(pts, embed, rgbc, warp_mh, hyper_mh, tmpl_mh):
    warp, wp = warp_mh
    hyper, hp = hyper_mh
    tmpl, tp = tmpl_mh
    embed_b = jnp.broadcast_to(embed[:, None, :], (B, S, E))
    warped = warp.apply({'params': wp}, pts, embed_b)['warped_points']
    hyper_pts = hyper.apply({'params': hp}, pts, embed_b)
    feat = jnp.concatenate([posenc_orig(warped, 4),
                            posenc_orig(hyper_pts, 2)], -1)
    out = tmpl.apply({'params': tp}, feat, rgb_condition=rgbc)
    return out['rgb'], out['alpha']


def _fused(pts, embed, rgbc, warp_mh, hyper_mh, tmpl_mh):
    wp = mlp_params_to_list(warp_mh[1]['mlp'])
    hp = mlp_params_to_list(hyper_mh[1]['mlp'])
    tp = nerf_mlp_params_to_list(tmpl_mh[1])
    pts_flat = pts.reshape(-1, 3)
    emb_flat = jnp.broadcast_to(embed[:, None, :], (B, S, E)).reshape(-1, E)
    rgbc_flat = jnp.broadcast_to(rgbc[:, None, :], (B, S, 11)).reshape(-1, 11)
    out = fused_level(SPEC, pts_flat, emb_flat, rgbc_flat, None, wp, hp, tp)
    return out['rgb'].reshape(B, S, 3), out['alpha'].reshape(B, S, 1)


def test_fused_level_forward_matches_composition():
    pts, embed, rgbc, wm, hm, tm = _setup()
    ref_rgb, ref_alpha = _reference(pts, embed, rgbc, wm, hm, tm)
    got_rgb, got_alpha = _fused(pts, embed, rgbc, wm, hm, tm)
    np.testing.assert_allclose(np.asarray(got_rgb), np.asarray(ref_rgb),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_alpha), np.asarray(ref_alpha),
                               rtol=1e-4, atol=1e-5)


def test_fused_level_backward_matches_composition():
    pts, embed, rgbc, (warp, wp0), (hyper, hp0), (tmpl, tp0) = _setup()
    tgt = jnp.asarray(np.random.RandomState(9).randn(B, S, 3), jnp.float32)

    def loss_ref(wp, hp, tp, pts, embed):
        embed_b = jnp.broadcast_to(embed[:, None, :], (B, S, E))
        warped = warp.apply({'params': wp}, pts, embed_b)['warped_points']
        hyper_pts = hyper.apply({'params': hp}, pts, embed_b)
        feat = jnp.concatenate([posenc_orig(warped, 4),
                                posenc_orig(hyper_pts, 2)], -1)
        out = tmpl.apply({'params': tp}, feat, rgb_condition=rgbc)
        return (jnp.mean((out['rgb'] - tgt) ** 2)
                + jnp.mean(out['alpha'] ** 2))

    def loss_fused(wp_l, hp_l, tp_l, pts, embed):
        pts_flat = pts.reshape(-1, 3)
        emb_flat = jnp.broadcast_to(embed[:, None, :],
                                    (B, S, E)).reshape(-1, E)
        rgbc_flat = jnp.broadcast_to(rgbc[:, None, :],
                                     (B, S, 11)).reshape(-1, 11)
        out = fused_level(SPEC, pts_flat, emb_flat, rgbc_flat, None,
                          wp_l, hp_l, tp_l)
        rgb = out['rgb'].reshape(B, S, 3)
        return jnp.mean((rgb - tgt) ** 2) + jnp.mean(out['alpha'] ** 2)

    wp_l = mlp_params_to_list(wp0['mlp'])
    hp_l = mlp_params_to_list(hp0['mlp'])
    tp_l = nerf_mlp_params_to_list(tp0)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
        wp_l, hp_l, tp_l, pts, embed)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
        wp0, hp0, tp0, pts, embed)

    # d points and d embed (embed grad summed over samples by broadcast VJP).
    np.testing.assert_allclose(np.asarray(gf[3]), np.asarray(gr[3]),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gf[4]), np.asarray(gr[4]),
                               rtol=1e-3, atol=1e-5)

    # Warp MLP grads.
    for i, (dw, db) in enumerate(gf[0]):
        name = f'hidden_{i}' if i < 2 else 'logit'
        np.testing.assert_allclose(np.asarray(dw),
                                   np.asarray(gr[0]['mlp'][name]['kernel']),
                                   rtol=1e-3, atol=1e-5, err_msg=f'warp {name}')
    # Hyper MLP grads.
    for i, (dw, db) in enumerate(gf[1]):
        name = f'hidden_{i}' if i < 2 else 'logit'
        np.testing.assert_allclose(np.asarray(dw),
                                   np.asarray(gr[1]['mlp'][name]['kernel']),
                                   rtol=1e-3, atol=1e-5,
                                   err_msg=f'hyper {name}')
    # Template trunk layer 0 (spot check) + heads.
    from hypernerf_tpu.ops.pallas.fused_mlp import list_to_nerf_mlp_params
    got_tree = list_to_nerf_mlp_params(gf[2], tp0)
    for key, got, want in [
            ('trunk0', got_tree['trunk']['hidden_0']['kernel'],
             gr[2]['trunk']['hidden_0']['kernel']),
            ('alpha', got_tree['alpha_head']['kernel'],
             gr[2]['alpha_head']['kernel']),
            ('rgb_logit', got_tree['rgb_branch']['logit']['kernel'],
             gr[2]['rgb_branch']['logit']['kernel'])]:
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-3, atol=1e-5, err_msg=key)


def test_fused_level_model_integration_cpu_fallback():
    """On CPU the model gates the fused path off and still matches configs."""
    from tests.conftest import make_rays, tiny_nerf_config
    from hypernerf_tpu.models.nerf import NerfModel
    from hypernerf_tpu.ops.ray_dict import prepare_ray_dict
    cfg = tiny_nerf_config(use_pallas=True, use_pallas_level=True,
                           use_pallas_fields=True)
    model = NerfModel(cfg)
    rd = prepare_ray_dict(jnp.asarray(make_rays(5)))
    key = jax.random.PRNGKey(0)
    variables = model.init({'params': key, 'sampling': key}, rd)
    out = model.apply(variables, rd, deterministic=True)
    assert np.isfinite(np.asarray(out['fine']['rgb'])).all()


def test_fused_level_with_alpha_condition():
    """Alpha-condition variant (use_nerf_embed) through the level kernel."""
    rs = np.random.RandomState(4)
    pts = jnp.asarray(rs.randn(B, S, 3).astype(np.float32) * 0.4)
    embed = jnp.asarray(rs.randn(B, E).astype(np.float32) * 0.2)
    rgbc = jnp.asarray(rs.randn(B, 11).astype(np.float32))
    alphac = jnp.asarray(rs.randn(B, 5).astype(np.float32))

    warp = TranslationField(depth=2, width=16, n_freq=4, skips=(1,))
    hyper = HyperSheetMLP(out_ch=H, depth=2, width=16, n_freq=3, skips=(1,))
    tmpl = NerfMLP(trunk_depth=3, trunk_width=32, rgb_branch_depth=2,
                   rgb_branch_width=16, skips=(1,))
    embed_b = jnp.broadcast_to(embed[:, None, :], (B, S, E))
    wp = warp.init(jax.random.PRNGKey(0), pts, embed_b)['params']
    hp = hyper.init(jax.random.PRNGKey(1), pts, embed_b)['params']
    feat = jnp.concatenate([posenc_orig(pts, 4),
                            posenc_orig(jnp.zeros((B, S, H)), 2)], -1)
    tp = tmpl.init(jax.random.PRNGKey(2), feat, alpha_condition=alphac,
                   rgb_condition=rgbc)['params']

    warped = warp.apply({'params': wp}, pts, embed_b)['warped_points']
    hyper_pts = hyper.apply({'params': hp}, pts, embed_b)
    feat = jnp.concatenate([posenc_orig(warped, 4),
                            posenc_orig(hyper_pts, 2)], -1)
    ref = tmpl.apply({'params': tp}, feat, alpha_condition=alphac,
                     rgb_condition=rgbc)

    spec = SPEC._replace(alpha_cond_ch=5)
    out = fused_level(
        spec, pts.reshape(-1, 3),
        embed_b.reshape(-1, E),
        jnp.broadcast_to(rgbc[:, None, :], (B, S, 11)).reshape(-1, 11),
        jnp.broadcast_to(alphac[:, None, :], (B, S, 5)).reshape(-1, 5),
        mlp_params_to_list(wp['mlp']), mlp_params_to_list(hp['mlp']),
        nerf_mlp_params_to_list(tp))
    np.testing.assert_allclose(np.asarray(out['alpha']).reshape(B, S, 1),
                               np.asarray(ref['alpha']), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out['rgb']).reshape(B, S, 3),
                               np.asarray(ref['rgb']), rtol=1e-4, atol=1e-5)


PLANE_SPEC = SPEC._replace(slice_method='axis_aligned_plane', hyper_out=E)


def _plane_reference(pts, embed, rgbc, warp_mh, tmpl_mh):
    """Dense composition for axis_aligned_plane: hyper coords = the embed
    (models.py:514-543), no hyper MLP."""
    warp, wp = warp_mh
    tmpl, tp = tmpl_mh
    embed_b = jnp.broadcast_to(embed[:, None, :], (B, S, E))
    warped = warp.apply({'params': wp}, pts, embed_b)['warped_points']
    feat = jnp.concatenate([posenc_orig(warped, 4),
                            posenc_orig(embed_b, 2)], -1)
    out = tmpl.apply({'params': tp}, feat, rgb_condition=rgbc)
    return out['rgb'], out['alpha']


def _plane_setup(seed=0):
    rs = np.random.RandomState(seed)
    pts = jnp.asarray(rs.randn(B, S, 3).astype(np.float32) * 0.4)
    embed = jnp.asarray(rs.randn(B, E).astype(np.float32) * 0.2)
    rgbc = jnp.asarray(rs.randn(B, 11).astype(np.float32))
    warp = TranslationField(depth=2, width=16, n_freq=4, skips=(1,))
    tmpl = NerfMLP(trunk_depth=3, trunk_width=32, rgb_branch_depth=2,
                   rgb_branch_width=16, skips=(1,))
    embed_b = jnp.broadcast_to(embed[:, None, :], (B, S, E))
    wp = warp.init(jax.random.PRNGKey(0), pts, embed_b)['params']
    feat = jnp.concatenate([posenc_orig(pts, 4),
                            posenc_orig(embed_b, 2)], -1)
    tp = tmpl.init(jax.random.PRNGKey(2), feat, rgb_condition=rgbc)['params']
    return pts, embed, rgbc, (warp, wp), (tmpl, tp)


def test_fused_level_plane_forward_matches_composition():
    pts, embed, rgbc, wm, tm = _plane_setup()
    ref_rgb, ref_alpha = _plane_reference(pts, embed, rgbc, wm, tm)
    wp = mlp_params_to_list(wm[1]['mlp'])
    tp = nerf_mlp_params_to_list(tm[1])
    emb_flat = jnp.broadcast_to(embed[:, None, :], (B, S, E)).reshape(-1, E)
    rgbc_flat = jnp.broadcast_to(rgbc[:, None, :], (B, S, 11)).reshape(-1, 11)
    out = fused_level(PLANE_SPEC, pts.reshape(-1, 3), emb_flat, rgbc_flat,
                      None, wp, [], tp)
    np.testing.assert_allclose(np.asarray(out['rgb']).reshape(B, S, 3),
                               np.asarray(ref_rgb), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out['alpha']).reshape(B, S, 1),
                               np.asarray(ref_alpha), rtol=1e-4, atol=1e-5)


def test_fused_level_plane_backward_matches_composition():
    """d_embed must carry BOTH the warp-MLP path and the direct hyper-coord
    path (d_hyper routes straight to the embed in plane mode)."""
    pts, embed, rgbc, (warp, wp0), (tmpl, tp0) = _plane_setup(seed=5)
    tgt = jnp.asarray(np.random.RandomState(9).randn(B, S, 3), jnp.float32)

    def loss_ref(wp, tp, pts, embed):
        embed_b = jnp.broadcast_to(embed[:, None, :], (B, S, E))
        warped = warp.apply({'params': wp}, pts, embed_b)['warped_points']
        feat = jnp.concatenate([posenc_orig(warped, 4),
                                posenc_orig(embed_b, 2)], -1)
        out = tmpl.apply({'params': tp}, feat, rgb_condition=rgbc)
        return (jnp.mean((out['rgb'] - tgt) ** 2)
                + jnp.mean(out['alpha'] ** 2))

    def loss_fused(wp_l, tp_l, pts, embed):
        emb_flat = jnp.broadcast_to(embed[:, None, :],
                                    (B, S, E)).reshape(-1, E)
        rgbc_flat = jnp.broadcast_to(rgbc[:, None, :],
                                     (B, S, 11)).reshape(-1, 11)
        out = fused_level(PLANE_SPEC, pts.reshape(-1, 3), emb_flat,
                          rgbc_flat, None, wp_l, [], tp_l)
        rgb = out['rgb'].reshape(B, S, 3)
        return jnp.mean((rgb - tgt) ** 2) + jnp.mean(out['alpha'] ** 2)

    wp_l = mlp_params_to_list(wp0['mlp'])
    tp_l = nerf_mlp_params_to_list(tp0)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(wp_l, tp_l, pts, embed)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(wp0, tp0, pts, embed)

    np.testing.assert_allclose(np.asarray(gf[2]), np.asarray(gr[2]),
                               rtol=1e-3, atol=1e-5, err_msg='d_points')
    np.testing.assert_allclose(np.asarray(gf[3]), np.asarray(gr[3]),
                               rtol=1e-3, atol=1e-5, err_msg='d_embed')
    for i, (dw, db) in enumerate(gf[0]):
        name = f'hidden_{i}' if i < 2 else 'logit'
        np.testing.assert_allclose(np.asarray(dw),
                                   np.asarray(gr[0]['mlp'][name]['kernel']),
                                   rtol=1e-3, atol=1e-5, err_msg=f'warp {name}')
    # Single-kernel backward agrees with the split backward too.
    spec1 = PLANE_SPEC._replace(split_bwd=False)

    def loss_one(wp_l, tp_l, pts, embed):
        emb_flat = jnp.broadcast_to(embed[:, None, :],
                                    (B, S, E)).reshape(-1, E)
        rgbc_flat = jnp.broadcast_to(rgbc[:, None, :],
                                     (B, S, 11)).reshape(-1, 11)
        out = fused_level(spec1, pts.reshape(-1, 3), emb_flat,
                          rgbc_flat, None, wp_l, [], tp_l)
        rgb = out['rgb'].reshape(B, S, 3)
        return jnp.mean((rgb - tgt) ** 2) + jnp.mean(out['alpha'] ** 2)

    g1 = jax.grad(loss_one, argnums=(0, 1, 2, 3))(wp_l, tp_l, pts, embed)
    np.testing.assert_allclose(np.asarray(g1[3]), np.asarray(gf[3]),
                               rtol=1e-5, atol=1e-7, err_msg='split vs one')


def test_fused_level_pipelined_backward_matches_split():
    """The software-pipelined one-kernel backward (template tile i
    interleaved with fields tile i-1, dx_t in VMEM scratch) agrees with the
    split two-kernel backward — same tile size, so accumulation order is
    identical and results match to fp32 exactness."""
    pts, embed, rgbc, (warp, wp0), (hyper, hp0), (tmpl, tp0) = _setup(seed=7)
    wp_l = mlp_params_to_list(wp0['mlp'])
    hp_l = mlp_params_to_list(hp0['mlp'])
    tp_l = nerf_mlp_params_to_list(tp0)
    tgt = jnp.asarray(np.random.RandomState(13).randn(B, S, 3), jnp.float32)

    def loss(spec, wp_l, hp_l, tp_l, pts, embed):
        emb_flat = jnp.broadcast_to(embed[:, None, :],
                                    (B, S, E)).reshape(-1, E)
        rgbc_flat = jnp.broadcast_to(rgbc[:, None, :],
                                     (B, S, 11)).reshape(-1, 11)
        out = fused_level(spec, pts.reshape(-1, 3), emb_flat, rgbc_flat,
                          None, wp_l, hp_l, tp_l)
        return (jnp.mean((out['rgb'].reshape(B, S, 3) - tgt) ** 2)
                + jnp.mean(out['alpha'] ** 2))

    args = (wp_l, hp_l, tp_l, pts, embed)
    g_split = jax.grad(lambda *a: loss(SPEC, *a), argnums=(0, 1, 2, 3, 4))(
        *args)
    spec_p = SPEC._replace(pipelined_bwd=True)
    g_pipe = jax.grad(lambda *a: loss(spec_p, *a), argnums=(0, 1, 2, 3, 4))(
        *args)
    for a, b in zip(jax.tree.leaves(g_split), jax.tree.leaves(g_pipe)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_fused_level_pipelined_backward_matches_split_alpha_cond():
    """Pipelined backward with the alpha-condition variant."""
    rs = np.random.RandomState(21)
    pts = jnp.asarray(rs.randn(B, S, 3).astype(np.float32) * 0.4)
    embed = jnp.asarray(rs.randn(B, E).astype(np.float32) * 0.2)
    rgbc = jnp.asarray(rs.randn(B, 11).astype(np.float32))
    alphac = jnp.asarray(rs.randn(B, 5).astype(np.float32))
    warp = TranslationField(depth=2, width=16, n_freq=4, skips=(1,))
    hyper = HyperSheetMLP(out_ch=H, depth=2, width=16, n_freq=3, skips=(1,))
    tmpl = NerfMLP(trunk_depth=3, trunk_width=32, rgb_branch_depth=2,
                   rgb_branch_width=16, skips=(1,))
    embed_b = jnp.broadcast_to(embed[:, None, :], (B, S, E))
    wp0 = warp.init(jax.random.PRNGKey(0), pts, embed_b)['params']
    hp0 = hyper.init(jax.random.PRNGKey(1), pts, embed_b)['params']
    feat = jnp.concatenate([posenc_orig(pts, 4),
                            posenc_orig(jnp.zeros((B, S, H)), 2)], -1)
    tp0 = tmpl.init(jax.random.PRNGKey(2), feat, alpha_condition=alphac,
                    rgb_condition=rgbc)['params']
    wp_l = mlp_params_to_list(wp0['mlp'])
    hp_l = mlp_params_to_list(hp0['mlp'])
    tp_l = nerf_mlp_params_to_list(tp0)
    tgt = jnp.asarray(np.random.RandomState(2).randn(B, S, 3), jnp.float32)

    def loss(spec, wp_l, hp_l, tp_l, pts, embed, alphac):
        emb_flat = jnp.broadcast_to(embed[:, None, :],
                                    (B, S, E)).reshape(-1, E)
        rgbc_flat = jnp.broadcast_to(rgbc[:, None, :],
                                     (B, S, 11)).reshape(-1, 11)
        ac_flat = jnp.broadcast_to(alphac[:, None, :],
                                   (B, S, 5)).reshape(-1, 5)
        out = fused_level(spec, pts.reshape(-1, 3), emb_flat, rgbc_flat,
                          ac_flat, wp_l, hp_l, tp_l)
        return (jnp.mean((out['rgb'].reshape(B, S, 3) - tgt) ** 2)
                + jnp.mean(out['alpha'] ** 2))

    spec0 = SPEC._replace(alpha_cond_ch=5)
    spec_p = spec0._replace(pipelined_bwd=True)
    args = (wp_l, hp_l, tp_l, pts, embed, alphac)
    nums = (0, 1, 2, 3, 4, 5)
    g_split = jax.grad(lambda *a: loss(spec0, *a), argnums=nums)(*args)
    g_pipe = jax.grad(lambda *a: loss(spec_p, *a), argnums=nums)(*args)
    for a, b in zip(jax.tree.leaves(g_split), jax.tree.leaves(g_pipe)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_fused_level_pipelined_backward_plane():
    """Pipelined backward in axis_aligned_plane mode (no hyper MLP)."""
    pts, embed, rgbc, (warp, wp0), (tmpl, tp0) = _plane_setup(seed=6)
    wp_l = mlp_params_to_list(wp0['mlp'])
    tp_l = nerf_mlp_params_to_list(tp0)
    tgt = jnp.asarray(np.random.RandomState(3).randn(B, S, 3), jnp.float32)

    def loss(spec, wp_l, tp_l, pts, embed):
        emb_flat = jnp.broadcast_to(embed[:, None, :],
                                    (B, S, E)).reshape(-1, E)
        rgbc_flat = jnp.broadcast_to(rgbc[:, None, :],
                                     (B, S, 11)).reshape(-1, 11)
        out = fused_level(spec, pts.reshape(-1, 3), emb_flat, rgbc_flat,
                          None, wp_l, [], tp_l)
        return jnp.mean((out['rgb'].reshape(B, S, 3) - tgt) ** 2)

    nums = (0, 1, 2, 3)
    g_split = jax.grad(lambda *a: loss(PLANE_SPEC, *a), argnums=nums)(
        wp_l, tp_l, pts, embed)
    spec_p = PLANE_SPEC._replace(pipelined_bwd=True)
    g_pipe = jax.grad(lambda *a: loss(spec_p, *a), argnums=nums)(
        wp_l, tp_l, pts, embed)
    for a, b in zip(jax.tree.leaves(g_split), jax.tree.leaves(g_pipe)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_fused_level_pipelined_forward_matches_standard():
    """The software-pipelined forward (fields tile i interleaved with
    template tile i-1, raw_t in VMEM scratch) is bit-equal to the standard
    fused forward — same per-tile math, same order within each stream."""
    pts, embed, rgbc, wm, hm, tm = _setup(seed=17)
    wp_l = mlp_params_to_list(wm[1]['mlp'])
    hp_l = mlp_params_to_list(hm[1]['mlp'])
    tp_l = nerf_mlp_params_to_list(tm[1])
    emb_flat = jnp.broadcast_to(embed[:, None, :], (B, S, E)).reshape(-1, E)
    rgbc_flat = jnp.broadcast_to(rgbc[:, None, :], (B, S, 11)).reshape(-1, 11)

    def run(spec):
        return fused_level(spec, pts.reshape(-1, 3), emb_flat, rgbc_flat,
                           None, wp_l, hp_l, tp_l)

    base = run(SPEC)
    pipe = run(SPEC._replace(pipelined_fwd=True))
    np.testing.assert_array_equal(np.asarray(pipe['rgb']),
                                  np.asarray(base['rgb']))
    np.testing.assert_array_equal(np.asarray(pipe['alpha']),
                                  np.asarray(base['alpha']))


def test_fused_level_interleaved_forward_matches_standard():
    """The half-tile interleaved forward (two independent half-tile streams
    alternated op-group by op-group) is bit-equal to the standard fused
    forward: row-blocked matmuls, each stream's internal order unchanged."""
    pts, embed, rgbc, wm, hm, tm = _setup(seed=23)
    wp_l = mlp_params_to_list(wm[1]['mlp'])
    hp_l = mlp_params_to_list(hm[1]['mlp'])
    tp_l = nerf_mlp_params_to_list(tm[1])
    emb_flat = jnp.broadcast_to(embed[:, None, :], (B, S, E)).reshape(-1, E)
    rgbc_flat = jnp.broadcast_to(rgbc[:, None, :], (B, S, 11)).reshape(-1, 11)

    def run(spec):
        return fused_level(spec, pts.reshape(-1, 3), emb_flat, rgbc_flat,
                           None, wp_l, hp_l, tp_l)

    base = run(SPEC)
    inter = run(SPEC._replace(interleaved_fwd=True))
    np.testing.assert_array_equal(np.asarray(inter['rgb']),
                                  np.asarray(base['rgb']))
    np.testing.assert_array_equal(np.asarray(inter['alpha']),
                                  np.asarray(base['alpha']))


def test_fused_level_interleaved_fwd_grads_match():
    """interleaved_fwd composes with the pipelined backward: the saved raw_t
    residual (concatenated halves) and the whole gradient are unchanged."""
    pts, embed, rgbc, (warp, wp0), (hyper, hp0), (tmpl, tp0) = _setup(seed=5)
    wp_l = mlp_params_to_list(wp0['mlp'])
    hp_l = mlp_params_to_list(hp0['mlp'])
    tp_l = nerf_mlp_params_to_list(tp0)
    tgt = jnp.asarray(np.random.RandomState(3).randn(B, S, 3), jnp.float32)

    def loss(spec, wp_l, hp_l, tp_l, pts, embed):
        emb_flat = jnp.broadcast_to(embed[:, None, :],
                                    (B, S, E)).reshape(-1, E)
        rgbc_flat = jnp.broadcast_to(rgbc[:, None, :],
                                     (B, S, 11)).reshape(-1, 11)
        out = fused_level(spec, pts.reshape(-1, 3), emb_flat, rgbc_flat,
                          None, wp_l, hp_l, tp_l)
        return (jnp.mean((out['rgb'].reshape(B, S, 3) - tgt) ** 2)
                + jnp.mean(out['alpha'] ** 2))

    args = (wp_l, hp_l, tp_l, pts, embed)
    nums = (0, 1, 2, 3, 4)
    g_base = jax.grad(lambda *a: loss(SPEC, *a), argnums=nums)(*args)
    spec_i = SPEC._replace(interleaved_fwd=True, pipelined_bwd=True)
    g_inter = jax.grad(lambda *a: loss(spec_i, *a), argnums=nums)(*args)
    for a, b in zip(jax.tree.leaves(g_base), jax.tree.leaves(g_inter)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_fused_level_fully_pipelined_grads_match_split():
    """pipelined_fwd + pipelined_bwd together: the saved raw_t residual and
    the whole gradient agree with the split path."""
    pts, embed, rgbc, (warp, wp0), (hyper, hp0), (tmpl, tp0) = _setup(seed=8)
    wp_l = mlp_params_to_list(wp0['mlp'])
    hp_l = mlp_params_to_list(hp0['mlp'])
    tp_l = nerf_mlp_params_to_list(tp0)
    tgt = jnp.asarray(np.random.RandomState(14).randn(B, S, 3), jnp.float32)

    def loss(spec, wp_l, hp_l, tp_l, pts, embed):
        emb_flat = jnp.broadcast_to(embed[:, None, :],
                                    (B, S, E)).reshape(-1, E)
        rgbc_flat = jnp.broadcast_to(rgbc[:, None, :],
                                     (B, S, 11)).reshape(-1, 11)
        out = fused_level(spec, pts.reshape(-1, 3), emb_flat, rgbc_flat,
                          None, wp_l, hp_l, tp_l)
        return (jnp.mean((out['rgb'].reshape(B, S, 3) - tgt) ** 2)
                + jnp.mean(out['alpha'] ** 2))

    args = (wp_l, hp_l, tp_l, pts, embed)
    nums = (0, 1, 2, 3, 4)
    g_split = jax.grad(lambda *a: loss(SPEC, *a), argnums=nums)(*args)
    spec_p = SPEC._replace(pipelined_fwd=True, pipelined_bwd=True)
    g_pipe = jax.grad(lambda *a: loss(spec_p, *a), argnums=nums)(*args)
    for a, b in zip(jax.tree.leaves(g_split), jax.tree.leaves(g_pipe)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_fused_level_single_kernel_backward_matches_split():
    """The split (two-kernel) and fused (one-kernel) backwards agree."""
    pts, embed, rgbc, (warp, wp0), (hyper, hp0), (tmpl, tp0) = _setup(seed=3)
    wp_l = mlp_params_to_list(wp0['mlp'])
    hp_l = mlp_params_to_list(hp0['mlp'])
    tp_l = nerf_mlp_params_to_list(tp0)
    tgt = jnp.asarray(np.random.RandomState(11).randn(B, S, 3), jnp.float32)

    def loss(spec, wp_l, pts):
        emb_flat = jnp.broadcast_to(embed[:, None, :],
                                    (B, S, E)).reshape(-1, E)
        rgbc_flat = jnp.broadcast_to(rgbc[:, None, :],
                                     (B, S, 11)).reshape(-1, 11)
        out = fused_level(spec, pts.reshape(-1, 3), emb_flat, rgbc_flat,
                          None, wp_l, hp_l, tp_l)
        return jnp.mean((out['rgb'].reshape(B, S, 3) - tgt) ** 2)

    g_split = jax.grad(lambda w, p: loss(SPEC, w, p),
                       argnums=(0, 1))(wp_l, pts)
    spec1 = SPEC._replace(split_bwd=False)
    g_one = jax.grad(lambda w, p: loss(spec1, w, p),
                     argnums=(0, 1))(wp_l, pts)
    np.testing.assert_allclose(np.asarray(g_split[1]), np.asarray(g_one[1]),
                               rtol=1e-5, atol=1e-7)
    for (a, _), (b, _) in zip(g_split[0], g_one[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_fused_level_bf16_epilogue_noop_at_f32():
    """bf16_epilogue is an exact no-op at compute_dtype float32: the
    epilogue runs in the compute dtype, which IS fp32 — same values and
    same gradients bit-for-bit."""
    pts, embed, rgbc, wm, hm, tm = _setup(seed=11)
    wp_l = mlp_params_to_list(wm[1]['mlp'])
    hp_l = mlp_params_to_list(hm[1]['mlp'])
    tp_l = nerf_mlp_params_to_list(tm[1])
    emb_flat = jnp.broadcast_to(embed[:, None, :], (B, S, E)).reshape(-1, E)
    rgbc_flat = jnp.broadcast_to(rgbc[:, None, :], (B, S, 11)).reshape(-1, 11)

    def loss(spec, wp_l, hp_l, tp_l):
        out = fused_level(spec, pts.reshape(-1, 3), emb_flat, rgbc_flat,
                          None, wp_l, hp_l, tp_l)
        return jnp.mean(out['rgb'] ** 2) + jnp.mean(out['alpha'] ** 2)

    spec_e = SPEC._replace(bf16_epilogue=True)
    v0, g0 = jax.value_and_grad(
        lambda *a: loss(SPEC, *a), argnums=(0, 1, 2))(wp_l, hp_l, tp_l)
    v1, g1 = jax.value_and_grad(
        lambda *a: loss(spec_e, *a), argnums=(0, 1, 2))(wp_l, hp_l, tp_l)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_level_bf16_epilogue_close_at_bf16():
    """At bf16 compute the flag changes only the bias-add rounding: one
    extra bf16 round per hidden layer. Forward and grads stay within bf16
    tolerance of the fp32-epilogue bf16 kernel."""
    pts, embed, rgbc, wm, hm, tm = _setup(seed=13)
    wp_l = mlp_params_to_list(wm[1]['mlp'])
    hp_l = mlp_params_to_list(hm[1]['mlp'])
    tp_l = nerf_mlp_params_to_list(tm[1])
    emb_flat = jnp.broadcast_to(embed[:, None, :], (B, S, E)).reshape(-1, E)
    rgbc_flat = jnp.broadcast_to(rgbc[:, None, :], (B, S, 11)).reshape(-1, 11)
    base = SPEC._replace(compute_dtype='bfloat16')

    def run(spec):
        return fused_level(spec, pts.reshape(-1, 3), emb_flat, rgbc_flat,
                           None, wp_l, hp_l, tp_l)

    r0 = run(base)
    r1 = run(base._replace(bf16_epilogue=True))
    np.testing.assert_allclose(np.asarray(r1['rgb']), np.asarray(r0['rgb']),
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(r1['alpha']),
                               np.asarray(r0['alpha']),
                               rtol=0.05, atol=0.05)

    def loss(spec, wp_l, hp_l, tp_l):
        out = run(spec)
        return jnp.mean(out['rgb'] ** 2) + jnp.mean(out['alpha'] ** 2)

    g0 = jax.grad(lambda *a: loss(base, *a), argnums=(0, 1, 2))(
        wp_l, hp_l, tp_l)
    g1 = jax.grad(
        lambda *a: loss(base._replace(bf16_epilogue=True), *a),
        argnums=(0, 1, 2))(wp_l, hp_l, tp_l)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(a).max(), 1e-6)
        assert np.abs(b - a).max() < 0.08 * scale + 1e-6
