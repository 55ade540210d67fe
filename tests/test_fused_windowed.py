"""Windowed (Nerfies annealing) in-kernel encoding vs the jnp reference.

The fused kernels take a per-feature scale row built from the annealing
alphas (fused_field.encoding_scales) so the coarse-to-fine annealed models
run the same fused paths as the fully-on ones. These tests check forward AND
exact-gradient parity against the jnp posenc (ops/posenc.py) + module
composition, in interpret mode at fp32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypernerf_tpu.models.modules import MLP, HyperSheetMLP, NerfMLP
from hypernerf_tpu.models.warping import TranslationField
from hypernerf_tpu.ops.pallas.fused_field import (FusedFieldSpec,
                                                  encoding_scales,
                                                  fused_field_mlp,
                                                  mlp_params_to_list,
                                                  norm_seg, seg_enc_ch)
from hypernerf_tpu.ops.pallas.fused_level import FusedLevelSpec, fused_level
from hypernerf_tpu.ops.pallas.fused_mlp import (FusedMLPSpec, fused_nerf_mlp,
                                                nerf_mlp_params_to_list)
from hypernerf_tpu.ops.posenc import posenc, posenc_orig


def _tree_allclose(got, ref, rtol=1e-4, atol=1e-5, msg=''):
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=rtol, atol=atol,
            err_msg=msg), got, ref)


# ------------------------------------------------------------- fused_field

def test_encoding_scales_layout():
    segs = ((2, 3, 1, True), (4, 0))
    sc = np.asarray(encoding_scales(segs, [jnp.float32(1.5), None]))
    assert sc.shape == (1, 128)
    # identity part = 1
    np.testing.assert_allclose(sc[0, :2], 1.0)
    # window for bands min_deg..min_deg+3 with alpha=1.5:
    from hypernerf_tpu.ops.posenc import posenc_window
    w = np.asarray(posenc_window(1, 4, jnp.float32(1.5)))
    np.testing.assert_allclose(sc[0, 2:8], np.repeat(w, 2), rtol=1e-6)
    np.testing.assert_allclose(sc[0, 8:14], np.repeat(w, 2), rtol=1e-6)
    # raw segment = 1, padding = 0
    np.testing.assert_allclose(sc[0, 14:18], 1.0)
    np.testing.assert_allclose(sc[0, 18:], 0.0)


@pytest.mark.parametrize('use_identity', [True, False])
def test_fused_field_windowed_matches_nerfies(use_identity):
    min_deg, max_deg, E = 1, 5, 8
    n_freq = max_deg - min_deg
    mlp = MLP(out_ch=3, depth=3, width=16, skips=(1,))
    rs = np.random.RandomState(0)
    P = 40
    pts = jnp.asarray(rs.randn(P, 3).astype(np.float32) * 0.5)
    embed = jnp.asarray(rs.randn(P, E).astype(np.float32) * 0.1)
    alpha = jnp.float32(2.3)

    def ref_fn(params, pts, embed):
        feat = posenc(pts, min_deg, max_deg, use_identity=use_identity,
                      alpha=alpha)
        return mlp.apply({'params': params},
                         jnp.concatenate([feat, embed], -1))

    feat = posenc(pts, min_deg, max_deg, use_identity=use_identity,
                  alpha=alpha)
    params = mlp.init(jax.random.PRNGKey(0),
                      jnp.concatenate([feat, embed], -1))['params']
    segs = ((3, n_freq, min_deg, use_identity), (E, 0))
    spec = FusedFieldSpec(segments=segs, depth=3, width=16, out_ch=3,
                          skips=(1,), tile=8, interpret=True,
                          compute_dtype='float32', windowed=True)
    scales = encoding_scales(segs, [alpha, None])

    def fused_fn(pairs, pts, embed):
        return fused_field_mlp(spec, jnp.concatenate([pts, embed], -1),
                               pairs, enc_scales=scales)

    pairs = mlp_params_to_list(params)
    _tree_allclose(fused_fn(pairs, pts, embed), ref_fn(params, pts, embed))

    tgt = jnp.asarray(rs.randn(P, 3).astype(np.float32))
    gf = jax.grad(lambda pr, p, e: jnp.mean((fused_fn(pr, p, e) - tgt) ** 2),
                  argnums=(1, 2))(pairs, pts, embed)
    gr = jax.grad(lambda pr, p, e: jnp.mean((ref_fn(pr, p, e) - tgt) ** 2),
                  argnums=(1, 2))(params, pts, embed)
    _tree_allclose(gf, gr, msg='input grads')
    # Weight grads: first hidden layer (touches the windowed encoding).
    gfw = jax.grad(lambda pr: jnp.mean((fused_fn(pr, pts, embed) - tgt) ** 2)
                   )(pairs)
    grw = jax.grad(lambda pr: jnp.mean((ref_fn(pr, pts, embed) - tgt) ** 2)
                   )(params)
    _tree_allclose(gfw[0][0], grw['hidden_0']['kernel'], msg='dW0')


def test_fused_field_window_actually_gates_bands():
    """alpha=0 zeroes every band: output must equal the same MLP fed only
    identity features (sin/cos features zero)."""
    E = 4
    segs = ((3, 4, 0, True), (E, 0))
    mlp = MLP(out_ch=2, depth=2, width=16, skips=(1,))
    rs = np.random.RandomState(1)
    pts = jnp.asarray(rs.randn(16, 3).astype(np.float32))
    embed = jnp.asarray(rs.randn(16, E).astype(np.float32))
    feat0 = posenc(pts, 0, 4, use_identity=True, alpha=jnp.float32(0.0))
    params = mlp.init(jax.random.PRNGKey(0),
                      jnp.concatenate([feat0, embed], -1))['params']
    spec = FusedFieldSpec(segments=segs, depth=2, width=16, out_ch=2,
                          skips=(1,), tile=8, interpret=True,
                          compute_dtype='float32', windowed=True)
    got = fused_field_mlp(spec, jnp.concatenate([pts, embed], -1),
                          mlp_params_to_list(params),
                          enc_scales=encoding_scales(
                              segs, [jnp.float32(0.0), None]))
    ref = mlp.apply({'params': params},
                    jnp.concatenate([feat0, embed], -1))
    _tree_allclose(got, ref)
    # And it differs from the fully-on encoding.
    on = fused_field_mlp(spec, jnp.concatenate([pts, embed], -1),
                         mlp_params_to_list(params),
                         enc_scales=encoding_scales(segs, [None, None]))
    assert np.abs(np.asarray(on) - np.asarray(got)).max() > 1e-4


# --------------------------------------------------------------- fused_mlp

def test_fused_mlp_nerfies_windowed_matches_reference():
    """In-kernel Nerfies encoding (windowed) for the template kernel."""
    s_min, s_max, h_min, h_max, H = 0, 4, 0, 2, 4
    nerf_alpha, hyper_alpha = jnp.float32(2.5), jnp.float32(1.2)
    tmpl = NerfMLP(trunk_depth=3, trunk_width=32, rgb_branch_depth=2,
                   rgb_branch_width=16, skips=(1,))
    rs = np.random.RandomState(2)
    P = 24
    pts = jnp.asarray(rs.randn(P, 3).astype(np.float32) * 0.4)
    hyper = jnp.asarray(rs.randn(P, H).astype(np.float32) * 0.2)
    rgbc = jnp.asarray(rs.randn(P, 11).astype(np.float32))

    def enc(pts, hyper):
        return jnp.concatenate([
            posenc(pts, s_min, s_max, use_identity=True, alpha=nerf_alpha),
            posenc(hyper, h_min, h_max, use_identity=False,
                   alpha=hyper_alpha)], -1)

    feat = enc(pts, hyper)[:, None, :]
    params = tmpl.init(jax.random.PRNGKey(0), feat,
                       rgb_condition=rgbc)['params']
    segs = ((3, s_max - s_min, s_min, True), (H, h_max - h_min, h_min, False))
    in_ch = sum(seg_enc_ch(s) for s in segs)
    spec = FusedMLPSpec(in_ch=in_ch, trunk_depth=3, trunk_width=32,
                        rgb_depth=2, rgb_width=16, skips=(1,),
                        rgb_cond_ch=11, tile=8, interpret=True,
                        compute_dtype='float32', enc_segments=segs,
                        windowed=True)
    scales = encoding_scales(segs, [nerf_alpha, hyper_alpha])
    pairs = nerf_mlp_params_to_list(params)

    def fused_fn(pairs, pts, hyper, rgbc):
        return fused_nerf_mlp(spec, jnp.concatenate([pts, hyper], -1),
                              rgbc, None, pairs, enc_scales=scales)

    def ref_fn(params, pts, hyper, rgbc):
        out = tmpl.apply({'params': params}, enc(pts, hyper)[:, None, :],
                         rgb_condition=rgbc)
        return {'rgb': out['rgb'][:, 0], 'alpha': out['alpha'][:, 0]}

    _tree_allclose(fused_fn(pairs, pts, hyper, rgbc),
                   ref_fn(params, pts, hyper, rgbc))

    tgt = jnp.asarray(rs.randn(P, 3).astype(np.float32))

    def loss_f(pairs, pts, hyper):
        o = fused_fn(pairs, pts, hyper, rgbc)
        return jnp.mean((o['rgb'] - tgt) ** 2) + jnp.mean(o['alpha'] ** 2)

    def loss_r(params, pts, hyper):
        o = ref_fn(params, pts, hyper, rgbc)
        return jnp.mean((o['rgb'] - tgt) ** 2) + jnp.mean(o['alpha'] ** 2)

    gf = jax.grad(loss_f, argnums=(1, 2))(pairs, pts, hyper)
    gr = jax.grad(loss_r, argnums=(1, 2))(params, pts, hyper)
    _tree_allclose(gf, gr, msg='d(pts, hyper)')


# ------------------------------------------------------------- fused_level

def test_fused_level_nerfies_windowed_matches_composition():
    """The full anneal-mode level (translation warp + bendy sheet + windowed
    Nerfies template encoding) in one kernel."""
    B, S, E, H = 3, 8, 8, 4
    nerf_alpha, hyper_alpha = jnp.float32(3.0), jnp.float32(0.7)
    spec = FusedLevelSpec(
        embed_ch=E,
        warp_depth=2, warp_width=16, warp_freq=4,
        hyper_depth=2, hyper_width=16, hyper_sheet_freq=3, hyper_out=H,
        use_original_embed=False,
        spatial_min_deg=0, spatial_max_deg=4,
        hyper_min_deg=0, hyper_max_deg=2,
        trunk_depth=3, trunk_width=32, rgb_depth=2, rgb_width=16,
        rgb_cond_ch=11, alpha_cond_ch=0, skips=(1,),
        tile=8, bwd_tile=8, tmpl_bwd_tile=8, interpret=True,
        compute_dtype='float32')

    rs = np.random.RandomState(3)
    pts = jnp.asarray(rs.randn(B, S, 3).astype(np.float32) * 0.4)
    embed = jnp.asarray(rs.randn(B, E).astype(np.float32) * 0.2)
    rgbc = jnp.asarray(rs.randn(B, 11).astype(np.float32))

    warp = TranslationField(depth=2, width=16, n_freq=4, skips=(1,))
    hyper_m = HyperSheetMLP(out_ch=H, depth=2, width=16, n_freq=3, skips=(1,))
    tmpl = NerfMLP(trunk_depth=3, trunk_width=32, rgb_branch_depth=2,
                   rgb_branch_width=16, skips=(1,))

    embed_b = jnp.broadcast_to(embed[:, None, :], (B, S, E))
    wp = warp.init(jax.random.PRNGKey(0), pts, embed_b)['params']
    hp = hyper_m.init(jax.random.PRNGKey(1), pts, embed_b)['params']

    def enc(warped, hyper_pts):
        return jnp.concatenate([
            posenc(warped, 0, 4, use_identity=True, alpha=nerf_alpha),
            posenc(hyper_pts, 0, 2, use_identity=False,
                   alpha=hyper_alpha)], -1)

    feat = enc(pts, jnp.zeros((B, S, H)))
    tp = tmpl.init(jax.random.PRNGKey(2), feat, rgb_condition=rgbc)['params']

    def ref_fn(wp, hp, tp, pts):
        warped = warp.apply({'params': wp}, pts, embed_b)['warped_points']
        hyper_pts = hyper_m.apply({'params': hp}, pts, embed_b)
        out = tmpl.apply({'params': tp}, enc(warped, hyper_pts),
                         rgb_condition=rgbc)
        return out['rgb'], out['alpha']

    scales = encoding_scales(spec.tmpl_enc_segments,
                             [nerf_alpha, hyper_alpha])

    def fused_fn(wp, hp, tp, pts):
        out = fused_level(
            spec, pts.reshape(-1, 3),
            embed_b.reshape(-1, E),
            jnp.broadcast_to(rgbc[:, None, :], (B, S, 11)).reshape(-1, 11),
            None, mlp_params_to_list(wp['mlp']),
            mlp_params_to_list(hp['mlp']), nerf_mlp_params_to_list(tp),
            tmpl_enc_scales=scales)
        return (out['rgb'].reshape(B, S, 3), out['alpha'].reshape(B, S, 1))

    _tree_allclose(fused_fn(wp, hp, tp, pts), ref_fn(wp, hp, tp, pts))

    tgt = jnp.asarray(rs.randn(B, S, 3).astype(np.float32))

    def loss(fn, a, b, c, pts):
        rgb, alpha = fn(a, b, c, pts)
        return jnp.mean((rgb - tgt) ** 2) + jnp.mean(alpha ** 2)

    gf = jax.grad(lambda *a: loss(fused_fn, *a), argnums=(0, 1, 2, 3))(
        wp, hp, tp, pts)
    gr = jax.grad(lambda *a: loss(ref_fn, *a), argnums=(0, 1, 2, 3))(
        wp, hp, tp, pts)
    # Points gradient flows through warp + hyper + windowed template enc.
    _tree_allclose(gf[3], gr[3], msg='d pts')
    # Weight grads for all three nets.
    _tree_allclose(gf[0], gr[0], msg='d warp')
    _tree_allclose(gf[1], gr[1], msg='d hyper')
    _tree_allclose(gf[2], gr[2], msg='d template')


# --------------------------------------------------------------- fused_se3

def test_fused_se3_windowed_matches_reference():
    from hypernerf_tpu.models.warping import SE3Field
    from hypernerf_tpu.ops.pallas.fused_se3 import (FusedSE3Spec,
                                                    fused_se3_wv,
                                                    se3_params_to_list)
    E = 8
    alpha = jnp.float32(1.7)
    field = SE3Field(trunk_depth=2, trunk_width=16, min_deg=0, max_deg=4,
                     skips=(1,), use_pallas=False)
    rs = np.random.RandomState(4)
    P = 24
    pts = jnp.asarray(rs.randn(P, 3).astype(np.float32) * 0.4)
    embed = jnp.asarray(rs.randn(P, E).astype(np.float32) * 0.2)
    params = field.init(jax.random.PRNGKey(0), pts, embed)['params']

    spec = FusedSE3Spec(embed_ch=E, use_metadata=True, min_deg=0, max_deg=4,
                        depth=2, width=16, skips=(1,), tile=8,
                        interpret=True, compute_dtype='float32',
                        windowed=True)
    scales = encoding_scales(spec.enc_segments, [alpha, None])
    w, v = fused_se3_wv(spec, pts, embed, se3_params_to_list(params),
                        enc_scales=scales)

    # jnp reference: the module's dense path with warp_alpha set.
    feat = posenc(pts, 0, 4, use_identity=False, alpha=alpha)
    inputs = jnp.concatenate([feat, embed], -1)
    trunk = MLP(out_ch=16, depth=2, width=16,
                skips=(1,)).apply({'params': params['trunk']}, inputs)
    ref_w = MLP(out_ch=3, depth=0,
                width=16).apply({'params': params['w_net']}, trunk)
    ref_v = MLP(out_ch=3, depth=0,
                width=16).apply({'params': params['v_net']}, trunk)
    _tree_allclose(w, ref_w)
    _tree_allclose(v, ref_v)

    # End-to-end: SE3Field.warp with alpha on CPU (dense) vs manual compose.
    out = field.apply({'params': params}, pts, embed,
                      {'warp_alpha': alpha})['warped_points']
    from hypernerf_tpu.ops import rigid_body
    ref_warped = rigid_body.transform_points(
        rigid_body.exp_se3_from_wv(ref_w, ref_v), pts)
    _tree_allclose(out, ref_warped)


# ------------------------------------------------------- fused_level (se3)

@pytest.mark.parametrize('bwd_mode', ['split', 'one', 'pipelined'])
def test_fused_level_se3_matches_composition(bwd_mode):
    """SE(3) warp (trunk + heads + in-kernel screw exponential) + hyper
    sheet + windowed Nerfies template, all fused; forward + exact grads."""
    from hypernerf_tpu.models.warping import SE3Field
    from hypernerf_tpu.ops.pallas.fused_se3 import se3_params_to_list

    B, S, E, H = 3, 8, 8, 4
    split_bwd = bwd_mode == 'split'
    nerf_alpha, hyper_alpha = jnp.float32(3.0), jnp.float32(0.7)
    warp_alpha = jnp.float32(1.4)
    spec = FusedLevelSpec(
        pipelined_bwd=bwd_mode == 'pipelined',
        embed_ch=E,
        warp_type='se3', warp_depth=2, warp_width=16,
        se3_min_deg=0, se3_max_deg=4, warp_windowed=True,
        hyper_depth=2, hyper_width=16, hyper_sheet_freq=3, hyper_out=H,
        use_original_embed=False,
        spatial_min_deg=0, spatial_max_deg=4,
        hyper_min_deg=0, hyper_max_deg=2,
        trunk_depth=3, trunk_width=32, rgb_depth=2, rgb_width=16,
        rgb_cond_ch=11, alpha_cond_ch=0, skips=(1,),
        tile=8, bwd_tile=8, tmpl_bwd_tile=8, interpret=True,
        compute_dtype='float32', split_bwd=split_bwd)

    rs = np.random.RandomState(5)
    pts = jnp.asarray(rs.randn(B, S, 3).astype(np.float32) * 0.4)
    embed = jnp.asarray(rs.randn(B, E).astype(np.float32) * 0.2)
    rgbc = jnp.asarray(rs.randn(B, 11).astype(np.float32))

    warp = SE3Field(trunk_depth=2, trunk_width=16, min_deg=0, max_deg=4,
                    skips=(1,), use_pallas=False)
    hyper_m = HyperSheetMLP(out_ch=H, depth=2, width=16, n_freq=3, skips=(1,))
    tmpl = NerfMLP(trunk_depth=3, trunk_width=32, rgb_branch_depth=2,
                   rgb_branch_width=16, skips=(1,))

    embed_b = jnp.broadcast_to(embed[:, None, :], (B, S, E))
    wp = warp.init(jax.random.PRNGKey(0), pts, embed_b)['params']
    hp = hyper_m.init(jax.random.PRNGKey(1), pts, embed_b)['params']

    def enc(warped, hyper_pts):
        return jnp.concatenate([
            posenc(warped, 0, 4, use_identity=True, alpha=nerf_alpha),
            posenc(hyper_pts, 0, 2, use_identity=False,
                   alpha=hyper_alpha)], -1)

    feat = enc(pts, jnp.zeros((B, S, H)))
    tp = tmpl.init(jax.random.PRNGKey(2), feat, rgb_condition=rgbc)['params']

    def ref_fn(wp, hp, tp, pts):
        warped = warp.apply({'params': wp}, pts, embed_b,
                            {'warp_alpha': warp_alpha})['warped_points']
        hyper_pts = hyper_m.apply({'params': hp}, pts, embed_b)
        out = tmpl.apply({'params': tp}, enc(warped, hyper_pts),
                         rgb_condition=rgbc)
        return out['rgb'], out['alpha']

    tmpl_scales = encoding_scales(spec.tmpl_enc_segments,
                                  [nerf_alpha, hyper_alpha])
    warp_scales = encoding_scales(spec.warp_fs.enc_segments,
                                  [warp_alpha, None])

    def fused_fn(wp, hp, tp, pts):
        out = fused_level(
            spec, pts.reshape(-1, 3),
            embed_b.reshape(-1, E),
            jnp.broadcast_to(rgbc[:, None, :], (B, S, 11)).reshape(-1, 11),
            None, se3_params_to_list(wp),
            mlp_params_to_list(hp['mlp']), nerf_mlp_params_to_list(tp),
            tmpl_enc_scales=tmpl_scales, warp_enc_scales=warp_scales)
        return (out['rgb'].reshape(B, S, 3), out['alpha'].reshape(B, S, 1))

    _tree_allclose(fused_fn(wp, hp, tp, pts), ref_fn(wp, hp, tp, pts))

    tgt = jnp.asarray(rs.randn(B, S, 3).astype(np.float32))

    def loss(fn, a, b, c, pts):
        rgb, alpha = fn(a, b, c, pts)
        return jnp.mean((rgb - tgt) ** 2) + jnp.mean(alpha ** 2)

    gf = jax.grad(lambda *a: loss(fused_fn, *a), argnums=(0, 1, 2, 3))(
        wp, hp, tp, pts)
    gr = jax.grad(lambda *a: loss(ref_fn, *a), argnums=(0, 1, 2, 3))(
        wp, hp, tp, pts)
    _tree_allclose(gf[3], gr[3], msg='d pts')
    _tree_allclose(gf[0], gr[0], msg='d se3 warp')
    _tree_allclose(gf[1], gr[1], msg='d hyper')
    _tree_allclose(gf[2], gr[2], msg='d template')
