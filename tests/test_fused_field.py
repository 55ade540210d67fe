"""Fused field kernel (posenc+MLP) vs the jnp reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypernerf_tpu.models.modules import MLP
from hypernerf_tpu.ops.pallas.fused_field import (FusedFieldSpec,
                                                  fused_field_mlp,
                                                  mlp_params_to_list)
from hypernerf_tpu.ops.posenc import posenc_orig


def _reference(params, mlp, pts, embed, n_freq):
    feat = jnp.concatenate([posenc_orig(pts, n_freq), embed], -1)
    return mlp.apply({'params': params}, feat)


def _setup(n_freq=4, depth=3, width=16, out_ch=3, skips=(1,), embed_ch=8,
           seed=0):
    mlp = MLP(out_ch=out_ch, depth=depth, width=width, skips=skips)
    rs = np.random.RandomState(seed)
    P = 40
    pts = jnp.asarray(rs.randn(P, 3).astype(np.float32) * 0.5)
    embed = jnp.asarray(rs.randn(P, embed_ch).astype(np.float32) * 0.1)
    feat = jnp.concatenate([posenc_orig(pts, n_freq), embed], -1)
    params = mlp.init(jax.random.PRNGKey(0), feat)['params']
    spec = FusedFieldSpec(segments=((3, n_freq), (embed_ch, 0)),
                          depth=depth, width=width, out_ch=out_ch,
                          skips=skips, tile=8, interpret=True,
                          compute_dtype='float32')
    return mlp, spec, params, pts, embed


def test_fused_field_forward_matches_reference():
    mlp, spec, params, pts, embed = _setup()
    ref = _reference(params, mlp, pts, embed, 4)
    got = fused_field_mlp(spec, jnp.concatenate([pts, embed], -1),
                          mlp_params_to_list(params))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_fused_field_skip_at_last_layer():
    mlp, spec, params, pts, embed = _setup(depth=3, skips=(2,))
    ref = _reference(params, mlp, pts, embed, 4)
    got = fused_field_mlp(spec, jnp.concatenate([pts, embed], -1),
                          mlp_params_to_list(params))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_fused_field_backward_matches_reference():
    mlp, spec, params, pts, embed = _setup()
    pairs = mlp_params_to_list(params)
    tgt = jnp.asarray(np.random.RandomState(3).randn(40, 3).astype(np.float32))

    def loss_fused(pairs, pts, embed):
        out = fused_field_mlp(spec, jnp.concatenate([pts, embed], -1), pairs)
        return jnp.mean((out - tgt) ** 2)

    def loss_ref(params, pts, embed):
        return jnp.mean((_reference(params, mlp, pts, embed, 4) - tgt) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(pairs, pts, embed)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(params, pts, embed)

    # dW/db
    depth = spec.depth
    for i in range(depth):
        np.testing.assert_allclose(
            np.asarray(gf[0][i][0]),
            np.asarray(gr[0][f'hidden_{i}']['kernel']),
            rtol=1e-3, atol=1e-6, err_msg=f'hidden_{i} kernel')
        np.testing.assert_allclose(
            np.asarray(gf[0][i][1]),
            np.asarray(gr[0][f'hidden_{i}']['bias']),
            rtol=1e-3, atol=1e-6, err_msg=f'hidden_{i} bias')
    np.testing.assert_allclose(np.asarray(gf[0][depth][0]),
                               np.asarray(gr[0]['logit']['kernel']),
                               rtol=1e-3, atol=1e-6)
    # d points (through the in-kernel posenc VJP) and d embed.
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gr[1]),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gf[2]), np.asarray(gr[2]),
                               rtol=1e-3, atol=1e-5)


def test_fused_field_translation_shapes():
    """TranslationField dims: posenc(3,10)+embed(8) -> 6x128 -> 3."""
    mlp = MLP(out_ch=3, depth=6, width=128, skips=(4,))
    rs = np.random.RandomState(1)
    pts = jnp.asarray(rs.randn(24, 3).astype(np.float32))
    embed = jnp.asarray(rs.randn(24, 8).astype(np.float32))
    feat = jnp.concatenate([posenc_orig(pts, 10), embed], -1)
    params = mlp.init(jax.random.PRNGKey(0), feat)['params']
    spec = FusedFieldSpec(segments=((3, 10), (8, 0)), depth=6, width=128,
                          out_ch=3, skips=(4,), tile=8, interpret=True,
                          compute_dtype='float32')
    ref = mlp.apply({'params': params}, feat)
    got = fused_field_mlp(spec, jnp.concatenate([pts, embed], -1),
                          mlp_params_to_list(params))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_se3_matches_reference():
    """Fused SE(3) trunk (posenc + trunk + w/v heads) vs the dense field."""
    import jax.numpy as jnp
    from hypernerf_tpu.models.warping import SE3Field
    from hypernerf_tpu.ops.pallas.fused_se3 import (FusedSE3Spec,
                                                    fused_se3_wv,
                                                    se3_params_to_list)
    from hypernerf_tpu.ops import rigid_body

    field = SE3Field(trunk_depth=2, trunk_width=16, min_deg=0, max_deg=4,
                     skips=(1,))
    rs = np.random.RandomState(0)
    pts = jnp.asarray(rs.randn(5, 6, 3).astype(np.float32) * 0.4)
    embed = jnp.asarray(rs.randn(5, 6, 8).astype(np.float32) * 0.3)
    params = field.init(jax.random.PRNGKey(0), pts, embed)['params']
    ref = field.apply({'params': params}, pts, embed)['warped_points']

    spec = FusedSE3Spec(embed_ch=8, min_deg=0, max_deg=4, depth=2, width=16,
                        skips=(1,), tile=8, interpret=True,
                        compute_dtype='float32')
    w, v = fused_se3_wv(spec, pts.reshape(-1, 3), embed.reshape(-1, 8),
                        se3_params_to_list(params))
    transform = rigid_body.exp_se3_from_wv(w, v)
    got = rigid_body.transform_points(
        transform, pts.reshape(-1, 3)).reshape(5, 6, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_fused_se3_backward_matches_reference():
    import jax.numpy as jnp
    from hypernerf_tpu.models.warping import SE3Field
    from hypernerf_tpu.ops.pallas.fused_se3 import (FusedSE3Spec,
                                                    fused_se3_wv,
                                                    se3_params_to_list)
    from hypernerf_tpu.ops import rigid_body

    field = SE3Field(trunk_depth=2, trunk_width=16, min_deg=0, max_deg=4,
                     skips=(1,))
    rs = np.random.RandomState(1)
    pts = jnp.asarray(rs.randn(24, 3).astype(np.float32) * 0.4)
    embed = jnp.asarray(rs.randn(24, 8).astype(np.float32) * 0.3)
    params = field.init(jax.random.PRNGKey(0), pts[None], embed[None])['params']
    spec = FusedSE3Spec(embed_ch=8, min_deg=0, max_deg=4, depth=2, width=16,
                        skips=(1,), tile=8, interpret=True,
                        compute_dtype='float32')
    pairs = se3_params_to_list(params)
    tgt = jnp.asarray(rs.randn(24, 3).astype(np.float32))

    def loss_fused(pairs, pts):
        w, v = fused_se3_wv(spec, pts, embed, pairs)
        warped = rigid_body.transform_points(
            rigid_body.exp_se3_from_wv(w, v), pts)
        return jnp.mean((warped - tgt) ** 2)

    def loss_ref(params, pts):
        warped = field.apply({'params': params}, pts[None],
                             embed[None])['warped_points'][0]
        return jnp.mean((warped - tgt) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1))(pairs, pts)
    gr = jax.grad(loss_ref, argnums=(0, 1))(params, pts)
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gr[1]),
                               rtol=1e-3, atol=1e-5)
    # Spot-check a trunk kernel grad and both heads.
    np.testing.assert_allclose(
        np.asarray(gf[0][0][0]),
        np.asarray(gr[0]['trunk']['hidden_0']['kernel']),
        rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(gf[0][-2][0]),
        np.asarray(gr[0]['w_net']['logit']['kernel']),
        rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(gf[0][-1][0]),
        np.asarray(gr[0]['v_net']['logit']['kernel']),
        rtol=1e-3, atol=1e-6)
