"""Fused SE(3)/quaternion warp-Jacobian vs the dense batched-VJP path.

The dense reference is models/warping.py ``_warp_jacobian`` over the
SE3Field/QuaternionField jnp path — the elastic side channel's previous
implementation for the screw-family warps. Unlike the translation kernel
(tests/test_fused_jacobian.py), d(embed) is NONZERO here (the retraction
consumes the primal w, v) and must match autodiff of the dense path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypernerf_tpu.models.warping import (QuaternionField, SE3Field,
                                          _warp_jacobian)
from hypernerf_tpu.ops.pallas.fused_field import encoding_scales
from hypernerf_tpu.ops.pallas.fused_se3 import (FusedSE3Spec,
                                                se3_params_to_list)
from hypernerf_tpu.ops.pallas.fused_se3_jacobian import (
    fused_se3_warp_jacobian)

B, S, E = 3, 8, 8
SPEC = FusedSE3Spec(embed_ch=E, use_metadata=True, min_deg=0, max_deg=4,
                    depth=3, width=16, skips=(1,), tile=8, interpret=True,
                    compute_dtype='float32')


def _setup(cls, seed=0):
    rs = np.random.RandomState(seed)
    pts = jnp.asarray(rs.randn(B, S, 3).astype(np.float32) * 0.4)
    embed = jnp.asarray(rs.randn(B, S, E).astype(np.float32) * 0.2)
    field = cls(trunk_depth=3, trunk_width=16, min_deg=0, max_deg=4,
                skips=(1,))
    wp = field.init(jax.random.PRNGKey(0), pts, embed)['params']
    return pts, embed, field, wp


def _dense_jac(field, wp, pts, embed, extra_params=None):
    return _warp_jacobian(
        lambda p: field.apply({'params': wp}, p, embed, extra_params,
                              method=field.warp, allow_pallas=False), pts)


def _fused_jac(field, wp, pts, embed, alpha=None, bwd_tile=None):
    spec = SPEC._replace(windowed=alpha is not None, bwd_tile=bwd_tile)
    scales = (encoding_scales(spec.enc_segments, [alpha, None])
              if alpha is not None else None)
    return fused_se3_warp_jacobian(
        spec, pts, embed, se3_params_to_list(wp), field._retract,
        enc_scales=scales)


@pytest.mark.parametrize('cls', [SE3Field, QuaternionField])
def test_fused_se3_jacobian_forward_matches_dense(cls):
    pts, embed, field, wp = _setup(cls)
    ref = _dense_jac(field, wp, pts, embed)
    got = _fused_jac(field, wp, pts, embed)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_fused_se3_jacobian_row_padding():
    """Point counts that are not a tile multiple are padded and sliced."""
    pts, embed, field, wp = _setup(SE3Field, seed=3)
    pts5 = pts.reshape(-1, 3)[:5]
    emb5 = embed.reshape(-1, E)[:5]
    ref = _dense_jac(field, wp, pts5, emb5)
    got = _fused_jac(field, wp, pts5, emb5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_fused_se3_jacobian_windowed():
    """The warp_alpha annealing window scales the tangents identically to
    the dense annealed posenc (mid-anneal: alpha inside the band range)."""
    pts, embed, field, wp = _setup(SE3Field, seed=11)
    alpha = 2.3
    ref = _dense_jac(field, wp, pts, embed,
                     extra_params={'warp_alpha': alpha})
    got = _fused_jac(field, wp, pts, embed, alpha=alpha)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize('cls', [SE3Field, QuaternionField])
@pytest.mark.parametrize('bwd_tile', [None, 4])
def test_fused_se3_jacobian_grads_match_dense(cls, bwd_tile):
    """d(loss(J))/d(params, points, embed) matches autodiff through the
    dense path — d(embed) is nonzero here (the retraction JVP consumes
    the primal w, v) and must route through the primal pullback stream.

    bwd_tile=4 != tile=8 covers the cotangent regrouping from per-FWD-tile
    to per-BWD-tile row layout (the production config runs 512/256)."""
    pts, embed, field, wp = _setup(cls, seed=7)
    tgt = jnp.asarray(np.random.RandomState(5).randn(B, S, 3, 3),
                      jnp.float32)

    def loss_dense(wp, pts, embed):
        j = _dense_jac(field, wp, pts, embed)
        return jnp.mean((j - tgt) ** 2) + jnp.mean(jnp.abs(j))

    def loss_fused(wp, pts, embed):
        j = _fused_jac(field, wp, pts, embed, bwd_tile=bwd_tile)
        return jnp.mean((j - tgt) ** 2) + jnp.mean(jnp.abs(j))

    g_ref = jax.grad(loss_dense, argnums=(0, 1, 2))(wp, pts, embed)
    g_got = jax.grad(loss_fused, argnums=(0, 1, 2))(wp, pts, embed)
    # The embed gradient must be genuinely nonzero (else the test is
    # vacuous for the primal pullback stream).
    assert float(jnp.max(jnp.abs(g_ref[2]))) > 1e-8
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-6)
