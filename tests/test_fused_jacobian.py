"""Fused warp-Jacobian kernel vs the dense batched-VJP path (interpret).

The dense reference is models/warping.py ``_warp_jacobian`` over the
TranslationField's jnp path — the elastic side channel's previous
implementation (and still the fallback for SE(3)/quaternion warps).
"""

import jax
import jax.numpy as jnp
import numpy as np

from hypernerf_tpu.models.warping import TranslationField, _warp_jacobian
from hypernerf_tpu.ops.pallas.fused_field import (FusedFieldSpec,
                                                  mlp_params_to_list)
from hypernerf_tpu.ops.pallas.fused_jacobian import fused_warp_jacobian

B, S, E = 3, 8, 8
SPEC = FusedFieldSpec(segments=((3, 4), (E, 0)), depth=3, width=16,
                      out_ch=3, skips=(1,), tile=8, interpret=True,
                      compute_dtype='float32')


def _setup(seed=0):
    rs = np.random.RandomState(seed)
    pts = jnp.asarray(rs.randn(B, S, 3).astype(np.float32) * 0.4)
    embed = jnp.asarray(rs.randn(B, S, E).astype(np.float32) * 0.2)
    warp = TranslationField(depth=3, width=16, n_freq=4, skips=(1,))
    wp = warp.init(jax.random.PRNGKey(0), pts, embed)['params']
    return pts, embed, warp, wp


def _dense_jac(warp, wp, pts, embed):
    return _warp_jacobian(
        lambda p: warp.apply({'params': wp}, p, embed,
                             method=warp.warp, allow_pallas=False), pts)


def test_fused_jacobian_forward_matches_dense():
    pts, embed, warp, wp = _setup()
    ref = _dense_jac(warp, wp, pts, embed)
    got = fused_warp_jacobian(SPEC, pts, embed,
                              mlp_params_to_list(wp['mlp']))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_fused_jacobian_row_padding():
    """Point counts that are not a tile multiple are padded and sliced."""
    pts, embed, warp, wp = _setup(seed=3)
    pts5 = pts.reshape(-1, 3)[:5]
    emb5 = embed.reshape(-1, E)[:5]
    ref = _dense_jac(warp, wp, pts5, emb5)
    got = fused_warp_jacobian(SPEC, pts5, emb5,
                              mlp_params_to_list(wp['mlp']))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_fused_jacobian_grads_match_dense():
    """d(loss(J))/d(params, points) matches autodiff through the dense
    path; d(embed) is zero on both (relu masks carry no gradient a.e.)."""
    pts, embed, warp, wp = _setup(seed=7)
    tgt = jnp.asarray(np.random.RandomState(5).randn(B, S, 3, 3), jnp.float32)

    def loss_dense(wp, pts, embed):
        j = _dense_jac(warp, wp, pts, embed)
        return jnp.mean((j - tgt) ** 2) + jnp.mean(jnp.abs(j))

    def loss_fused(wp, pts, embed):
        j = fused_warp_jacobian(SPEC, pts, embed,
                                mlp_params_to_list(wp['mlp']))
        return jnp.mean((j - tgt) ** 2) + jnp.mean(jnp.abs(j))

    g_ref = jax.grad(loss_dense, argnums=(0, 1, 2))(wp, pts, embed)
    g_got = jax.grad(loss_fused, argnums=(0, 1, 2))(wp, pts, embed)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-6)
    # The embed gradient is exactly zero through the Jacobian.
    np.testing.assert_array_equal(np.asarray(g_got[2]),
                                  np.zeros_like(g_got[2]))
