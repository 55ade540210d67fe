"""Unit tests for batched SE(3)/SO(3) math (ops/rigid_body.py)."""

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from hypernerf_tpu.ops import rigid_body


def test_skew_batched_cross_product():
    rs = np.random.RandomState(0)
    w = rs.randn(4, 5, 3).astype(np.float32)
    v = rs.randn(4, 5, 3).astype(np.float32)
    W = np.asarray(rigid_body.skew(jnp.asarray(w)))
    assert W.shape == (4, 5, 3, 3)
    got = np.einsum('...ij,...j->...i', W, v)
    np.testing.assert_allclose(got, np.cross(w, v), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(W, -np.swapaxes(W, -1, -2), atol=1e-6)


def test_exp_so3_matches_scipy():
    rs = np.random.RandomState(1)
    axis = rs.randn(6, 3)
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    theta = rs.rand(6) * np.pi
    got = np.asarray(rigid_body.exp_so3(jnp.asarray(axis, jnp.float32),
                                        jnp.asarray(theta, jnp.float32)))
    want = Rotation.from_rotvec(axis * theta[:, None]).as_matrix()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_exp_se3_pure_translation():
    # Rotation axis ~0 handled by exp_se3_from_wv: pure translation by v.
    w = jnp.zeros((3, 3), jnp.float32)
    v = jnp.asarray(np.random.RandomState(2).randn(3, 3), jnp.float32)
    T = np.asarray(rigid_body.exp_se3_from_wv(w, v))
    np.testing.assert_allclose(T[..., :3, :3],
                               np.tile(np.eye(3), (3, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(T[..., :3, 3], np.asarray(v), atol=1e-5)


def test_exp_se3_screw_motion_matches_closed_form():
    # Unit screw: rotate about z by theta while translating along z.
    theta = 0.7
    screw = jnp.asarray([[0, 0, 1, 0, 0, 1.0]], jnp.float32)
    T = np.asarray(rigid_body.exp_se3(screw, jnp.asarray([theta], jnp.float32)))[0]
    want_R = Rotation.from_rotvec([0, 0, theta]).as_matrix()
    np.testing.assert_allclose(T[:3, :3], want_R, rtol=1e-5, atol=1e-6)
    # G(theta) v for this screw gives translation (0, 0, theta).
    np.testing.assert_allclose(T[:3, 3], [0, 0, theta], atol=1e-5)
    np.testing.assert_allclose(T[3], [0, 0, 0, 1], atol=1e-7)


def test_transform_points_roundtrip():
    rs = np.random.RandomState(3)
    w = rs.randn(8, 3).astype(np.float32) * 0.5
    v = rs.randn(8, 3).astype(np.float32)
    pts = rs.randn(8, 3).astype(np.float32)
    T = rigid_body.exp_se3_from_wv(jnp.asarray(w), jnp.asarray(v))
    warped = np.asarray(rigid_body.transform_points(T, jnp.asarray(pts)))
    # Invert: T^-1 @ warped == pts.
    T_np = np.asarray(T)
    back = np.einsum('bij,bj->bi', np.linalg.inv(T_np),
                     np.concatenate([warped, np.ones((8, 1))], -1))[:, :3]
    np.testing.assert_allclose(back, pts, rtol=1e-3, atol=1e-4)


def test_homogenous_helpers():
    v = jnp.asarray([[1.0, 2.0, 3.0]])
    h = rigid_body.to_homogenous(v)
    np.testing.assert_array_equal(np.asarray(h), [[1, 2, 3, 1]])
    np.testing.assert_allclose(
        np.asarray(rigid_body.from_homogenous(h * 2.0)), [[1, 2, 3]])


def test_se3_warp_vec_matches_matrix_path():
    """The vector form (kernel-friendly, no 3x3) equals exp_se3_from_wv +
    transform_points, including the theta->0 branch."""
    import jax.numpy as jnp
    from hypernerf_tpu.ops import rigid_body
    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.randn(50, 3).astype(np.float32) * 0.5)
    v = jnp.asarray(rs.randn(50, 3).astype(np.float32) * 0.3)
    pts = jnp.asarray(rs.randn(50, 3).astype(np.float32))
    # Include near-zero rotations (the init regime).
    w = w.at[:10].set(w[:10] * 1e-8)
    ref = rigid_body.transform_points(rigid_body.exp_se3_from_wv(w, v), pts)
    got = rigid_body.se3_warp_vec(w, v, pts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)

    # Gradients agree too (the kernel backward uses jax.vjp of the vector
    # form).
    import jax
    def loss_vec(w, v, pts):
        return jnp.sum(rigid_body.se3_warp_vec(w, v, pts) ** 2)
    def loss_mat(w, v, pts):
        return jnp.sum(rigid_body.transform_points(
            rigid_body.exp_se3_from_wv(w, v), pts) ** 2)
    gv = jax.grad(loss_vec, argnums=(0, 1, 2))(w, v, pts)
    gm = jax.grad(loss_mat, argnums=(0, 1, 2))(w, v, pts)
    for a, b, name in zip(gv, gm, 'wvp'):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_se3_warp_vec_bwd_matches_autodiff():
    """The hand-derived VJP (used inside the fused level backward kernel)
    equals jax.vjp of se3_warp_vec, including the small-angle branch."""
    import jax
    import jax.numpy as jnp

    from hypernerf_tpu.ops.rigid_body import se3_warp_vec, se3_warp_vec_bwd

    rs = np.random.RandomState(0)
    n = 64
    w = np.concatenate([
        rs.normal(scale=0.7, size=(n - 8, 3)),       # generic angles
        rs.normal(scale=1e-8, size=(4, 3)),          # small-angle branch
        rs.normal(scale=3.0, size=(4, 3)),           # large angles
    ]).astype(np.float32)
    v = rs.normal(scale=0.5, size=(n, 3)).astype(np.float32)
    p = rs.normal(scale=1.0, size=(n, 3)).astype(np.float32)
    g = rs.normal(size=(n, 3)).astype(np.float32)

    _, vjp = jax.vjp(se3_warp_vec, jnp.asarray(w), jnp.asarray(v),
                     jnp.asarray(p))
    ad_w, ad_v, ad_p = vjp(jnp.asarray(g))
    mw, mv, mp = se3_warp_vec_bwd(jnp.asarray(w), jnp.asarray(v),
                                  jnp.asarray(p), jnp.asarray(g))
    np.testing.assert_allclose(np.asarray(mw), np.asarray(ad_w),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mv), np.asarray(ad_v),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mp), np.asarray(ad_p),
                               rtol=1e-5, atol=1e-6)


def test_se3_warp_vec_bwd_matches_autodiff_f64():
    """Tight f64 agreement rules out any systematic term error."""
    import jax
    import jax.numpy as jnp

    from hypernerf_tpu.ops.rigid_body import se3_warp_vec, se3_warp_vec_bwd

    with jax.enable_x64(True):
        rs = np.random.RandomState(1)
        n = 32
        w = rs.normal(scale=0.8, size=(n, 3))
        v = rs.normal(scale=0.5, size=(n, 3))
        p = rs.normal(size=(n, 3))
        g = rs.normal(size=(n, 3))
        _, vjp = jax.vjp(se3_warp_vec, jnp.asarray(w), jnp.asarray(v),
                         jnp.asarray(p))
        ad = vjp(jnp.asarray(g))
        manual = se3_warp_vec_bwd(jnp.asarray(w), jnp.asarray(v),
                                  jnp.asarray(p), jnp.asarray(g))
        for m, a in zip(manual, ad):
            np.testing.assert_allclose(np.asarray(m), np.asarray(a),
                                       rtol=1e-12, atol=1e-12)
