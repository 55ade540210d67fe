"""Unit tests for quaternion math (ops/quaternion.py)."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from hypernerf_tpu.ops import quaternion as q


def _random_unit_quats(n, seed=0):
    rs = np.random.RandomState(seed)
    quats = rs.randn(n, 4)
    return (quats / np.linalg.norm(quats, axis=-1, keepdims=True)).astype(
        np.float32)


def test_identity_and_parts():
    e = q.identity()
    np.testing.assert_array_equal(np.asarray(e), [0, 0, 0, 1])
    x = jnp.asarray([[1., 2., 3., 4.]])
    np.testing.assert_array_equal(np.asarray(q.im(x)), [[1, 2, 3]])
    np.testing.assert_array_equal(np.asarray(q.re(x)), [[4]])


def test_multiply_matches_scipy():
    a = _random_unit_quats(5, 0)
    b = _random_unit_quats(5, 1)
    got = np.asarray(q.multiply(jnp.asarray(a), jnp.asarray(b)))
    # scipy uses xyzw too; R(a)*R(b) == R(a*b).
    want = (Rotation.from_quat(a) * Rotation.from_quat(b)).as_quat()
    # Quaternion double cover: compare up to sign.
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, want * sign, rtol=1e-4, atol=1e-5)


def test_rotate_matches_rotation_matrix():
    quats = _random_unit_quats(6, 2)
    v = np.random.RandomState(3).randn(6, 3).astype(np.float32)
    got = np.asarray(q.rotate(jnp.asarray(quats), jnp.asarray(v)))
    want = Rotation.from_quat(quats).apply(v)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # And the explicit matrix conversion agrees.
    R = np.asarray(q.to_rotation_matrix(jnp.asarray(quats)))
    np.testing.assert_allclose(np.einsum('bij,bj->bi', R, v), want,
                               rtol=1e-4, atol=1e-5)


def test_conjugate_inverse_norm():
    quats = jnp.asarray(_random_unit_quats(4, 4))
    inv = q.inverse(quats)
    prod = np.asarray(q.multiply(quats, inv))
    np.testing.assert_allclose(prod, np.tile([0, 0, 0, 1.0], (4, 1)),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(q.norm(quats)), 1.0, atol=1e-6)


def test_exp_log_roundtrip():
    # exp of a pure quaternion [axis*theta/2, 0] is the rotation quat.
    axis = np.array([[0, 0, 1.0], [1.0, 0, 0]], np.float32)
    theta = np.array([0.8, 1.2], np.float32)
    pure = np.concatenate([axis * (theta[:, None] / 2),
                           np.zeros((2, 1), np.float32)], -1)
    rot = np.asarray(q.exp(jnp.asarray(pure)))
    want = Rotation.from_rotvec(axis * theta[:, None]).as_quat()
    np.testing.assert_allclose(rot, want, rtol=1e-4, atol=1e-5)
    # log inverts it (imaginary part).
    back = np.asarray(q.log(jnp.asarray(rot, jnp.float32)))
    np.testing.assert_allclose(back[:, :3], pure[:, :3], rtol=1e-3, atol=1e-4)


def test_from_axis_angle():
    got = np.asarray(q.from_axis_angle(jnp.asarray([[0., 0., 1.]]),
                                       jnp.asarray([np.pi / 2])))
    want = Rotation.from_rotvec([[0, 0, np.pi / 2]]).as_quat()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_quat_warp_vec_matches_matrix_path():
    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.randn(64, 3) * 0.5, jnp.float32)
    v = jnp.asarray(rs.randn(64, 3) * 0.2, jnp.float32)
    pts = jnp.asarray(rs.randn(64, 3), jnp.float32)
    got = np.asarray(q.quat_warp_vec(w, v, pts))
    # Reference: rotation matrix from the same axis-angle, then translate.
    theta = np.linalg.norm(np.asarray(w), axis=-1)
    want = Rotation.from_rotvec(np.asarray(w)).apply(np.asarray(pts)) \
        + np.asarray(v)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    assert theta.max() > 0.1  # non-trivial rotations exercised


def test_quat_warp_vec_small_angle():
    v = jnp.asarray([[0.1, -0.2, 0.3]], jnp.float32)
    pts = jnp.asarray([[1.0, 2.0, 3.0]], jnp.float32)
    w0 = jnp.zeros((1, 3), jnp.float32)
    got = np.asarray(q.quat_warp_vec(w0, v, pts))
    np.testing.assert_allclose(got, np.asarray(pts + v), rtol=1e-6)
    # Gradients stay finite at the zero-rotation init regime.
    g = jax.grad(lambda w: jnp.sum(q.quat_warp_vec(w, v, pts)))(w0)
    assert np.all(np.isfinite(np.asarray(g)))


def test_quat_warp_differs_from_se3():
    # Same (w, v): SE(3) couples translation through the screw; the
    # quaternion field applies it directly after rotation.
    from hypernerf_tpu.ops import rigid_body
    rs = np.random.RandomState(1)
    w = jnp.asarray(rs.randn(8, 3) * 0.8, jnp.float32)
    v = jnp.asarray(rs.randn(8, 3) * 0.5, jnp.float32)
    pts = jnp.asarray(rs.randn(8, 3), jnp.float32)
    quat = np.asarray(q.quat_warp_vec(w, v, pts))
    se3 = np.asarray(rigid_body.se3_warp_vec(w, v, pts))
    assert np.abs(quat - se3).max() > 1e-3


def test_quat_warp_vec_bwd_matches_autodiff():
    """The hand-derived VJP (used inside the fused level backward kernel)
    equals jax.vjp of quat_warp_vec, including the small-angle branch."""
    import jax
    import jax.numpy as jnp

    from hypernerf_tpu.ops.quaternion import quat_warp_vec, quat_warp_vec_bwd

    rs = np.random.RandomState(0)
    n = 64
    w = np.concatenate([
        rs.normal(scale=0.7, size=(n - 8, 3)),
        rs.normal(scale=1e-8, size=(4, 3)),
        rs.normal(scale=3.0, size=(4, 3)),
    ]).astype(np.float32)
    v = rs.normal(scale=0.5, size=(n, 3)).astype(np.float32)
    p = rs.normal(size=(n, 3)).astype(np.float32)
    g = rs.normal(size=(n, 3)).astype(np.float32)

    _, vjp = jax.vjp(quat_warp_vec, jnp.asarray(w), jnp.asarray(v),
                     jnp.asarray(p))
    ad_w, ad_v, ad_p = vjp(jnp.asarray(g))
    mw, mv, mp = quat_warp_vec_bwd(jnp.asarray(w), jnp.asarray(v),
                                   jnp.asarray(p), jnp.asarray(g))
    np.testing.assert_allclose(np.asarray(mw), np.asarray(ad_w),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mv), np.asarray(ad_v),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mp), np.asarray(ad_p),
                               rtol=1e-5, atol=1e-6)


def test_quat_warp_vec_bwd_matches_autodiff_f64():
    import jax
    import jax.numpy as jnp

    from hypernerf_tpu.ops.quaternion import quat_warp_vec, quat_warp_vec_bwd

    with jax.enable_x64(True):
        rs = np.random.RandomState(1)
        n = 32
        w = rs.normal(scale=0.8, size=(n, 3))
        v = rs.normal(scale=0.5, size=(n, 3))
        p = rs.normal(size=(n, 3))
        g = rs.normal(size=(n, 3))
        _, vjp = jax.vjp(quat_warp_vec, jnp.asarray(w), jnp.asarray(v),
                         jnp.asarray(p))
        ad = vjp(jnp.asarray(g))
        manual = quat_warp_vec_bwd(jnp.asarray(w), jnp.asarray(v),
                                   jnp.asarray(p), jnp.asarray(g))
        for m, a in zip(manual, ad):
            np.testing.assert_allclose(np.asarray(m), np.asarray(a),
                                       rtol=1e-12, atol=1e-12)
