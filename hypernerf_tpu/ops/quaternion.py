"""Batched quaternion math (xyzw convention: xyz imaginary, w real).

Capability parity with /root/reference/hypernerf/quaternion.py, plus the
``exp`` map the reference omits (BASELINE's north star calls for quaternion
exp-map SE(3) support). All functions broadcast over leading dims; the
reference's ``multiply`` uses an unbatched ``torch.dot`` (quaternion.py:107),
fixed here with a batched inner product.
"""

from __future__ import annotations

import jax.numpy as jnp


def safe_acos(t, eps: float = 1e-7):
    """arccos clamped away from +-1 so the gradient stays finite."""
    return jnp.arccos(jnp.clip(t, -1.0 + eps, 1.0 - eps))


def im(q):
    """Imaginary part: (..., 4) -> (..., 3)."""
    return q[..., :3]


def re(q):
    """Real part: (..., 4) -> (..., 1)."""
    return q[..., 3:]


def identity(dtype=jnp.float32):
    """The identity quaternion [0, 0, 0, 1]."""
    return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dtype)


def conjugate(q):
    return jnp.concatenate([-im(q), re(q)], axis=-1)


def norm(q):
    return jnp.linalg.norm(q, axis=-1, keepdims=True)


def normalize(q):
    return q / norm(q)


def inverse(q):
    return normalize(conjugate(q))


def multiply(q1, q2):
    """Hamilton product, batched."""
    c = (re(q1) * im(q2)
         + re(q2) * im(q1)
         + jnp.cross(im(q1), im(q2)))
    w = re(q1) * re(q2) - jnp.sum(im(q1) * im(q2), axis=-1, keepdims=True)
    return jnp.concatenate([c, w], axis=-1)


def rotate(q, v):
    """Rotate vectors v by unit quaternions q: q * [v, 0] * q^-1."""
    q_v = jnp.concatenate([v, jnp.zeros_like(v[..., :1])], axis=-1)
    return im(multiply(multiply(q, q_v), conjugate(q)))


def log(q, eps: float = 1e-8):
    """Quaternion logarithm: [axis * angle/2, log|q|]."""
    mag = norm(q)
    v = im(q)
    s = re(q)
    w = jnp.log(mag)
    denom = jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)
    xyz = v / denom * safe_acos(s / mag)
    return jnp.concatenate([xyz, w], axis=-1)


def exp(q, eps: float = 1e-8):
    """Quaternion exponential (inverse of ``log`` for pure quaternions)."""
    v = im(q)
    s = re(q)
    theta = jnp.linalg.norm(v, axis=-1, keepdims=True)
    scale = jnp.where(theta > eps, jnp.sin(theta) / jnp.maximum(theta, eps), 1.0)
    xyz = v * scale
    w = jnp.cos(theta)
    return jnp.exp(s) * jnp.concatenate([xyz, w], axis=-1)


def from_axis_angle(axis, angle):
    """Unit quaternion for a rotation of ``angle`` about unit ``axis``."""
    half = 0.5 * angle[..., None]
    return jnp.concatenate([axis * jnp.sin(half), jnp.cos(half)], axis=-1)


def _cross3(a, b, axis: int = -1):
    """Cross product on 3-vectors via component slices (no (.., 4) concats —
    Mosaic rejects jnp.cross / quaternion-width concatenates in kernels).
    ``axis``: -1 for (..., 3) rows, 0 for component-major (3, T)."""
    if axis == 0:
        a0, a1, a2 = a[0:1], a[1:2], a[2:3]
        b0, b1, b2 = b[0:1], b[1:2], b[2:3]
    else:
        a0, a1, a2 = a[..., 0:1], a[..., 1:2], a[..., 2:3]
        b0, b1, b2 = b[..., 0:1], b[..., 1:2], b[..., 2:3]
    return jnp.concatenate([a1 * b2 - a2 * b1,
                            a2 * b0 - a0 * b2,
                            a0 * b1 - a1 * b0], axis=axis)


def quat_warp_vec(w, v, points, small_angle: float = 1e-6,
                  axis: int = -1):
    """Quaternion rotation + translation warp: R(exp q(w)) p + v.

    The quaternion counterpart of rigid_body.se3_warp_vec: ``w`` is a raw
    rotation vector (angle |w|, exponentiated through the unit quaternion
    ``from_axis_angle``), ``v`` a raw translation applied AFTER the rotation
    (no screw coupling — the difference from SE(3)). Smooth at w -> 0 (the
    near-zero-init regime): degenerates to points + v.

    The rotation is evaluated in Rodrigues vector form — identical to
    conjugation by the unit quaternion (rotate(from_axis_angle(axis, θ), p))
    but built only from (..., 3)/(..., 1) ops, so it lowers inside Pallas
    kernels (Mosaic rejects the (..., 4) quaternion concats);
    tests/test_quaternion.py pins it against scipy's quaternion rotation.

    Args:
      w: (..., 3) raw rotation-vector outputs.
      v: (..., 3) raw translations.
      points: (..., 3).

    Returns:
      (..., 3) warped points.
    """
    # Clamp BEFORE the sqrt: sqrt'(0) is inf and jnp.where evaluates both
    # branches under autodiff, so the gradient must never see sqrt(0).
    sq = jnp.sum(w * w, axis=axis, keepdims=True)
    small_sq = small_angle * small_angle
    safe = jnp.sqrt(jnp.where(sq < small_sq, small_sq, sq))
    a = w / safe
    sin_t, cos_t = jnp.sin(safe), jnp.cos(safe)
    # R p = p + sin(t) (a x p) + (1 - cos(t)) (a (a.p) - p) — the residual
    # Rodrigues form (identity + small terms): numerically tighter at the
    # near-zero-init regime than p cos(t) + ..., for values AND for the
    # in-kernel VJP. The unit-axis identity a x (a x p) = a (a.p) - p saves
    # one lane-starved (T, 3) cross inside the fused kernels.
    ap = jnp.sum(a * points, axis=axis, keepdims=True)
    axp = _cross3(a, points, axis)
    rp = points + sin_t * axp + (1.0 - cos_t) * (a * ap - points)
    warped = rp + v
    return jnp.where(sq <= small_sq, points + v, warped)


def quat_warp_vec_bwd(w, v, points, g, small_angle: float = 1e-6,
                      axis: int = -1):
    """Hand-derived VJP of ``quat_warp_vec``: g -> (d_w, d_v, d_points).

    Recomputes every forward quantity inline instead of stashing
    ``jax.vjp`` residuals — inside the fused level backward kernel the AD
    residuals (~20 lane-padded (T, 3) arrays live across the whole trunk
    backward) were what pinned the SE(3)/quaternion fields-backward tile to
    256 (VMEM), while this closed form is a handful of VPU ops with a
    minimal live set. Built from column-slice ops only (kernel-safe).

    Math: warped = R p + v with R = I + sin(t) A + (1-cos(t)) A^2,
    A = [a]_x, a = w/t, t = |w|. Then d_p = R^T g;
    d_a = sin(t) (p x g) + (1-cos(t)) ((a x p) x g - p x (a x g));
    d_t = cos(t) <a x p, g> + sin(t) <a x (a x p), g>;
    d_w = a d_t + (d_a - a <a, d_a>)/t; and d_v = g. At w -> 0 the forward
    degenerates to p + v, so d_p = g, d_w = 0 there.
    """
    sq = jnp.sum(w * w, axis=axis, keepdims=True)
    small_sq = small_angle * small_angle
    small = sq <= small_sq
    safe = jnp.sqrt(jnp.where(sq < small_sq, small_sq, sq))
    a = w / safe
    sin_t, cos_t = jnp.sin(safe), jnp.cos(safe)

    # Unit-axis triple-product identities (see rigid_body.se3_warp_vec_bwd):
    # 3 crosses instead of 6 — crosses are the dominant lane-starved VPU
    # cost inside the fused fields-backward kernel.
    ag = jnp.sum(a * g, axis=axis, keepdims=True)
    ap = jnp.sum(a * points, axis=axis, keepdims=True)
    pg = jnp.sum(points * g, axis=axis, keepdims=True)
    one_m_cos = 1.0 - cos_t

    axg = _cross3(a, g, axis)
    # d_p = R^T g = g - sin(t) (a x g) + (1-cos(t)) (a (a.g) - g).
    d_p = g - sin_t * axg + one_m_cos * (a * ag - g)

    axp = _cross3(a, points, axis)
    d_a = (sin_t * _cross3(points, g, axis)
           + one_m_cos * (points * ag - 2.0 * a * pg + g * ap))
    d_t = (cos_t * jnp.sum(axp * g, axis=axis, keepdims=True)
           + sin_t * (ap * ag - pg))
    d_w = (a * d_t
           + (d_a - a * jnp.sum(a * d_a, axis=axis, keepdims=True)) / safe)

    zero = jnp.zeros_like(g)
    return (jnp.where(small, zero, d_w),
            g,
            jnp.where(small, g, d_p))


def to_rotation_matrix(q):
    """Unit quaternion -> (..., 3, 3) rotation matrix."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w),
                      2 * (x * z + y * w)], axis=-1)
    row1 = jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z),
                      2 * (y * z - x * w)], axis=-1)
    row2 = jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w),
                      1 - 2 * (x * x + y * y)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)
