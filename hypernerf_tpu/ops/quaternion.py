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
