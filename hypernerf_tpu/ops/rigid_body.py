"""Batched rigid-body (SE(3)/SO(3)) math.

Capability parity with /root/reference/hypernerf/rigid_body.py, which is
unbatched (``skew`` flattens to a single 3-vector at rigid_body.py:35 and
hardcodes ``.cuda()`` throughout). Here every function is fully batched over
arbitrary leading dims so the SE(3) warp field can evaluate per ray sample in
one fused XLA computation, and small-angle Taylor guards make ``exp_se3``
differentiable at theta=0 (the identity transform the warp field is
initialized to).
"""

from __future__ import annotations

import jax.numpy as jnp

# Below this angle, use Taylor expansions of the so(3)/se(3) coefficient
# functions to stay finite and differentiable.
_SMALL_ANGLE = 1e-6


def skew(w):
    """Skew (cross-product) matrix for the 3-vector(s) w.

    Modern Robotics Eqn 3.30, batched: (..., 3) -> (..., 3, 3).
    """
    zeros = jnp.zeros_like(w[..., 0])
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    row0 = jnp.stack([zeros, -wz, wy], axis=-1)
    row1 = jnp.stack([wz, zeros, -wx], axis=-1)
    row2 = jnp.stack([-wy, wx, zeros], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def rp_to_se3(r, p):
    """Assemble (..., 3, 3) rotations and (..., 3) translations into
    (..., 4, 4) homogeneous transforms."""
    batch = r.shape[:-2]
    top = jnp.concatenate([r, p[..., :, None]], axis=-1)  # (..., 3, 4)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=r.dtype), (*batch, 1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def exp_so3(w, theta):
    """Rodrigues' formula: rotation about unit axis w by angle theta.

    Args:
      w: (..., 3) unit rotation axes.
      theta: (...,) angles.

    Returns:
      (..., 3, 3) rotation matrices.
    """
    wm = skew(w)
    wm2 = wm @ wm
    theta = theta[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), wm.shape)
    return eye + jnp.sin(theta) * wm + (1.0 - jnp.cos(theta)) * wm2


def exp_se3(screw_axis, theta):
    """Exponential map from se(3) to SE(3), Modern Robotics Eqn 3.88, batched.

    Args:
      screw_axis: (..., 6) screw axes [w, v] with unit w.
      theta: (...,) motion magnitudes.

    Returns:
      (..., 4, 4) homogeneous transforms.
    """
    w, v = screw_axis[..., :3], screw_axis[..., 3:]
    wm = skew(w)
    wm2 = wm @ wm
    r = exp_so3(w, theta)
    t = theta[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), wm.shape)
    g = t * eye + (1.0 - jnp.cos(t)) * wm + (t - jnp.sin(t)) * wm2
    p = jnp.squeeze(g @ v[..., :, None], axis=-1)
    return rp_to_se3(r, p)


def exp_se3_from_wv(w, v):
    """SE(3) exp from unnormalized rotation/translation outputs.

    Computes theta = |w|, normalizes the screw axis, and handles theta -> 0
    smoothly (identity rotation, translation -> v) — the safe form the SE(3)
    warp field needs since its heads are initialized near zero (the reference
    divides by theta unguarded at warping.py:231-232, a NaN at init).

    Args:
      w: (..., 3) rotation vectors.  v: (..., 3) translation generators.

    Returns:
      (..., 4, 4) homogeneous transforms.
    """
    theta = jnp.linalg.norm(w, axis=-1)
    safe_theta = jnp.maximum(theta, _SMALL_ANGLE)[..., None]
    w_unit = w / safe_theta
    v_unit = v / safe_theta
    screw = jnp.concatenate([w_unit, v_unit], axis=-1)
    transform = exp_se3(screw, jnp.maximum(theta, _SMALL_ANGLE))
    # At theta ~ 0 the transform degenerates to a pure translation by v.
    small = (theta <= _SMALL_ANGLE)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(4, dtype=w.dtype), (*w.shape[:-1], 4, 4))
    translate = eye.at[..., :3, 3].set(v)
    return jnp.where(small, translate, transform)


def _cross(a, b, axis: int = -1):
    """Cross product on 3-vectors via component slices (no 3x3
    intermediates). ``axis`` is the component axis: -1 for (..., 3) rows,
    0 for component-major (3, T) layouts (full-lane VPU inside kernels)."""
    if axis == 0:
        a0, a1, a2 = a[0:1], a[1:2], a[2:3]
        b0, b1, b2 = b[0:1], b[1:2], b[2:3]
    else:
        a0, a1, a2 = a[..., 0:1], a[..., 1:2], a[..., 2:3]
        b0, b1, b2 = b[..., 0:1], b[..., 1:2], b[..., 2:3]
    return jnp.concatenate([a1 * b2 - a2 * b1,
                            a2 * b0 - a0 * b2,
                            a0 * b1 - a1 * b0], axis=axis)


def se3_warp_vec(w, v, points, axis: int = -1):
    """exp_se3_from_wv + transform_points in pure vector form.

    Identical math to the matrix path (Rodrigues + Modern Robotics 3.88)
    expressed with cross/dot products only — no (..., 3, 3)/(..., 4, 4)
    intermediates, so it runs efficiently inside Pallas kernels (Mosaic
    handles (T, 3) blocks but lowers tiny matmul batches poorly) and keeps
    XLA relayout-free. Tested for equality against the matrix path.

    Args:
      w: (..., 3) raw rotation outputs.  v: (..., 3) raw translations.
      points: (..., 3).
      axis: component axis — -1 for (..., 3) layouts, 0 for component-major
        (3, T) (the in-kernel layout: (T, 3) ops use 3 of 128 VPU lanes,
        (3, T) uses them all; results are bit-identical).

    Returns:
      warped points, same layout as ``points``.
    """
    theta = jnp.sqrt(jnp.sum(w * w, axis=axis, keepdims=True))
    safe = jnp.maximum(theta, _SMALL_ANGLE)
    a = w / safe
    sin_t, cos_t = jnp.sin(safe), jnp.cos(safe)
    one_m_cos = 1.0 - cos_t
    # Unit-axis triple-product identity: a x (a x x) = a (a.x) - x. Halves
    # the cross-product count (2 instead of 4) — inside the fused kernels
    # every (T, 3) op is lane-starved VPU work, so crosses dominate the
    # retraction cost (see BENCHMARKS.md round-3 MXU table).
    ap = jnp.sum(a * points, axis=axis, keepdims=True)
    av = jnp.sum(a * v, axis=axis, keepdims=True)
    axp = _cross(a, points, axis)
    axv = _cross(a, v, axis)
    # R p = p + sin(t) (a x p) + (1 - cos(t)) (a (a.p) - p)
    rp = points + sin_t * axp + one_m_cos * (a * ap - points)
    # G v = v + b1 (a x v) + b2 (a (a.v) - v), b1 = (1-cos)/t, b2 = (t-sin)/t
    gv = (v + (one_m_cos / safe) * axv
          + ((safe - sin_t) / safe) * (a * av - v))
    warped = rp + gv
    # theta -> 0: pure translation by the raw v (matches exp_se3_from_wv).
    return jnp.where(theta <= _SMALL_ANGLE, points + v, warped)


def se3_warp_vec_bwd(w, v, points, g, axis: int = -1):
    """Hand-derived VJP of ``se3_warp_vec``: g -> (d_w, d_v, d_points).

    Recomputes the screw exponential's forward quantities inline instead of
    stashing ``jax.vjp`` residuals — see quaternion.quat_warp_vec_bwd for
    why (the AD residual set pinned the fused fields-backward tile to 256).

    Math: warped = R p + G v with R = I + sin(t) A + (1-cos(t)) A^2 and
    G = I + b1 A + b2 A^2, b1 = (1-cos(t))/t, b2 = (t-sin(t))/t, A = [a]_x,
    a = w/t, t = |w|. Then d_p = R^T g, d_v = G^T g; the a- and t-
    cotangents collect the R- and G-path terms (d/dt of sin, 1-cos, b1, b2)
    and pull back through a = w/t: d_w = a d_t + (I - a a^T) d_a / t.
    At t -> 0: warped = p + v, so d_p = d_v = g, d_w = 0.
    """
    sq = jnp.sum(w * w, axis=axis, keepdims=True)
    eps_sq = _SMALL_ANGLE * _SMALL_ANGLE
    small = sq <= eps_sq
    safe = jnp.sqrt(jnp.where(sq < eps_sq, eps_sq, sq))
    a = w / safe
    sin_t, cos_t = jnp.sin(safe), jnp.cos(safe)
    one_m_cos = 1.0 - cos_t
    b1 = one_m_cos / safe
    b2 = (safe - sin_t) / safe

    # Unit-axis triple-product identities keep the cross count at 5 (was
    # 12): a x (a x x) = a (a.x) - x; (a x p) x g - p x (a x g)
    # = p (a.g) - 2 a (p.g) + g (a.p); <a x (a x p), g> = (a.p)(a.g) - p.g.
    ag = jnp.sum(a * g, axis=axis, keepdims=True)
    ap = jnp.sum(a * points, axis=axis, keepdims=True)
    av = jnp.sum(a * v, axis=axis, keepdims=True)
    pg = jnp.sum(points * g, axis=axis, keepdims=True)
    vg = jnp.sum(v * g, axis=axis, keepdims=True)

    axg = _cross(a, g, axis)
    a_axg = a * ag - g
    # d_p = R^T g;  d_v = G^T g  (transposes flip the sign of the A term).
    d_p = g - sin_t * axg + one_m_cos * a_axg
    d_v = g - b1 * axg + b2 * a_axg

    axp = _cross(a, points, axis)
    axv = _cross(a, v, axis)
    d_a = (sin_t * _cross(points, g, axis)
           + one_m_cos * (points * ag - 2.0 * a * pg + g * ap)
           + b1 * _cross(v, g, axis)
           + b2 * (v * ag - 2.0 * a * vg + g * av))
    # db1/dt = sin/t - (1-cos)/t^2; db2/dt = (sin - t cos)/t^2.
    b1p = sin_t / safe - one_m_cos / (safe * safe)
    b2p = (sin_t - safe * cos_t) / (safe * safe)
    d_t = (cos_t * jnp.sum(axp * g, axis=axis, keepdims=True)
           + sin_t * (ap * ag - pg)
           + b1p * jnp.sum(axv * g, axis=axis, keepdims=True)
           + b2p * (av * ag - vg))
    d_w = (a * d_t
           + (d_a - a * jnp.sum(a * d_a, axis=axis, keepdims=True)) / safe)

    zero = jnp.zeros_like(g)
    return (jnp.where(small, zero, d_w),
            jnp.where(small, g, d_v),
            jnp.where(small, g, d_p))


def to_homogenous(v):
    """(..., 3) points -> (..., 4) homogeneous coordinates."""
    return jnp.concatenate([v, jnp.ones_like(v[..., :1])], axis=-1)


def from_homogenous(v):
    """(..., 4) homogeneous coordinates -> (..., 3) points."""
    return v[..., :3] / v[..., -1:]


def transform_points(transform, points):
    """Apply (..., 4, 4) transforms to (..., 3) points, batched."""
    homo = to_homogenous(points)
    out = jnp.squeeze(transform @ homo[..., :, None], axis=-1)
    return from_homogenous(out)
