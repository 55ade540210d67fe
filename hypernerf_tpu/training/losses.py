"""Training losses (parity with /root/reference/losses.py) + the Nerfies
elastic regularization the reference cannot express (its warp field raises
NotImplementedError on Jacobians, /root/reference/hypernerf/warping.py:122;
ours computes them, models/warping.py)."""

from __future__ import annotations

import jax.numpy as jnp


def mse_loss(results: dict, targets: jnp.ndarray) -> jnp.ndarray:
    """MSE on the coarse rgb plus (if present) the fine rgb (losses.py:9-14)."""
    loss = jnp.mean((results['coarse']['rgb'] - targets) ** 2)
    if 'fine' in results and results['fine'] is not None:
        loss = loss + jnp.mean((results['fine']['rgb'] - targets) ** 2)
    return loss


loss_dict = {'mse': mse_loss}


def _sym3_eigvals_cm(xx, yy, zz, xy, xz, yz):
    """Eigenvalues of symmetric 3x3 matrices from their six COMPONENT
    ARRAYS, closed form — every input/output is (...,)-shaped.

    The trigonometric method (Smith 1961): shift by the mean eigenvalue q,
    normalize by p = sqrt(tr(B^2)/6), read the roots of the normalized
    characteristic polynomial off acos(det(B/p)/2). Fully vectorized VPU
    math — on TPU this is ~100x faster than the batched QR paths behind
    jnp.linalg.svd/eigvalsh at NeRF sample counts (512k 3x3 matrices:
    15 ms vs 1.7 s; svd's backward does not even fit VMEM).

    Component-major on purpose: the earlier (..., 3, 3) tensor form put
    every intermediate on (3, 3) minor dims — 3/8 sublane x 3/128 lane
    tile utilization, with jnp.linalg.det lowering to strided gathers —
    and its GRADIENT alone cost ~95 ms per 512k matrices. Six flat
    component arrays keep all ~80 flops full-lane elementwise (both
    directions fuse into one pass over N).

    Degenerate guard (the warp-init regime, J ~= I so A ~= I): where
    tr(B^2) ~ 0 every eigenvalue is q. Both branches of the select are
    computed on SAFE inputs (p_safe=1 in the degenerate lanes) so the
    gradient of the discarded branch cannot produce inf/NaN — the
    double-where pattern.

    Returns (l1, l2, l3) component arrays, descending.
    """
    q = (xx + yy + zz) / 3.0
    bxx, byy, bzz = xx - q, yy - q, zz - q
    p2 = (bxx * bxx + byy * byy + bzz * bzz
          + 2.0 * (xy * xy + xz * xz + yz * yz)) / 6.0
    # Scale-relative degeneracy test (eigenvalue spread << mean eigenvalue).
    degen = p2 < (1e-12 * q * q + 1e-30)
    p = jnp.sqrt(jnp.where(degen, 1.0, p2))
    # det(B/p) via the symmetric 3x3 cofactor expansion on components.
    det_b = (bxx * (byy * bzz - yz * yz)
             - xy * (xy * bzz - yz * xz)
             + xz * (xy * yz - byy * xz))
    r = jnp.clip(0.5 * det_b / (p * p * p), -1.0 + 1e-6, 1.0 - 1e-6)
    phi = jnp.arccos(r) / 3.0
    two_p = jnp.where(degen, 0.0, 2.0 * p)
    l1 = q + two_p * jnp.cos(phi)
    l3 = q + two_p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    l2 = 3.0 * q - l1 - l3
    return l1, l2, l3


def _sym3_eigvals(A: jnp.ndarray) -> jnp.ndarray:
    """Eigenvalues of symmetric (..., 3, 3) matrices (descending): the
    tensor-layout wrapper over ``_sym3_eigvals_cm`` (see there for the
    method and why the math runs on component arrays)."""
    comp = [A[..., i, j] for (i, j) in
            ((0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2))]
    return jnp.stack(_sym3_eigvals_cm(*comp), axis=-1)


def elastic_loss(jacobian: jnp.ndarray, eps: float = 1e-6,
                 scale: float = 0.03) -> jnp.ndarray:
    """Per-sample Nerfies elastic penalty (Park et al. 2021, §3.4).

    ||log Sigma||^2 over the warp Jacobian's singular values, remapped by
    the Geman-McClure robust loss (Barron's general loss at alpha=-2 with
    the Nerfies default scale 0.03) so outliers at motion discontinuities
    don't dominate. Identity Jacobians (rigid regions) score exactly 0.

    The singular values come from the closed-form eigenvalues of J^T J
    (log sigma = 0.5 log lambda) rather than jnp.linalg.svd — see
    ``_sym3_eigvals`` for why (TPU). Eigenvalue-only differentiation is
    exact and the sum over log^2 is a symmetric function, so coincident
    singular values (rigid regions) keep well-defined gradients.

    Args:
      jacobian: (..., 3, 3) d(warped)/d(points) per sample.
      eps: singular-value floor (log(0) guard).
      scale: robust-loss scale c.

    Returns:
      (...,) per-sample losses.
    """
    # Component-major throughout: nine flat (...,) jacobian columns -> six
    # gram components -> closed-form eigenvalues, all full-lane elementwise
    # (a (..., 3, 3) einsum + tensor eigvals ran at 3/8 x 3/128 tile
    # utilization and dominated the elastic step — see _sym3_eigvals_cm).
    jac = jacobian.astype(jnp.float32)
    c = [jac[..., i, j] for i in range(3) for j in range(3)]
    # gram[a, b] = sum_i J[i, a] * J[i, b]; columns a of J are c[a::3].
    def _g(a, b):
        return c[a] * c[b] + c[a + 3] * c[b + 3] + c[a + 6] * c[b + 6]
    lam = _sym3_eigvals_cm(_g(0, 0), _g(1, 1), _g(2, 2),
                           _g(0, 1), _g(0, 2), _g(1, 2))
    sq_residual = 0.0
    for lam_i in lam:
        log_sval = 0.5 * jnp.log(jnp.maximum(lam_i, eps * eps))
        sq_residual = sq_residual + log_sval ** 2
    squared_scaled = sq_residual / (scale ** 2)
    return 2.0 * squared_scaled / (squared_scaled + 4.0)


def background_loss(warped_points: jnp.ndarray, points: jnp.ndarray,
                    scale: float = 0.001) -> jnp.ndarray:
    """Per-point Nerfies background regularization (Park et al. 2021 §3.5).

    Known-static 3-D points must not move under the warp: the squared
    displacement through the same Geman-McClure remap as ``elastic_loss``
    (Nerfies default scale 0.001). Returns (...,) per-point losses.
    """
    sq = jnp.sum((warped_points - points) ** 2, axis=-1)
    squared_scaled = sq / (scale ** 2)
    return 2.0 * squared_scaled / (squared_scaled + 4.0)


def weighted_elastic_loss(results: dict, scale: float = 0.03) -> jnp.ndarray:
    """Elastic penalty over every level carrying a Jacobian, weighted by the
    volume-rendering weights (empty space doesn't pay) — summed per ray,
    averaged over rays, summed over levels (the Nerfies train-step reduce).

    When the model subsampled the Jacobian points
    (NerfConfig.elastic_jacobian_samples), ``warp_jacobian_weights``
    carries the importance weights W/K and the same reduce is an unbiased
    estimator of the full weighted penalty.
    """
    total = 0.0
    for level in ('coarse', 'fine'):
        res = results.get(level)
        if not res or 'warp_jacobian' not in res:
            continue
        per_sample = elastic_loss(res['warp_jacobian'], scale=scale)
        w = jnp.asarray(res.get('warp_jacobian_weights', res['weights']),
                        jnp.float32)
        total = total + jnp.mean(jnp.sum(w * per_sample, axis=-1))
    return total
