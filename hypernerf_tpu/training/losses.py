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


def elastic_loss(jacobian: jnp.ndarray, eps: float = 1e-6,
                 scale: float = 0.03) -> jnp.ndarray:
    """Per-sample Nerfies elastic penalty (Park et al. 2021, §3.4).

    ||log Sigma||^2 over the warp Jacobian's singular values, remapped by
    the Geman-McClure robust loss (Barron's general loss at alpha=-2 with
    the Nerfies default scale 0.03) so outliers at motion discontinuities
    don't dominate. Identity Jacobians (rigid regions) score exactly 0.

    Args:
      jacobian: (..., 3, 3) d(warped)/d(points) per sample.
      eps: singular-value floor (log(0) guard).
      scale: robust-loss scale c.

    Returns:
      (...,) per-sample losses.
    """
    svals = jnp.linalg.svd(jacobian, compute_uv=False)
    log_svals = jnp.log(jnp.maximum(svals, eps))
    sq_residual = jnp.sum(log_svals ** 2, axis=-1)
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
    """
    total = 0.0
    for level in ('coarse', 'fine'):
        res = results.get(level)
        if not res or 'warp_jacobian' not in res:
            continue
        per_sample = elastic_loss(res['warp_jacobian'], scale=scale)
        w = jnp.asarray(res['weights'], jnp.float32)
        total = total + jnp.mean(jnp.sum(w * per_sample, axis=-1))
    return total
