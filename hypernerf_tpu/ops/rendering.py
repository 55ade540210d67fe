"""Volume rendering: alpha compositing and depth maps.

Capability parity with /root/reference/hypernerf/model_utils.py:43-107 (the
compositing), :300-362 (sigma noise, median depth) and
/root/reference/hypernerf/models.py:35-63 (``filter_sigma``), rebuilt as pure
jnp. Numerics intentionally preserved: eps=1e-5 inside the exclusive cumprod,
the 1e7 "sample at infinity" distance (safe in bf16/fp32 — the reference's
fp16 comment at model_utils.py:70 doesn't apply on TPU), and acc excluding the
infinity sample.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def volumetric_rendering(rgb, sigma, z_vals, dirs, use_white_background: bool,
                         sample_at_infinity: bool = True, eps: float = 1e-5):
    """Alpha-composite per-sample rgb/sigma into per-ray outputs.

    Args:
      rgb: (B, S, 3) sample colors.
      sigma: (B, S) densities.
      z_vals: (B, S) sample depths.
      dirs: (B, 3) ray directions (len scales the deltas).
      use_white_background: composite onto white.
      sample_at_infinity: give the last sample a huge delta (opaque far field).
      eps: numerical floor inside the transmittance cumprod.

    Returns:
      dict with 'rgb' (B,3), 'depth' (B,), 'med_depth' (B,), 'acc' (B,),
      'weights' (B,S).
    """
    last_sample_z = 1e7 if sample_at_infinity else 1e-7
    dists = jnp.concatenate([
        z_vals[..., 1:] - z_vals[..., :-1],
        jnp.full_like(z_vals[..., :1], last_sample_z),
    ], axis=-1)
    dists = dists * jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    alpha = 1.0 - jnp.exp(-sigma * dists)
    # Exclusive cumprod of transmittance (prepend 1.0, as in tf.math.cumprod).
    accum_prod = jnp.concatenate([
        jnp.ones_like(alpha[..., :1]),
        jnp.cumprod(1.0 - alpha[..., :-1] + eps, axis=-1),
    ], axis=-1)
    weights = alpha * accum_prod

    out_rgb = jnp.sum(weights[..., None] * rgb, axis=-2)
    exp_depth = jnp.sum(weights * z_vals, axis=-1)
    med_depth = compute_depth_map(weights, z_vals)
    acc = jnp.sum(weights, axis=-1)
    if use_white_background:
        out_rgb = out_rgb + (1.0 - acc[..., None])
    if sample_at_infinity:
        acc = jnp.sum(weights[..., :-1], axis=-1)

    return {
        'rgb': out_rgb,
        'depth': exp_depth,
        'med_depth': med_depth,
        'acc': acc,
        'weights': weights,
    }


def compute_opaqueness_mask(weights, depth_threshold: float = 0.5):
    """One-hot mask at the first sample where cumulative weight crosses the
    threshold (the 'surface')."""
    cumulative = jnp.cumsum(weights, axis=-1)
    opaqueness = cumulative >= depth_threshold
    padded = jnp.concatenate(
        [jnp.zeros_like(opaqueness[..., :1]), opaqueness[..., :-1]], axis=-1)
    mask = jnp.logical_xor(opaqueness, padded)
    return mask.astype(weights.dtype)


def compute_depth_index(weights, depth_threshold: float = 0.5):
    """Sample index of the median-depth accumulation."""
    return jnp.argmax(compute_opaqueness_mask(weights, depth_threshold), axis=-1)


def compute_depth_map(weights, z_vals, depth_threshold: float = 0.5):
    """Median-accumulation depth (differs from NeRF-W's expected depth)."""
    mask = compute_opaqueness_mask(weights, depth_threshold)
    return jnp.sum(mask * z_vals, axis=-1)


def noise_regularize(key, raw_alpha, noise_std, use_stratified_sampling: bool):
    """Add N(0, noise_std) to the raw density pre-activation.

    Applied only when stratified sampling is on and noise_std > 0, matching
    model_utils.py:300-317. ``key=None`` disables the noise (deterministic eval).
    """
    if (key is None or noise_std is None or noise_std <= 0.0
            or not use_stratified_sampling):
        return raw_alpha
    noise = jax.random.normal(key, raw_alpha.shape, raw_alpha.dtype) * noise_std
    return raw_alpha + noise


def filter_sigma(points, sigma, render_opts):
    """Filter densities by render options (models.py:35-63).

    - 'dust_threshold': zero out sigma below the threshold.
    - 'bounding_box': zero out sigma outside (xmin,xmax,ymin,ymax,zmin,zmax).
    """
    if not render_opts:
        return sigma
    if 'dust_threshold' in render_opts:
        thresh = render_opts.get('dust_threshold', 0.0)
        sigma = jnp.where(sigma >= thresh, sigma, 0.0)
    if 'bounding_box' in render_opts:
        xmin, xmax, ymin, ymax, zmin, zmax = render_opts['bounding_box']
        mask = ((points[..., 0] >= xmin) & (points[..., 0] <= xmax)
                & (points[..., 1] >= ymin) & (points[..., 1] <= ymax)
                & (points[..., 2] >= zmin) & (points[..., 2] <= zmax))
        sigma = jnp.where(mask, sigma, 0.0)
    return sigma
