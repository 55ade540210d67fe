"""Ray sampling: stratified coarse sampling and inverse-CDF importance sampling.

Capability parity with /root/reference/hypernerf/model_utils.py:6-41 (coarse)
and :160-232 (hierarchical), rebuilt for JAX: explicit PRNG keys instead of
global torch RNG, a vectorized comparison-mask CDF inversion (masked max/min
reductions over the (bins, samples) comparison matrix — ``jnp.searchsorted``'s
binary search + dynamic gathers measured ~30x slower on TPU, BENCHMARKS.md),
and ``stop_gradient`` on the fine z-samples (the reference's ``.detach()`` at
model_utils.py:204).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_along_rays(key, origins, directions, num_samples: int,
                      near, far, use_stratified_sampling: bool,
                      use_linear_disparity: bool):
    """Stratified sampling along rays.

    Args:
      key: PRNG key for the stratified jitter (ignored when not stratified).
      origins: (B, 3) ray origins.
      directions: (B, 3) ray directions.
      num_samples: number of coarse samples per ray.
      near / far: scalar or (B,)/(B,1) clip distances.
      use_stratified_sampling: jitter samples within each bin.
      use_linear_disparity: sample linearly in disparity rather than depth.

    Returns:
      z_vals: (B, S) sampled depths; points: (B, S, 3) sampled positions.
    """
    batch_size = origins.shape[0]
    near = jnp.broadcast_to(jnp.asarray(near, origins.dtype), (batch_size,))[:, None]
    far = jnp.broadcast_to(jnp.asarray(far, origins.dtype), (batch_size,))[:, None]

    t_vals = jnp.linspace(0.0, 1.0, num_samples, dtype=origins.dtype)
    if not use_linear_disparity:
        z_vals = near * (1.0 - t_vals) + far * t_vals
    else:
        z_vals = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)

    if use_stratified_sampling:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
        t_rand = jax.random.uniform(key, (batch_size, num_samples),
                                    dtype=origins.dtype)
        z_vals = lower + (upper - lower) * t_rand
    else:
        z_vals = jnp.broadcast_to(z_vals, (batch_size, num_samples))

    points = origins[..., None, :] + z_vals[..., :, None] * directions[..., None, :]
    return z_vals, points


def sorted_uniform(key, n_rays: int, num_samples: int, dtype=jnp.float32):
    """Sorted iid-uniform draws WITHOUT a sort: (B, N), ascending per row.

    Uses the order-statistics identity u_(i) = S_i / S_(N+1) with
    S_i = sum of i iid Exp(1) spacings — the joint law of the result is
    EXACTLY that of sorting N iid uniforms, at the cost of one cumsum
    instead of an XLA sort (3.7 ms at (8192, 192); BENCHMARKS.md). Sorted u
    makes the inverse-CDF output sorted by construction, which the fused
    compositing kernel's bitonic union-merge requires — and since
    ``sample_pdf`` unions and sorts anyway, the order of u never affected
    its output.
    """
    e = -jnp.log1p(-jax.random.uniform(key, (n_rays, num_samples + 1),
                                       dtype=dtype))
    s = jnp.cumsum(e, axis=-1)
    return s[:, :-1] / s[:, -1:]


def piecewise_constant_pdf(key, bins, weights, num_samples: int,
                           use_stratified_sampling: bool):
    """Inverse-CDF sampling from a piecewise-constant PDF over ``bins``.

    Matches the reference semantics (model_utils.py:160-204): eps=1e-5 added to
    weights, CDF padded with a leading zero, u drawn uniform (stratified) or
    linspace(0,1), CDF inverted, and a ``stop_gradient`` on the result.

    TPU note: the inversion uses the fully vectorized comparison-mask
    formulation (max/min reductions over a (B, n_bins+1, N) mask) instead of
    searchsorted + gather — per-ray binary search with dynamic gathers lowers
    catastrophically on TPU (measured ~100ms for 8192x64->128 vs ~2ms for
    this form), while reductions ride the VPU and fuse.

    Args:
      key: PRNG key for the uniform draws.
      bins: (B, n_bins + 1) sorted bin edges.
      weights: (B, n_bins) nonnegative bin weights.
      num_samples: number of samples to draw per ray.
      use_stratified_sampling: random u (True) or deterministic linspace.

    Returns:
      (B, num_samples) sampled z values (gradient-stopped).
    """
    eps = 1e-5
    n_rays, n_bins = weights.shape
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # (B, n_bins+1)

    if use_stratified_sampling:
        # Sorted iid uniforms (order-statistics construction): identical in
        # law to the reference's torch.rand draws — sample_pdf's union+sort
        # output never depended on u's order — and shared with the fused
        # compositing kernel's in-kernel sampler so both paths see the SAME
        # u for the same key (tests compare them exactly).
        u = sorted_uniform(key, n_rays, num_samples, dtype=bins.dtype)
    else:
        u = jnp.linspace(0.0, 1.0, num_samples, dtype=bins.dtype)
        u = jnp.broadcast_to(u, (n_rays, num_samples))

    # mask[b, i, j] == True iff cdf[b, i] <= u[b, j]; the CDF-inverse bracket
    # [cdf[inds-1], cdf[inds]] is then a masked max/min reduction.
    mask = u[..., None, :] >= cdf[..., :, None]

    def minmax(x):
        x0 = jnp.max(jnp.where(mask, x[..., None], x[..., :1, None]), axis=-2)
        x1 = jnp.min(jnp.where(mask, x[..., -1:, None], x[..., None]), axis=-2)
        x0 = jnp.minimum(x0, x[..., -2:-1])
        x1 = jnp.maximum(x1, x[..., 1:2])
        return x0, x1

    bins_g0, bins_g1 = minmax(bins)
    cdf_g0, cdf_g1 = minmax(cdf)

    denom = cdf_g1 - cdf_g0
    denom = jnp.where(denom < eps, 1.0, denom)
    samples = bins_g0 + (u - cdf_g0) / denom * (bins_g1 - bins_g0)
    return jax.lax.stop_gradient(samples)


def sample_pdf(key, bins, weights, origins, directions, z_vals,
               num_samples: int, use_stratified_sampling: bool):
    """Hierarchical sampling: draw fine samples and merge-sort with coarse z.

    Mirrors model_utils.py:206-232: fine z-samples from the inverse CDF are
    unioned with the coarse ``z_vals`` and sorted per ray.

    Returns:
      z_vals: (B, n_coarse + num_samples) merged sorted depths;
      points: (B, n_coarse + num_samples, 3).
    """
    z_samples = piecewise_constant_pdf(key, bins, weights, num_samples,
                                       use_stratified_sampling)
    z_vals = jnp.sort(jnp.concatenate([z_vals, z_samples], axis=-1), axis=-1)
    points = origins[..., None, :] + z_vals[..., None] * directions[..., None, :]
    return z_vals, points


def weighted_sample_indices(key, weights, num: int):
    """(..., K) sample indices drawn iid proportional to ``weights``.

    The inverse-CDF draw as a comparison-mask count (searchsorted lowers
    ~30x slower on TPU, see piecewise_constant_pdf). Rays whose weights
    sum to ~0 resolve to the last index — their importance estimator is
    scaled by that ~0 sum anyway. Used by the elastic-loss Jacobian
    subsampler (models/nerf.py render_samples).
    """
    w = jnp.maximum(weights.astype(jnp.float32), 0.0)
    cdf = jnp.cumsum(w, axis=-1)
    cdf = cdf / jnp.maximum(cdf[..., -1:], 1e-12)
    u = jax.random.uniform(key, (*weights.shape[:-1], num))
    idx = jnp.sum((u[..., :, None] >= cdf[..., None, :]).astype(jnp.int32),
                  axis=-1)
    return jnp.minimum(idx, weights.shape[-1] - 1)
