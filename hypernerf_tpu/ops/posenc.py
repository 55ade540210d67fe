"""Positional encodings.

Capability parity with the reference's two schemes
(/root/reference/hypernerf/model_utils.py:234-298), rebuilt as vectorized jnp:

* ``posenc_orig`` — the original-NeRF encoding (identity + sin/cos over 2^k
  bands). The reference builds it with a Python loop over frequencies
  (model_utils.py:241-245); here the whole thing is a single broadcasted
  multiply + sin/cos so XLA can fuse it into the downstream matmul.
* ``posenc`` — the Nerfies-style encoding with a Hann-windowed annealing over
  frequency bands. The reference stubs out the window (model_utils.py:263-267
  is commented); this implements it for real, gated on ``alpha``.

Channel-count helpers are closed-form (the reference probes shapes by running
a dummy tensor on CUDA, model_utils.py:251 — a portability wart we drop).
"""

from __future__ import annotations

import jax.numpy as jnp


def posenc_orig_channels(in_ch: int, n_freqs: int) -> int:
    """Output channels of ``posenc_orig`` (identity + sin/cos per band)."""
    return in_ch * (1 + 2 * n_freqs)


def posenc_channels(in_ch: int, min_deg: int, max_deg: int,
                    use_identity: bool = False) -> int:
    """Output channels of the Nerfies-style ``posenc``."""
    n_freqs = max_deg - min_deg
    return in_ch * (2 * n_freqs + (1 if use_identity else 0))


def posenc_orig(x: jnp.ndarray, n_freqs: int, log_scale: bool = True) -> jnp.ndarray:
    """Original NeRF positional encoding.

    Output layout matches the reference (model_utils.py:242-246):
    ``[x, sin(f0*x), cos(f0*x), sin(f1*x), cos(f1*x), ...]`` along the last
    axis, with ``f_k = 2**k`` (or linear bands when ``log_scale=False``).

    Args:
      x: (..., C) input.
      n_freqs: number of frequency bands.
      log_scale: use powers of two (True) or linear bands.

    Returns:
      (..., C * (1 + 2 * n_freqs)) encoded features.
    """
    if n_freqs == 0:
        return x
    if log_scale:
        freqs = 2.0 ** jnp.arange(n_freqs, dtype=x.dtype)
    else:
        freqs = jnp.linspace(0.0, n_freqs - 1, n_freqs, dtype=x.dtype)
    # (..., F, C)
    xb = x[..., None, :] * freqs[:, None]
    # (..., F, 2, C): per-band [sin, cos] blocks, flattened to f0sin,f0cos,f1sin,...
    four = jnp.stack([jnp.sin(xb), jnp.cos(xb)], axis=-2)
    four = four.reshape(*x.shape[:-1], 2 * n_freqs * x.shape[-1])
    return jnp.concatenate([x, four], axis=-1)


def posenc_window(min_deg: int, max_deg: int, alpha: jnp.ndarray) -> jnp.ndarray:
    """Hann window easing in frequency bands as ``alpha`` goes 0 -> num bands.

    A truncated Hann window slid along the frequency spectrum: band k is fully
    on once ``alpha >= k + 1`` and fully off while ``alpha <= k``.

    Returns:
      (max_deg - min_deg,) per-band weights in [0, 1].
    """
    bands = jnp.arange(min_deg, max_deg, dtype=jnp.float32)
    x = jnp.clip(alpha - bands, 0.0, 1.0)
    return 0.5 * (1.0 - jnp.cos(jnp.pi * x))


def posenc(x: jnp.ndarray, min_deg: int, max_deg: int,
           use_identity: bool = False, alpha=None) -> jnp.ndarray:
    """Nerfies-style positional encoding with optional windowed annealing.

    Encodes with sinusoids scaled by ``2^[min_deg:max_deg-1]``; when ``alpha``
    is given each band is weighted by a sliding Hann window (the coarse-to-fine
    annealing of Nerfies/HyperNeRF — implemented for real, unlike the
    reference which comments it out at model_utils.py:263-267).

    Args:
      x: (..., C) input.
      min_deg / max_deg: frequency band range (exclusive upper).
      use_identity: prepend the raw input.
      alpha: None, or a scalar easing bands in as it goes 0 -> (max_deg-min_deg).

    Returns:
      (..., C * 2 * (max_deg - min_deg) [+ C]) features.
    """
    n_freqs = max_deg - min_deg
    scales = 2.0 ** jnp.arange(min_deg, max_deg, dtype=x.dtype)
    # (..., F, C)
    xb = x[..., None, :] * scales[:, None]
    # (..., F, 2, C): sin(xb), sin(xb + pi/2) = cos(xb)
    four = jnp.sin(jnp.stack([xb, xb + 0.5 * jnp.pi], axis=-2))
    if alpha is not None:
        window = posenc_window(min_deg, max_deg, alpha).astype(x.dtype)
        four = four * window[:, None, None]
    four = four.reshape(*x.shape[:-1], 2 * n_freqs * x.shape[-1])
    if use_identity:
        return jnp.concatenate([x, four], axis=-1)
    return four
