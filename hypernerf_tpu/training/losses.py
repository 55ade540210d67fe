"""Training losses (parity with /root/reference/losses.py)."""

from __future__ import annotations

import jax.numpy as jnp


def mse_loss(results: dict, targets: jnp.ndarray) -> jnp.ndarray:
    """MSE on the coarse rgb plus (if present) the fine rgb (losses.py:9-14)."""
    loss = jnp.mean((results['coarse']['rgb'] - targets) ** 2)
    if 'fine' in results and results['fine'] is not None:
        loss = loss + jnp.mean((results['fine']['rgb'] - targets) ** 2)
    return loss


loss_dict = {'mse': mse_loss}
