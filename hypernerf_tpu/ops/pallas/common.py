"""Shared Mosaic compiler parameters for the fused kernels.

Mosaic's default scoped-VMEM budget is a conservative 16MB, far below the
128MB a v5e core actually has; the fused backward kernels are tile-size
limited by that default (the SE(3)/quaternion fields backward needs ~24.5M
at tile 1024, models/nerf.py:286-295). Raising the limit only gates compile
success — block sizes and pipeline buffers are still set by the BlockSpecs,
so kernels that fit in 16MB are unaffected.
"""

from __future__ import annotations

import os

# Leave headroom below the 128MB physical VMEM for Mosaic's own scratch,
# semaphores, and the XLA context around the custom call.
VMEM_LIMIT_BYTES = int(os.environ.get('HYPERNERF_VMEM_LIMIT_BYTES',
                                      96 * 1024 * 1024))


def vmem_params(interpret: bool = False):
    """compiler_params for pl.pallas_call; None in interpret mode (CPU)."""
    if interpret:
        return None
    from jax.experimental.pallas import tpu as pltpu
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES)
