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


def drive(gen):
    """Run a tile generator to completion and return its StopIteration value.

    The tile-level forward/backward bodies are written as generators that
    yield at op-group (≈ one matmul) boundaries, so pipelined kernels can
    interleave two independent tiles' instruction streams (see
    ``interleave``). Plain callers just drive one generator to the end —
    identical trace to the non-generator form.
    """
    while True:
        try:
            next(gen)
        except StopIteration as stop:
            return stop.value


def interleave(*gens):
    """Alternate op-groups from several independent tile generators.

    Mosaic overlaps instruction streams that ALTERNATE in program order
    (measured: a 256-wide and a 128-wide matmul chain interleaved reach
    99.7% of bf16 peak vs 60% for the narrow chain alone — BENCHMARKS.md
    round-3 A/B). Emitting one yield-chunk from each live generator per
    round produces exactly that alternation at trace time; each stream's
    internal op order (and hence its numerics) is unchanged.

    Returns the list of generator return values, in argument order.
    """
    results = [None] * len(gens)
    live = [True] * len(gens)
    while any(live):
        for idx, gen in enumerate(gens):
            if not live[idx]:
                continue
            try:
                next(gen)
            except StopIteration as stop:
                results[idx] = stop.value
                live[idx] = False
    return results
