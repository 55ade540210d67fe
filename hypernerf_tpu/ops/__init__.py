"""L0 math primitives: pure jnp functions, fully unit-testable and vmap-able."""

import jax.numpy as jnp


def at_least_f32(x):
    """Upcast-preserving fp32 floor: bf16 -> f32, f32 -> f32, f64 -> f64.

    The model's activation policy computes compositing-critical values
    (sigma/rgb heads, hyper coords, warp outputs) in AT LEAST fp32 while
    matmuls run in bf16. A hard ``astype(float32)`` would silently DOWNCAST
    the float64 cross-framework parity path (tools/reference_parity.py runs
    both frameworks in f64 to get under the fp32 conditioning floor of the
    compositing chain); this helper keeps wider dtypes intact.
    """
    return x.astype(jnp.promote_types(x.dtype, jnp.float32))


from hypernerf_tpu.ops.posenc import (  # noqa: E402
    posenc_orig,
    posenc,
    posenc_window,
    posenc_orig_channels,
    posenc_channels,
)
from hypernerf_tpu.ops.sampling import (
    sample_along_rays,
    piecewise_constant_pdf,
    sample_pdf,
)
from hypernerf_tpu.ops.rendering import (
    volumetric_rendering,
    compute_opaqueness_mask,
    compute_depth_index,
    compute_depth_map,
    noise_regularize,
    filter_sigma,
)
from hypernerf_tpu.ops import rigid_body
from hypernerf_tpu.ops import quaternion
