"""L0 math primitives: pure jnp functions, fully unit-testable and vmap-able."""

from hypernerf_tpu.ops.posenc import (
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
