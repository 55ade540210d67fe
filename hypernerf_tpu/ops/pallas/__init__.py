"""Pallas TPU kernels for the hot per-sample ops.

Every kernel has a pure-jnp reference implementation elsewhere in ops/ or
models/; kernels are validated against those references in tests (interpret
mode on CPU, compiled on TPU).
"""

from hypernerf_tpu.ops.pallas.fused_mlp import (FusedMLPSpec, fused_nerf_mlp,
                                                nerf_mlp_params_to_list)
