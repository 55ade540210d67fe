"""hypernerf_tpu — a TPU-native JAX framework for HyperNeRF.

A from-scratch rebuild of the capabilities of songrise/HyperNeRF-torch
(deformable NeRF with translation/SE(3) warp fields and hyper-space slicing),
designed for TPU: device-resident ray pipeline, one jit-compiled train step,
rays sharded over a `jax.sharding.Mesh`, bf16 matmuls on the MXU, and Pallas
kernels for the hot per-sample ops.

Layer map (mirrors SURVEY.md §1 for the reference):
  ops/       L0 math primitives (posenc, sampling, volume rendering, SE(3), quaternions)
  datasets/  L1 data (LLFF / Blender loaders -> device-resident ray buffers)
  models/    L2 neural modules + L3 NerfModel
  parallel/  device mesh / sharding helpers
  training/  L4 losses, metrics, optimizers, checkpoints, trainer, renderer
  utils/     depth visualization, logging
"""

__version__ = "0.1.0"
