"""Shared helpers for the distributed tests (tests/test_distributed.py).

Kept free of jax/conftest imports so the 2-process worker
(tests/distributed_worker.py) can import them BEFORE configuring its own
XLA flags — importing tests.conftest would force the 8-virtual-device
flag meant for the in-process suite.
"""

import numpy as np

# Deterministic tiny model: no stratified jitter, no sigma noise, so a
# k-device step is bit-comparable to a 1-device step on the same global
# batch (the property tests/test_train.py::
# test_multi_device_step_equals_single_device establishes for k=8).
TINY_KWARGS = dict(
    num_embeddings=4,
    num_coarse_samples=8,
    num_fine_samples=8,
    trunk_depth=2, trunk_width=16,
    rgb_branch_depth=2, rgb_branch_width=16,
    warp_depth=2, warp_width=16,
    hyper_sheet_depth=2, hyper_sheet_width=16,
    skips=(1,),
    compute_dtype='float32',
    noise_std=None,
    use_stratified_sampling=False,
)


def smooth_ray_batch(n=64):
    """Same deterministic ray/rgb batch as tests/test_train.py
    _smooth_ray_batch (duplicated here to stay conftest-free)."""
    rs = np.random.RandomState(0)
    x = rs.uniform(-0.4, 0.4, n).astype(np.float32)
    y = rs.uniform(-0.3, 0.3, n).astype(np.float32)
    dirs = np.stack([x, y, -np.ones_like(x)], -1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = np.zeros((n, 3), np.float32)
    rays = np.concatenate([
        origins, dirs,
        np.full((n, 1), 0.5, np.float32),
        np.full((n, 1), 3.0, np.float32),
        np.zeros((n, 1), np.float32)], 1)
    rgbs = np.stack([x + 0.5, y + 0.5, np.full_like(x, 0.3)], -1)
    return rays.astype(np.float32), rgbs.astype(np.float32)
