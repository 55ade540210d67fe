"""Test config: force the CPU backend with 8 virtual devices.

JAX's standard fake-backend recipe for multi-chip tests
(xla_force_host_platform_device_count) — the sharding tests exercise the real
shard_map/pjit code paths on an 8-device CPU mesh. The axon TPU plugin
overrides JAX_PLATFORMS via jax.config, so we override it back in-process.
"""

import os

os.environ['XLA_FLAGS'] = ('--xla_force_host_platform_device_count=8 '
                           + os.environ.get('XLA_FLAGS', ''))

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.RandomState(0)


def tiny_nerf_config(**overrides):
    """A small NerfConfig that runs fast on CPU."""
    from hypernerf_tpu.configs import NerfConfig
    base = dict(
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
    )
    base.update(overrides)
    return NerfConfig(**base)


@pytest.fixture
def tiny_config():
    return tiny_nerf_config()


def make_smooth_llff_scene(tmp_path, n_images=3, w=16, h=12):
    """A synthetic LLFF scene whose images are smooth gradients — learnable
    by a tiny NeRF, used for overfit/integration tests."""
    from PIL import Image
    img_dir = tmp_path / 'images'
    img_dir.mkdir(parents=True)
    poses_bounds = []
    focal = 20.0
    yy, xx = np.mgrid[0:h * 4, 0:w * 4].astype(np.float32)
    for i in range(n_images):
        r = xx / xx.max()
        g = yy / yy.max()
        b = 0.5 + 0.1 * i
        img = np.stack([r, g, np.full_like(r, b)], -1)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            img_dir / f'img_{i:03d}.png')
        right = np.array([1.0, 0, 0])
        down = np.array([0, -1.0, 0])
        back = np.array([0, 0, 1.0])
        center = np.array([0.05 * (i - 1), 0.02 * (i - 1), 0.0])
        c2w = np.stack([down, right, back, center], 1)
        hwf = np.array([[h * 4], [w * 4], [focal * 4]])
        poses_bounds.append(
            np.concatenate([np.concatenate([c2w, hwf], 1).reshape(-1),
                            np.array([2.0, 8.0])]))
    np.save(tmp_path / 'poses_bounds.npy', np.stack(poses_bounds))
    return str(tmp_path)


def make_rays(n=6, with_idx=True, seed=0, near=0.2, far=2.0, num_ids=4):
    """Random flat ray tensors (N, 8|9)."""
    rs = np.random.RandomState(seed)
    origins = rs.randn(n, 3).astype(np.float32) * 0.1
    dirs = rs.randn(n, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    cols = [origins, dirs,
            np.full((n, 1), near, np.float32),
            np.full((n, 1), far, np.float32)]
    if with_idx:
        cols.append((rs.randint(0, num_ids, (n, 1))).astype(np.float32))
    return np.concatenate(cols, axis=1)
