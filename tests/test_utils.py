"""Tests for metrics (SSIM), logging, and visualization utilities."""

import os

import jax.numpy as jnp
import numpy as np

from hypernerf_tpu.training.metrics import mse, psnr, ssim
from hypernerf_tpu.utils.logging import MetricsLogger
from hypernerf_tpu.utils.visualization import to_uint8, visualize_depth


def test_psnr_known_values():
    a = jnp.zeros((8, 8, 3))
    b = jnp.ones((8, 8, 3)) * 0.1
    np.testing.assert_allclose(float(mse(a, b)), 0.01, rtol=1e-6)
    np.testing.assert_allclose(float(psnr(a, b)), 20.0, rtol=1e-5)


def test_psnr_valid_mask():
    a = jnp.zeros((4, 4, 1))
    b = jnp.ones((4, 4, 1))
    mask = jnp.zeros((4, 4, 1), bool).at[0, 0, 0].set(True)
    # Only one pixel differs within the mask -> mse over masked region = 1.
    np.testing.assert_allclose(float(mse(a, b, valid_mask=mask)), 1.0)


def test_ssim_identity_and_noise():
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(32, 32, 3).astype(np.float32))
    assert float(ssim(img, img)) > 0.999
    noisy = img + jnp.asarray(rs.randn(32, 32, 3).astype(np.float32)) * 0.3
    assert float(ssim(img, noisy)) < 0.8


def test_visualize_depth():
    depth = np.linspace(0, 1, 64).reshape(8, 8)
    rgb = visualize_depth(depth)
    assert rgb.shape == (8, 8, 3)
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0
    # JET: near (min depth) is blue-ish, far is red-ish.
    assert not np.allclose(rgb[0, 0], rgb[-1, -1])
    # NaN-safe.
    rgb2 = visualize_depth(np.full((4, 4), np.nan))
    assert np.isfinite(rgb2).all()


def test_to_uint8_clips():
    img = np.array([[-0.5, 0.5, 1.5]])
    out = to_uint8(img)
    np.testing.assert_array_equal(out, [[0, 127, 255]])


def test_metrics_logger_csv_and_images(tmp_path):
    logger = MetricsLogger(str(tmp_path), 'exp', use_tensorboard=False)
    logger.add_scalar('train/loss', 0.5, 1)
    logger.add_scalar('val/psnr', 30.0, 2)
    logger.add_images('val/GT_pred_depth',
                      np.zeros((2, 4, 4, 3), np.float32), 2)
    logger.close()
    csv_path = os.path.join(str(tmp_path), 'exp', 'metrics.csv')
    with open(csv_path) as f:
        lines = f.read().strip().splitlines()
    assert lines[0] == 'time,step,tag,value'
    assert any('train/loss' in l for l in lines)
    img_dir = os.path.join(str(tmp_path), 'exp', 'images')
    assert len(os.listdir(img_dir)) == 2


def test_distributed_helpers_noop_without_env(monkeypatch):
    from hypernerf_tpu.parallel.distributed import (is_primary_host,
                                                    maybe_initialize_distributed)
    monkeypatch.delenv('HYPERNERF_COORDINATOR', raising=False)
    assert maybe_initialize_distributed() is False
    assert is_primary_host() is True


def test_shard_batch_and_replicate():
    import jax
    import jax.numpy as jnp
    from hypernerf_tpu.parallel.mesh import create_mesh, replicate, shard_batch
    mesh = create_mesh()
    x = jnp.arange(16.0).reshape(16, 1)
    sharded = shard_batch(mesh, x)
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(x))
    rep = replicate(mesh, {'a': x})
    np.testing.assert_array_equal(np.asarray(rep['a']), np.asarray(x))


def test_process_local_data_path_matches_device_put():
    """The multi-host pod path (make_array_from_process_local_data) must
    assemble the same global arrays as plain device_put: same values, same
    shardings, for both the replicated dataset buffers and a sharded batch.
    Single-process here, but the API path is identical on a pod."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from hypernerf_tpu.parallel.mesh import DATA_AXIS, _put, create_mesh
    mesh = create_mesh()
    x = np.arange(32.0, dtype=np.float32).reshape(16, 2)
    for spec in (P(), P(DATA_AXIS)):
        sharding = NamedSharding(mesh, spec)
        via_local = _put({'a': x}, sharding, True)['a']
        via_put = _put({'a': jnp.asarray(x)}, sharding, False)['a']
        np.testing.assert_array_equal(np.asarray(via_local),
                                      np.asarray(via_put))
        assert via_local.sharding.is_equivalent_to(via_put.sharding, x.ndim)
