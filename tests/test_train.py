"""Training-system tests: sharded train step, overfit, checkpoints, trainer."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypernerf_tpu.configs import TrainConfig
from hypernerf_tpu.models.nerf import NerfModel
from hypernerf_tpu.parallel.mesh import create_mesh, replicate
from hypernerf_tpu.training import checkpoints as ckpt_lib
from hypernerf_tpu.training.optimizers import get_optimizer
from hypernerf_tpu.training.renderer import ImageRenderer
from hypernerf_tpu.training.train_state import (create_train_state,
                                                forward_params,
                                                make_train_step)
from tests.conftest import make_rays, make_smooth_llff_scene, tiny_nerf_config


def _smooth_ray_batch(n=2048):
    """Rays through a camera at origin looking -z with smooth target colors
    depending only on direction — overfittable by a tiny NeRF."""
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


def _make_setup(nerf_cfg, train_cfg, mesh):
    model = NerfModel(nerf_cfg)
    tx = get_optimizer(train_cfg, steps_per_epoch=100)
    rays, rgbs = _smooth_ray_batch()
    state = create_train_state(model, tx, train_cfg, jax.random.PRNGKey(0),
                               rays[:8])
    state = replicate(mesh, state)
    step_fn = make_train_step(model, tx, nerf_cfg, train_cfg, mesh)
    all_rays = replicate(mesh, jnp.asarray(rays))
    all_rgbs = replicate(mesh, jnp.asarray(rgbs))
    return model, state, step_fn, all_rays, all_rgbs


def test_train_step_runs_on_8_device_mesh():
    mesh = create_mesh()
    assert mesh.devices.size == 8
    cfg = tiny_nerf_config(num_fine_samples=0, use_warp=False,
                           hyper_slice_method='none', noise_std=0.0)
    tc = TrainConfig(batch_size=256, lr=1e-3)
    model, state, step_fn, all_rays, all_rgbs = _make_setup(cfg, tc, mesh)
    rng = jax.random.PRNGKey(1)
    for _ in range(3):
        state, metrics = step_fn(state, all_rays, all_rgbs, rng)
    metrics = jax.device_get(metrics)
    assert np.isfinite(metrics['loss'])
    assert np.isfinite(metrics['psnr'])
    assert int(jax.device_get(state.step)) == 3
    for leaf in jax.tree.leaves(jax.device_get(state.params)):
        assert np.isfinite(leaf).all()


def test_multi_device_step_equals_single_device():
    """The ddp_sharded contract (/root/reference/train.py:229): an 8-device
    step with pmean on the identical global batch produces the same loss and
    parameter update as a 1-device step."""
    cfg = tiny_nerf_config(use_stratified_sampling=False, noise_std=None)
    tc = TrainConfig(batch_size=64, lr=1e-3)
    model = NerfModel(cfg)
    tx = get_optimizer(tc, steps_per_epoch=100)
    rays, rgbs = _smooth_ray_batch(64)
    rng = jax.random.PRNGKey(1)

    results = {}
    for n_dev in (1, 8):
        mesh = create_mesh(num_devices=n_dev)
        state = create_train_state(model, tx, tc, jax.random.PRNGKey(0),
                                   rays[:8])
        state = replicate(mesh, state)
        step_fn = make_train_step(model, tx, cfg, tc, mesh,
                                  explicit_batch=True)
        from hypernerf_tpu.parallel.mesh import shard_batch
        b_rays = shard_batch(mesh, jnp.asarray(rays))
        b_rgbs = shard_batch(mesh, jnp.asarray(rgbs))
        state, metrics = step_fn(state, b_rays, b_rgbs, rng)
        results[n_dev] = (jax.device_get(metrics['loss']),
                          jax.device_get(state.params))

    loss1, params1 = results[1]
    loss8, params8 = results[8]
    np.testing.assert_allclose(loss1, loss8, rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree.leaves(params1), jax.tree.leaves(params8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_zero1_optimizer_sharding_matches_replicated():
    """--shard_optimizer_state (the fairscale ddp_sharded analogue,
    /root/reference/train.py:229): the ZeRO-1 step produces the identical
    update to the replicated one, and the Adam moments actually live
    sharded over the data axis."""
    cfg = tiny_nerf_config(use_stratified_sampling=False, noise_std=None)
    rays, rgbs = _smooth_ray_batch(64)
    rng = jax.random.PRNGKey(1)
    mesh = create_mesh()
    from hypernerf_tpu.parallel.mesh import shard_batch
    b_rays = shard_batch(mesh, jnp.asarray(rays))
    b_rgbs = shard_batch(mesh, jnp.asarray(rgbs))

    results = {}
    for zero1 in (False, True):
        tc = TrainConfig(batch_size=64, lr=1e-3,
                         shard_optimizer_state=zero1)
        model = NerfModel(cfg)
        tx = get_optimizer(tc, steps_per_epoch=100)
        state = create_train_state(model, tx, tc, jax.random.PRNGKey(0),
                                   rays[:8])
        state = replicate(mesh, state)
        step_fn = make_train_step(model, tx, cfg, tc, mesh,
                                  explicit_batch=True)
        for _ in range(2):
            state, metrics = step_fn(state, b_rays, b_rgbs, rng)
        results[zero1] = (jax.device_get(metrics['loss']), state)

    loss_rep, state_rep = results[False]
    loss_z1, state_z1 = results[True]
    np.testing.assert_allclose(loss_rep, loss_z1, rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree.leaves(jax.device_get(state_rep.params)),
                    jax.tree.leaves(jax.device_get(state_z1.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(jax.device_get(state_rep.opt_state)),
                    jax.tree.leaves(jax.device_get(state_z1.opt_state))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    # The moments are materially sharded: every divisible leaf is split
    # over the 8 devices (1/8 of the bytes per device), the rest replicated.
    n_sharded = 0
    for leaf in jax.tree.leaves(state_z1.opt_state):
        if leaf.ndim >= 1 and leaf.shape[0] and leaf.shape[0] % 8 == 0:
            assert not leaf.sharding.is_fully_replicated, leaf.shape
            shard = leaf.addressable_shards[0]
            assert shard.data.shape[0] == leaf.shape[0] // 8
            n_sharded += 1
    assert n_sharded > 0


def test_batch_size_must_divide_devices():
    mesh = create_mesh()
    cfg = tiny_nerf_config()
    tc = TrainConfig(batch_size=100)  # not divisible by 8
    model = NerfModel(cfg)
    tx = get_optimizer(tc, steps_per_epoch=10)
    with pytest.raises(ValueError, match='divisible'):
        make_train_step(model, tx, cfg, tc, mesh)


def test_overfit_smooth_scene():
    """End-to-end sanity: loss drops and PSNR climbs on a learnable scene."""
    mesh = create_mesh(num_devices=1)
    cfg = tiny_nerf_config(num_fine_samples=0, use_warp=False,
                           hyper_slice_method='none', noise_std=0.0,
                           num_coarse_samples=8,
                           trunk_depth=3, trunk_width=32)
    tc = TrainConfig(batch_size=512, lr=5e-3, lr_scheduler='steplr',
                     decay_step=(1000,))
    model, state, step_fn, all_rays, all_rgbs = _make_setup(cfg, tc, mesh)
    rng = jax.random.PRNGKey(1)
    first_psnr = None
    for i in range(150):
        state, metrics = step_fn(state, all_rays, all_rgbs, rng)
        if i == 0:
            first_psnr = float(jax.device_get(metrics)['psnr'])
    final_psnr = float(jax.device_get(metrics)['psnr'])
    assert final_psnr > first_psnr + 5.0, (first_psnr, final_psnr)
    assert final_psnr > 20.0, final_psnr


def test_checkpoint_roundtrip(tmp_path):
    mesh = create_mesh(num_devices=1)
    cfg = tiny_nerf_config(num_fine_samples=0, use_warp=False,
                           hyper_slice_method='none')
    tc = TrainConfig(batch_size=64, lr=1e-3)
    model, state, step_fn, all_rays, all_rgbs = _make_setup(cfg, tc, mesh)
    rng = jax.random.PRNGKey(1)
    state, _ = step_fn(state, all_rays, all_rgbs, rng)
    state, _ = step_fn(state, all_rays, all_rgbs, rng)

    ckpt_dir = str(tmp_path / 'ckpts')
    path = ckpt_lib.save_checkpoint(ckpt_dir, 2, jax.device_get(state),
                                    metrics={'val/psnr': 11.5})
    assert ckpt_lib.latest_checkpoint(ckpt_dir) == path
    assert ckpt_lib.best_checkpoint(ckpt_dir) == path

    # Full-state restore into a fresh state.
    fresh = create_train_state(model, get_optimizer(tc, 100), tc,
                               jax.random.PRNGKey(42),
                               np.asarray(all_rays[:8]))
    restored = ckpt_lib.restore_checkpoint(path, fresh)
    assert int(restored.step) == 2
    orig_flat = jax.tree.leaves(jax.device_get(state.params))
    rest_flat = jax.tree.leaves(restored.params)
    for a, b in zip(orig_flat, rest_flat):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Resumed training continues without error.
    restored = replicate(mesh, restored)
    restored, metrics = step_fn(restored, all_rays, all_rgbs, rng)
    assert int(jax.device_get(restored.step)) == 3


def test_weights_only_load_and_prefix_ignore(tmp_path):
    mesh = create_mesh(num_devices=1)
    cfg = tiny_nerf_config(num_fine_samples=0, use_warp=False,
                           hyper_slice_method='none')
    tc = TrainConfig(batch_size=64)
    model, state, step_fn, all_rays, all_rgbs = _make_setup(cfg, tc, mesh)
    ckpt_dir = str(tmp_path / 'ckpts')
    path = ckpt_lib.save_checkpoint(ckpt_dir, 1, jax.device_get(state))

    # Fresh init differs; partial load recovers the saved weights.
    fresh = create_train_state(model, get_optimizer(tc, 100), tc,
                               jax.random.PRNGKey(42),
                               np.asarray(all_rays[:8]))
    loaded = ckpt_lib.load_weights(fresh.params, path)
    want = jax.device_get(state.params)
    for a, b in zip(jax.tree.leaves(loaded), jax.tree.leaves(want)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Ignored prefixes keep the fresh init.
    loaded2 = ckpt_lib.load_weights(fresh.params, path,
                                    prefixes_to_ignore=('nerf_coarse',))
    assert not np.array_equal(
        np.asarray(loaded2['nerf_coarse']['trunk']['hidden_0']['kernel']),
        np.asarray(want['nerf_coarse']['trunk']['hidden_0']['kernel']))

    # save_weights_only strips the optimizer state.
    out_path = str(tmp_path / 'weights_only')
    ckpt_lib.save_weights_only(path, out_path)
    raw = ckpt_lib.extract_model_params(out_path)
    assert any('trunk' in k for k in raw)


def test_trainer_end_to_end(tmp_path):
    """The Trainer class: data -> fit -> val -> ckpt (LLFF synthetic scene)."""
    scene = make_smooth_llff_scene(tmp_path / 'scene')
    from hypernerf_tpu.training.trainer import Trainer
    cfg = tiny_nerf_config(num_fine_samples=4, num_coarse_samples=4,
                           noise_std=0.0)
    tc = TrainConfig(root_dir=scene, dataset_name='llff', img_wh=(16, 12),
                     batch_size=64, chunk=64, max_steps=6, log_every=2,
                     num_sanity_val_steps=1, val_check_interval=0.5,
                     exp_name='t', ckpt_dir=str(tmp_path / 'ckpts'),
                     log_dir=str(tmp_path / 'logs'))
    mesh = create_mesh(num_devices=2)
    trainer = Trainer(cfg, tc, mesh=mesh)
    # num_embeddings covers every dataset image id.
    assert trainer.nerf_cfg.num_embeddings >= 3
    metrics = trainer.fit(progress=False)
    assert np.isfinite(metrics['train/loss'])
    val = trainer.validate(step=6, log_images=False)
    assert np.isfinite(val['val/psnr'])
    ckpt = ckpt_lib.latest_checkpoint(os.path.join(str(tmp_path / 'ckpts'),
                                                   't'))
    assert ckpt is not None
    assert os.path.exists(os.path.join(os.path.dirname(ckpt),
                                       'nerf_config.json'))


def test_renderer_padding():
    mesh = create_mesh(num_devices=1)
    cfg = tiny_nerf_config(num_fine_samples=0, use_warp=False,
                           hyper_slice_method='none')
    model = NerfModel(cfg)
    rays = make_rays(50)
    from hypernerf_tpu.ops.ray_dict import prepare_ray_dict
    key = jax.random.PRNGKey(0)
    variables = model.init({'params': key, 'sampling': key},
                           prepare_ray_dict(jnp.asarray(rays[:8])))
    renderer = ImageRenderer(model, chunk=16)
    out = renderer(variables['params'], rays)  # 50 -> pads to 64
    assert out['coarse']['rgb'].shape == (50, 3)
    assert np.isfinite(out['coarse']['rgb']).all()


def test_renderer_packed_readback_matches_float():
    """keep/levels/quantize bound the readback without changing pixels:
    the device-quantized rgb is bit-equal to host to_uint8 of the float
    render (so eval.py's PNG bytes are unchanged by the packed path)."""
    from hypernerf_tpu.utils.visualization import to_uint8
    cfg = tiny_nerf_config(num_fine_samples=4, use_warp=False,
                           hyper_slice_method='none',
                           use_stratified_sampling=False, noise_std=None)
    model = NerfModel(cfg)
    rays = make_rays(32)
    from hypernerf_tpu.ops.ray_dict import prepare_ray_dict
    key = jax.random.PRNGKey(0)
    variables = model.init({'params': key, 'sampling': key},
                           prepare_ray_dict(jnp.asarray(rays[:8])))
    full = ImageRenderer(model, chunk=16)(variables['params'], rays)
    packed = ImageRenderer(model, chunk=16, keep=('rgb',), levels=('fine',),
                           quantize=True)(variables['params'], rays)
    assert set(packed) == {'fine'}
    assert set(packed['fine']) == {'rgb'}
    assert packed['fine']['rgb'].dtype == np.uint8
    np.testing.assert_array_equal(packed['fine']['rgb'],
                                  to_uint8(full['fine']['rgb']))


def test_trainer_blender_dataset(tmp_path):
    """Trainer end-to-end on a Blender scene (white background honored)."""
    import json
    from PIL import Image
    rs = np.random.RandomState(0)
    frames = []
    (tmp_path / 'train').mkdir()
    for i in range(2):
        img = (rs.rand(16, 16, 4) * 255).astype(np.uint8)
        Image.fromarray(img, 'RGBA').save(tmp_path / 'train' / f'r_{i}.png')
        c2w = np.eye(4); c2w[2, 3] = 4.0
        frames.append({'file_path': f'./train/r_{i}',
                       'transform_matrix': c2w.tolist()})
    meta = {'camera_angle_x': 0.7, 'frames': frames}
    for split in ('train', 'val'):
        with open(tmp_path / f'transforms_{split}.json', 'w') as f:
            json.dump(meta, f)

    from tests.conftest import tiny_nerf_config
    from hypernerf_tpu.training.trainer import Trainer
    cfg = tiny_nerf_config(num_fine_samples=0, num_coarse_samples=4,
                           noise_std=0.0)
    tc = TrainConfig(root_dir=str(tmp_path), dataset_name='blender',
                     img_wh=(16, 16), batch_size=32, chunk=64, max_steps=2,
                     num_sanity_val_steps=0, log_every=1, exp_name='b',
                     ckpt_dir=str(tmp_path / 'ckpts'),
                     log_dir=str(tmp_path / 'logs'))
    trainer = Trainer(cfg, tc, mesh=create_mesh(num_devices=1))
    # Dataset white background propagates into the model config.
    assert trainer.nerf_cfg.use_white_background
    metrics = trainer.fit(progress=False)
    assert np.isfinite(metrics['train/loss'])


def test_load_weights_missing_path_is_noop():
    params = {'a': jnp.ones((2, 2))}
    assert ckpt_lib.load_weights(params, None) is params
    assert ckpt_lib.load_weights(params, '') is params


def test_latest_and_best_checkpoint_empty_dir(tmp_path):
    assert ckpt_lib.latest_checkpoint(str(tmp_path)) is None
    assert ckpt_lib.best_checkpoint(str(tmp_path)) is None
    assert ckpt_lib.latest_checkpoint(str(tmp_path / 'nope')) is None
