"""Occupancy-grid guided sampling: ops, model integration, train step."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hypernerf_tpu.configs import NerfConfig, TrainConfig
from hypernerf_tpu.models.nerf import NerfModel
from hypernerf_tpu.ops.occupancy import (cell_points, grid_lookup, init_grid,
                                         sample_occupancy_rays, update_grid)

BBOX = ((-2.0, -2.0, -2.0), (2.0, 2.0, 2.0))


def test_grid_lookup_nearest_voxel_and_outside():
    g = 4
    grid = jnp.arange(g ** 3, dtype=jnp.float32).reshape(g, g, g)
    # Center of voxel (1, 2, 3): world coords via the unit transform.
    pt = jnp.asarray([[-2 + 4 * (1.5 / g), -2 + 4 * (2.5 / g),
                       -2 + 4 * (3.5 / g)]])
    val = grid_lookup(grid, pt, BBOX)
    assert float(val[0]) == float(grid[1, 2, 3])
    outside = jnp.asarray([[5.0, 0.0, 0.0], [0.0, -2.5, 0.0]])
    np.testing.assert_array_equal(np.asarray(grid_lookup(grid, outside, BBOX)),
                                  [0.0, 0.0])


def test_update_grid_ema_max():
    grid = init_grid(4) + 1.0
    sigma = jnp.zeros((64,)).at[0].set(10.0)
    new = update_grid(grid, sigma, decay=0.5)
    assert float(new[0, 0, 0]) == 10.0      # new evidence wins
    assert float(new[1, 1, 1]) == 0.5       # decayed elsewhere


def test_cell_points_cover_bbox():
    pts = cell_points(8, BBOX)
    assert pts.shape == (512, 3)
    assert float(pts.min()) >= -2.0 and float(pts.max()) <= 2.0
    jit = cell_points(8, BBOX, key=jax.random.PRNGKey(0))
    assert float(jnp.max(jnp.abs(jit - pts))) <= 4.0 / 8  # within a cell


def test_sample_occupancy_concentrates():
    g = 32
    grid = init_grid(g)
    # Occupied shell: z-slice around world z in [0, 0.5].
    zi0 = int((0.0 + 2) / 4 * g)
    zi1 = int((0.5 + 2) / 4 * g) + 1
    grid = grid.at[:, :, zi0:zi1].set(50.0)

    b, s = 64, 32
    origins = jnp.tile(jnp.asarray([[0.0, 0.0, -2.0]]), (b, 1))
    dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (b, 1))
    z, pts = sample_occupancy_rays(
        jax.random.PRNGKey(0), origins, dirs, grid, BBOX, s,
        near=0.1, far=3.9, n_probes=64, use_stratified_sampling=True,
        floor=0.01)
    assert z.shape == (b, s) and pts.shape == (b, s, 3)
    assert bool(jnp.all(z[:, 1:] >= z[:, :-1]))          # sorted
    assert float(z.min()) >= 0.1 and float(z.max()) <= 3.9
    # World z of samples = -2 + t; occupied band is t in [2, 2.5].
    frac_in = float(jnp.mean((z >= 2.0) & (z <= 2.5)))
    assert frac_in > 0.6, frac_in  # ~12.5% of the range draws >60% of samples


def test_gate_fine_weights_suppresses_empty_space():
    from hypernerf_tpu.ops.occupancy import gate_fine_weights
    g = 16
    grid = init_grid(g)
    # Occupied only for world z in [0, 1].
    zi0, zi1 = int((0 + 2) / 4 * g), int((1 + 2) / 4 * g) + 1
    grid = grid.at[:, :, zi0:zi1].set(10.0)
    b, s = 4, 8
    origins = jnp.tile(jnp.asarray([[0.0, 0.0, -2.0]]), (b, 1))
    dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (b, 1))
    z = jnp.tile(jnp.linspace(0.5, 3.5, s)[None], (b, 1))  # world z -1.5..1.5
    w = jnp.ones((b, s))
    floor = 0.01
    gated = gate_fine_weights(grid, origins, dirs, z, w, BBOX, floor)
    # Voxels zi0..zi1-1 cover world z in [0, 1.25) <=> t in [2, 3.25).
    occupied = (z >= 2.0) & (z < 3.25)
    # Occupied bins keep ~full weight; empty bins drop to the floor.
    assert float(jnp.min(jnp.where(occupied, gated, 2.0))) >= 1.0
    emptied = jnp.where(occupied, 0.0, gated)
    assert float(jnp.max(emptied)) <= floor + 1e-6


def test_occupancy_update_probes_multiple_ids():
    """With per-frame geometry, a single-id probe misses frames; the
    multi-id max must see density from more than one metadata id."""
    from hypernerf_tpu.training.train_state import make_occupancy_update
    from hypernerf_tpu.training.optimizers import get_optimizer
    from hypernerf_tpu.training.train_state import create_train_state

    nerf_cfg, train_cfg = _tiny_cfgs()
    train_cfg = dataclasses.replace(train_cfg, occupancy_probe_ids=3)
    model = NerfModel(nerf_cfg)
    tx = get_optimizer(train_cfg, steps_per_epoch=10)
    state = create_train_state(model, tx, train_cfg, jax.random.PRNGKey(0),
                               _rays(16))
    update_fn = make_occupancy_update(model, nerf_cfg, train_cfg)
    new_state = update_fn(state, jax.random.PRNGKey(3))
    assert np.isfinite(np.asarray(new_state.occupancy)).all()
    assert float(jnp.sum(new_state.occupancy)) > 0.0


def _tiny_cfgs():
    nerf_cfg = NerfConfig(
        num_embeddings=4, num_coarse_samples=8, num_fine_samples=8,
        trunk_depth=2, trunk_width=32, rgb_branch_depth=1,
        rgb_branch_width=16, warp_depth=1, warp_width=16,
        hyper_sheet_depth=1, hyper_sheet_width=16, skips=(),
        noise_std=None, compute_dtype='float32', use_pallas=False,
        use_occupancy_grid=True, occupancy_resolution=8,
        occupancy_probes=16)
    train_cfg = TrainConfig(batch_size=16, lr=1e-3,
                            occupancy_update_every=2)
    return nerf_cfg, train_cfg


def _rays(n, num_ids=4):
    rs = np.random.RandomState(0)
    o = rs.randn(n, 3).astype(np.float32) * 0.1
    d = rs.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return np.concatenate([
        o, d, np.full((n, 1), 0.1, np.float32),
        np.full((n, 1), 3.0, np.float32),
        rs.randint(0, num_ids, (n, 1)).astype(np.float32)], 1)


def test_train_step_with_occupancy_grid():
    from hypernerf_tpu.ops.ray_dict import prepare_ray_dict
    from hypernerf_tpu.parallel.mesh import create_mesh, replicate
    from hypernerf_tpu.training.optimizers import get_optimizer
    from hypernerf_tpu.training.train_state import (create_train_state,
                                                    make_occupancy_update,
                                                    make_train_step)

    nerf_cfg, train_cfg = _tiny_cfgs()
    model = NerfModel(nerf_cfg)
    tx = get_optimizer(train_cfg, steps_per_epoch=10)
    rays = _rays(64)
    rgbs = np.random.RandomState(1).rand(64, 3).astype(np.float32)

    state = create_train_state(model, tx, train_cfg, jax.random.PRNGKey(0),
                               rays[:8])
    assert state.occupancy is not None
    assert state.occupancy.shape == (8, 8, 8)

    mesh = create_mesh()
    state = replicate(mesh, state)
    step_fn = make_train_step(model, tx, nerf_cfg, train_cfg, mesh)
    update_fn = make_occupancy_update(model, nerf_cfg, train_cfg)
    rng = jax.random.PRNGKey(1)

    state = update_fn(state, rng)
    occ_sum = float(jnp.sum(state.occupancy))
    assert np.isfinite(occ_sum) and occ_sum > 0.0  # softplus sigma > 0

    all_rays = replicate(mesh, jnp.asarray(rays))
    all_rgbs = replicate(mesh, jnp.asarray(rgbs))
    state, metrics = step_fn(state, all_rays, all_rgbs, rng)
    assert np.isfinite(float(metrics['loss']))
    assert state.occupancy is not None  # survives the step

    # Rendering without a grid (eval path) still works.
    rd = prepare_ray_dict(jnp.asarray(rays[:8]))
    from hypernerf_tpu.training.train_state import forward_params
    out = model.apply({'params': forward_params(state.params)}, rd,
                      deterministic=True)
    assert np.isfinite(float(jnp.sum(out['fine']['rgb'])))


def test_config_rejects_occupancy_with_linear_disparity():
    import pytest
    with pytest.raises(ValueError, match='linear depth'):
        NerfConfig(use_occupancy_grid=True, use_linear_disparity=True)


def test_restore_without_saved_occupancy_keeps_fresh_grid(tmp_path):
    """Resuming with newly-enabled use_occupancy_grid from an older
    checkpoint (saved without a grid) must keep the state's fresh grid."""
    from hypernerf_tpu.training import checkpoints as ckpt_lib
    from hypernerf_tpu.training.optimizers import get_optimizer
    from hypernerf_tpu.training.train_state import create_train_state

    nerf_cfg, train_cfg = _tiny_cfgs()
    no_occ_cfg = dataclasses.replace(nerf_cfg, use_occupancy_grid=False)
    rays = _rays(16)
    tx = get_optimizer(train_cfg, steps_per_epoch=10)
    old_state = create_train_state(NerfModel(no_occ_cfg), tx, train_cfg,
                                   jax.random.PRNGKey(0), rays[:8])
    assert old_state.occupancy is None
    path = ckpt_lib.save_checkpoint(str(tmp_path), 7, old_state,
                                    nerf_config=no_occ_cfg,
                                    train_config=train_cfg)

    new_state = create_train_state(NerfModel(nerf_cfg), tx, train_cfg,
                                   jax.random.PRNGKey(0), rays[:8])
    fresh = new_state.occupancy + 1.25
    new_state = new_state.replace(occupancy=fresh)
    restored = ckpt_lib.restore_checkpoint(path, new_state)
    assert int(restored.step) == 7
    np.testing.assert_allclose(np.asarray(restored.occupancy),
                               np.asarray(fresh))


def test_checkpoint_roundtrip_with_occupancy(tmp_path):
    from hypernerf_tpu.training import checkpoints as ckpt_lib
    from hypernerf_tpu.training.optimizers import get_optimizer
    from hypernerf_tpu.training.train_state import create_train_state

    nerf_cfg, train_cfg = _tiny_cfgs()
    model = NerfModel(nerf_cfg)
    tx = get_optimizer(train_cfg, steps_per_epoch=10)
    rays = _rays(16)
    state = create_train_state(model, tx, train_cfg, jax.random.PRNGKey(0),
                               rays[:8])
    state = state.replace(occupancy=state.occupancy + 3.5)
    path = ckpt_lib.save_checkpoint(str(tmp_path), 5, state,
                                    nerf_config=nerf_cfg,
                                    train_config=train_cfg)
    restored = ckpt_lib.restore_checkpoint(
        path, state.replace(occupancy=jnp.zeros_like(state.occupancy)))
    np.testing.assert_allclose(np.asarray(restored.occupancy),
                               np.asarray(state.occupancy))
    assert int(restored.step) == 5


def test_renderer_passes_occupancy_grid():
    """The eval renderer samples through the grid when one is passed:
    grid-guided output matches a direct model.apply with the grid and
    differs from the uniform-sampling render (VERDICT r2 item 4 follow-up:
    grid-trained models validate/eval with their training distribution)."""
    from hypernerf_tpu.ops.ray_dict import prepare_ray_dict
    from hypernerf_tpu.training.renderer import ImageRenderer

    nerf_cfg, _ = _tiny_cfgs()
    model = NerfModel(nerf_cfg)
    rays = _rays(16)
    key = jax.random.PRNGKey(0)
    params = model.init({'params': key, 'sampling': key},
                        prepare_ray_dict(jnp.asarray(rays[:8])))['params']
    # A deliberately lopsided grid so the guided z distribution differs.
    grid = jnp.zeros((8, 8, 8)).at[2:4, 2:4, 2:4].set(5.0)

    renderer = ImageRenderer(model, chunk=16)
    out_uniform = renderer(params, rays)
    out_grid = renderer(params, rays, occupancy_grid=grid)
    direct = model.apply({'params': params},
                         prepare_ray_dict(jnp.asarray(rays)),
                         deterministic=True, return_weights=False,
                         occupancy_grid=grid)
    np.testing.assert_allclose(out_grid['fine']['rgb'],
                               np.asarray(direct['fine']['rgb']), atol=1e-6)
    diff = np.abs(out_grid['fine']['rgb'] - out_uniform['fine']['rgb']).max()
    assert diff > 1e-7, 'grid had no effect on the rendered output'

    # The shard_map'd renderer threads the replicated grid identically.
    from hypernerf_tpu.parallel.mesh import create_mesh
    sharded = ImageRenderer(model, chunk=16, mesh=create_mesh(
        num_devices=8))(params, rays, occupancy_grid=grid)
    np.testing.assert_allclose(sharded['fine']['rgb'],
                               out_grid['fine']['rgb'], atol=1e-6)


def test_load_occupancy_from_checkpoint(tmp_path):
    from hypernerf_tpu.training import checkpoints as ckpt_lib
    from hypernerf_tpu.training.optimizers import get_optimizer
    from hypernerf_tpu.training.train_state import create_train_state

    nerf_cfg, train_cfg = _tiny_cfgs()
    tx = get_optimizer(train_cfg, steps_per_epoch=10)
    rays = _rays(16)
    state = create_train_state(NerfModel(nerf_cfg), tx, train_cfg,
                               jax.random.PRNGKey(0), rays[:8])
    state = state.replace(occupancy=state.occupancy + 2.0)
    path = ckpt_lib.save_checkpoint(str(tmp_path), 3, state,
                                    nerf_config=nerf_cfg,
                                    train_config=train_cfg)
    grid = ckpt_lib.load_occupancy(path)
    np.testing.assert_allclose(np.asarray(grid), np.asarray(state.occupancy))
    assert ckpt_lib.load_occupancy(None) is None

    # Checkpoints without a grid (non-occupancy run) yield None.
    no_occ = dataclasses.replace(nerf_cfg, use_occupancy_grid=False)
    state2 = create_train_state(NerfModel(no_occ), tx, train_cfg,
                                jax.random.PRNGKey(0), rays[:8])
    path2 = ckpt_lib.save_checkpoint(str(tmp_path / 'b'), 3, state2,
                                     nerf_config=no_occ,
                                     train_config=train_cfg)
    assert ckpt_lib.load_occupancy(path2) is None
