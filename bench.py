#!/usr/bin/env python
"""Benchmark: training-step throughput of the flagship HyperNeRF model.

Measures rays/sec/chip of the full jitted+sharded train step (translation
warp + bendy-sheet slicing, coarse 64 + fine 64 samples — the BASELINE.json
metric config) on whatever accelerator is attached, and prints ONE JSON line:

  {"metric": "rays_per_sec_per_chip", "value": N, "unit": "rays/s",
   "vs_baseline": N}

Baseline: the reference's implied 4.1k rays/s on a GTX 2080Ti
(/root/repo/BASELINE.md, derived from /root/reference/Readme.md:29-41).

``--mode`` reproduces every showcased variant (docs/VALIDATION.md) as a
one-liner: flagship (default) | se3 | quaternion | anneal (windowed Nerfies
encoding) | occupancy (grid-guided 32+32 fast preset, refresh amortized
into the timed loop) | render / render_occupancy (secs/frame at 504x378 —
the BASELINE.json third metric — through the production tiled renderer).
"""

from __future__ import annotations

import argparse
import json
import time

BASELINE_RAYS_PER_SEC = 4100.0  # 1x 2080Ti, BASELINE.md

MODES = ('flagship', 'se3', 'quaternion', 'anneal', 'occupancy',
         'static', 'plane', 'elastic', 'elastic_se3', 'elastic_quaternion',
         'render', 'render_occupancy')

# The reference renders one 504x378 frame through its chunked eval loop in
# ~30 s on the 2080Ti (190,512 rays / 2048-ray chunks at its ~26k rays/s
# no-grad forward: 100k steps x 1024 rays / 7h training at 3 fwd + bwd
# passes ~= 4.1k * 6.3). Conservative derivation; used only for the render
# modes' vs_baseline ratio.
BASELINE_SECS_PER_FRAME = 30.0


def mode_overrides(mode: str) -> dict:
    if mode == 'se3':
        return dict(warp_field_type='se3')
    if mode == 'quaternion':
        return dict(warp_field_type='quaternion')
    if mode == 'anneal':
        return dict(use_original_embed=False)
    if mode in ('occupancy', 'render_occupancy'):
        return dict(use_occupancy_grid=True,
                    num_coarse_samples=32, num_fine_samples=32)
    if mode == 'elastic':
        return dict(elastic_jacobian_samples=16)
    if mode == 'elastic_se3':
        return dict(warp_field_type='se3', elastic_jacobian_samples=16)
    if mode == 'elastic_quaternion':
        return dict(warp_field_type='quaternion',
                    elastic_jacobian_samples=16)
    if mode == 'static':
        return dict(use_warp=False, hyper_slice_method='none')
    if mode == 'plane':
        return dict(hyper_slice_method='axis_aligned_plane')
    return {}


def bench_render(mode: str, cfg, model, chunk: int = 8192):
    """secs/frame at 504x378 (the BASELINE.json third metric): a full-frame
    forward render through the production tiled renderer (eval.py's path)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hypernerf_tpu.ops.ray_dict import prepare_ray_dict
    from hypernerf_tpu.training.renderer import ImageRenderer

    w, h = 504, 378
    n_rays = w * h
    rs = np.random.RandomState(0)
    origins = np.zeros((n_rays, 3), np.float32)
    dirs = rs.randn(n_rays, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    rays = np.concatenate([
        origins, dirs,
        np.zeros((n_rays, 1), np.float32),
        np.ones((n_rays, 1), np.float32),
        np.zeros((n_rays, 1), np.float32)], 1)

    rng = jax.random.PRNGKey(0)
    params = model.init({'params': rng, 'sampling': rng, 'sigma_noise': rng},
                        prepare_ray_dict(jnp.asarray(rays[:8])))['params']
    grid = None
    if cfg.use_occupancy_grid:
        grid = jax.random.uniform(rng, (cfg.occupancy_resolution,) * 3)
    # The production eval readback: final level only, uint8 rgb quantized
    # on device (eval.py writes uint8 PNGs; the f32 readback was pure
    # tunnel-transfer waste — ~4.6 MB/frame -> ~0.2 MB).
    renderer = ImageRenderer(model, chunk=chunk, keep=('rgb',),
                             levels=('fine',), quantize=True)

    renderer(params, rays, occupancy_grid=grid)  # compile + warm
    n_frames = 5
    t0 = time.perf_counter()
    for _ in range(n_frames):
        out = renderer(params, rays, occupancy_grid=grid)
    # render_rays device_gets internally; out is host numpy already.
    assert out['fine']['rgb'].dtype == np.uint8
    secs = (time.perf_counter() - t0) / n_frames
    print(json.dumps({
        'metric': 'secs_per_frame_504x378',
        'value': round(secs, 4),
        'unit': 's',
        'vs_baseline': round(BASELINE_SECS_PER_FRAME / secs, 2),
    }))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--mode', choices=MODES, default='flagship')
    # 16384 is the measured throughput sweet spot on v5e (sweep: 8192 ->
    # 75.8k, 16384 -> 77.0k, 32768 -> 76.8k rays/s; BENCHMARKS.md).
    parser.add_argument('--batch_per_chip', type=int, default=16384)
    # 16384 measured best on v5e (8192 -> 1.02, 16384 -> 0.99, 32768 ->
    # 0.99 s/frame); bigger tiles amortize the lax.map loop overhead.
    parser.add_argument('--render_chunk', type=int, default=16384,
                        help='rays per lax.map tile in the render modes')
    # Kernel-config overrides (default: NerfConfig defaults) for sweeps.
    parser.add_argument('--pipelined_bwd', type=int, choices=(0, 1),
                        default=None,
                        help='override NerfConfig.pallas_pipelined_bwd')
    parser.add_argument('--pipelined_fwd', type=int, choices=(0, 1),
                        default=None,
                        help='override NerfConfig.pallas_pipelined_fwd')
    parser.add_argument('--interleaved_fwd', type=int, choices=(0, 1),
                        default=None,
                        help='override NerfConfig.pallas_interleaved_fwd '
                             '(half-tile interleaved level forward)')
    parser.add_argument('--bf16_epilogue', type=int, choices=(0, 1),
                        default=None,
                        help='override NerfConfig.pallas_bf16_epilogue '
                             '(hidden-layer bias+relu in bf16)')
    parser.add_argument('--bwd_tile', type=int, default=None,
                        help='override NerfConfig.pallas_bwd_tile')
    parser.add_argument('--fwd_tile', type=int, default=None,
                        help='override NerfConfig.pallas_tile')
    parser.add_argument('--n_fine', type=int, default=None,
                        help='override num_fine_samples (e.g. 128 = the '
                             'reference default, a non-power-of-two union '
                             'riding the sentinel-padded in-kernel merge)')
    args = parser.parse_args()

    from hypernerf_tpu.utils.platform import apply_platform_overrides
    apply_platform_overrides()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hypernerf_tpu.configs import NerfConfig, TrainConfig
    from hypernerf_tpu.models.nerf import NerfModel
    from hypernerf_tpu.parallel.mesh import create_mesh, replicate
    from hypernerf_tpu.training.optimizers import get_optimizer
    from hypernerf_tpu.training.train_state import (create_train_state,
                                                    make_train_step)

    n_chips = len(jax.devices())
    batch_size = args.batch_per_chip * n_chips
    cfg_kwargs = dict(
        num_embeddings=100,
        num_coarse_samples=64,
        num_fine_samples=64,
        use_warp=True,
        warp_field_type='translation',
        hyper_slice_method='bendy_sheet',
        noise_std=1.0,
        compute_dtype='bfloat16',
    )
    cfg_kwargs.update(mode_overrides(args.mode))
    if args.n_fine is not None:
        cfg_kwargs['num_fine_samples'] = args.n_fine
    if args.pipelined_bwd is not None:
        cfg_kwargs['pallas_pipelined_bwd'] = bool(args.pipelined_bwd)
    if args.pipelined_fwd is not None:
        cfg_kwargs['pallas_pipelined_fwd'] = bool(args.pipelined_fwd)
    if args.interleaved_fwd is not None:
        cfg_kwargs['pallas_interleaved_fwd'] = bool(args.interleaved_fwd)
    if args.bf16_epilogue is not None:
        cfg_kwargs['pallas_bf16_epilogue'] = bool(args.bf16_epilogue)
    if args.bwd_tile is not None:
        cfg_kwargs['pallas_bwd_tile'] = args.bwd_tile
    if args.fwd_tile is not None:
        cfg_kwargs['pallas_tile'] = args.fwd_tile
    cfg = NerfConfig(**cfg_kwargs)
    # elastic*: the respective warp family + the Nerfies elastic penalty,
    # which adds the fused warp-Jacobian side channel (stacked forward-mode
    # tangents — ops/pallas/fused_jacobian.py for the translation warp,
    # fused_se3_jacobian.py + the XLA retraction JVP for se3/quaternion;
    # the render itself stays on the fused level kernels — models/nerf.py).
    elastic_w = 0.01 if args.mode.startswith('elastic') else 0.0
    train_cfg = TrainConfig(batch_size=batch_size, lr=5e-4,
                            elastic_loss_weight=elastic_w)

    mesh = create_mesh()
    model = NerfModel(cfg)
    if args.mode.startswith('render'):
        return bench_render(args.mode, cfg, model, chunk=args.render_chunk)
    tx = get_optimizer(train_cfg, steps_per_epoch=1000)

    # Synthetic device-resident ray buffer (throughput is data-independent).
    n_rays = 1 << 18
    rs = np.random.RandomState(0)
    origins = rs.randn(n_rays, 3).astype(np.float32) * 0.1
    dirs = rs.randn(n_rays, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    rays = np.concatenate([
        origins, dirs,
        np.zeros((n_rays, 1), np.float32),
        np.ones((n_rays, 1), np.float32),
        rs.randint(0, 100, (n_rays, 1)).astype(np.float32)], 1)
    rgbs = rs.rand(n_rays, 3).astype(np.float32)

    state = create_train_state(model, tx, train_cfg, jax.random.PRNGKey(0),
                               rays[:8])
    state = replicate(mesh, state)
    all_rays = replicate(mesh, jnp.asarray(rays))
    all_rgbs = replicate(mesh, jnp.asarray(rgbs))
    step_fn = make_train_step(model, tx, cfg, train_cfg, mesh)
    rng = jax.random.PRNGKey(1)

    update_fn = None
    if cfg.use_occupancy_grid:
        from hypernerf_tpu.training.train_state import make_occupancy_update
        update_fn = make_occupancy_update(model, cfg, train_cfg)
        update_every = train_cfg.occupancy_update_every

    # Warmup: compile + 3 steps. (device_get, not block_until_ready: the
    # remote-tunnel backend can report ready before execution completes, so
    # force a host readback of a value at the end of the dependency chain.)
    if update_fn is not None:
        state = update_fn(state, rng)
    state, metrics = step_fn(state, all_rays, all_rgbs, rng)
    jax.device_get(metrics['loss'])
    for _ in range(3):
        state, metrics = step_fn(state, all_rays, all_rgbs, rng)
    jax.device_get(metrics['loss'])

    n_steps = 20
    t0 = time.perf_counter()
    for i in range(n_steps):
        # Amortize the grid refresh at its real training cadence so the
        # occupancy number is honest end-to-end throughput.
        if update_fn is not None and i % update_every == 0:
            state = update_fn(state, rng)
        state, metrics = step_fn(state, all_rays, all_rgbs, rng)
    jax.device_get(metrics['loss'])
    jax.device_get(jax.tree.leaves(state.params)[0])
    elapsed = time.perf_counter() - t0

    rays_per_sec = n_steps * batch_size / elapsed
    rays_per_sec_per_chip = rays_per_sec / n_chips
    print(json.dumps({
        'metric': 'rays_per_sec_per_chip',
        'value': round(rays_per_sec_per_chip, 1),
        'unit': 'rays/s',
        'vs_baseline': round(rays_per_sec_per_chip / BASELINE_RAYS_PER_SEC, 2),
    }))


if __name__ == '__main__':
    main()
