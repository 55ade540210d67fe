#!/usr/bin/env python
"""Profile the flagship train step on the attached accelerator.

Captures a jax.profiler trace around a few train steps (the bench.py
workload) and prints per-op EXCLUSIVE device times aggregated by op name,
largest first — the numbers quoted in BENCHMARKS.md.

Usage:
  python tools/profile_step.py [--steps N] [--batch B] [--top K]
  python tools/profile_step.py --config se3     # SE(3) warp variant

The xplane parsing needs tensorflow (present in this image) only to decode
the protobuf; nothing else touches TF.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def parse_xplane(trace_dir):
    """Sum exclusive device-op durations from the newest .xplane.pb."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(
        trace_dir, 'plugins/profile/*/*.xplane.pb')))
    if not paths:
        raise FileNotFoundError(f'no xplane under {trace_dir}')
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], 'rb') as f:
        xspace.ParseFromString(f.read())

    totals = {}
    for plane in xspace.planes:
        if 'TPU' not in plane.name and 'GPU' not in plane.name:
            continue
        # XLA Ops line carries exclusive per-op events on device planes.
        for line in plane.lines:
            if line.name not in ('XLA Ops',):
                continue
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                totals[name] = totals.get(name, 0.0) + ev.duration_ps / 1e9
    return totals  # name -> total ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=5)
    ap.add_argument('--batch', type=int, default=8192)
    ap.add_argument('--top', type=int, default=40)
    ap.add_argument('--config', default='flagship',
                    choices=['flagship', 'se3', 'anneal'])
    ap.add_argument('--trace_dir', default=None)
    args = ap.parse_args()

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
    batch_size = args.batch * n_chips
    kw = dict(num_embeddings=100, num_coarse_samples=64, num_fine_samples=64,
              use_warp=True, hyper_slice_method='bendy_sheet', noise_std=1.0,
              compute_dtype='bfloat16')
    if args.config == 'se3':
        kw['warp_field_type'] = 'se3'
    else:
        kw['warp_field_type'] = 'translation'
    if args.config == 'anneal':
        kw['use_original_embed'] = False
    cfg = NerfConfig(**kw)
    train_cfg = TrainConfig(batch_size=batch_size, lr=5e-4)

    mesh = create_mesh()
    model = NerfModel(cfg)
    tx = get_optimizer(train_cfg, steps_per_epoch=1000)

    n_rays = 1 << 18
    rs = np.random.RandomState(0)
    origins = rs.randn(n_rays, 3).astype(np.float32) * 0.1
    dirs = rs.randn(n_rays, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    rays = np.concatenate([
        origins, dirs, np.zeros((n_rays, 1), np.float32),
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

    state, metrics = step_fn(state, all_rays, all_rgbs, rng)
    jax.device_get(metrics['loss'])
    for _ in range(3):
        state, metrics = step_fn(state, all_rays, all_rgbs, rng)
    jax.device_get(metrics['loss'])

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix='hntpu_prof_')
    with jax.profiler.trace(trace_dir):
        for _ in range(args.steps):
            state, metrics = step_fn(state, all_rays, all_rgbs, rng)
        jax.device_get(metrics['loss'])
        jax.device_get(jax.tree.leaves(state.params)[0])

    totals = parse_xplane(trace_dir)
    per_step = {k: v / args.steps for k, v in totals.items()}
    total = sum(per_step.values())
    print(f'# trace: {trace_dir}')
    print(f'# config={args.config} batch={batch_size} steps={args.steps}')
    print(f'# total exclusive device time: {total:.1f} ms/step')
    for name, ms in sorted(per_step.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f'{ms:8.3f} ms  {name}')


if __name__ == '__main__':
    main()
