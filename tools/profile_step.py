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


_SHAPE_RE = None


def _parse_operands(hlo_text):
    """Extract (dtype, dims) for every operand of a custom-call HLO string.

    The xplane op name is the full HLO instruction text; its operand list
    sits inside ``custom-call(...)``. Returns [] for non-custom-calls.
    """
    import re
    global _SHAPE_RE
    if _SHAPE_RE is None:
        _SHAPE_RE = re.compile(r'(f32|bf16|s32|u32)\[([\d,]*)\]')
    m = re.search(r'custom-call\((.*?)\), custom_call_target', hlo_text,
                  re.DOTALL)
    if not m:
        return []
    out = []
    for dt, dims in _SHAPE_RE.findall(m.group(1)):
        out.append((dt, tuple(int(d) for d in dims.split(',') if d)))
    return out


def mxu_report(per_step, peak_tflops):
    """Analytic per-kernel MXU utilization for the fused level kernels.

    The Pallas kernels are opaque custom calls — XLA cost analysis assigns
    them zero FLOPs and the standard trace carries no hardware counters —
    so utilization is derived from first principles: every weight matrix a
    kernel consumes is visible in its HLO operand list, each contributes
    exactly 2*N*in*out MXU FLOPs per pass over N samples (the kernels do
    nothing else on the MXU except the cheap posenc band expansion), and
    backward kernels run 3 passes (fwd recompute + dX + dW; the outputs
    tuple full of weight-shaped fp32 gradients identifies them). N comes
    from the largest leading dim among activation operands.
    """
    rows = []
    for name, ms in per_step.items():
        if '_render_level_fused' not in name or 'custom-call' not in name:
            continue
        operands = _parse_operands(name)
        if not operands:
            continue
        # Weights: 2-D (in, out) with both dims in [8, 512]; biases (1, out)
        # and activations (N, c) / 3-D tiles are excluded.
        weights = [d for dt, d in operands
                   if len(d) == 2 and 8 <= d[0] <= 512 and 8 <= d[1] <= 512]
        n = max((d[0] for dt, d in operands
                 if len(d) == 2 and d[0] > 512), default=0)
        if not weights or not n:
            continue  # compositing/sampling kernels: VPU-bound, no weights
        # Backward kernels return the per-weight fp32 gradient accumulators.
        out_m = name.split('custom-call(')[0]
        grads = _SHAPE_RE.findall(out_m)
        n_grad_outs = sum(1 for dt, dims in grads
                          if dt == 'f32' and len(
                              tuple(int(x) for x in dims.split(',') if x)) == 2
                          and 8 <= int(dims.split(',')[0]) <= 512)
        passes = 3 if n_grad_outs >= 5 else 1
        flops = passes * sum(2 * a * b for a, b in weights) * n
        tflops = flops / (ms * 1e-3) / 1e12
        rows.append((name.split(' = ')[0].strip('% '), ms, n, passes,
                     flops / 1e9, tflops, 100 * tflops / peak_tflops))
    print(f'\n# MXU utilization (analytic: operand-derived matmul FLOPs / '
          f'measured time / {peak_tflops:.0f} TF/s peak)')
    print(f'{"kernel":44s} {"ms":>7s} {"samples":>9s} {"passes":>6s} '
          f'{"GFLOP":>8s} {"TFLOP/s":>8s} {"MXU%":>6s}')
    for r in sorted(rows, key=lambda r: -r[1]):
        print(f'{r[0]:44s} {r[1]:7.3f} {r[2]:9d} {r[3]:6d} '
              f'{r[4]:8.1f} {r[5]:8.1f} {r[6]:6.1f}')
    if rows:
        tot_ms = sum(r[1] for r in rows)
        tot_fl = sum(r[4] for r in rows)
        agg = tot_fl / tot_ms  # GFLOP/ms == TFLOP/s
        print(f'{"TOTAL (matmul kernels)":44s} {tot_ms:7.3f} {"":9s} {"":6s} '
              f'{tot_fl:8.1f} {agg:8.1f} {100 * agg / peak_tflops:6.1f}')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=5)
    ap.add_argument('--batch', type=int, default=8192)
    ap.add_argument('--top', type=int, default=40)
    ap.add_argument('--mxu', action='store_true',
                    help='print analytic per-kernel MXU utilization '
                         '(bf16 peak via --peak_tflops, default v5e 197)')
    ap.add_argument('--peak_tflops', type=float, default=197.0)
    ap.add_argument('--config', default='flagship',
                    choices=['flagship', 'se3', 'anneal', 'elastic',
                             'elastic_se3', 'elastic_quaternion'])
    ap.add_argument('--pipelined_fwd', type=int, choices=(0, 1),
                    default=None,
                    help='override NerfConfig.pallas_pipelined_fwd')
    ap.add_argument('--pipelined_bwd', type=int, choices=(0, 1),
                    default=None,
                    help='override NerfConfig.pallas_pipelined_bwd')
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
    if args.config in ('se3', 'elastic_se3'):
        kw['warp_field_type'] = 'se3'
    elif args.config == 'elastic_quaternion':
        kw['warp_field_type'] = 'quaternion'
    else:
        kw['warp_field_type'] = 'translation'
    if args.config == 'anneal':
        kw['use_original_embed'] = False
    elastic_w = 0.0
    if args.config.startswith('elastic'):
        kw['elastic_jacobian_samples'] = 16
        elastic_w = 0.01
    if args.pipelined_fwd is not None:
        kw['pallas_pipelined_fwd'] = bool(args.pipelined_fwd)
    if args.pipelined_bwd is not None:
        kw['pallas_pipelined_bwd'] = bool(args.pipelined_bwd)
    cfg = NerfConfig(**kw)
    train_cfg = TrainConfig(batch_size=batch_size, lr=5e-4,
                            elastic_loss_weight=elastic_w)

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
    if args.mxu:
        mxu_report(per_step, args.peak_tflops)


if __name__ == '__main__':
    main()
