#!/usr/bin/env python
"""End-to-end quality validation on the synthetic dynamic scene.

Generates the analytic dynamic LLFF scene (tools/make_synthetic_scene.py),
trains the full HyperNeRF model (translation warp + bendy-sheet slicing) for
--max_steps, and reports train/val PSNR plus throughput. This stands in for
the reference's LLFF captures (none ship with this image): ~30 PSNR here
demonstrates the same "fairly good model" bar as the reference's Readme.md:41
claim on its own dynamic scene.

  python tools/validate_synthetic.py --steps 20000 --out /tmp/val_scene
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--out', type=str, default='/tmp/val_scene')
    parser.add_argument('--steps', type=int, default=20000)
    parser.add_argument('--batch_size', type=int, default=4096)
    parser.add_argument('--n_frames', type=int, default=20)
    parser.add_argument('--width', type=int, default=160)
    parser.add_argument('--height', type=int, default=120)
    parser.add_argument('--static', action='store_true',
                        help='train a static NeRF instead (ablation)')
    parser.add_argument('--mode', type=str, default=None,
                        choices=[None, 'hypernerf', 'static', 'se3',
                                 'plane', 'anneal', 'quaternion'],
                        help='model variant to validate')
    parser.add_argument('--occupancy', action='store_true',
                        help='enable occupancy-grid guided coarse sampling')
    parser.add_argument('--N_samples', type=int, default=64)
    parser.add_argument('--N_importance', type=int, default=64)
    parser.add_argument('--lr_scheduler', type=str, default='cosine',
                        choices=['cosine', 'steplr', 'poly'],
                        help="'steplr' with no decay boundary = constant lr "
                             '(matches reference_on_synthetic, whose torch '
                             'Adam loop never decays over short runs)')
    parser.add_argument('--glo_dim', type=int, default=None,
                        help='override GLO embedding dim (plane-mode '
                             'head-to-heads use 4 to match the reference, '
                             'whose plane slicing requires GLO_dim == '
                             'hyper_slice_out_dim, models.py:268)')
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--compute_dtype', type=str, default=None,
                        choices=[None, 'bfloat16', 'float32'],
                        help='matmul dtype override. float32 matches the '
                             'torch reference exactly; measured at h2h scale '
                             '(40x30, 400 steps) bf16 vs f32 is within noise '
                             '(15.47 vs 15.49 plane val PSNR — the seed '
                             'spread is several dB, the dtype is not)')
    parser.add_argument('--report', type=str, default=None,
                        help='append a JSON result line to this file')
    parser.add_argument('--elastic_loss_weight', type=float, default=0.0,
                        help='Nerfies elastic regularization weight (the '
                             'render stays fused; the Jacobian side channel '
                             'runs densely)')
    parser.add_argument('--elastic_jacobian_samples', type=int, default=0,
                        help='importance-subsample the elastic Jacobian to '
                             'K points per ray (0 = every sample)')
    parser.add_argument('--background_loss_weight', type=float, default=0.0,
                        help='Nerfies background regularization weight; '
                             'static points are generated from the '
                             'analytic scene (blender dataset only — its '
                             'model space is world coordinates)')
    parser.add_argument('--dataset', choices=('llff', 'blender'),
                        default='llff',
                        help='scene format / loader to validate end-to-end '
                             '(blender: square images, near=2 far=6, '
                             'white background)')
    args = parser.parse_args()

    from hypernerf_tpu.utils.platform import apply_platform_overrides
    apply_platform_overrides()

    from make_synthetic_scene import make_blender_scene, make_scene
    if args.dataset == 'blender':
        assert args.width == args.height, 'blender images must be square'
        if not os.path.exists(os.path.join(args.out,
                                           'transforms_train.json')):
            make_blender_scene(args.out, args.n_frames, args.width)
            print(f'generated blender scene at {args.out}', flush=True)
    elif not os.path.exists(os.path.join(args.out, 'poses_bounds.npy')):
        make_scene(args.out, args.n_frames, args.width, args.height)
        print(f'generated scene at {args.out}', flush=True)

    background_points_path = ''
    if args.background_loss_weight:
        assert args.dataset == 'blender', (
            'background loss validation needs world-space model coords '
            '(the LLFF pipeline warps NDC points)')
        import numpy as _np
        from make_synthetic_scene import make_static_points
        background_points_path = os.path.join(args.out, 'static_points.npy')
        _np.save(background_points_path, make_static_points(4096))

    from hypernerf_tpu.configs import NerfConfig, TrainConfig
    from hypernerf_tpu.training.trainer import Trainer

    mode = args.mode or ('static' if args.static else 'hypernerf')
    common = dict(num_coarse_samples=args.N_samples,
                  num_fine_samples=args.N_importance)
    if args.glo_dim is not None:
        common.update(glo_dim=args.glo_dim)
    if args.compute_dtype is not None:
        common.update(compute_dtype=args.compute_dtype)
    if args.occupancy:
        # The synthetic LLFF scene lives in NDC; the unit cube covers it.
        common.update(use_occupancy_grid=True,
                      occupancy_bbox_min=-1.5, occupancy_bbox_max=1.5)
    if args.elastic_jacobian_samples:
        common.update(
            elastic_jacobian_samples=args.elastic_jacobian_samples)
    if mode == 'static':
        nerf_cfg = NerfConfig(use_warp=False, hyper_slice_method='none',
                              **common)
    elif mode == 'se3':
        nerf_cfg = NerfConfig(use_warp=True, warp_field_type='se3',
                              hyper_slice_method='bendy_sheet', **common)
    elif mode == 'quaternion':
        nerf_cfg = NerfConfig(use_warp=True, warp_field_type='quaternion',
                              hyper_slice_method='bendy_sheet', **common)
    elif mode == 'plane':
        nerf_cfg = NerfConfig(use_warp=True,
                              hyper_slice_method='axis_aligned_plane',
                              **common)
    elif mode == 'anneal':
        nerf_cfg = NerfConfig(use_warp=True, hyper_slice_method='bendy_sheet',
                              use_original_embed=False, **common)
    else:
        nerf_cfg = NerfConfig(use_warp=True, hyper_slice_method='bendy_sheet',
                              **common)
    train_cfg = TrainConfig(
        root_dir=args.out, dataset_name=args.dataset,
        img_wh=(args.width, args.height),
        elastic_loss_weight=args.elastic_loss_weight,
        background_loss_weight=args.background_loss_weight,
        background_points_path=background_points_path,
        batch_size=args.batch_size, max_steps=args.steps,
        seed=args.seed,
        lr=5e-4, lr_scheduler=args.lr_scheduler,
        # steplr boundary past the run (epochs) => constant lr; int32-safe.
        decay_step=(10 ** 5,), num_epochs=30,
        # Coarse-to-fine annealing scaled to the run length (anneal mode).
        warp_alpha_steps=max(1, args.steps // 2),
        hyper_alpha_steps=max(1, args.steps // 8),
        log_every=500, val_check_interval=20.0,
        ckpt_every_steps=max(1000, args.steps // 4),
        exp_name='synthetic_val_' + mode,
        ckpt_dir=os.path.join(args.out, 'ckpts'),
        log_dir=os.path.join(args.out, 'logs'))

    t0 = time.time()
    trainer = Trainer(nerf_cfg, train_cfg)
    metrics = trainer.fit()
    wall = time.time() - t0
    val = trainer.validate(step=args.steps, log_images=False)
    result = {
        'mode': (mode + ('+occ' if args.occupancy else '')
                 + ('+elastic' if args.elastic_loss_weight else '')
                 + ('+bg' if args.background_loss_weight else '')),
        'dataset': args.dataset,
        'samples': (args.N_samples, args.N_importance),
        'steps': args.steps,
        'batch_size': args.batch_size,
        'wall_clock_s': round(wall, 1),
        'train_psnr': round(metrics.get('train/psnr', float('nan')), 2),
        'val_psnr': round(val['val/psnr'], 2),
        'rays_per_sec': round(metrics.get('train/rays_per_sec', 0.0)),
    }
    print(json.dumps(result))
    if args.report:
        with open(args.report, 'a') as f:
            f.write(json.dumps(result) + '\n')


if __name__ == '__main__':
    main()
