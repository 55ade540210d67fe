"""Run the torch reference end-to-end on the synthetic LLFF scene (CPU).

Two claims this proves (VERDICT round-1 missing #2):
  1. The synthetic scene from tools/make_synthetic_scene.py is loadable by
     the REFERENCE's /root/reference/datasets/llff.py unchanged (same
     poses_bounds.npy + images/ layout) — checked by actually loading it.
  2. A same-data PSNR-per-step comparison: the reference's NerfModel trained
     with its own defaults (Adam 5e-4, MSE coarse+fine, stratified sampling,
     sigma noise) on the same scene/ray budget as this repo's trainer.

PyTorch-Lightning is not in this image, so the training loop is a minimal
torch Adam loop mirroring NeRFSystem.training_step (train.py:147-163): random
ray batches from the precomputed train buffer, prepare_ray_dict, forward,
coarse+fine MSE, backward, step. kornia / torchvision (dataset-only deps) are
shimmed with minimal equivalents below — create_meshgrid and ToTensor only.

Usage (CPU, ~minutes at small resolution):
    python tools/reference_on_synthetic.py --scene /tmp/val_scene_small \
        --img_wh 40 30 --steps 300 --batch 512 --report /tmp/ref_curve.jsonl

Pair with the jax side on the same scene:
    HYPERNERF_PLATFORM=cpu python tools/validate_synthetic.py ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

REFERENCE_ROOT = '/root/reference'


def _install_dataset_shims():
    """Minimal kornia/torchvision shims for the reference's dataset imports.

    The reference uses exactly: kornia.create_meshgrid (ray_utils.py:2,17)
    and torchvision.transforms.ToTensor (llff.py:8). Neither package is in
    this image; these shims reproduce only those two entry points.
    """
    import numpy as np
    import torch

    if 'kornia' not in sys.modules:
        kornia = types.ModuleType('kornia')

        def create_meshgrid(height, width, normalized_coordinates=True,
                            device=None, dtype=None):
            xs = torch.arange(width, dtype=torch.float32)
            ys = torch.arange(height, dtype=torch.float32)
            if normalized_coordinates:
                xs = 2.0 * xs / max(width - 1, 1) - 1.0
                ys = 2.0 * ys / max(height - 1, 1) - 1.0
            gy, gx = torch.meshgrid(ys, xs, indexing='ij')
            return torch.stack([gx, gy], dim=-1)[None]  # (1, H, W, 2), (x,y)

        kornia.create_meshgrid = create_meshgrid
        sys.modules['kornia'] = kornia

    if 'torchvision' not in sys.modules:
        tv = types.ModuleType('torchvision')
        transforms = types.ModuleType('torchvision.transforms')

        class ToTensor:
            def __call__(self, pic):
                arr = np.asarray(pic, dtype=np.float32) / 255.0
                if arr.ndim == 2:
                    arr = arr[..., None]
                return torch.from_numpy(arr).permute(2, 0, 1).contiguous()

        transforms.ToTensor = ToTensor
        tv.transforms = transforms
        sys.modules['torchvision'] = tv
        sys.modules['torchvision.transforms'] = transforms


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--scene', type=str, required=True,
                        help='LLFF scene dir (make_synthetic_scene.py output)')
    parser.add_argument('--img_wh', nargs=2, type=int, default=[40, 30])
    parser.add_argument('--steps', type=int, default=300)
    parser.add_argument('--batch', type=int, default=512)
    parser.add_argument('--n_samples', type=int, default=16)
    parser.add_argument('--n_importance', type=int, default=16)
    parser.add_argument('--lr', type=float, default=5e-4)
    parser.add_argument('--eval_every', type=int, default=50)
    parser.add_argument('--chunk', type=int, default=1024)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--slice_method', type=str, default='bendy_sheet',
                        choices=['bendy_sheet', 'axis_aligned_plane', 'none'],
                        help='hyper slicing (plane mode requires '
                             'GLO_dim == hyper_slice_out_dim in the '
                             'reference, models.py:268 — pass --glo_dim 4)')
    parser.add_argument('--use_warp', type=int, default=1)
    parser.add_argument('--glo_dim', type=int, default=8)
    parser.add_argument('--report', type=str, default=None,
                        help='append JSONL rows {step, loss, val_psnr}')
    args = parser.parse_args()

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    _install_dataset_shims()
    from tools.reference_parity import load_reference
    ref = load_reference()
    torch = ref.torch
    torch.manual_seed(args.seed)

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from datasets.llff import LLFFDataset  # the REFERENCE loader

    t_load = time.time()
    train_ds = LLFFDataset(root_dir=args.scene, split='train',
                           img_wh=tuple(args.img_wh), include_idx=True)
    val_ds = LLFFDataset(root_dir=args.scene, split='val',
                         img_wh=tuple(args.img_wh), include_idx=True)
    print(f'reference LLFFDataset loaded the synthetic scene unchanged: '
          f'{len(train_ds)} train rays ({time.time() - t_load:.1f}s)')
    all_rays, all_rgbs = train_ds.all_rays, train_ds.all_rgbs
    assert all_rays.shape[-1] == 9, 'include_idx must add the id column'
    num_img = int(all_rays[:, 8].max().item()) + 1

    ids = list(range(num_img))
    slice_method = (None if args.slice_method == 'none'
                    else args.slice_method)
    model = ref.models.NerfModel(
        {'warp': ids, 'camera': [0], 'appearance': ids, 'time': ids},
        near=0.0, far=1.0,
        n_samples_coarse=args.n_samples, n_samples_fine=args.n_importance,
        noise_std=1.0, use_warp=bool(args.use_warp), use_nerf_embed=False,
        use_alpha_cond=False, use_rgb_cond=False,
        hyper_slice_method=slice_method, hyper_slice_out_dim=4,
        GLO_dim=args.glo_dim, share_GLO=True,
        xyz_fourier_dim=10, hyper_fourier_dim=6, view_fourier_dim=6)
    optim = torch.optim.Adam(model.parameters(), lr=args.lr)
    mse = torch.nn.MSELoss()
    extra = {'nerf_alpha': None, 'warp_alpha': None, 'hyper_alpha': None,
             'hyper_sheet_alpha': None}

    def val_psnr():
        sample = val_ds[0]
        rays, rgbs = sample['rays'], sample['rgbs']
        model.eval()
        # The reference's `deterministic` arg is plumbed but unused
        # (models.py:686/732); flip the sampling flag for a noise-free val.
        model.use_stratified_sampling = False
        preds = []
        with torch.no_grad():
            for i in range(0, rays.shape[0], args.chunk):
                rd = ref.model_utils.prepare_ray_dict(rays[i:i + args.chunk])
                out = model(rd, extra)
                typ = 'fine' if 'fine' in out else 'coarse'
                preds.append(out[typ]['rgb'])
        model.use_stratified_sampling = True
        model.train()
        pred = torch.cat(preds, 0)
        v = float(-10.0 * torch.log10(mse(pred, rgbs)))
        return v

    def report(row):
        print(json.dumps(row), flush=True)
        if args.report:
            with open(args.report, 'a') as f:
                f.write(json.dumps(row) + '\n')

    n_rays = all_rays.shape[0]
    t0 = time.time()
    for step in range(1, args.steps + 1):
        idx = torch.randint(0, n_rays, (args.batch,))
        rays, rgbs = all_rays[idx], all_rgbs[idx]
        rd = ref.model_utils.prepare_ray_dict(rays)
        out = model(rd, extra)
        loss = mse(out['coarse']['rgb'], rgbs) + mse(out['fine']['rgb'], rgbs)
        optim.zero_grad()
        loss.backward()
        optim.step()
        if step % args.eval_every == 0 or step == args.steps:
            report({'framework': 'torch-reference', 'step': step,
                    'loss': float(loss.detach()), 'val_psnr': val_psnr(),
                    'rays_per_sec': args.batch * step / (time.time() - t0)})


if __name__ == '__main__':
    main()
