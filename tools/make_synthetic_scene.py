#!/usr/bin/env python
"""Generate a synthetic dynamic LLFF-format scene with analytic ground truth.

No real LLFF captures ship with this image, so end-to-end quality validation
uses this generator: a volumetric scene (static gaussian blob + one blob
moving across frames + a background wall) rendered analytically by dense ray
marching, written as `poses_bounds.npy` + `images/` in the exact layout the
LLFF loader (and the reference's, datasets/llff.py) expects. A HyperNeRF
model with a warp field can fit the moving blob; a static NeRF cannot —
giving a discriminative PSNR target.

Usage:
  python tools/make_synthetic_scene.py --out /tmp/scene \
      --n_frames 20 --width 160 --height 120
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def scene_sigma_rgb(points: np.ndarray, t: float):
    """Analytic density/color fields. points: (..., 3), t in [0,1]."""
    # Static blob at the origin.
    d_static = np.linalg.norm(points - np.array([0.0, 0.0, -2.5]), axis=-1)
    sigma_static = 40.0 * np.exp(-(d_static / 0.45) ** 2)
    # Moving blob: sweeps left to right with a small vertical bob.
    cx = -0.8 + 1.6 * t
    cy = 0.3 * np.sin(2 * np.pi * t)
    d_mov = np.linalg.norm(points - np.array([cx, cy, -2.0]), axis=-1)
    sigma_mov = 60.0 * np.exp(-(d_mov / 0.3) ** 2)
    # Background wall at z=-4 with a smooth color pattern.
    wall = np.exp(-((points[..., 2] + 4.0) / 0.1) ** 2) * 50.0

    sigma = sigma_static + sigma_mov + wall

    # Colors: static blob orange, moving blob blue-green, wall striped.
    w_static = sigma_static / (sigma + 1e-9)
    w_mov = sigma_mov / (sigma + 1e-9)
    w_wall = wall / (sigma + 1e-9)
    c_static = np.array([0.9, 0.5, 0.2])
    c_mov = np.array([0.2, 0.7, 0.8])
    stripes = 0.5 + 0.4 * np.sin(4.0 * points[..., 0:1])
    c_wall = np.concatenate(
        [stripes, 0.5 * np.ones_like(stripes),
         0.8 - 0.3 * stripes], axis=-1)
    rgb = (w_static[..., None] * c_static + w_mov[..., None] * c_mov
           + w_wall[..., None] * c_wall)
    return sigma, np.clip(rgb, 0.0, 1.0)


def render_fields(c2w, h, w, focal, t, near=1.0, far=6.0, n_samples=192):
    """Dense ray-march through the analytic fields (numpy, exact enough).

    Returns (premultiplied rgb (h, w, 3), accumulated opacity (h, w))."""
    j, i = np.meshgrid(np.arange(h, dtype=np.float32),
                       np.arange(w, dtype=np.float32), indexing='ij')
    dirs = np.stack([(i - w / 2) / focal, -(j - h / 2) / focal,
                     -np.ones_like(i)], -1)
    rays_d = dirs @ c2w[:, :3].T
    rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = np.broadcast_to(c2w[:, 3], rays_d.shape)

    z = np.linspace(near, far, n_samples, dtype=np.float32)
    pts = (rays_o[..., None, :]
           + z[:, None] * rays_d[..., None, :])  # (h, w, S, 3)
    sigma, rgb = scene_sigma_rgb(pts, t)
    dists = np.diff(z, append=1e4)
    alpha = 1.0 - np.exp(-sigma * dists)
    trans = np.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = np.concatenate([np.ones_like(trans[..., :1]),
                            trans[..., :-1]], -1)
    weights = alpha * trans
    premult = np.sum(weights[..., None] * rgb, axis=-2)
    return premult, weights.sum(-1)


def render_image(c2w, h, w, focal, t, near=1.0, far=6.0, n_samples=192):
    """White-background composite of render_fields (the LLFF-format GT)."""
    premult, acc = render_fields(c2w, h, w, focal, t, near, far, n_samples)
    img = premult + (1.0 - acc)[..., None]  # white background
    return np.clip(img, 0.0, 1.0)


def _camera_pose(k: int, n_frames: int):
    """Forward-facing look-at arc pose for frame k: (3, 4) right-up-back."""
    theta = (k / max(1, n_frames - 1) - 0.5) * 0.5
    cx, cy = 0.8 * np.sin(theta), 0.15 * np.cos(3 * theta)
    center = np.array([cx, cy, 0.6])
    # Look-at the static blob.
    back = center - np.array([0.0, 0.0, -2.5])
    back = back / np.linalg.norm(back)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, back)
    right /= np.linalg.norm(right)
    up2 = np.cross(back, right)
    return np.stack([right, up2, back, center], 1), center, up2


def make_scene(out_dir: str, n_frames: int = 20, width: int = 160,
               height: int = 120, focal: float = 180.0):
    from PIL import Image
    img_dir = os.path.join(out_dir, 'images')
    os.makedirs(img_dir, exist_ok=True)

    poses_bounds = []
    for k in range(n_frames):
        t = k / max(1, n_frames - 1)
        c2w, center, up2 = _camera_pose(k, n_frames)
        right, back = c2w[:, 0], c2w[:, 2]

        img = render_image(c2w.astype(np.float32), height, width, focal, t)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(img_dir, f'image{k:03d}.png'))

        # poses_bounds rows use the pre-flip "down right back" convention
        # (llff.py:206 flips [down,right,back] -> [right,up,back]):
        # columns [ -up, right, back ] so the loader's flip recovers c2w.
        c2w_drb = np.stack([-up2, right, back, center], 1)
        hwf = np.array([[height], [width], [focal]], dtype=np.float64)
        poses_bounds.append(np.concatenate(
            [np.concatenate([c2w_drb, hwf], 1).reshape(-1),
             np.array([1.2, 6.0])]))
    np.save(os.path.join(out_dir, 'poses_bounds.npy'),
            np.stack(poses_bounds))
    return out_dir


def make_blender_scene(out_dir: str, n_frames: int = 20, size: int = 128,
                       focal: float = 140.0):
    """The same analytic dynamic scene in NeRF-synthetic (Blender) layout.

    transforms_{train,val,test}.json + RGBA train/r_{k}.png: straight
    (un-premultiplied) color with alpha = accumulated opacity, so the
    loader's blend-onto-white (datasets/blender.py _load_rgba, matching
    /root/reference/datasets/blender.py:58) reproduces the analytic
    white-background composite exactly. Square images (the Blender loader's
    constraint, blender.py:20); camera_angle_x chosen so the loader's
    800px-reference focal math recovers ``focal`` at ``size``. The scene
    content sits 2.4-4.8 units from the cameras — inside the loader's
    hardcoded near=2, far=6.
    """
    import json as _json

    from PIL import Image
    img_dir = os.path.join(out_dir, 'train')
    os.makedirs(img_dir, exist_ok=True)

    frames = []
    for k in range(n_frames):
        t = k / max(1, n_frames - 1)
        c2w, _, _ = _camera_pose(k, n_frames)
        premult, acc = render_fields(c2w.astype(np.float32), size, size,
                                     focal, t)
        straight = np.clip(premult / np.maximum(acc[..., None], 1e-6), 0, 1)
        rgba = np.concatenate([straight, np.clip(acc, 0, 1)[..., None]], -1)
        Image.fromarray((rgba * 255).astype(np.uint8), 'RGBA').save(
            os.path.join(img_dir, f'r_{k}.png'))
        c2w44 = np.concatenate(
            [c2w, np.array([[0.0, 0.0, 0.0, 1.0]])], axis=0)
        frames.append({'file_path': f'./train/r_{k}',
                       'transform_matrix': c2w44.tolist()})

    meta = {'camera_angle_x': float(2.0 * np.arctan(size / (2.0 * focal))),
            'frames': frames}
    for split in ('train', 'val', 'test'):
        with open(os.path.join(out_dir, f'transforms_{split}.json'),
                  'w') as f:
            _json.dump(meta, f)
    return out_dir


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--out', type=str, required=True)
    parser.add_argument('--n_frames', type=int, default=20)
    parser.add_argument('--width', type=int, default=160)
    parser.add_argument('--height', type=int, default=120)
    parser.add_argument('--focal', type=float, default=180.0)
    parser.add_argument('--format', choices=('llff', 'blender'),
                        default='llff')
    args = parser.parse_args()
    if args.format == 'blender':
        assert args.width == args.height, 'blender images must be square'
        make_blender_scene(args.out, args.n_frames, args.width, args.focal)
    else:
        make_scene(args.out, args.n_frames, args.width, args.height,
                   args.focal)
    print(f'Wrote {args.n_frames} frames to {args.out}')


def make_static_points(n: int = 4096, seed: int = 0) -> np.ndarray:
    """(n, 3) world-space points on the scene's STATIC geometry.

    Half inside the static blob (center (0,0,-2.5), radius 0.45), half on
    the background wall (z=-4) — the stand-in for the COLMAP sparse points
    Nerfies feeds its background regularization (Park et al. 2021 §3.5).
    World coordinates, i.e. the Blender pipeline's model space (the LLFF
    pipeline warps NDC points; these would need the NDC map first).
    """
    rs = np.random.RandomState(seed)
    n_blob = n // 2
    d = rs.randn(n_blob, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    r = 0.45 * rs.rand(n_blob, 1) ** (1.0 / 3.0)
    blob = np.array([0.0, 0.0, -2.5]) + d * r
    wall = np.stack([rs.uniform(-1.5, 1.5, n - n_blob),
                     rs.uniform(-1.5, 1.5, n - n_blob),
                     np.full(n - n_blob, -4.0)], axis=-1)
    return np.concatenate([blob, wall]).astype(np.float32)
