"""Tests for the data layer with synthetic on-disk scenes."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from hypernerf_tpu.datasets import dataset_dict
from hypernerf_tpu.datasets.blender import BlenderDataset
from hypernerf_tpu.datasets.depth_io import read_pfm, save_pfm
from hypernerf_tpu.datasets.llff import LLFFDataset
from hypernerf_tpu.datasets.rays import (get_ndc_rays, get_ray_directions,
                                         get_rays)

W, H = 16, 12
N_IMAGES = 5


@pytest.fixture
def llff_dir(tmp_path):
    """A tiny synthetic LLFF scene: forward-facing cameras near -z."""
    rs = np.random.RandomState(0)
    img_dir = tmp_path / 'images'
    img_dir.mkdir()
    poses_bounds = []
    focal = 20.0
    for i in range(N_IMAGES):
        img = (rs.rand(H * 4, W * 4, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(img_dir / f'img_{i:03d}.png')
        # Camera at a small offset, looking along -z ("down right back"
        # convention pre-flip: columns are [down, right, back, center]).
        right = np.array([1.0, 0, 0])
        down = np.array([0, -1.0, 0])
        back = np.array([0, 0, 1.0])
        center = np.array([0.1 * (i - 2), 0.05 * (i - 2), 0.0])
        c2w = np.stack([down, right, back, center], 1)  # (3, 4)
        hwf = np.array([[H * 4], [W * 4], [focal * 4]])
        poses_bounds.append(
            np.concatenate([np.concatenate([c2w, hwf], 1).reshape(-1),
                            np.array([2.0, 8.0])]))
    np.save(tmp_path / 'poses_bounds.npy', np.stack(poses_bounds))
    return str(tmp_path)


@pytest.fixture
def blender_dir(tmp_path):
    rs = np.random.RandomState(0)
    frames = []
    (tmp_path / 'train').mkdir()
    for i in range(3):
        img = (rs.rand(32, 32, 4) * 255).astype(np.uint8)
        Image.fromarray(img, 'RGBA').save(tmp_path / 'train' / f'r_{i}.png')
        c2w = np.eye(4)
        c2w[2, 3] = 4.0
        frames.append({'file_path': f'./train/r_{i}',
                       'transform_matrix': c2w.tolist()})
    meta = {'camera_angle_x': 0.7, 'frames': frames}
    for split in ('train', 'val', 'test'):
        with open(tmp_path / f'transforms_{split}.json', 'w') as f:
            json.dump(meta, f)
    return str(tmp_path)


def test_registry():
    assert dataset_dict['llff'] is LLFFDataset
    assert dataset_dict['blender'] is BlenderDataset


def test_ray_directions_geometry():
    dirs = get_ray_directions(H, W, 20.0)
    assert dirs.shape == (H, W, 3)
    np.testing.assert_allclose(dirs[..., 2], -1.0)
    # Center pixel looks straight ahead.
    np.testing.assert_allclose(dirs[H // 2, W // 2, :2],
                               [0 / 20.0, -0 / 20.0], atol=0.5 / 20.0 + 1e-6)


def test_get_rays_normalized():
    dirs = get_ray_directions(H, W, 20.0)
    c2w = np.eye(4)[:3].astype(np.float32)
    rays_o, rays_d = get_rays(dirs, c2w)
    assert rays_o.shape == (H * W, 3) and rays_d.shape == (H * W, 3)
    np.testing.assert_allclose(np.linalg.norm(rays_d, axis=-1), 1.0,
                               rtol=1e-5)
    np.testing.assert_allclose(rays_o, 0.0)


def test_ndc_rays_near_plane():
    dirs = get_ray_directions(H, W, 20.0)
    c2w = np.eye(4)[:3].astype(np.float32)
    c2w[2, 3] = 2.0  # camera at z=2 looking down -z
    rays_o, rays_d = get_rays(dirs, c2w)
    ndc_o, ndc_d = get_ndc_rays(H, W, 20.0, 1.0, rays_o, rays_d)
    # NDC origins sit on the z=-1..1 cube's near face: o2 = 1 + 2*near/oz.
    assert np.isfinite(ndc_o).all() and np.isfinite(ndc_d).all()
    # d2 = 1 - o2 (derivation invariant).
    np.testing.assert_allclose(ndc_d[:, 2], 1.0 - ndc_o[:, 2], atol=1e-5)


def test_llff_train_split(llff_dir):
    ds = LLFFDataset(llff_dir, split='train', img_wh=(W, H), include_idx=True)
    # One image held out for val.
    assert ds.all_rays.shape == ((N_IMAGES - 1) * H * W, 9)
    assert ds.all_rgbs.shape == ((N_IMAGES - 1) * H * W, 3)
    assert ds.all_rays.dtype == np.float32
    # NDC near/far are 0/1.
    np.testing.assert_allclose(ds.all_rays[:, 6], 0.0)
    np.testing.assert_allclose(ds.all_rays[:, 7], 1.0)
    # Metadata ids skip the val image and stay in range.
    ids = np.unique(ds.all_rays[:, 8]).astype(int)
    assert ds.val_idx not in ids
    assert ids.max() < N_IMAGES
    sample = ds[0]
    assert sample['rays'].shape == (9,)
    assert sample['rgbs'].shape == (3,)


def test_llff_val_and_test_splits(llff_dir):
    val = LLFFDataset(llff_dir, split='val', img_wh=(W, H), val_num=2)
    assert len(val) == 2
    sample = val[0]
    assert sample['rays'].shape == (H * W, 8)
    assert sample['rgbs'].shape == (H * W, 3)

    test = LLFFDataset(llff_dir, split='test', img_wh=(W, H))
    assert len(test) == 120  # spiral path
    assert test[0]['rays'].shape == (H * W, 8)

    test_train = LLFFDataset(llff_dir, split='test_train', img_wh=(W, H))
    assert len(test_train) == N_IMAGES
    assert 'rgbs' in test_train[0]


def test_llff_without_idx(llff_dir):
    ds = LLFFDataset(llff_dir, split='train', img_wh=(W, H),
                     include_idx=False)
    assert ds.all_rays.shape[1] == 8


def test_llff_spheric(llff_dir):
    ds = LLFFDataset(llff_dir, split='train', img_wh=(W, H),
                     spheric_poses=True)
    # Spheric near/far come from the (rescaled) bounds, not NDC 0/1.
    assert ds.all_rays[0, 6] > 0.5  # bounds.min() / (0.75*bounds.min()) = 1.33
    assert ds.all_rays[0, 7] > ds.all_rays[0, 6]
    test = LLFFDataset(llff_dir, split='test', img_wh=(W, H),
                       spheric_poses=True)
    assert test[0]['rays'].shape == (H * W, 8)


def test_blender_dataset(blender_dir):
    ds = BlenderDataset(blender_dir, split='train', img_wh=(32, 32),
                        include_idx=True)
    assert ds.white_back
    assert ds.all_rays.shape == (3 * 32 * 32, 9)
    np.testing.assert_allclose(ds.all_rays[:, 6], 2.0)
    np.testing.assert_allclose(ds.all_rays[:, 7], 6.0)
    val = BlenderDataset(blender_dir, split='val', img_wh=(32, 32))
    assert len(val) == 3
    sample = val[0]
    assert sample['rays'].shape == (32 * 32, 8)
    assert sample['rgbs'].shape == (32 * 32, 3)
    assert sample['valid_mask'].shape == (32 * 32,)


def test_pfm_roundtrip(tmp_path):
    depth = np.random.RandomState(0).rand(8, 10).astype(np.float32)
    path = str(tmp_path / 'd.pfm')
    save_pfm(path, depth)
    loaded, scale = read_pfm(path)
    np.testing.assert_allclose(loaded, depth, rtol=1e-6)


def test_blender_scene_generator_roundtrip(tmp_path):
    """make_blender_scene output loads through BlenderDataset, and the
    loader's white-blend of the straight-alpha RGBA reproduces the analytic
    white-background composite (the LLFF-format GT) for the same pose."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))
    from make_synthetic_scene import (make_blender_scene, render_image,
                                      _camera_pose)

    out = str(tmp_path / 'bscene')
    size, focal, n_frames = 24, 26.0, 3
    make_blender_scene(out, n_frames=n_frames, size=size, focal=focal)

    ds = BlenderDataset(out, split='train', img_wh=(size, size),
                        include_idx=True)
    assert ds.all_rays.shape == (n_frames * size * size, 9)
    assert ds.near == 2.0 and ds.far == 6.0
    # The loader's 800px-reference focal math must recover the generator's.
    np.testing.assert_allclose(ds.focal, focal, rtol=1e-6)
    # Frame ids are the metadata column.
    ids = ds.all_rays[:, 8].reshape(n_frames, -1)
    assert (ids == np.arange(n_frames)[:, None]).all()

    # White-blended loader GT == analytic white-background render (up to
    # the uint8 quantization of the RGBA png).
    c2w, _, _ = _camera_pose(0, n_frames)
    direct = render_image(c2w.astype(np.float32), size, size, focal, 0.0)
    loader_rgb = ds.all_rgbs[:size * size].reshape(size, size, 3)
    assert np.abs(loader_rgb - direct).max() < 0.02

    val = BlenderDataset(out, split='val', img_wh=(size, size))
    sample = val[0]
    assert sample['rays'].shape == (size * size, 8)
    assert sample['rgbs'].shape == (size * size, 3)
