"""Tests for the CLI flag surface (hypernerf_tpu/opt.py)."""

import pytest

from hypernerf_tpu.opt import configs_from_args, get_opts


def test_defaults_match_reference():
    """Flag defaults mirror /root/reference/opt.py:3-116."""
    args = get_opts([])
    assert args.dataset_name == 'llff'
    assert args.N_samples == 64
    assert args.N_importance == 128
    assert args.batch_size == 2048
    assert args.lr == 5e-4
    assert args.optimizer == 'adam'
    assert args.lr_scheduler == 'steplr'
    assert args.decay_step == [20]
    assert args.decay_gamma == 0.1
    assert args.noise_std == 1.0
    assert args.use_warp is True
    assert args.slice_method == 'bendy_sheet'
    assert args.hyper_slice_out_dim == 4
    assert args.meta_GLO_dim == 8
    assert args.share_GLO is True
    assert args.xyz_fourier == 10
    assert args.hyper_fourier == 6
    assert args.view_fourier == 6
    assert args.prefixes_to_ignore == ['loss']


def test_configs_from_args_resolution():
    args = get_opts(['--N_samples', '32', '--N_importance', '64',
                     '--slice_method', 'axis_aligned_plane',
                     '--use_warp', 'false', '--warp_field', 'se3',
                     '--precision', '32', '--perturb', '0',
                     '--batch_size', '512', '--lr', '1e-3',
                     '--decay_step', '10', '20'])
    nerf_cfg, train_cfg = configs_from_args(args)
    assert nerf_cfg.num_coarse_samples == 32
    assert nerf_cfg.num_fine_samples == 64
    assert nerf_cfg.hyper_slice_method == 'axis_aligned_plane'
    assert nerf_cfg.use_warp is False
    assert nerf_cfg.warp_field_type == 'se3'
    assert nerf_cfg.compute_dtype == 'float32'
    assert nerf_cfg.use_stratified_sampling is False  # perturb 0
    assert train_cfg.batch_size == 512
    assert train_cfg.lr == 1e-3
    assert train_cfg.decay_step == (10, 20)


def test_shard_optimizer_state_flag():
    assert configs_from_args(get_opts([]))[1].shard_optimizer_state is False
    args = get_opts(['--shard_optimizer_state'])
    assert configs_from_args(args)[1].shard_optimizer_state is True


def test_eval_mode_flags():
    args = get_opts(['--split', 'test_train', '--save_depth',
                     '--depth_format', 'bytes', '--scene_name', 's'],
                    eval_mode=True)
    assert args.split == 'test_train'
    assert args.save_depth is True
    assert args.depth_format == 'bytes'
    assert args.scene_name == 's'


def test_bool_flag_parsing():
    args = get_opts(['--use_warp', 'False', '--share_GLO', '0'])
    assert args.use_warp is False
    assert args.share_GLO is False
    args = get_opts(['--use_warp', 'true'])
    assert args.use_warp is True


def test_nerfies_embed_flag():
    args = get_opts(['--use_nerfies_embed'])
    nerf_cfg, _ = configs_from_args(args)
    assert nerf_cfg.use_original_embed is False


def test_config_json_roundtrip():
    from hypernerf_tpu.configs import NerfConfig, TrainConfig
    nerf_cfg, train_cfg = configs_from_args(get_opts([]))
    assert NerfConfig.from_json(nerf_cfg.to_json()) == nerf_cfg
    assert TrainConfig.from_json(train_cfg.to_json()) == train_cfg
