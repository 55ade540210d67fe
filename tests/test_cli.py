"""End-to-end CLI smoke tests: train.py and eval.py as subprocesses.

These exercise the full L5 surface (flags -> configs -> Trainer -> ckpt ->
eval render -> PNG/GIF outputs) on the CPU backend via HYPERNERF_PLATFORM.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.conftest import make_smooth_llff_scene

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd, extra_env=None):
    env = dict(os.environ)
    env['HYPERNERF_PLATFORM'] = 'cpu'
    env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')
    env.update(extra_env or {})
    return subprocess.run([sys.executable] + args, cwd=cwd, env=env,
                          capture_output=True, text=True, timeout=900)


@pytest.mark.slow
def test_train_then_eval_cli(tmp_path):
    scene = make_smooth_llff_scene(tmp_path / 'scene')
    workdir = str(tmp_path / 'work')
    os.makedirs(workdir)

    common = ['--dataset_name', 'llff', '--root_dir', scene,
              '--img_wh', '16', '12', '--N_samples', '4',
              '--N_importance', '4', '--chunk', '64']
    result = _run([os.path.join(REPO, 'train.py'),
                   '--batch_size', '32', '--max_steps', '4',
                   '--log_every', '2', '--exp_name', 'smoke',
                   '--noise_std', '0'] + common, workdir)
    assert result.returncode == 0, result.stderr[-3000:]
    assert 'Final metrics' in result.stdout

    ckpt_dir = os.path.join(workdir, 'ckpts', 'smoke')
    steps = [d for d in os.listdir(ckpt_dir) if d.startswith('step_')]
    assert steps, os.listdir(ckpt_dir)
    assert os.path.exists(os.path.join(ckpt_dir, 'nerf_config.json'))
    assert os.path.exists(os.path.join(ckpt_dir, 'train_config.json'))
    # Metrics CSV written.
    csv_path = os.path.join(workdir, 'logs', 'smoke', 'metrics.csv')
    assert os.path.getsize(csv_path) > 0

    ckpt = os.path.join(ckpt_dir, sorted(steps)[-1])
    result = _run([os.path.join(REPO, 'eval.py'),
                   '--scene_name', 'smoke', '--split', 'test_train',
                   '--ckpt_path', ckpt, '--save_depth'] + common, workdir)
    assert result.returncode == 0, result.stderr[-3000:]
    out_dir = os.path.join(workdir, 'results', 'llff', 'smoke')
    pngs = [f for f in os.listdir(out_dir) if f.endswith('.png')]
    assert len(pngs) == 3  # one per training image (test_train split)
    assert os.path.exists(os.path.join(out_dir, 'smoke.gif'))
    assert any(f.startswith('depth_') for f in os.listdir(out_dir))
    assert 'Mean PSNR' in result.stdout


@pytest.mark.slow
def test_save_weights_only_cli(tmp_path):
    scene = make_smooth_llff_scene(tmp_path / 'scene')
    workdir = str(tmp_path / 'work')
    os.makedirs(workdir)
    result = _run([os.path.join(REPO, 'train.py'),
                   '--dataset_name', 'llff', '--root_dir', scene,
                   '--img_wh', '16', '12', '--N_samples', '4',
                   '--N_importance', '0', '--batch_size', '32',
                   '--max_steps', '2', '--noise_std', '0',
                   '--exp_name', 'w'], workdir)
    assert result.returncode == 0, result.stderr[-3000:]
    ckpt_dir = os.path.join(workdir, 'ckpts', 'w')
    step = sorted(d for d in os.listdir(ckpt_dir)
                  if d.startswith('step_'))[-1]
    result = _run([os.path.join(REPO, 'save_weights_only.py'),
                   '--ckpt_path', os.path.join(ckpt_dir, step)], workdir)
    assert result.returncode == 0, result.stderr[-3000:]
    assert 'Done!' in result.stdout
