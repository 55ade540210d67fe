"""The training system: the reference's NeRFSystem + Trainer, TPU-native.

Capability parity with /root/reference/train.py:35-234 (PyTorch-Lightning
LightningModule + Trainer): builds the model from configs, owns the val loop
(full-image render + PSNR + GT/pred/depth image logging at every
val_check_interval fraction of an epoch, with num_sanity_val_steps up front),
checkpoints every epoch keeping everything (save_top_k=-1) while tracking
val/psnr for best selection, resumes full state (--ckpt_path) or warm-starts
weights (--weight_path).

TPU-native differences: the dataset is device-resident and batches are drawn
inside the jitted step (no DataLoader workers); the number of embeddings is
taken from the dataset (the reference hardcodes NUM_IMG=100, train.py:42);
throughput (rays/sec) is measured and logged.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hypernerf_tpu.configs import NerfConfig, TrainConfig
from hypernerf_tpu.datasets import dataset_dict
from hypernerf_tpu.models.nerf import NerfModel
from hypernerf_tpu.parallel.mesh import create_mesh, replicate
from hypernerf_tpu.training import checkpoints as ckpt_lib
from hypernerf_tpu.training.losses import loss_dict
from hypernerf_tpu.training.optimizers import get_optimizer, get_scheduler
from hypernerf_tpu.training.renderer import ImageRenderer
from hypernerf_tpu.training.train_state import (compute_extra_params,
                                                create_train_state,
                                                forward_params,
                                                make_occupancy_update,
                                                make_train_step)
from hypernerf_tpu.utils.logging import MetricsLogger
from hypernerf_tpu.utils.visualization import visualize_depth


class Trainer:
    def __init__(self, nerf_cfg: NerfConfig, train_cfg: TrainConfig,
                 mesh=None, logger: Optional[MetricsLogger] = None):
        self.nerf_cfg = nerf_cfg
        self.train_cfg = train_cfg
        self.mesh = mesh if mesh is not None else create_mesh()
        self.logger = logger

        # ---- data (host-side, one-time) ----
        dataset_cls = dataset_dict[train_cfg.dataset_name]
        kwargs = dict(root_dir=train_cfg.root_dir,
                      img_wh=tuple(train_cfg.img_wh),
                      include_idx=train_cfg.use_nerfies_meta)
        if train_cfg.dataset_name == 'llff':
            kwargs['spheric_poses'] = train_cfg.spheric_poses
        self.train_dataset = dataset_cls(split='train', **kwargs)
        self.val_dataset = dataset_cls(split='val', **kwargs)

        num_images = self.train_dataset.num_instance
        if nerf_cfg.num_embeddings < num_images:
            nerf_cfg = dataclasses.replace(nerf_cfg,
                                           num_embeddings=num_images)
            self.nerf_cfg = nerf_cfg
        # Honor the dataset background (the reference drops white_back on the
        # floor for the live model — intended behavior restored).
        if getattr(self.train_dataset, 'white_back', False) \
                and not nerf_cfg.use_white_background:
            self.nerf_cfg = nerf_cfg = dataclasses.replace(
                nerf_cfg, use_white_background=True)

        # Host-side metadata-id validation: XLA gathers clamp out-of-range
        # ids silently (torch would raise), so a mis-indexed dataset would
        # otherwise train wrong without a trace (models/modules.py:98-102).
        rays_np = np.asarray(self.train_dataset.all_rays)
        if rays_np.shape[-1] >= 9:
            max_id = int(rays_np[:, 8].max())
            if max_id >= nerf_cfg.num_embeddings:
                raise ValueError(
                    f'Dataset metadata id {max_id} is out of range for '
                    f'num_embeddings={nerf_cfg.num_embeddings}.')

        self.model = NerfModel(nerf_cfg)

        n_rays = len(self.train_dataset.all_rays)
        self.steps_per_epoch = max(1, n_rays // train_cfg.batch_size)
        self.total_steps = (train_cfg.max_steps
                            or train_cfg.num_epochs * self.steps_per_epoch)

        # ---- device-resident dataset (replicated over the mesh) ----
        self.all_rays = replicate(self.mesh,
                                  jnp.asarray(self.train_dataset.all_rays))
        self.all_rgbs = replicate(self.mesh,
                                  jnp.asarray(self.train_dataset.all_rgbs))

        # ---- optimizer / state ----
        self.tx = get_optimizer(train_cfg, self.steps_per_epoch,
                                self.total_steps)
        rng = jax.random.PRNGKey(train_cfg.seed)
        self.base_rng, init_rng = jax.random.split(rng)
        self.state = create_train_state(
            self.model, self.tx, train_cfg, init_rng,
            self.train_dataset.all_rays[:8])

        # Warm start / resume.
        self.ckpt_dir = os.path.join(train_cfg.ckpt_dir, train_cfg.exp_name)
        if train_cfg.weight_path:
            loaded = ckpt_lib.load_weights(
                forward_params(self.state.params), train_cfg.weight_path,
                prefixes_to_ignore=train_cfg.prefixes_to_ignore)
            self.state = self.state.replace(params=loaded)
        if train_cfg.ckpt_path:
            self.state = ckpt_lib.restore_checkpoint(train_cfg.ckpt_path,
                                                     self.state)
        self.state = replicate(self.mesh, self.state)

        background_points = None
        if (train_cfg.background_loss_weight > 0
                and train_cfg.background_points_path):
            if not nerf_cfg.use_warp:
                raise ValueError(
                    'background_loss_weight needs a warp field '
                    '(use_warp=True)')
            pts = np.load(train_cfg.background_points_path)
            assert pts.ndim == 2 and pts.shape[1] == 3, pts.shape
            background_points = replicate(
                self.mesh, jnp.asarray(pts, jnp.float32))
        self.train_step = make_train_step(self.model, self.tx, nerf_cfg,
                                          train_cfg, self.mesh,
                                          background_points=background_points)
        self.occupancy_update = (
            make_occupancy_update(self.model, nerf_cfg, train_cfg)
            if nerf_cfg.use_occupancy_grid else None)
        # Val/eval renders shard over the same mesh as training (the
        # reference replicates the val image per rank instead, train.py:85).
        self.renderer = ImageRenderer(self.model, chunk=train_cfg.chunk,
                                      mesh=self.mesh)
        # The schedule value, logged like the reference's per-step 'lr'
        # scalar (train.py:159).
        self.lr_schedule = get_scheduler(train_cfg, self.steps_per_epoch,
                                         self.total_steps)

    # ------------------------------------------------------------------ val

    def validate(self, step: int, log_images: bool = True) -> Dict[str, float]:
        sample = self.val_dataset[0]
        params = forward_params(self.state.params)
        # Render with the SAME annealing alphas the train step uses at this
        # step — otherwise a mid-anneal model is validated with all bands on
        # (a different function than the one being trained).
        extra_params = compute_extra_params(self.nerf_cfg, self.train_cfg,
                                            step)
        # Grid-trained models validate through the same grid-guided coarse
        # distribution they train with (state.occupancy is None otherwise).
        out = self.renderer(params, sample['rays'], extra_params,
                            occupancy_grid=self.state.occupancy)
        typ = 'fine' if 'fine' in out else 'coarse'
        pred = out[typ]['rgb']
        rgbs = sample['rgbs']
        # val/loss is the full coarse+fine training loss on the val image
        # (reference train.py:171 / losses.py:9-14); val/psnr is final-level.
        val_loss = float(loss_dict[self.train_cfg.loss_type](out, rgbs))
        val_mse = float(np.mean((pred - rgbs) ** 2))
        val_psnr = -10.0 * np.log10(val_mse)
        metrics = {'val/loss': val_loss, 'val/psnr': val_psnr}
        if self.logger is not None:
            for k, v in metrics.items():
                self.logger.add_scalar(k, v, step)
            if log_images:
                w, h = self.train_cfg.img_wh
                img = pred.reshape(h, w, 3)
                img_gt = rgbs.reshape(h, w, 3)
                depth = visualize_depth(out[typ]['depth'].reshape(h, w))
                self.logger.add_images(
                    'val/GT_pred_depth',
                    np.stack([img_gt, np.clip(img, 0, 1), depth]), step)
        return metrics

    # ---------------------------------------------------------------- train

    def fit(self, progress: bool = True):
        cfg = self.train_cfg
        start_step = int(jax.device_get(self.state.step))
        val_every = max(1, int(self.steps_per_epoch * cfg.val_check_interval))

        if cfg.num_sanity_val_steps > 0 and start_step == 0:
            self.validate(step=0, log_images=True)

        profiling = False
        t0 = time.time()
        rays_done = 0
        last_metrics = {}
        for step in range(start_step, self.total_steps):
            # jax.profiler tracing window (the reference's PL profiler
            # equivalent, SURVEY.md §5): view with tensorboard --logdir.
            if cfg.profile_steps > 0 and step == cfg.profile_start:
                jax.profiler.start_trace(os.path.join(
                    cfg.log_dir, cfg.exp_name, 'profile'))
                profiling = True
            if (self.occupancy_update is not None
                    and step % cfg.occupancy_update_every == 0):
                self.state = self.occupancy_update(self.state, self.base_rng)
            self.state, metrics = self.train_step(
                self.state, self.all_rays, self.all_rgbs, self.base_rng)
            if profiling and step >= cfg.profile_start + cfg.profile_steps:
                jax.device_get(metrics['loss'])
                jax.profiler.stop_trace()
                profiling = False
            rays_done += cfg.batch_size

            if (step + 1) % cfg.log_every == 0 or step + 1 == self.total_steps:
                metrics = jax.device_get(metrics)
                elapsed = time.time() - t0
                rays_per_sec = rays_done / max(elapsed, 1e-9)
                train_metrics = {
                    'train/loss': float(metrics['loss']),
                    'train/psnr': float(metrics['psnr']),
                    'train/rays_per_sec': rays_per_sec,
                    'lr': float(self.lr_schedule(step)),
                }
                # update (not reassign): keep the latest val/ metrics so the
                # checkpoint manifest always carries the last val/psnr.
                last_metrics.update(train_metrics)
                if self.logger is not None:
                    for k, v in train_metrics.items():
                        self.logger.add_scalar(k, v, step + 1)
                if progress:
                    print(f'step {step + 1}/{self.total_steps} '
                          f'loss={last_metrics["train/loss"]:.5f} '
                          f'psnr={last_metrics["train/psnr"]:.2f} '
                          f'rays/s={rays_per_sec:,.0f}', flush=True)

            if (step + 1) % val_every == 0:
                val_metrics = self.validate(step + 1)
                last_metrics.update(val_metrics)
                if progress:
                    print(f'  val psnr={val_metrics["val/psnr"]:.2f}',
                          flush=True)

            ckpt_every = cfg.ckpt_every_steps or self.steps_per_epoch
            if ((step + 1) % ckpt_every == 0
                    or step + 1 == self.total_steps) \
                    and jax.process_index() == 0:
                ckpt_lib.save_checkpoint(
                    self.ckpt_dir, step + 1, jax.device_get(self.state),
                    nerf_config=self.nerf_cfg, train_config=cfg,
                    metrics={k: v for k, v in last_metrics.items()
                             if k.startswith('val/')})
                if cfg.ckpt_keep_top_k:
                    ckpt_lib.prune_checkpoints(self.ckpt_dir,
                                               cfg.ckpt_keep_top_k)
        return last_metrics
