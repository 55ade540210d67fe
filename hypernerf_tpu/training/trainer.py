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

    def _val_stats(self, out, rgbs):
        """On-device val metrics + display tensors (jitted once).

        Everything the host needs from a val render is computed on device —
        the training loss over all levels, final-level PSNR, the prediction
        quantized to uint8 (PNG-identical, 12x smaller over the tunnel than
        the f32 per-level render dict) and the f32 depth for the JET viz.
        """
        typ = 'fine' if self.nerf_cfg.num_fine_samples > 0 else 'coarse'
        pred = out[typ]['rgb']
        # val/loss is the full coarse+fine training loss on the val image
        # (reference train.py:171 / losses.py:9-14); val/psnr is final-level.
        val_loss = loss_dict[self.train_cfg.loss_type](out, rgbs)
        val_mse = jnp.mean((pred - rgbs) ** 2)
        val_psnr = -10.0 * jnp.log10(val_mse)
        from hypernerf_tpu.training.renderer import quantize_rgb_u8
        return {'val/loss': val_loss, 'val/psnr': val_psnr,
                'pred_u8': quantize_rgb_u8(pred), 'depth': out[typ]['depth']}

    def _dispatch_val(self, step: int):
        """Launch a val render WITHOUT blocking the host.

        Returns (step, device-side stats). The render is queued behind the
        already-dispatched train steps on the device stream and reads this
        step's params before any later (donating) train step can overwrite
        them — dispatch order alone makes the result correct; the host never
        waits. ``_finish_val`` reads it back once it has long completed.
        """
        params = forward_params(self.state.params)
        # Render with the SAME annealing alphas the train step uses at this
        # step — otherwise a mid-anneal model is validated with all bands on
        # (a different function than the one being trained).
        extra_params = compute_extra_params(self.nerf_cfg, self.train_cfg,
                                            step)
        # Grid-trained models validate through the same grid-guided coarse
        # distribution they train with (state.occupancy is None otherwise).
        out = self.renderer(params, self._val_rays, extra_params,
                            occupancy_grid=self.state.occupancy,
                            device_get=False)
        if self._val_stats_fn is None:
            self._val_stats_fn = jax.jit(self._val_stats)
        return step, self._val_stats_fn(out, self._val_rgbs_dev)

    def _finish_val(self, pending, log_images: bool = True
                    ) -> Dict[str, float]:
        """Read back + log a dispatched val render (the only blocking part)."""
        step, stats = pending
        stats = jax.device_get(stats)
        metrics = {'val/loss': float(stats['val/loss']),
                   'val/psnr': float(stats['val/psnr'])}
        if self.logger is not None:
            for k, v in metrics.items():
                self.logger.add_scalar(k, v, step)
            if log_images:
                w, h = self.train_cfg.img_wh
                img = stats['pred_u8'].reshape(h, w, 3) / 255.0
                img_gt = np.asarray(self._val_rgbs).reshape(h, w, 3)
                depth = visualize_depth(stats['depth'].reshape(h, w))
                self.logger.add_images(
                    'val/GT_pred_depth',
                    np.stack([img_gt, img, depth]), step)
        return metrics

    @property
    def _val_rays(self):
        if not hasattr(self, '_val_sample'):
            self._val_sample = self.val_dataset[0]
            self._val_stats_fn = None
            self._val_rgbs_dev = replicate(
                self.mesh, jnp.asarray(self._val_sample['rgbs']))
        return self._val_sample['rays']

    @property
    def _val_rgbs(self):
        _ = self._val_rays
        return self._val_sample['rgbs']

    def validate(self, step: int, log_images: bool = True) -> Dict[str, float]:
        """Synchronous val (tools / end-of-run); fit() uses the async pair."""
        return self._finish_val(self._dispatch_val(step), log_images)

    # ---------------------------------------------------------------- train

    def fit(self, progress: bool = True):
        """The training loop, written so the HOST NEVER WAITS on the device
        inside the steady state: val renders are dispatched behind the
        in-flight train steps and read back ~16 steps later (by which time
        the device has finished them — the readback is pure tunnel latency,
        overlapped with further dispatch), and per-log metric readbacks are
        delayed one log interval the same way. The reference's Lightning
        loop blocks on every val image and every logged scalar
        (/root/reference/train.py:96-117, :155-161).
        """
        cfg = self.train_cfg
        start_step = int(jax.device_get(self.state.step))
        val_every = max(1, int(self.steps_per_epoch * cfg.val_check_interval))
        # Enough steps for the val render to drain through the device queue;
        # small enough that the metrics land well before the next ckpt.
        val_flush_delay = min(16, max(1, val_every - 1))

        if cfg.num_sanity_val_steps > 0 and start_step == 0:
            self.validate(step=0, log_images=True)

        profiling = False
        t0 = time.time()
        rays_done = 0
        last_metrics = {}
        pending_val = None   # (step, device stats) flying behind the stream
        pending_log = None   # (step, device metrics, rays/s), ditto

        def flush_val():
            nonlocal pending_val
            if pending_val is None:
                return
            val_metrics = self._finish_val(pending_val)
            last_metrics.update(val_metrics)
            if progress:
                print(f'  val psnr={val_metrics["val/psnr"]:.2f} '
                      f'(step {pending_val[0]})', flush=True)
            pending_val = None

        def flush_log():
            nonlocal pending_log
            if pending_log is None:
                return
            log_step, dev_metrics, rays_per_sec = pending_log
            m = jax.device_get(dev_metrics)
            train_metrics = {
                'train/loss': float(m['loss']),
                'train/psnr': float(m['psnr']),
                'train/rays_per_sec': rays_per_sec,
                'lr': float(self.lr_schedule(log_step - 1)),
            }
            # update (not reassign): keep the latest val/ metrics so the
            # checkpoint manifest always carries the last val/psnr.
            last_metrics.update(train_metrics)
            if self.logger is not None:
                for k, v in train_metrics.items():
                    self.logger.add_scalar(k, v, log_step)
            if progress:
                print(f'step {log_step}/{self.total_steps} '
                      f'loss={train_metrics["train/loss"]:.5f} '
                      f'psnr={train_metrics["train/psnr"]:.2f} '
                      f'rays/s={rays_per_sec:,.0f}', flush=True)
            pending_log = None

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
                flush_log()  # the PREVIOUS interval's metrics — long ready
                pending_log = (step + 1, metrics,
                               rays_done / max(time.time() - t0, 1e-9))

            # Flush a flying val once the device has certainly finished it.
            if (pending_val is not None
                    and step + 1 >= pending_val[0] + val_flush_delay):
                flush_val()

            if (step + 1) % val_every == 0:
                flush_val()
                pending_val = self._dispatch_val(step + 1)

            ckpt_every = cfg.ckpt_every_steps or self.steps_per_epoch
            if (step + 1) % ckpt_every == 0 or step + 1 == self.total_steps:
                flush_val()  # manifest must carry this step's val/psnr
                if jax.process_index() == 0:
                    ckpt_lib.save_checkpoint(
                        self.ckpt_dir, step + 1, jax.device_get(self.state),
                        nerf_config=self.nerf_cfg, train_config=cfg,
                        metrics={k: v for k, v in last_metrics.items()
                                 if k.startswith('val/')})
                    if cfg.ckpt_keep_top_k:
                        ckpt_lib.prune_checkpoints(self.ckpt_dir,
                                                   cfg.ckpt_keep_top_k)
        flush_log()
        flush_val()
        return last_metrics
