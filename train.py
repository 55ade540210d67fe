#!/usr/bin/env python
"""Train HyperNeRF on TPU (CLI parity with /root/reference/train.py).

Example (mirrors the reference README command):
  python train.py --dataset_name llff --root_dir /data/scene \
      --N_importance 64 --img_wh 504 378 --num_epochs 30 --batch_size 1024 \
      --optimizer adam --lr 5e-4 --lr_scheduler steplr --decay_step 10 20 \
      --decay_gamma 0.5 --exp_name exp
"""

from __future__ import annotations


def main():
    from hypernerf_tpu.utils.platform import apply_platform_overrides
    apply_platform_overrides()

    from hypernerf_tpu.opt import configs_from_args, get_opts
    args = get_opts()
    nerf_cfg, train_cfg = configs_from_args(args)

    from hypernerf_tpu.parallel.distributed import maybe_initialize_distributed
    from hypernerf_tpu.parallel.mesh import create_mesh
    from hypernerf_tpu.training.trainer import Trainer
    from hypernerf_tpu.utils.logging import MetricsLogger

    maybe_initialize_distributed()
    num_devices = args.num_devices or args.num_gpus
    mesh = create_mesh(num_devices=num_devices)
    print(f'Device mesh: {mesh.devices.size} x {mesh.devices.flat[0].platform}')

    logger = MetricsLogger(train_cfg.log_dir, train_cfg.exp_name)
    trainer = Trainer(nerf_cfg, train_cfg, mesh=mesh, logger=logger)
    print(f'Dataset: {len(trainer.train_dataset.all_rays):,} rays, '
          f'{trainer.steps_per_epoch} steps/epoch, '
          f'{trainer.total_steps} total steps')
    try:
        metrics = trainer.fit()
        print('Final metrics:', metrics)
    finally:
        logger.close()


if __name__ == '__main__':
    main()
