#!/usr/bin/env python
"""Render a trained model along a test pose path (parity with /root/reference/eval.py).

Produces results/{dataset}/{scene}/NNN.png frames, optional PFM/byte depth
dumps, a {scene}.gif at --gif_fps, and per-frame + mean PSNR when GT images
are available. The model configuration is loaded from the config JSON saved
next to the checkpoint (no drifted flag re-typing, unlike the reference's
eval.py:20-74), with CLI flags as fallback/overrides.
"""

from __future__ import annotations

import os


def main():
    from hypernerf_tpu.utils.platform import apply_platform_overrides
    apply_platform_overrides()

    from hypernerf_tpu.opt import configs_from_args, get_opts
    args = get_opts(eval_mode=True)

    import numpy as np

    from hypernerf_tpu.configs import NerfConfig, TrainConfig
    from hypernerf_tpu.datasets import dataset_dict
    from hypernerf_tpu.datasets.depth_io import save_pfm
    from hypernerf_tpu.models.nerf import NerfModel
    from hypernerf_tpu.parallel.mesh import create_mesh
    from hypernerf_tpu.training import checkpoints as ckpt_lib
    from hypernerf_tpu.training import metrics
    from hypernerf_tpu.training.renderer import ImageRenderer
    from hypernerf_tpu.training.train_state import compute_extra_params

    w, h = args.img_wh

    # Resolve the configs: prefer the JSONs serialized at train time.
    nerf_cfg, train_cfg = configs_from_args(args)
    ckpt_path = args.ckpt_path or args.weight_path
    if ckpt_path:
        ckpt_dir = os.path.dirname(os.path.abspath(ckpt_path))
        cfg_json = os.path.join(ckpt_dir, 'nerf_config.json')
        if os.path.exists(cfg_json):
            with open(cfg_json) as f:
                nerf_cfg = NerfConfig.from_json(f.read())
        tc_json = os.path.join(ckpt_dir, 'train_config.json')
        if os.path.exists(tc_json):
            with open(tc_json) as f:
                train_cfg = TrainConfig.from_json(f.read())

    # Annealing alphas at the checkpoint's step, so an anneal-trained model
    # is rendered through the same windowed encoding it was trained with.
    # Weights-only checkpoints carry no step: assume fully annealed.
    ckpt_step = ckpt_lib.checkpoint_step(ckpt_path) if ckpt_path else None
    if ckpt_step is None:
        ckpt_step = max(train_cfg.warp_alpha_steps,
                        train_cfg.hyper_alpha_steps)
    extra_params = compute_extra_params(nerf_cfg, train_cfg, ckpt_step)

    kwargs = dict(root_dir=args.root_dir, split=args.split,
                  img_wh=tuple(args.img_wh),
                  include_idx=args.use_nerfies_meta)
    if args.dataset_name == 'llff':
        kwargs['spheric_poses'] = args.spheric_poses
    dataset = dataset_dict[args.dataset_name](**kwargs)

    model = NerfModel(nerf_cfg)
    import jax
    rng = jax.random.PRNGKey(0)
    sample_rays = dataset[0]['rays'][:8]
    from hypernerf_tpu.ops.ray_dict import prepare_ray_dict
    variables = model.init({'params': rng, 'sampling': rng,
                            'sigma_noise': rng},
                           prepare_ray_dict(jax.numpy.asarray(sample_rays)))
    params = ckpt_lib.load_weights(variables['params'], ckpt_path)
    # Grid-trained models render through the same grid-guided coarse
    # sampling they trained with (None for non-grid configs/checkpoints).
    occupancy = (ckpt_lib.load_occupancy(ckpt_path)
                 if nerf_cfg.use_occupancy_grid else None)

    # Shard full-frame renders over all available chips. Readback is
    # packed: only the rendered level's rgb (+depth when dumping), rgb
    # quantized to uint8 ON DEVICE (renderer.quantize_rgb_u8 — bit-equal
    # to the host to_uint8, so the PNG/GIF bytes are unchanged while the
    # per-frame tunnel transfer drops ~16x).
    typ = 'fine' if nerf_cfg.num_fine_samples > 0 else 'coarse'
    keep = ('rgb', 'depth') if args.save_depth else ('rgb',)
    renderer = ImageRenderer(model, chunk=args.chunk, mesh=create_mesh(),
                             keep=keep, levels=(typ,), quantize=True)

    dir_name = f'results/{args.dataset_name}/{args.scene_name}'
    os.makedirs(dir_name, exist_ok=True)

    import imageio.v2 as imageio
    imgs, psnrs = [], []
    for i in range(len(dataset)):
        sample = dataset[i]
        out = renderer(params, sample['rays'], extra_params,
                       occupancy_grid=occupancy)
        img_pred_ = np.asarray(out[typ]['rgb']).reshape(h, w, 3)
        assert img_pred_.dtype == np.uint8

        if args.save_depth:
            depth_pred = np.nan_to_num(
                np.asarray(out[typ]['depth']).reshape(h, w))
            if args.depth_format == 'pfm':
                save_pfm(os.path.join(dir_name, f'depth_{i:03d}.pfm'),
                         depth_pred.astype(np.float32))
            else:
                with open(os.path.join(dir_name, f'depth_{i:03d}'), 'wb') as f:
                    f.write(depth_pred.tobytes())

        imgs.append(img_pred_)
        imageio.imwrite(os.path.join(dir_name, f'{i:03d}.png'), img_pred_)

        if 'rgbs' in sample:
            img_gt = sample['rgbs'].reshape(h, w, 3)
            # PSNR of the image actually written to disk (the reference
            # scores the pre-quantization float render, eval.py:169-172;
            # the difference is < 0.01 dB at these PSNRs).
            frame_psnr = float(metrics.psnr(img_gt,
                                            img_pred_.astype(np.float32)
                                            / 255.0))
            psnrs.append(frame_psnr)
            print(f'frame {i:03d}: psnr {frame_psnr:.2f}', flush=True)
        else:
            print(f'frame {i:03d} rendered', flush=True)

    imageio.mimsave(os.path.join(dir_name, f'{args.scene_name}.gif'),
                    imgs, fps=args.gif_fps)
    if psnrs:
        print(f'Mean PSNR : {np.mean(psnrs):.2f}')


if __name__ == '__main__':
    main()
