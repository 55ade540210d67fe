#!/usr/bin/env python
"""Import a torch reference checkpoint into this framework.

Converts a checkpoint produced by the PyTorch reference
(/root/reference/train.py — a PyTorch-Lightning ``.ckpt`` with the model
under ``state_dict['nerf.*']``, utils/__init__.py:66-81 — or the bare state
dict its utils/save_weights_only.py emits) into this repo's orbax
weights-only checkpoint plus the ``nerf_config.json`` eval.py reads, so a
reference user can bring their trained models along:

    python tools/import_torch_ckpt.py --ckpt_path epoch=29.ckpt \
        --out_dir ckpts/imported [--check] [any train-CLI flags...]

* The model architecture is reconstructed from the checkpoint's saved
  Lightning hyper-parameters when present (NeRFSystem.save_hyperparameters,
  train.py:38); any extra CLI flags (reference opt.py names) override, and
  are required for bare state dicts. The embedding table size / GLO dim are
  always taken from the checkpoint tensors themselves.
* Weights are mapped through the same fixed linear reindexing the parity
  harness proves correct to ~2e-7 (tools/reference_parity.py
  ``torch_to_flax_params``: dense transposes + posenc block-layout
  permutations on first-layer and skip-concat rows).
* ``--check`` additionally loads the reference model itself with the
  checkpoint weights and asserts both frameworks' renders agree on a probe
  ray batch before writing anything.

The output is directly consumable by ``eval.py --ckpt_path <out>/step_N``
and by ``train.py --weight_path`` (non-strict warm start).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODEL_PREFIX = 'nerf.'


def strip_reference_ckpt(raw):
    """(state_dict without the 'nerf.' prefix, hparams dict, global step).

    Accepts a Lightning checkpoint dict or a bare state dict
    (utils/save_weights_only.py keeps the prefixed keys).
    """
    step, hparams = 0, {}
    if isinstance(raw, dict) and 'state_dict' in raw:
        step = int(raw.get('global_step') or 0)
        hp = raw.get('hyper_parameters') or raw.get('hparams') or {}
        hparams = dict(hp) if isinstance(hp, dict) else dict(vars(hp))
        raw = raw['state_dict']
    sd = {k[len(MODEL_PREFIX):]: v for k, v in raw.items()
          if k.startswith(MODEL_PREFIX)}
    if not sd:
        raise ValueError(
            f"no '{MODEL_PREFIX}*' keys found — not a reference checkpoint "
            f'(got keys like {list(raw)[:3]})')
    return sd, hparams, step


def config_from_hparams(hparams, override_argv=()):
    """NerfConfig/TrainConfig from saved Lightning hparams + CLI overrides.

    hparams keys are the reference opt.py flag names (train.py:38 saves the
    parsed namespace); this repo's opt.py accepts the same names, so the
    resolution logic (configs_from_args) is shared. Explicit CLI flags win
    over saved hparams.
    """
    from hypernerf_tpu.opt import configs_from_args, get_opts
    defaults = get_opts([])
    args = get_opts(list(override_argv))
    for key, val in hparams.items():
        if not hasattr(args, key) or val is None:
            continue
        if getattr(args, key) == getattr(defaults, key):
            setattr(args, key, tuple(val) if isinstance(val, list) else val)
    return configs_from_args(args)


def _sized_from_tensors(nerf_cfg, sd):
    """Pin num_embeddings / glo_dim to the checkpoint's embedding tables."""
    for key in ('warp_embed.embed.weight', 'hyper_embed.embed.weight',
                'nerf_embed.embed.weight'):
        if key in sd:
            n, d = tuple(sd[key].shape)
            return dataclasses.replace(nerf_cfg, num_embeddings=int(n),
                                       glo_dim=int(d))
    return nerf_cfg


def import_checkpoint(ckpt_path: str, out_dir: str, override_argv=(),
                      check: bool = False):
    """Convert; returns (saved checkpoint path, NerfConfig)."""
    import torch

    from tools.reference_parity import torch_to_flax_params

    raw = torch.load(ckpt_path, map_location='cpu')
    sd, hparams, step = strip_reference_ckpt(raw)
    nerf_cfg, train_cfg = config_from_hparams(hparams, override_argv)
    nerf_cfg = _sized_from_tensors(nerf_cfg, sd)
    if nerf_cfg.num_fine_samples > 0 and not any(
            k.startswith('nerf_mlps_fine') for k in sd):
        raise ValueError('config expects a fine MLP but the checkpoint has '
                         'none — pass --N_importance 0')

    params = torch_to_flax_params(None, nerf_cfg, tensors=sd)

    if check:
        _check_against_reference(nerf_cfg, sd, params)

    import jax

    from hypernerf_tpu.training.checkpoints import MODEL_KEY
    import orbax.checkpoint as ocp
    out_dir = os.path.abspath(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f'step_{step}')
    ocp.PyTreeCheckpointer().save(
        path, {MODEL_KEY: jax.device_get(params), 'step': step}, force=True)
    with open(os.path.join(out_dir, 'nerf_config.json'), 'w') as f:
        f.write(nerf_cfg.to_json())
    with open(os.path.join(out_dir, 'train_config.json'), 'w') as f:
        f.write(train_cfg.to_json())
    return path, nerf_cfg


def _check_against_reference(nerf_cfg, sd, params, n_rays: int = 8):
    """Render a probe batch through BOTH frameworks and assert agreement."""
    import numpy as np

    from tools.reference_parity import (build_torch_model,
                                        forward_deviations, make_ray_batch,
                                        run_jax_forward, run_torch_forward)

    cfg = dataclasses.replace(nerf_cfg, noise_std=None,
                              use_stratified_sampling=False,
                              compute_dtype='float32',
                              use_pallas=False, use_pallas_fields=False,
                              use_pallas_level=False)
    torch_model = build_torch_model(cfg)
    missing, unexpected = torch_model.load_state_dict(sd, strict=False)
    if unexpected:
        raise ValueError(f'unexpected checkpoint keys: {unexpected[:5]}')
    origins, directions, ids = make_ray_batch(n_rays, cfg.num_embeddings)
    t_out = run_torch_forward(torch_model, origins, directions, ids)
    j_out = run_jax_forward(cfg, params, origins, directions, ids)
    devs = forward_deviations(t_out, j_out)
    worst = max(devs.values())
    print('probe-render deviations vs the reference model:')
    for k, v in sorted(devs.items()):
        print(f'  {k:24s} {v:.3e}')
    if worst > 1e-4:
        raise ValueError(f'--check failed: worst deviation {worst:.3e}')
    print(f'--check OK (worst {worst:.3e})')


def main():
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument('--ckpt_path', type=str, required=True)
    parser.add_argument('--out_dir', type=str, required=True)
    parser.add_argument('--check', action='store_true',
                        help='verify the imported weights render identically '
                             'through the torch reference before saving')
    args, overrides = parser.parse_known_args()

    os.environ.setdefault('HYPERNERF_PLATFORM', 'cpu')
    from hypernerf_tpu.utils.platform import apply_platform_overrides
    apply_platform_overrides()

    path, cfg = import_checkpoint(args.ckpt_path, args.out_dir,
                                  overrides, check=args.check)
    print(f'imported -> {path}')
    print(f'render with: python eval.py --ckpt_path {path} ...')


if __name__ == '__main__':
    main()
