"""Checkpointing via orbax: full-state resume and weights-only warm start.

Capability parity with the reference's checkpoint semantics
(/root/reference/utils/__init__.py:66-89, train.py:200-204, 221):

* Every-save retention (save_top_k=-1) with the val/psnr of each save
  recorded so the best checkpoint is identifiable.
* Model parameters stored under a named sub-model key ('nerf' — the PL
  "nerf." state-dict prefix equivalent).
* Weights-only warm start (--weight_path): non-strict partial load into an
  existing parameter tree, with ignore-prefix filtering
  (--prefixes_to_ignore).
* Full-state resume (--ckpt_path): params + optimizer state + step.
* The resolved model/train configs are serialized next to the checkpoints so
  eval can never drift from the training flags (the reference's eval.py
  re-declares a drifted flag set, eval.py:20-74).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import jax
import numpy as np
import orbax.checkpoint as ocp

MODEL_KEY = 'nerf'


def _flatten(tree, prefix=()):
    """Flatten a nested dict pytree into {'a/b/c': leaf}."""
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (str(k),)))
    else:
        out['/'.join(prefix)] = tree
    return out


def save_checkpoint(ckpt_dir: str, step: int, state, nerf_config=None,
                    train_config=None, metrics: Optional[dict] = None):
    """Save a full training checkpoint at ``ckpt_dir/step_N``."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f'step_{step}')
    payload = {
        MODEL_KEY: jax.device_get(state.params),
        'opt_state': jax.device_get(state.opt_state),
        'step': int(step),
    }
    occupancy = getattr(state, 'occupancy', None)
    if occupancy is not None:
        payload['occupancy'] = jax.device_get(occupancy)
    checkpointer = ocp.PyTreeCheckpointer()
    checkpointer.save(path, payload, force=True)

    # Append to the manifest (step -> metrics), used for best-ckpt selection.
    manifest_path = os.path.join(ckpt_dir, 'manifest.json')
    manifest = {}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)
    manifest[str(step)] = {k: float(v) for k, v in (metrics or {}).items()}
    with open(manifest_path, 'w') as f:
        json.dump(manifest, f, indent=2)

    if nerf_config is not None:
        with open(os.path.join(ckpt_dir, 'nerf_config.json'), 'w') as f:
            f.write(nerf_config.to_json())
    if train_config is not None:
        with open(os.path.join(ckpt_dir, 'train_config.json'), 'w') as f:
            f.write(train_config.to_json())
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Path of the highest-step checkpoint in ``ckpt_dir`` (or None)."""
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        if name.startswith('step_') and name[5:].isdigit():
            steps.append(int(name[5:]))
    if not steps:
        return None
    return os.path.join(ckpt_dir, f'step_{max(steps)}')


def best_checkpoint(ckpt_dir: str, monitor: str = 'val/psnr',
                    mode: str = 'max') -> Optional[str]:
    """Path of the best checkpoint per the manifest (ModelCheckpoint parity)."""
    manifest_path = os.path.join(ckpt_dir, 'manifest.json')
    if not os.path.exists(manifest_path):
        return latest_checkpoint(ckpt_dir)
    with open(manifest_path) as f:
        manifest = json.load(f)
    scored = [(v[monitor], int(k)) for k, v in manifest.items()
              if monitor in v]
    if not scored:
        return latest_checkpoint(ckpt_dir)
    best = max(scored)[1] if mode == 'max' else min(scored)[1]
    return os.path.join(ckpt_dir, f'step_{best}')


def prune_checkpoints(ckpt_dir: str, keep_top_k: int,
                      monitor: str = 'val/psnr', mode: str = 'max'):
    """Retention policy: keep the top-k checkpoints by the monitored metric
    plus (always) the latest, delete the rest.

    The reference keeps everything (save_top_k=-1, train.py:203); this is the
    opt-in top-k mode of PL's ModelCheckpoint. Checkpoints missing the metric
    (e.g. saved before any validation) rank last. The manifest keeps all
    rows so history survives pruning.
    """
    import shutil
    manifest_path = os.path.join(ckpt_dir, 'manifest.json')
    if not os.path.isdir(ckpt_dir) or keep_top_k is None or keep_top_k < 1:
        return
    manifest = {}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)
    steps = []
    for name in os.listdir(ckpt_dir):
        if name.startswith('step_') and name[5:].isdigit():
            steps.append(int(name[5:]))
    if len(steps) <= keep_top_k:
        return
    latest = max(steps)
    sign = 1.0 if mode == 'max' else -1.0

    def score(step):
        val = manifest.get(str(step), {}).get(monitor)
        return sign * float(val) if val is not None else -float('inf')

    ranked = sorted(steps, key=score, reverse=True)
    keep = set(ranked[:keep_top_k]) | {latest}
    for step in steps:
        if step not in keep:
            shutil.rmtree(os.path.join(ckpt_dir, f'step_{step}'),
                          ignore_errors=True)


def checkpoint_step(ckpt_path: str) -> Optional[int]:
    """The global step a checkpoint was saved at (None for weights-only)."""
    try:
        raw = ocp.PyTreeCheckpointer().restore(os.path.abspath(ckpt_path))
    except Exception:
        return None
    step = raw.get('step') if isinstance(raw, dict) else None
    return int(step) if step is not None else None


def restore_checkpoint(path: str, state=None):
    """Restore a checkpoint.

    With ``state`` given, the restored payload is coerced to its structure
    (full-state resume); otherwise the raw tree is returned.
    """
    path = os.path.abspath(path)
    checkpointer = ocp.PyTreeCheckpointer()
    raw = checkpointer.restore(path)
    if state is None:
        return raw
    template = {
        MODEL_KEY: jax.device_get(state.params),
        'opt_state': jax.device_get(state.opt_state),
        'step': 0,
    }
    occupancy = getattr(state, 'occupancy', None)
    # Only ask for 'occupancy' when the checkpoint actually contains it:
    # resuming a run that newly enables use_occupancy_grid from an older
    # checkpoint keeps the state's fresh grid instead of failing restore.
    if occupancy is not None and isinstance(raw, dict) and 'occupancy' in raw:
        template['occupancy'] = jax.device_get(occupancy)
    restored = checkpointer.restore(path, item=template)
    out = state.replace(
        step=np.asarray(restored['step'], np.int32),
        params=restored[MODEL_KEY],
        opt_state=restored['opt_state'])
    if occupancy is not None and 'occupancy' in restored:
        out = out.replace(occupancy=restored['occupancy'])
    return out


def load_occupancy(ckpt_path: Optional[str]):
    """The occupancy grid stored in a full checkpoint, or None.

    Lets eval render a grid-trained model through the same grid-guided
    coarse sampling distribution it was trained with. Weights-only
    checkpoints (save_weights_only.py) carry no grid.
    """
    if not ckpt_path:
        return None
    raw = ocp.PyTreeCheckpointer().restore(os.path.abspath(ckpt_path))
    if isinstance(raw, dict) and raw.get('occupancy') is not None:
        return jax.numpy.asarray(raw['occupancy'])
    return None


def extract_model_params(ckpt_path: str, model_name: str = MODEL_KEY,
                         prefixes_to_ignore: Sequence[str] = ()) -> dict:
    """Load just the model sub-tree from a checkpoint, dropping ignored
    prefixes (utils/__init__.py:66-81 parity: 'nerf.' strip + filter)."""
    raw = ocp.PyTreeCheckpointer().restore(os.path.abspath(ckpt_path))
    tree = raw.get(model_name, raw)
    flat = _flatten(tree)
    kept = {k: v for k, v in flat.items()
            if not any(k.startswith(p) for p in prefixes_to_ignore)}
    return kept


def load_weights(params, ckpt_path: Optional[str],
                 model_name: str = MODEL_KEY,
                 prefixes_to_ignore: Sequence[str] = ()):
    """Non-strict partial weight load into an existing parameter tree.

    Leaves present in the checkpoint (and not prefix-ignored) override the
    corresponding leaves of ``params``; everything else keeps its init
    (load_ckpt parity, utils/__init__.py:83-89).
    """
    if not ckpt_path:
        return params
    ckpt_flat = extract_model_params(ckpt_path, model_name,
                                     prefixes_to_ignore)

    def merge(tree, prefix=()):
        if isinstance(tree, dict):
            return {k: merge(v, prefix + (str(k),)) for k, v in tree.items()}
        key = '/'.join(prefix)
        if key in ckpt_flat and np.shape(ckpt_flat[key]) == np.shape(tree):
            return jax.numpy.asarray(ckpt_flat[key], dtype=tree.dtype)
        return tree

    return merge(jax.device_get(params))


def save_weights_only(ckpt_path: str, out_path: str):
    """Strip a full checkpoint down to bare model weights
    (utils/save_weights_only.py parity)."""
    params = ocp.PyTreeCheckpointer().restore(
        os.path.abspath(ckpt_path)).get(MODEL_KEY)
    ocp.PyTreeCheckpointer().save(os.path.abspath(out_path),
                                  {MODEL_KEY: params}, force=True)
