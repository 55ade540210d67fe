"""Optimizers and LR schedules via optax.

Capability parity with /root/reference/utils/__init__.py:23-60,
/root/reference/utils/optimizers.py (vendored RAdam/Ranger) and
/root/reference/utils/warmup_scheduler.py (GradualWarmupScheduler). The
reference steps its schedulers per *epoch*; here schedules are continuous in
*steps* (epoch boundaries converted via steps_per_epoch), which is the natural
unit for a jitted train loop and matches the same decay trajectory.

Optimizer map:
  sgd    -> optax.sgd(momentum, weight_decay as additive L2)
  adam   -> optax.adam(eps=1e-8) (+ additive L2, matching torch Adam's
            weight_decay-into-gradient semantics)
  radam  -> optax.radam (replaces the vendored RAdam, optimizers.py:6-96)
  ranger -> RAdam wrapped in optax.lookahead (replaces Ranger,
            optimizers.py:266-404; sync period 6, slow step 0.5 — Ranger's
            defaults)
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import optax

from hypernerf_tpu.configs import TrainConfig

_EPS = 1e-8


def get_scheduler(cfg: TrainConfig, steps_per_epoch: int,
                  total_steps: Optional[int] = None):
    """Build the LR schedule (utils/__init__.py:43-60 semantics, in steps)."""
    total_steps = total_steps or max(1, cfg.num_epochs * steps_per_epoch)
    if cfg.lr_scheduler == 'steplr':
        boundaries = {int(e) * steps_per_epoch: cfg.decay_gamma
                      for e in cfg.decay_step}
        schedule = optax.piecewise_constant_schedule(
            init_value=cfg.lr, boundaries_and_scales=boundaries)
    elif cfg.lr_scheduler == 'cosine':
        schedule = optax.cosine_decay_schedule(
            init_value=cfg.lr, decay_steps=total_steps, alpha=_EPS / cfg.lr)
    elif cfg.lr_scheduler == 'poly':
        def schedule(step):
            frac = 1.0 - (step / steps_per_epoch) / max(1, cfg.num_epochs)
            return cfg.lr * jnp.clip(frac, 0.0, 1.0) ** cfg.poly_exp
    else:
        raise ValueError(f'scheduler not recognized: {cfg.lr_scheduler}')

    # Gradual warmup (warmup_scheduler.py:4-58): ramp base_lr ->
    # base_lr * multiplier over warmup_epochs, then hand off.
    if cfg.warmup_epochs > 0 and cfg.optimizer not in ('radam', 'ranger'):
        warmup_steps = cfg.warmup_epochs * steps_per_epoch
        base = schedule

        def warmed(step):
            ramp = cfg.lr * ((cfg.warmup_multiplier - 1.0)
                             * (step / warmup_steps) + 1.0)
            after = base(step - warmup_steps) * cfg.warmup_multiplier
            return jnp.where(step <= warmup_steps, ramp, after)
        return warmed
    return schedule


def get_optimizer(cfg: TrainConfig, steps_per_epoch: int,
                  total_steps: Optional[int] = None
                  ) -> optax.GradientTransformation:
    """Build the optax optimizer+schedule chain (utils/__init__.py:23-41)."""
    schedule = get_scheduler(cfg, steps_per_epoch, total_steps)
    wd = [] if cfg.weight_decay == 0 else [
        optax.add_decayed_weights(cfg.weight_decay)]

    if cfg.optimizer == 'sgd':
        core = optax.chain(*wd, optax.trace(decay=cfg.momentum),
                           optax.scale_by_learning_rate(schedule))
    elif cfg.optimizer == 'adam':
        core = optax.chain(*wd, optax.scale_by_adam(eps=_EPS),
                           optax.scale_by_learning_rate(schedule))
    elif cfg.optimizer == 'radam':
        core = optax.chain(*wd, optax.scale_by_radam(eps=_EPS),
                           optax.scale_by_learning_rate(schedule))
    elif cfg.optimizer == 'ranger':
        inner = optax.chain(*wd, optax.scale_by_radam(eps=_EPS),
                            optax.scale_by_learning_rate(schedule))
        return optax.lookahead(inner, sync_period=6, slow_step_size=0.5)
    else:
        raise ValueError(f'optimizer not recognized: {cfg.optimizer}')
    return core


def wrap_params_for_optimizer(cfg: TrainConfig, params):
    """Ranger (lookahead) tracks fast+slow weights; wrap/unwrap as needed."""
    if cfg.optimizer == 'ranger':
        return optax.LookaheadParams.init_synced(params)
    return params


def unwrap_params(cfg: TrainConfig, params):
    if cfg.optimizer == 'ranger':
        return params.slow
    return params
