"""Tests for optimizers and LR schedules (training/optimizers.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypernerf_tpu.configs import TrainConfig
from hypernerf_tpu.training.optimizers import get_optimizer, get_scheduler


def _params():
    return {'w': jnp.ones((4, 4)), 'b': jnp.zeros((4,))}


def _grads():
    return {'w': jnp.ones((4, 4)) * 0.1, 'b': jnp.ones((4,)) * 0.1}


def test_steplr_schedule_decays_at_epoch_boundaries():
    cfg = TrainConfig(lr=1e-3, lr_scheduler='steplr', decay_step=(2, 4),
                      decay_gamma=0.1)
    sched = get_scheduler(cfg, steps_per_epoch=100)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(199)) == pytest.approx(1e-3)
    assert float(sched(200)) == pytest.approx(1e-4)
    assert float(sched(400)) == pytest.approx(1e-5)


def test_cosine_schedule_endpoints():
    cfg = TrainConfig(lr=1e-3, lr_scheduler='cosine', num_epochs=10)
    sched = get_scheduler(cfg, steps_per_epoch=10)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(100)) < 1e-6  # decayed to ~eps


def test_poly_schedule():
    cfg = TrainConfig(lr=1e-3, lr_scheduler='poly', num_epochs=10,
                      poly_exp=0.9)
    sched = get_scheduler(cfg, steps_per_epoch=10)
    assert float(sched(0)) == pytest.approx(1e-3)
    want = 1e-3 * (1 - 5 / 10) ** 0.9
    assert float(sched(50)) == pytest.approx(want, rel=1e-5)
    assert float(sched(100)) == pytest.approx(0.0, abs=1e-9)


def test_warmup_wraps_schedule():
    cfg = TrainConfig(lr=1e-3, lr_scheduler='steplr', decay_step=(100,),
                      warmup_epochs=2, warmup_multiplier=2.0)
    sched = get_scheduler(cfg, steps_per_epoch=10)
    # Ramp from base lr to base*multiplier over 20 steps.
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(10)) == pytest.approx(1.5e-3)
    assert float(sched(20)) == pytest.approx(2e-3)
    # After warmup: steplr value times multiplier.
    assert float(sched(30)) == pytest.approx(2e-3)


@pytest.mark.parametrize('name', ['sgd', 'adam', 'radam', 'ranger'])
def test_optimizers_produce_updates(name):
    cfg = TrainConfig(optimizer=name, lr=1e-2)
    tx = get_optimizer(cfg, steps_per_epoch=10)
    params = _params()
    if name == 'ranger':
        import optax
        params = optax.LookaheadParams.init_synced(params)
    state = tx.init(params)
    updates, state = tx.update(_grads() if name != 'ranger'
                               else _grads(), state, params)
    import optax
    new_params = optax.apply_updates(params, updates)
    leaves = jax.tree.leaves(new_params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # Parameters actually moved.
    flat_old = jax.tree.leaves(params)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(flat_old, leaves))


def test_weight_decay_chain():
    cfg = TrainConfig(optimizer='adam', lr=1e-2, weight_decay=0.1)
    tx = get_optimizer(cfg, steps_per_epoch=10)
    params = _params()
    state = tx.init(params)
    zero_grads = jax.tree.map(jnp.zeros_like, params)
    updates, _ = tx.update(zero_grads, state, params)
    # With zero gradient and nonzero weights, decay produces movement on w.
    assert np.abs(np.asarray(updates['w'])).max() > 0


def test_unknown_optimizer_and_scheduler():
    with pytest.raises(ValueError):
        get_optimizer(TrainConfig(optimizer='bogus'), 10)
    with pytest.raises(ValueError):
        get_scheduler(TrainConfig(lr_scheduler='bogus'), 10)
