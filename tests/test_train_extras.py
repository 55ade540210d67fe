"""Tests for annealing schedules and train-state helpers."""

import jax.numpy as jnp
import numpy as np

from hypernerf_tpu.configs import NerfConfig, TrainConfig
from hypernerf_tpu.training.train_state import (compute_extra_params,
                                                forward_params)


def test_extra_params_disabled_for_original_embed():
    cfg = NerfConfig(use_original_embed=True)
    assert compute_extra_params(cfg, TrainConfig(), 100) == {}


def test_extra_params_annealing_ramp():
    cfg = NerfConfig(use_original_embed=False, warp_min_deg=0, warp_max_deg=8,
                     hyper_point_min_deg=0, hyper_point_max_deg=4)
    tc = TrainConfig(warp_alpha_steps=1000, hyper_alpha_steps=100)
    at0 = compute_extra_params(cfg, tc, 0)
    assert float(at0['warp_alpha']) == 0.0
    assert float(at0['hyper_alpha']) == 0.0
    mid = compute_extra_params(cfg, tc, 500)
    np.testing.assert_allclose(float(mid['warp_alpha']), 4.0)
    np.testing.assert_allclose(float(mid['hyper_alpha']), 4.0)  # saturated
    end = compute_extra_params(cfg, tc, 10_000)
    np.testing.assert_allclose(float(end['warp_alpha']), 8.0)
    np.testing.assert_allclose(float(end['hyper_alpha']), 4.0)
    # hyper_sheet_alpha tracks hyper_alpha.
    np.testing.assert_allclose(float(end['hyper_sheet_alpha']), 4.0)
    # nerf (spatial) bands fully on.
    np.testing.assert_allclose(float(end['nerf_alpha']), 10.0)


def test_forward_params_passthrough_and_lookahead():
    import optax
    params = {'w': jnp.ones((2,))}
    assert forward_params(params) is params
    la = optax.LookaheadParams.init_synced(params)
    np.testing.assert_array_equal(np.asarray(forward_params(la)['w']),
                                  np.asarray(params['w']))
