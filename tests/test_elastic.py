"""Nerfies elastic regularization (beyond-reference: the reference's warp
field raises NotImplementedError on Jacobians, warping.py:122)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hypernerf_tpu.configs import NerfConfig, TrainConfig
from hypernerf_tpu.models.nerf import NerfModel
from hypernerf_tpu.training.losses import (elastic_loss,
                                           weighted_elastic_loss)


def test_elastic_loss_identity_is_zero():
    jac = jnp.broadcast_to(jnp.eye(3), (5, 7, 3, 3))
    np.testing.assert_allclose(np.asarray(elastic_loss(jac)), 0.0, atol=1e-9)


def test_elastic_loss_known_value_and_robust_cap():
    # diag(e, 1, 1): log svals = (1, 0, 0), sq_residual = 1.
    jac = jnp.diag(jnp.array([np.e, 1.0, 1.0]))[None]
    scale = 0.03
    expected = 2.0 * (1 / scale ** 2) / (1 / scale ** 2 + 4.0)
    np.testing.assert_allclose(np.asarray(elastic_loss(jac, scale=scale)),
                               [expected], rtol=1e-6)
    # The Geman-McClure remap saturates at 2 — huge distortions can't
    # dominate the batch.
    huge = jnp.diag(jnp.array([1e6, 1.0, 1.0]))[None]
    assert float(elastic_loss(huge)[0]) < 2.0
    # Monotone in the distortion below saturation.
    small = jnp.diag(jnp.array([1.01, 1.0, 1.0]))[None]
    assert float(elastic_loss(small)[0]) < float(elastic_loss(jac)[0])


def test_weighted_elastic_loss_reduce():
    jac = jnp.broadcast_to(jnp.diag(jnp.array([np.e, 1.0, 1.0])),
                           (2, 4, 3, 3))
    per_sample = elastic_loss(jac)
    w = jnp.ones((2, 4)) * 0.25
    results = {'coarse': {'warp_jacobian': jac, 'weights': w}}
    got = float(weighted_elastic_loss(results))
    np.testing.assert_allclose(got, float(per_sample[0, 0]), rtol=1e-6)
    # Levels without a Jacobian contribute nothing.
    results['fine'] = {'weights': w}
    np.testing.assert_allclose(float(weighted_elastic_loss(results)), got,
                               rtol=1e-6)


def test_train_step_with_elastic_loss():
    """The elastic term flows through the sharded train step: enabling it
    changes the loss and keeps gradients finite."""
    from tests.conftest import make_rays, tiny_nerf_config
    from hypernerf_tpu.parallel.mesh import create_mesh, replicate
    from hypernerf_tpu.training.optimizers import get_optimizer
    from hypernerf_tpu.training.train_state import (create_train_state,
                                                    make_train_step)

    nerf_cfg = tiny_nerf_config(num_coarse_samples=4, num_fine_samples=4,
                                noise_std=0.0)
    rays = make_rays(32)
    rgbs = np.random.RandomState(1).rand(32, 3).astype(np.float32)
    mesh = create_mesh(num_devices=1)
    rng = jax.random.PRNGKey(0)

    losses = {}
    for weight in (0.0, 10.0):
        train_cfg = TrainConfig(batch_size=16, lr=1e-3,
                                elastic_loss_weight=weight)
        model = NerfModel(nerf_cfg)
        tx = get_optimizer(train_cfg, steps_per_epoch=10)
        state = create_train_state(model, tx, train_cfg, rng, rays[:8])
        state = replicate(mesh, state)
        step_fn = make_train_step(model, tx, nerf_cfg, train_cfg, mesh)
        state, metrics = step_fn(state, replicate(mesh, jnp.asarray(rays)),
                                 replicate(mesh, jnp.asarray(rgbs)), rng)
        losses[weight] = float(metrics['loss'])
        assert np.isfinite(losses[weight])
        assert all(np.isfinite(np.asarray(x)).all()
                   for x in jax.tree.leaves(state.params))
    # Identical rng/params: any difference is the elastic term (can be tiny
    # at init — warp starts near-identity — so drive the weight high).
    assert losses[10.0] != losses[0.0]


def test_background_loss_values():
    from hypernerf_tpu.training.losses import background_loss
    pts = jnp.ones((5, 3))
    np.testing.assert_allclose(
        np.asarray(background_loss(pts, pts)), 0.0, atol=1e-12)
    moved = pts + jnp.array([0.001, 0.0, 0.0])
    scale = 0.001
    sq = float(jnp.sum((moved - pts) ** 2, -1)[0])  # f32-exact displacement
    expected = 2.0 * (sq / scale ** 2) / (sq / scale ** 2 + 4.0)
    np.testing.assert_allclose(np.asarray(background_loss(moved, pts)),
                               expected, rtol=1e-5)


def test_train_step_with_background_loss():
    """Background points thread through the sharded step (8-device mesh) and
    pull the warp toward the identity: the warp-field gradient changes."""
    from tests.conftest import make_rays, tiny_nerf_config
    from hypernerf_tpu.parallel.mesh import create_mesh, replicate
    from hypernerf_tpu.training.optimizers import get_optimizer
    from hypernerf_tpu.training.train_state import (create_train_state,
                                                    make_train_step)

    nerf_cfg = tiny_nerf_config(num_coarse_samples=4, num_fine_samples=4,
                                noise_std=0.0)
    rays = make_rays(64)
    rgbs = np.random.RandomState(1).rand(64, 3).astype(np.float32)
    bg = jnp.asarray(np.random.RandomState(2).randn(128, 3) * 0.5,
                     jnp.float32)
    mesh = create_mesh(num_devices=8)
    rng = jax.random.PRNGKey(0)

    params_out = {}
    for weight in (0.0, 1000.0):
        train_cfg = TrainConfig(batch_size=32, lr=1e-2,
                                background_loss_weight=weight,
                                background_points_per_step=64)
        model = NerfModel(nerf_cfg)
        tx = get_optimizer(train_cfg, steps_per_epoch=10)
        state = create_train_state(model, tx, train_cfg, rng, rays[:8])
        state = replicate(mesh, state)
        step_fn = make_train_step(model, tx, nerf_cfg, train_cfg, mesh,
                                  background_points=replicate(mesh, bg)
                                  if weight else None)
        state, metrics = step_fn(state, replicate(mesh, jnp.asarray(rays)),
                                 replicate(mesh, jnp.asarray(rgbs)), rng)
        assert np.isfinite(float(metrics['loss']))
        params_out[weight] = jax.device_get(state.params)
    w0 = jax.tree.leaves(params_out[0.0])
    w1 = jax.tree.leaves(params_out[1000.0])
    assert any(not np.allclose(a, b) for a, b in zip(w0, w1)), \
        'background loss had no effect on the update'


def test_warp_jacobian_matches_jacrev():
    """The batched forward-mode Jacobian equals the per-point jacrev one
    (which is what the Nerfies math specifies)."""
    from tests.conftest import tiny_nerf_config
    from hypernerf_tpu.models.warping import TranslationField, _warp_jacobian

    field = TranslationField(depth=2, width=16, skips=(1,))
    rs = np.random.RandomState(0)
    pts = jnp.asarray(rs.randn(12, 3), jnp.float32)
    emb = jnp.asarray(rs.randn(12, 4), jnp.float32)
    variables = field.init(jax.random.PRNGKey(0), pts, emb)

    out = field.apply(variables, pts, emb, return_jacobian=True)

    def warp_one(p, e):
        return field.apply(variables, p[None], e[None])['warped_points'][0]

    jac_ref = jax.vmap(jax.jacrev(warp_one, argnums=0))(pts, emb)
    np.testing.assert_allclose(np.asarray(out['jacobian']),
                               np.asarray(jac_ref), rtol=1e-5, atol=1e-6)


def _svd_elastic(jac, scale=0.03, eps=1e-6):
    svals = jnp.linalg.svd(jac, compute_uv=False)
    log_svals = jnp.log(jnp.maximum(svals, eps))
    sq = jnp.sum(log_svals ** 2, axis=-1)
    ss = sq / (scale ** 2)
    return 2.0 * ss / (ss + 4.0)


def test_analytic_eigvals_match_svd_values_and_grads():
    """The closed-form sym-3x3 eigenvalue path (the TPU-viable one; svd's
    batched QR backward OOMs VMEM at NeRF sample counts) agrees with the
    svd formulation in value AND gradient away from degeneracy."""
    rs = np.random.RandomState(3)
    jac = jnp.asarray(np.eye(3) + 0.2 * rs.randn(64, 3, 3), jnp.float32)

    v_new = np.asarray(elastic_loss(jac))
    v_svd = np.asarray(_svd_elastic(jac))
    np.testing.assert_allclose(v_new, v_svd, rtol=5e-4, atol=1e-6)

    g_new = np.asarray(jax.grad(lambda j: jnp.sum(elastic_loss(j)))(jac))
    g_svd = np.asarray(jax.grad(lambda j: jnp.sum(_svd_elastic(j)))(jac))
    np.testing.assert_allclose(g_new, g_svd, rtol=2e-2, atol=2e-3)


def test_analytic_eigvals_degenerate_grads_finite():
    """Identity / isotropic / rank-deficient Jacobians (coincident singular
    values) must produce finite gradients — the warp-init regime."""
    cases = np.stack([
        np.eye(3),
        2.0 * np.eye(3),
        np.eye(3) + 1e-8 * np.arange(9).reshape(3, 3),
        np.diag([1.0, 1.0, 2.0]),
        np.diag([1e-9, 1.0, 1.0]),
    ]).astype(np.float32)
    jac = jnp.asarray(cases)
    vals = np.asarray(elastic_loss(jac))
    assert np.isfinite(vals).all()
    np.testing.assert_allclose(vals[0], 0.0, atol=1e-6)
    grads = np.asarray(jax.grad(lambda j: jnp.sum(elastic_loss(j)))(jac))
    assert np.isfinite(grads).all(), grads


def test_weighted_sample_indices_distribution():
    from hypernerf_tpu.ops.sampling import weighted_sample_indices
    w = jnp.asarray([[0.0, 0.7, 0.0, 0.3],
                     [1.0, 0.0, 0.0, 0.0]])
    idx = weighted_sample_indices(jax.random.PRNGKey(0), w, 4000)
    idx = np.asarray(idx)
    # Zero-weight bins never drawn; frequencies track the weights.
    assert set(np.unique(idx[0])) <= {1, 3}
    assert set(np.unique(idx[1])) == {0}
    freq1 = (idx[0] == 1).mean()
    assert abs(freq1 - 0.7) < 0.03, freq1
    # Degenerate all-zero ray resolves in-range (estimator scales by W~0).
    z = weighted_sample_indices(jax.random.PRNGKey(1),
                                jnp.zeros((1, 4)), 8)
    assert ((np.asarray(z) >= 0) & (np.asarray(z) < 4)).all()


def test_subsampled_elastic_estimator_unbiased():
    """W/K importance weights + weight-proportional draws estimate the full
    weighted elastic penalty: mean over many keys converges to the exact
    reduce."""
    from hypernerf_tpu.ops.sampling import weighted_sample_indices
    rs = np.random.RandomState(0)
    B, S, K = 8, 16, 4
    jac = jnp.asarray(np.eye(3) + 0.3 * rs.randn(B, S, 3, 3),
                      jnp.float32)
    w = jnp.asarray(rs.rand(B, S).astype(np.float32))
    e = elastic_loss(jac)
    exact = float(jnp.mean(jnp.sum(w * e, axis=-1)))

    def draw(key):
        idx = weighted_sample_indices(key, w, K)
        e_k = jnp.take_along_axis(e, idx, axis=-1)
        w_eff = jnp.sum(w, -1, keepdims=True) / K
        return jnp.mean(jnp.sum(w_eff * e_k, axis=-1))

    keys = jax.random.split(jax.random.PRNGKey(42), 400)
    est = float(jnp.mean(jax.vmap(draw)(keys)))
    np.testing.assert_allclose(est, exact, rtol=0.05)
