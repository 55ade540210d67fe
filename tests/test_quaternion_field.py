"""QuaternionField: module behavior + model integration (dense path)."""

import jax
import jax.numpy as jnp
import numpy as np

from hypernerf_tpu.configs import NerfConfig
from hypernerf_tpu.models.nerf import NerfModel
from hypernerf_tpu.models.warping import QuaternionField, SE3Field
from hypernerf_tpu.ops import quaternion
from hypernerf_tpu.ops.ray_dict import prepare_ray_dict


def _field_out(field_cls, pts, emb, key):
    field = field_cls(trunk_depth=2, trunk_width=32, max_deg=4, skips=())
    variables = field.init(key, pts, emb)
    return field.apply(variables, pts, emb), variables


def test_quaternion_field_matches_retraction():
    rs = np.random.RandomState(0)
    pts = jnp.asarray(rs.randn(16, 3), jnp.float32)
    emb = jnp.asarray(rs.randn(16, 8), jnp.float32)
    key = jax.random.PRNGKey(0)
    out, variables = _field_out(QuaternionField, pts, emb, key)
    warped = out['warped_points']
    assert warped.shape == (16, 3)
    # Near-zero-init heads: the warp starts close to identity.
    assert float(jnp.max(jnp.abs(warped - pts))) < 1e-2

    # Same params through SE3Field differ only in the retraction; with
    # nudged (non-tiny) heads the two retract differently.
    nudged = jax.tree.map(lambda x: x + 0.05, variables)
    field_q = QuaternionField(trunk_depth=2, trunk_width=32, max_deg=4,
                              skips=())
    field_s = SE3Field(trunk_depth=2, trunk_width=32, max_deg=4, skips=())
    wq = field_q.apply(nudged, pts, emb)['warped_points']
    ws = field_s.apply(nudged, pts, emb)['warped_points']
    assert float(jnp.max(jnp.abs(wq - ws))) > 1e-4


def test_quaternion_field_jacobian():
    rs = np.random.RandomState(1)
    pts = jnp.asarray(rs.randn(4, 3), jnp.float32)
    emb = jnp.asarray(rs.randn(4, 8), jnp.float32)
    field = QuaternionField(trunk_depth=1, trunk_width=16, max_deg=2,
                            skips=())
    variables = field.init(jax.random.PRNGKey(0), pts, emb)
    out = field.apply(variables, pts, emb, return_jacobian=True)
    assert out['jacobian'].shape == (4, 3, 3)
    assert np.all(np.isfinite(np.asarray(out['jacobian'])))


def test_model_quaternion_warp_trains():
    cfg = NerfConfig(
        num_embeddings=4, num_coarse_samples=8, num_fine_samples=8,
        warp_field_type='quaternion', warp_depth=1, warp_width=16,
        trunk_depth=2, trunk_width=32, rgb_branch_depth=1,
        rgb_branch_width=16, hyper_sheet_depth=1, hyper_sheet_width=16,
        skips=(), noise_std=None, compute_dtype='float32',
        use_pallas=False)
    model = NerfModel(cfg)
    rs = np.random.RandomState(0)
    n = 16
    o = rs.randn(n, 3).astype(np.float32) * 0.1
    d = rs.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate([
        o, d, np.full((n, 1), 0.1, np.float32),
        np.full((n, 1), 3.0, np.float32),
        rs.randint(0, 4, (n, 1)).astype(np.float32)], 1)
    rd = prepare_ray_dict(jnp.asarray(rays))
    key = jax.random.PRNGKey(0)
    variables = model.init({'params': key, 'sampling': key}, rd)

    def loss(params):
        out = model.apply(params, rd, deterministic=True)
        return jnp.mean(out['fine']['rgb'] ** 2)

    val, grads = jax.value_and_grad(loss)(variables)
    assert np.isfinite(float(val))
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # The warp field's parameters receive gradient signal.
    wg = jax.tree.leaves(grads['params']['warp_field'])
    assert max(float(jnp.max(jnp.abs(g))) for g in wg) > 0.0
