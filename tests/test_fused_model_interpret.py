"""Full fused model dispatch on CPU via Pallas interpret mode.

The model's fused fast paths (query_template fused MLP, the fused level
kernel, in-kernel hierarchical sampling + fused compositing, and the
elastic warp-Jacobian side channel) are gated on a TPU backend; with
``NerfConfig.pallas_interpret`` they run under the Pallas interpreter so
the MODEL-LEVEL dispatch — not just the kernels (test_fused_level.py) —
is exercised end-to-end off-device against the dense XLA path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypernerf_tpu.configs import NerfConfig
from hypernerf_tpu.models.nerf import NerfModel
from hypernerf_tpu.ops.ray_dict import prepare_ray_dict

B = 4  # rays


def _rays(seed=0, n=B):
    rs = np.random.RandomState(seed)
    origins = rs.randn(n, 3).astype(np.float32) * 0.1
    dirs = rs.randn(n, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    rays = np.concatenate([
        origins, dirs,
        np.zeros((n, 1), np.float32),
        np.ones((n, 1), np.float32),
        rs.randint(0, 4, (n, 1)).astype(np.float32)], 1)
    return prepare_ray_dict(jnp.asarray(rays))


def _cfg(pallas: bool, **kw):
    base = dict(
        num_embeddings=4, glo_dim=8,
        num_coarse_samples=8, num_fine_samples=8,
        use_warp=True, warp_field_type='translation',
        hyper_slice_method='bendy_sheet',
        warp_depth=2, warp_width=16, warp_freq=4,
        hyper_sheet_depth=2, hyper_sheet_width=16,
        trunk_depth=2, trunk_width=32,
        rgb_branch_depth=1, rgb_branch_width=16,
        skips=(1,), noise_std=0.0,
        compute_dtype='float32',
        use_pallas=pallas, use_pallas_fields=pallas, use_pallas_level=pallas,
        pallas_interpret=pallas, pallas_tile=8, pallas_bwd_tile=8)
    base.update(kw)
    return NerfConfig(**base)


def _run(cfg, return_warp_jacobian=False, seed=0):
    model = NerfModel(cfg)
    rays = _rays(seed)
    rngs = {'params': jax.random.PRNGKey(0),
            'sampling': jax.random.PRNGKey(7)}
    variables = model.init(rngs, rays)
    out = model.apply(variables, rays,
                      return_warp_jacobian=return_warp_jacobian,
                      rngs={'sampling': jax.random.PRNGKey(7)})
    return out


@pytest.mark.slow
@pytest.mark.parametrize('variant', [
    dict(warp_field_type='translation'),
    dict(warp_field_type='se3'),
    dict(warp_field_type='quaternion'),
    dict(warp_field_type='translation', use_original_embed=False),  # anneal
    dict(hyper_slice_method='axis_aligned_plane'),
    # Reference-default 1:2 coarse:fine ratio (opt.py:23): union 8+16=24
    # is non-power-of-two -> in-kernel sentinel-padded merge.
    dict(num_fine_samples=16),
], ids=['translation', 'se3', 'quaternion', 'anneal', 'plane',
        'nonpow2-union'])
def test_fused_model_matches_dense(variant):
    """use_pallas_level under the interpreter == the dense XLA model."""
    warp_type = variant.get('warp_field_type')
    dense = _run(_cfg(False, **variant))
    fused = _run(_cfg(True, **variant))
    for level in ('coarse', 'fine'):
        for key in ('rgb', 'depth', 'acc'):
            np.testing.assert_allclose(
                np.asarray(fused[level][key]), np.asarray(dense[level][key]),
                rtol=2e-4, atol=2e-5, err_msg=f'{warp_type}/{level}/{key}')


@pytest.mark.slow
@pytest.mark.parametrize('warp_type', ['translation', 'se3', 'quaternion'])
def test_fused_model_elastic_jacobian_side_channel(warp_type):
    """With return_warp_jacobian the render stays fused and the Jacobian
    side channel (models/nerf.py render_samples) matches the dense model's
    Jacobian at both levels — for every warp family (translation rides
    ops/pallas/fused_jacobian.py; se3/quaternion the primal+tangent kernel
    in ops/pallas/fused_se3_jacobian.py + the XLA retraction JVP)."""
    dense = _run(_cfg(False, warp_field_type=warp_type),
                 return_warp_jacobian=True)
    fused = _run(_cfg(True, warp_field_type=warp_type),
                 return_warp_jacobian=True)
    for level in ('coarse', 'fine'):
        assert 'warp_jacobian' in fused[level], f'{level} lost the Jacobian'
        jac_f = np.asarray(fused[level]['warp_jacobian'])
        jac_d = np.asarray(dense[level]['warp_jacobian'])
        assert jac_f.shape == jac_d.shape
        # Same dense pullback math on near-identical points (fine points
        # differ only through the kernel-vs-XLA coarse weights).
        np.testing.assert_allclose(jac_f, jac_d, rtol=2e-4, atol=2e-5,
                                   err_msg=level)
        # And the render itself did come from the fused path: weights for
        # the fine level carry the union sample count.
    assert fused['fine']['weights'].shape[-1] == 16


@pytest.mark.slow
def test_fused_model_subsampled_jacobian():
    """elastic_jacobian_samples=K: the fused path returns (B, K, 3, 3)
    Jacobians + (B, K) importance weights, and the weighted reduce stays
    finite and in the exact penalty's ballpark."""
    from hypernerf_tpu.training.losses import weighted_elastic_loss

    out = _run(_cfg(True, elastic_jacobian_samples=4),
               return_warp_jacobian=True)
    for level in ('coarse', 'fine'):
        jac = out[level]['warp_jacobian']
        wts = out[level]['warp_jacobian_weights']
        assert jac.shape[:2] == (B, 4) and jac.shape[-2:] == (3, 3)
        assert wts.shape == (B, 4)
    loss = float(weighted_elastic_loss(out))
    assert np.isfinite(loss) and loss >= 0.0
