"""Unit tests for neural modules (models/modules.py, models/warping.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from hypernerf_tpu.models.modules import MLP, GLOEmbed, HyperSheetMLP, NerfMLP
from hypernerf_tpu.models.warping import SE3Field, TranslationField


def test_mlp_skip_topology():
    """The layer after a skip index consumes width + in_ch features."""
    mlp = MLP(out_ch=3, depth=4, width=16, skips=(1,))
    x = jnp.ones((2, 5))
    params = mlp.init(jax.random.PRNGKey(0), x)['params']
    assert params['hidden_0']['kernel'].shape == (5, 16)
    assert params['hidden_1']['kernel'].shape == (16, 16)
    # skip concat after hidden_1 -> hidden_2 sees 16 + 5.
    assert params['hidden_2']['kernel'].shape == (21, 16)
    assert params['hidden_3']['kernel'].shape == (16, 16)
    assert params['logit']['kernel'].shape == (16, 3)
    assert mlp.apply({'params': params}, x).shape == (2, 3)


def test_mlp_depth_zero_is_linear():
    mlp = MLP(out_ch=2, depth=0, width=16)
    x = jnp.ones((3, 4))
    params = mlp.init(jax.random.PRNGKey(0), x)['params']
    assert list(params.keys()) == ['logit']
    assert mlp.apply({'params': params}, x).shape == (3, 2)


def test_mlp_output_init_and_activation():
    mlp = MLP(out_ch=3, depth=1, width=8,
              output_init=jax.nn.initializers.zeros,
              output_activation=jax.nn.sigmoid)
    x = jnp.ones((2, 4))
    params = mlp.init(jax.random.PRNGKey(0), x)['params']
    out = mlp.apply({'params': params}, x)
    # Zero output weights leave only the torch-default bias
    # (U(+-1/sqrt(8)), the reference's un-re-initialized nn.Linear bias),
    # so the sigmoid output sits within that bound of 0.5.
    bound = jax.nn.sigmoid(1.0 / np.sqrt(8)) - 0.5
    assert np.abs(np.asarray(out) - 0.5).max() <= bound + 1e-6
    assert np.abs(np.asarray(params['logit']['bias'])).max() > 0.0

    zb = MLP(out_ch=3, depth=1, width=8,
             output_init=jax.nn.initializers.zeros,
             torch_default_bias=False,
             output_activation=jax.nn.sigmoid)
    zparams = zb.init(jax.random.PRNGKey(0), x)['params']
    np.testing.assert_allclose(np.asarray(zb.apply({'params': zparams}, x)),
                               0.5)  # sigmoid(0)


def test_glo_embed_init_std_and_squeeze():
    embed = GLOEmbed(num_embeddings=50, features=8)
    idx = jnp.asarray([[0], [1], [2]], jnp.int32)
    params = embed.init(jax.random.PRNGKey(0), idx)['params']
    table = np.asarray(params['embed']['embedding'])
    assert table.shape == (50, 8)
    # init normal with std 0.1/dim (modules.py:146).
    assert abs(table.std() - 0.1 / 8) < 0.003
    out = embed.apply({'params': params}, idx)
    assert out.shape == (3, 8)
    # (B,) input works too.
    out2 = embed.apply({'params': params}, jnp.asarray([0, 1, 2]))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_nerf_mlp_shapes_and_conditions():
    mlp = NerfMLP(trunk_depth=2, trunk_width=32, rgb_branch_depth=2,
                  rgb_branch_width=16, skips=(1,))
    x = jnp.ones((4, 6, 10))
    alpha_cond = jnp.ones((4, 8))
    rgb_cond = jnp.ones((4, 12))
    params = mlp.init(jax.random.PRNGKey(0), x, alpha_cond, rgb_cond)['params']
    out = mlp.apply({'params': params}, x, alpha_cond, rgb_cond)
    assert out['rgb'].shape == (4, 6, 3)
    assert out['alpha'].shape == (4, 6, 1)
    # Condition dims feed the heads: alpha head sees bottleneck(16)+8.
    assert params['alpha_head']['kernel'].shape == (16 + 8, 1)
    assert params['rgb_branch']['hidden_0']['kernel'].shape == (16 + 12, 16)

    # Unconditioned variant.
    mlp2 = NerfMLP(trunk_depth=2, trunk_width=32, rgb_branch_depth=2,
                   rgb_branch_width=16, skips=(1,))
    params2 = mlp2.init(jax.random.PRNGKey(0), x)['params']
    out2 = mlp2.apply({'params': params2}, x)
    assert out2['rgb'].shape == (4, 6, 3)
    assert params2['alpha_head']['kernel'].shape == (16, 1)


def test_hyper_sheet_mlp_near_zero_at_init():
    """Output init std 1e-5 (modules.py:320) + the reference's
    un-re-initialized output bias U(+-1/sqrt(width)): at init the hyper
    coords are a small PER-CHANNEL CONSTANT (the bias), not exactly zero —
    faithful to the reference's actual init (its weight-only re-init
    loop, modules.py:105-109)."""
    mlp = HyperSheetMLP(out_ch=4, depth=2, width=16, skips=(1,))
    pts = jnp.ones((3, 5, 3)) * 0.3
    embed = jnp.ones((3, 5, 8)) * 0.1
    params = mlp.init(jax.random.PRNGKey(0), pts, embed)['params']
    out = np.asarray(mlp.apply({'params': params}, pts, embed))
    assert out.shape == (3, 5, 4)
    assert np.abs(out).max() <= 1.0 / np.sqrt(16) + 1e-3
    # Constant across points: the weight contribution is ~1e-5.
    assert np.abs(out - out[0, 0]).max() < 1e-3


def test_translation_field_near_identity_at_init():
    """uniform(0,1e-4) output weights + the reference's default output bias
    -> the warp starts as a small CONSTANT translation (|b| <= 1/sqrt(16)
    here), identical for every point — the reference's actual init."""
    field = TranslationField(depth=2, width=16, skips=(1,))
    pts = jnp.asarray(np.random.RandomState(0).randn(4, 6, 3), jnp.float32)
    embed = jnp.ones((4, 6, 8)) * 0.05
    params = field.init(jax.random.PRNGKey(0), pts, embed)['params']
    out = field.apply({'params': params}, pts, embed)
    delta = np.asarray(out['warped_points']) - np.asarray(pts)
    assert np.abs(delta).max() <= 1.0 / np.sqrt(16) + 1e-3
    # The shift is near-constant across points (bias-dominated; the
    # uniform(0,1e-4) weight term contributes ~1e-3).
    assert np.abs(delta - delta[0, 0]).max() < 5e-3


def test_translation_field_jacobian():
    # Low n_freq so the posenc chain rule doesn't amplify the tiny output
    # init (d posenc/dx scales with 2^n_freq).
    field = TranslationField(depth=2, width=16, skips=(1,), n_freq=2)
    pts = jnp.asarray(np.random.RandomState(0).randn(2, 3, 3), jnp.float32)
    embed = jnp.ones((2, 3, 8)) * 0.05
    params = field.init(jax.random.PRNGKey(0), pts, embed)['params']
    out = field.apply({'params': params}, pts, embed, None, True)
    jac = np.asarray(out['jacobian'])
    assert jac.shape == (2, 3, 3, 3)
    # Near-identity warp -> jacobian ~ I.
    np.testing.assert_allclose(jac, np.broadcast_to(np.eye(3), jac.shape),
                               atol=0.02)

    # Jacobian agrees with finite differences at one probe point.
    def warp_flat(p):
        inp = p.reshape(1, 1, 3)
        return np.asarray(field.apply(
            {'params': params}, jnp.asarray(inp), embed[:1, :1]
        )['warped_points']).reshape(3)

    p0 = np.asarray(pts)[0, 0]
    eps = 1e-4
    fd = np.stack([(warp_flat(p0 + eps * np.eye(3)[i])
                    - warp_flat(p0 - eps * np.eye(3)[i])) / (2 * eps)
                   for i in range(3)], axis=1)
    np.testing.assert_allclose(jac[0, 0], fd, atol=1e-2)


def test_se3_field_near_identity_at_init_and_batched():
    field = SE3Field(trunk_depth=2, trunk_width=16, skips=(1,))
    pts = jnp.asarray(np.random.RandomState(0).randn(4, 6, 3), jnp.float32)
    embed = jnp.ones((4, 6, 8)) * 0.05
    params = field.init(jax.random.PRNGKey(0), pts, embed)['params']
    out = field.apply({'params': params}, pts, embed)
    warped = np.asarray(out['warped_points'])
    assert warped.shape == (4, 6, 3)
    assert np.isfinite(warped).all()  # no NaN at theta ~ 0 (init regime)
    assert np.abs(warped - np.asarray(pts)).max() < 1e-2


def test_se3_field_responds_to_metadata():
    field = SE3Field(trunk_depth=2, trunk_width=16, skips=(1,))
    pts = jnp.asarray(np.random.RandomState(0).randn(2, 3, 3), jnp.float32)
    e1 = jnp.ones((2, 3, 8)) * 2.0
    e2 = -jnp.ones((2, 3, 8)) * 2.0
    params = field.init(jax.random.PRNGKey(3), pts, e1)['params']
    w1 = np.asarray(field.apply({'params': params}, pts, e1)['warped_points'])
    w2 = np.asarray(field.apply({'params': params}, pts, e2)['warped_points'])
    # The reference's SE3Field drops the metadata (warping.py:223-224);
    # ours must actually condition on it.
    assert np.abs(w1 - w2).max() > 0
