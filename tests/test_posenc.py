"""Unit tests for positional encodings (ops/posenc.py).

The encodings emit block layout [x | sin bands | cos bands] — a pure feature
permutation of the reference's per-band interleaving (absorbed by the first
dense layer), chosen for TPU lane utilization. Tests verify against a
loop-built oracle in that layout, plus the custom VJPs against autodiff.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypernerf_tpu.ops.posenc import (posenc, posenc_channels, posenc_orig,
                                      posenc_orig_channels, posenc_window)


def _posenc_orig_blocks(x, n_freqs):
    """Oracle: identity, then all sin bands, then all cos bands."""
    sins = [np.sin(2.0 ** k * x) for k in range(n_freqs)]
    coss = [np.cos(2.0 ** k * x) for k in range(n_freqs)]
    return np.concatenate([x] + sins + coss, axis=-1)


def test_posenc_orig_matches_oracle():
    x = np.random.RandomState(0).randn(5, 7, 3).astype(np.float32)
    got = np.asarray(posenc_orig(jnp.asarray(x), 10))
    np.testing.assert_allclose(got, _posenc_orig_blocks(x, 10), rtol=1e-5,
                               atol=1e-5)


def test_posenc_orig_channels():
    x = jnp.ones((2, 3))
    for f in (0, 1, 7, 10):
        assert posenc_orig(x, f).shape[-1] == posenc_orig_channels(3, f)
    assert posenc_orig_channels(3, 10) == 63  # the NeRF xyz channel count
    assert posenc_orig_channels(3, 6) == 39   # the viewdir channel count


def test_posenc_orig_zero_freqs_is_identity():
    x = jnp.ones((2, 3)) * 0.5
    np.testing.assert_array_equal(np.asarray(posenc_orig(x, 0)), np.asarray(x))


def test_posenc_orig_is_permutation_of_interleaved():
    """Same multiset of features as the reference's interleaved layout."""
    x = np.random.RandomState(1).randn(4, 3).astype(np.float32)
    ours = np.sort(np.asarray(posenc_orig(jnp.asarray(x), 6)), axis=-1)
    interleaved = [x]
    for k in range(6):
        interleaved += [np.sin(2.0 ** k * x), np.cos(2.0 ** k * x)]
    theirs = np.sort(np.concatenate(interleaved, -1), axis=-1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_posenc_orig_custom_vjp_matches_autodiff():
    def plain(x):
        sins = [jnp.sin(2.0 ** k * x) for k in range(5)]
        coss = [jnp.cos(2.0 ** k * x) for k in range(5)]
        return jnp.concatenate([x] + sins + coss, -1)

    x = jnp.asarray(np.random.RandomState(0).randn(7, 3).astype(np.float32))
    g = jnp.asarray(np.random.RandomState(1).randn(7, 33).astype(np.float32))
    _, vjp_custom = jax.vjp(lambda x: posenc_orig(x, 5), x)
    _, vjp_plain = jax.vjp(plain, x)
    np.testing.assert_allclose(np.asarray(vjp_custom(g)[0]),
                               np.asarray(vjp_plain(g)[0]),
                               rtol=1e-4, atol=1e-5)


def test_posenc_nerfies_shapes_and_identity():
    x = jnp.ones((4, 3)) * 0.2
    out = posenc(x, 0, 8, use_identity=False)
    assert out.shape == (4, posenc_channels(3, 0, 8))
    out_id = posenc(x, 0, 8, use_identity=True)
    assert out_id.shape == (4, posenc_channels(3, 0, 8, use_identity=True))
    np.testing.assert_allclose(np.asarray(out_id[:, :3]), np.asarray(x))


def test_posenc_sin_cos_structure():
    # Block k of the sin half is sin(2^k x); cos half likewise.
    x = jnp.asarray([[0.3, -0.1, 0.7]])
    out = np.asarray(posenc(x, 0, 4))
    sin_half = out[:, :12].reshape(1, 4, 3)
    cos_half = out[:, 12:].reshape(1, 4, 3)
    for k in range(4):
        np.testing.assert_allclose(sin_half[0, k], np.sin(2.0 ** k * x[0]),
                                   rtol=1e-6)
        np.testing.assert_allclose(cos_half[0, k], np.cos(2.0 ** k * x[0]),
                                   rtol=1e-5, atol=1e-6)


def test_posenc_window_limits():
    # alpha=0: all bands off; alpha=num_bands: all bands fully on.
    w0 = np.asarray(posenc_window(0, 8, jnp.float32(0.0)))
    np.testing.assert_allclose(w0, np.zeros(8), atol=1e-7)
    w_full = np.asarray(posenc_window(0, 8, jnp.float32(8.0)))
    np.testing.assert_allclose(w_full, np.ones(8), atol=1e-7)
    # Monotone ease-in for the band at the alpha frontier.
    mid = [float(posenc_window(0, 8, jnp.float32(a))[2])
           for a in (2.0, 2.25, 2.5, 2.75, 3.0)]
    assert all(b >= a for a, b in zip(mid, mid[1:]))
    assert mid[0] == pytest.approx(0.0, abs=1e-7)
    assert mid[-1] == pytest.approx(1.0, abs=1e-7)


def test_posenc_windowed_annealing_zeroes_high_bands():
    x = jnp.ones((2, 3)) * 0.4
    out = np.asarray(posenc(x, 0, 8, alpha=jnp.float32(2.0)))
    sin_half = out[:, :24].reshape(2, 8, 3)
    cos_half = out[:, 24:].reshape(2, 8, 3)
    # Bands >= 2 fully suppressed at alpha=2.
    np.testing.assert_allclose(sin_half[:, 2:], 0.0, atol=1e-7)
    np.testing.assert_allclose(cos_half[:, 2:], 0.0, atol=1e-7)
    # Bands < 2 untouched.
    ref = np.asarray(posenc(x, 0, 8))
    np.testing.assert_allclose(out[:, :6].reshape(2, 2, 3),
                               ref[:, :6].reshape(2, 2, 3), rtol=1e-6)


def test_posenc_nerfies_custom_vjp_matches_autodiff():
    def plain(x, alpha):
        scales = 2.0 ** jnp.arange(0, 6, dtype=x.dtype)
        window = 0.5 * (1 - jnp.cos(
            jnp.pi * jnp.clip(alpha - jnp.arange(0, 6, dtype=x.dtype), 0, 1)))
        sins = [window[k] * jnp.sin(scales[k] * x) for k in range(6)]
        coss = [window[k] * jnp.cos(scales[k] * x) for k in range(6)]
        return jnp.concatenate([x] + sins + coss, -1)

    x = jnp.asarray(np.random.RandomState(0).randn(5, 3).astype(np.float32))
    alpha = jnp.float32(2.7)
    out = posenc(x, 0, 6, use_identity=True, alpha=alpha)
    np.testing.assert_allclose(np.asarray(out), np.asarray(plain(x, alpha)),
                               rtol=1e-5, atol=1e-6)
    g = jnp.asarray(np.random.RandomState(1).randn(5, 39).astype(np.float32))
    _, vjp_custom = jax.vjp(
        lambda x: posenc(x, 0, 6, use_identity=True, alpha=alpha), x)
    _, vjp_plain = jax.vjp(lambda x: plain(x, alpha), x)
    np.testing.assert_allclose(np.asarray(vjp_custom(g)[0]),
                               np.asarray(vjp_plain(g)[0]),
                               rtol=1e-4, atol=1e-5)
