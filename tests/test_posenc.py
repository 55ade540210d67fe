"""Unit tests for positional encodings (ops/posenc.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hypernerf_tpu.ops.posenc import (posenc, posenc_channels, posenc_orig,
                                      posenc_orig_channels, posenc_window)


def _posenc_orig_loop(x, n_freqs):
    """Brute-force reference: identity + per-band [sin, cos] blocks."""
    out = [x]
    for k in range(n_freqs):
        f = 2.0 ** k
        out.append(np.sin(f * x))
        out.append(np.cos(f * x))
    return np.concatenate(out, axis=-1)


def test_posenc_orig_matches_loop_reference():
    x = np.random.RandomState(0).randn(5, 7, 3).astype(np.float32)
    got = np.asarray(posenc_orig(jnp.asarray(x), 10))
    want = _posenc_orig_loop(x, 10)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_posenc_orig_channels():
    x = jnp.ones((2, 3))
    for f in (0, 1, 7, 10):
        assert posenc_orig(x, f).shape[-1] == posenc_orig_channels(3, f)
    assert posenc_orig_channels(3, 10) == 63  # the NeRF xyz channel count
    assert posenc_orig_channels(3, 6) == 39   # the viewdir channel count


def test_posenc_orig_zero_freqs_is_identity():
    x = jnp.ones((2, 3)) * 0.5
    np.testing.assert_array_equal(np.asarray(posenc_orig(x, 0)), np.asarray(x))


def test_posenc_nerfies_shapes_and_identity():
    x = jnp.ones((4, 3)) * 0.2
    out = posenc(x, 0, 8, use_identity=False)
    assert out.shape == (4, posenc_channels(3, 0, 8))
    out_id = posenc(x, 0, 8, use_identity=True)
    assert out_id.shape == (4, posenc_channels(3, 0, 8, use_identity=True))
    np.testing.assert_allclose(np.asarray(out_id[:, :3]), np.asarray(x))


def test_posenc_sin_cos_structure():
    # Band k block is [sin(2^k x), cos(2^k x)] per channel.
    x = jnp.asarray([[0.3, -0.1, 0.7]])
    out = np.asarray(posenc(x, 0, 4))
    out = out.reshape(1, 4, 2, 3)
    for k in range(4):
        np.testing.assert_allclose(out[0, k, 0], np.sin(2.0 ** k * x[0]),
                                   rtol=1e-6)
        np.testing.assert_allclose(out[0, k, 1], np.cos(2.0 ** k * x[0]),
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
    out = out.reshape(2, 8, 2, 3)
    # Bands >= 2 fully suppressed at alpha=2.
    np.testing.assert_allclose(out[:, 2:], np.zeros_like(out[:, 2:]),
                               atol=1e-7)
    # Bands < 2 untouched.
    ref = np.asarray(posenc(x, 0, 8)).reshape(2, 8, 2, 3)
    np.testing.assert_allclose(out[:, :2], ref[:, :2], rtol=1e-6)
