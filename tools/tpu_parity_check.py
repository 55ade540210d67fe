#!/usr/bin/env python
"""On-device parity check: Pallas paths vs the dense XLA reference paths.

The interpret-mode tests (tests/test_fused_*.py) verify kernel math on CPU;
this script verifies the COMPILED kernels on the real TPU agree with the
dense flax paths (same params, deterministic forward) within bf16 tolerance,
for the flagship model and each kernel switch combination.

  python tools/tpu_parity_check.py
"""

from __future__ import annotations

import dataclasses
import sys


def main():
    from hypernerf_tpu.utils.platform import apply_platform_overrides
    apply_platform_overrides()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hypernerf_tpu.configs import NerfConfig
    from hypernerf_tpu.models.nerf import NerfModel
    from hypernerf_tpu.ops.ray_dict import prepare_ray_dict

    assert jax.default_backend() == 'tpu', 'run on the TPU'

    base = NerfConfig(num_embeddings=16, num_coarse_samples=16,
                      num_fine_samples=16, noise_std=None,
                      use_warp=True, hyper_slice_method='bendy_sheet',
                      compute_dtype='bfloat16',
                      use_pallas=False, use_pallas_fields=False,
                      use_pallas_level=False, pallas_tile=256,
                      pallas_bwd_tile=256)

    rs = np.random.RandomState(0)
    n = 512
    o = rs.randn(n, 3).astype(np.float32) * 0.1
    d = rs.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate([
        o, d, np.zeros((n, 1), np.float32), np.ones((n, 1), np.float32),
        rs.randint(0, 16, (n, 1)).astype(np.float32)], 1)
    rd = prepare_ray_dict(jnp.asarray(rays))
    key = jax.random.PRNGKey(0)

    model = NerfModel(base)
    variables = model.init({'params': key, 'sampling': key}, rd)

    def render(cfg):
        m = NerfModel(cfg)
        fn = jax.jit(lambda v, r: m.apply(v, r, deterministic=True)
                     ['fine']['rgb'])
        return np.asarray(jax.device_get(fn(variables, rd)))

    ref = render(base)
    failures = 0
    for name, overrides in [
            ('template kernel', dict(use_pallas=True)),
            ('template + field kernels', dict(use_pallas=True,
                                              use_pallas_fields=True)),
            ('fused level kernel', dict(use_pallas=True,
                                        use_pallas_fields=True,
                                        use_pallas_level=True))]:
        got = render(dataclasses.replace(base, **overrides))
        err = np.abs(got - ref).max()
        ok = err < 0.02  # bf16 path-order differences
        print(f'{name}: max |drgb| = {err:.5f} {"OK" if ok else "FAIL"}',
              flush=True)
        failures += 0 if ok else 1
    sys.exit(1 if failures else 0)


if __name__ == '__main__':
    main()
