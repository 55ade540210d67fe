"""Backend selection helpers.

The TPU plugin in this environment pins ``jax_platforms`` via ``jax.config``
(overriding the JAX_PLATFORMS env var), so headless tests/CI that want the
CPU backend need an in-process override before any backend initializes.
Set ``HYPERNERF_PLATFORM=cpu`` (optionally with
``HYPERNERF_HOST_DEVICES=8``) and call :func:`apply_platform_overrides`
first thing in a CLI entry point.

Also enables JAX's persistent compilation cache (compiles through the
remote-compile tunnel take minutes; the cache makes reruns instant).
"""

from __future__ import annotations

import os


def apply_platform_overrides(cache_dir: str = '~/.cache/jax_comp'):
    platform = os.environ.get('HYPERNERF_PLATFORM')
    n_dev = os.environ.get('HYPERNERF_HOST_DEVICES')
    if n_dev:
        os.environ['XLA_FLAGS'] = (
            f'--xla_force_host_platform_device_count={n_dev} '
            + os.environ.get('XLA_FLAGS', ''))
    import jax
    if platform:
        jax.config.update('jax_platforms', platform)
    if cache_dir:
        jax.config.update('jax_compilation_cache_dir',
                          os.path.expanduser(cache_dir))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
