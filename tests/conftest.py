"""Test configuration: CPU backend with 8 virtual devices.

Tests run on the host CPU platform with a virtual 8-device topology so
that mesh/sharding tests exercise real multi-device lowering without TPU
hardware (the driver separately dry-runs the multi-chip path).  float64 is
enabled because the numerical gradient checks use the reference's
delta=1e-5, below float32 resolution.

Note: this environment force-registers a remote TPU PJRT plugin and sets
JAX_PLATFORMS=axon at interpreter startup; `jax.config.update` (which takes
precedence over the env var) is the reliable way to pin tests to CPU.
"""

import os

_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()

import pathlib  # noqa: E402

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

# Session-persistent compilation cache: the pipeline/cascade equality
# tests compile multi-second XLA programs that are identical between CI
# runs; caching them cuts the full-suite wall time several-fold.  A
# separate directory from the committed TPU cache (.jax_cache) so CPU
# test programs never bloat the repo.
jax.config.update('jax_compilation_cache_dir',
                  str(pathlib.Path(__file__).resolve().parents[1]
                      / '.jax_cache_cpu'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
