"""Test harness: force an 8-device virtual CPU mesh so multi-chip sharding
paths compile and run without TPU hardware."""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

# the axon sitecustomize re-exports JAX_PLATFORMS at interpreter start, so
# the env var alone is not enough — force the platform through jax.config
# (effective until the first backend initialization)
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
