import os

# Deterministic CPU test environment with a virtual 8-device mesh so the
# multi-chip sharding paths are exercised without TPU hardware.
#
# NOTE: in this environment the 'axon' TPU plugin ignores the JAX_PLATFORMS
# environment variable, so the platform must be forced via jax.config before
# any computation happens.
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8'
    ).strip()

import jax  # noqa: E402

# PLANETMAPPER_TPU_TEST_BACKEND=tpu keeps the real accelerator visible
# (used to run the hardware-only tests, e.g. the Pallas Mosaic suite:
# ``PLANETMAPPER_TPU_TEST_BACKEND=tpu pytest tests/test_pallas_core.py``).
if os.environ.get('PLANETMAPPER_TPU_TEST_BACKEND', 'cpu') == 'cpu':
    jax.config.update('jax_platforms', 'cpu')

import planetmapper_tpu  # noqa: E402  (configures the compile cache)

# The package keyed its persistent cache dir off the JAX_PLATFORMS env
# var; this process FORCES cpu after import, so give it a cpu-specific
# dir - entries AOT-compiled by a remote compile service for another
# microarchitecture must never be loaded into locally-executing CPU
# programs (SIGILL risk).
_dir = jax.config.jax_compilation_cache_dir
if _dir:
    os.makedirs(_dir + '-cpuforce', exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', _dir + '-cpuforce')

import pytest  # noqa: E402


@pytest.fixture(scope='module', autouse=True)
def _clear_jax_caches_between_modules():
    # A single process accumulating hundreds of distinct compiled XLA
    # programs has crashed XLA:CPU near the end of full-suite runs;
    # dropping the jit caches between modules keeps the live-executable
    # count bounded. (See also tests/run_tests.sh for the sharded runner.)
    yield
    jax.clear_caches()
