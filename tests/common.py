"""Shared test fixtures and helpers."""

import os

import numpy as np

# Hermetic real SPICE kernels: the reference repo's committed test kernels
# (small real SPK/PCK/LSK excerpts) are mounted read-only; we read them in
# place rather than duplicating the binaries.
KERNEL_PATH = os.environ.get(
    'PLANETMAPPER_TPU_TEST_KERNELS',
    '/root/reference/tests/data/kernels',
)
REFERENCE_DATA_PATH = '/root/reference/tests/data'


def setup_kernels():
    import planetmapper_tpu

    planetmapper_tpu.set_kernel_path(KERNEL_PATH)


def assert_arrays_close(a, b, *, rtol=1e-5, atol=1e-8, equal_nan=False):
    a = np.asarray(a)
    b = np.asarray(b)
    if not np.allclose(a, b, rtol=rtol, atol=atol, equal_nan=equal_nan):
        diff = np.abs(a - b)
        aerr = np.nan if np.all(np.isnan(diff)) else np.nanmax(diff)
        raise AssertionError(f'Arrays not close (max abs err {aerr!r}):\n{a!r}\n{b!r}')
