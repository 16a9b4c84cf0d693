"""
planetmapper_tpu: a TPU-native planetary-geometry framework.

A from-scratch rebuild of the capabilities of PlanetMapper
(github.com/ortk95/planetmapper) designed for JAX/XLA on TPU: the per-pixel
scalar SPICE loops of the reference become one vmapped, jitted device
pipeline fed by an on-device ephemeris/frame engine compiled from SPICE
kernels at scene-construction time.

Double precision is enabled globally on import: planetary geometry needs
km-scale precision at ~1e9 km distances, far beyond float32.
"""

from __future__ import annotations

import os as _os

import jax

jax.config.update('jax_enable_x64', True)

# Persistent compilation cache: geometry pipelines are compiled once per
# (machine, backend, shape) and reused across processes. XLA compile times
# dominate cold-start otherwise.
_cache_dir = _os.environ.get(
    'PLANETMAPPER_TPU_COMPILATION_CACHE',
    _os.path.expanduser('~/.cache/planetmapper_tpu/jax'),
)
if _cache_dir and _cache_dir.lower() != 'off':
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', _cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

from .common import __author__, __description__, __url__, __version__, CITATION_STRING  # noqa: E402
from .kernels.pool import (  # noqa: E402
    clear_kernels,
    get_kernel_path,
    load_kernels,
    prevent_kernel_loading,
    set_kernel_path,
    sort_kernel_paths,
)

__all__ = [
    '__version__',
    'set_kernel_path',
    'get_kernel_path',
    'load_kernels',
    'clear_kernels',
    'prevent_kernel_loading',
    'sort_kernel_paths',
]


def __getattr__(name: str):
    # Lazy imports of the heavier API layers keep `import planetmapper_tpu`
    # fast and avoid import cycles during incremental builds.
    if name in ('SpiceBase', 'BodyBase'):
        from . import base

        return getattr(base, name)
    if name == 'Body':
        from .body import Body

        return Body
    if name == 'BasicBody':
        from .basic_body import BasicBody

        return BasicBody
    if name in ('BodyXY', 'Backplane', 'BackplaneNotFoundError', 'MapKwargs'):
        from . import body_xy

        return getattr(body_xy, name)
    if name == 'Observation':
        from .observation import Observation

        return Observation
    if name == 'AngularCoordinateKwargs':
        from .body import AngularCoordinateKwargs

        return AngularCoordinateKwargs
    if name == 'WireframeKwargs':
        from .body import WireframeKwargs

        return WireframeKwargs
    if name in ('base', 'body', 'basic_body', 'body_xy', 'observation',
                'progress', 'utils', 'data_loader', 'kernel_downloader',
                'gui', 'cli', 'common'):
        import importlib

        return importlib.import_module(f'.{name}', __name__)
    if name == 'run_gui':
        from .gui import run_gui

        return run_gui
    raise AttributeError(f'module {__name__!r} has no attribute {name!r}')
