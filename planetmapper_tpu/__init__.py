"""
planetmapper_tpu: a TPU-native planetary-geometry framework.

A from-scratch rebuild of the capabilities of PlanetMapper
(github.com/ortk95/planetmapper) designed for JAX/XLA on TPU: the per-pixel
scalar SPICE loops of the reference become one vmapped, jitted device
pipeline fed by an on-device ephemeris/frame engine compiled from SPICE
kernels at scene-construction time.

Coordinate systems
------------------
Every public transform converts between these systems (each is an adapter
to/from the internal observer-frame rectangular vector, mirroring the
reference's architecture, body.py:876-887):

- ``xy``: image pixel coordinates of an observation. ``(0, 0)`` is the
  centre of the bottom-left pixel; x increases rightwards and y upwards.
  Set by the disc parameters ``(x0, y0, r0, rotation)``.
- ``radec``: J2000 right ascension / declination in degrees, as seen by
  the observer (the sky position).
- ``lonlat``: planetographic longitude / latitude on the target body in
  degrees (positive-west or positive-east following the body's IAU
  convention; ``planetocentric=True`` selects planetocentric instead).
- ``km``: distance in km from the centre of the target in the target
  plane, with the north pole of the body pointing up.
- ``angular``: relative angular coordinates in arcseconds, by default
  centred on the target with celestial north up (customisable origin and
  rotation via ``origin_ra``/``origin_dec``/``coordinate_rotation``).

Internally ``targvec`` (body-fixed rectangular), ``obsvec`` (observer
J2000 rectangular), ``obsvec_norm`` (normalised obsvec) and ``rayvec``
(observer->point ray) appear in private APIs.

Units are degrees, km, seconds and km/s throughout unless a name says
otherwise (``angular`` coordinates and plate scales use arcseconds).

Double precision is enabled globally on import: planetary geometry needs
km-scale precision at ~1e9 km distances, far beyond float32. (On TPU the
fused pipeline then re-introduces float32 deliberately where an error
analysis allows it - see :mod:`planetmapper_tpu.pipeline`.)
"""

from __future__ import annotations

import os as _os

import jax

jax.config.update('jax_enable_x64', True)

# In remote-TPU sessions the only XLA:CPU programs are tiny scalar helpers
# (ctor-time ephemeris, host trig), so cap the CPU ISA below AVX512. This
# is not about speed: XLA:CPU on AVX512 hosts embeds virtual tuning
# features (+prefer-no-scatter/+prefer-no-gather) in AOT executables, and
# its persistent-cache loader then logs a spurious machine-mismatch error
# on EVERY cached reload (the host-feature probe never reports virtual
# features, jaxlib 0.9 cpu_aot_loader.cc:210). Capping to AVX2 keeps those
# flags out of the executables so warm starts are clean. XLA_FLAGS is
# parsed at first backend init/compile - after this import in any normal
# flow, but a no-op if the process already compiled something before
# importing this package (harmless: the warnings return, nothing breaks).
# Any user-provided xla_cpu_max_isa value is respected.
def _axon_session() -> bool:
    # The axon plugin registers itself via a .pth hook regardless of
    # JAX_PLATFORMS, so presence of the package IS the signal; the env
    # var check alone missed every default-environment session and the
    # spurious loader errors returned.
    if 'axon' in _os.environ.get('JAX_PLATFORMS', ''):
        return True
    try:
        import importlib.util

        return importlib.util.find_spec('axon') is not None
    except (ImportError, ValueError):  # pragma: no cover
        return False


if _axon_session():
    _flags = _os.environ.get('XLA_FLAGS', '')
    if 'xla_cpu_max_isa' not in _flags:
        _os.environ['XLA_FLAGS'] = (
            f'{_flags} --xla_cpu_max_isa=AVX2'.strip()
        )

# Persistent compilation cache: geometry pipelines are compiled once per
# (machine, backend, shape) and reused across processes. XLA compile times
# dominate cold-start otherwise.


def _default_cache_dir() -> str:
    # Isolate the cache per (jax version, host, CPU microarch): XLA:CPU AOT
    # entries embed machine features, and reusing a cache written on a
    # different microarchitecture triggers SIGILL-risk warnings at load.
    import hashlib
    import platform

    # The platform set matters too: sessions using a remote compile
    # service (e.g. the axon TPU plugin) store CPU AOT entries compiled
    # on the REMOTE machine's microarchitecture - those must not be
    # shared with locally-compiling CPU sessions on the same host.
    # No hostname in the key: the microarchitecture (cpuinfo flags,
    # below) is what decides AOT-entry compatibility, and containers on
    # the same machine should share a cache (cold compiles cost tens of
    # seconds through a remote-compile TPU transport).
    key = (
        f'{jax.__version__}-{platform.machine()}'
        f"-{_os.environ.get('JAX_PLATFORMS', '')}"
        f"-{_os.environ.get('PALLAS_AXON_REMOTE_COMPILE', '')}"
        # the ISA cap changes the machine features embedded in XLA:CPU
        # AOT entries - capped and uncapped entries must not mix, or the
        # loader logs machine-mismatch errors on every reload
        f"-{_os.environ.get('XLA_FLAGS', '')}"
    )
    try:
        with open('/proc/cpuinfo') as f:
            for line in f:
                if line.startswith(('model name', 'flags')):
                    key += line
                    if line.startswith('flags'):
                        break
    except OSError:
        key += platform.processor()
    digest = hashlib.sha1(key.encode()).hexdigest()[:12]
    return _os.path.expanduser(f'~/.cache/planetmapper_tpu/jax-{digest}')


_cache_dir = _os.environ.get(
    'PLANETMAPPER_TPU_COMPILATION_CACHE', _default_cache_dir()
)
if _cache_dir and _cache_dir.lower() != 'off':
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', _cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

from .common import (  # noqa: E402
    CITATION_BIBTEX,
    CITATION_DOI,
    CITATION_STRING,
    __author__,
    __description__,
    __license__,
    __url__,
    __version__,
)
from .kernels.pool import (  # noqa: E402
    clear_kernels,
    get_kernel_path,
    load_kernels,
    prevent_kernel_loading,
    set_kernel_path,
    sort_kernel_paths,
)

__all__ = [
    'run_gui',
    'set_kernel_path',
    'get_kernel_path',
    'load_kernels',
    'clear_kernels',
    'prevent_kernel_loading',
    'sort_kernel_paths',
    'SpiceBase',
    'Body',
    'Backplane',
    'BodyXY',
    'Observation',
    'BasicBody',
    'AngularCoordinateKwargs',
    'WireframeKwargs',
    'WireframeComponent',
    'DEFAULT_WIREFRAME_FORMATTING',
    'MapKwargs',
    'base',
    'gui',
    'utils',
    'kernel_downloader',
    'data_loader',
    'CITATION_STRING',
    'CITATION_DOI',
    'CITATION_BIBTEX',
]

_BODY_ATTRS = {
    'Body', 'AngularCoordinateKwargs', 'WireframeKwargs',
    'WireframeComponent', 'DEFAULT_WIREFRAME_FORMATTING', 'LonLatGridKwargs',
}
_BODY_XY_ATTRS = {'BodyXY', 'Backplane', 'BackplaneNotFoundError', 'MapKwargs'}
_SUBMODULES = {
    'base', 'body', 'basic_body', 'body_xy', 'observation', 'progress',
    'utils', 'data_loader', 'kernel_downloader', 'cli', 'common',
    'exceptions', 'pipeline', 'parallel', 'io', 'core', 'kernels', 'ops',
}


def __getattr__(name: str):
    # Lazy imports of the heavier API layers keep `import planetmapper_tpu`
    # fast and avoid import cycles. GUI access degrades gracefully when
    # tkinter is unavailable (informative error at use time, like the
    # reference's mock-module pattern).
    if name in ('SpiceBase', 'BodyBase'):
        from . import base

        return getattr(base, name)
    if name in _BODY_ATTRS:
        from . import body

        return getattr(body, name)
    if name == 'BasicBody':
        from .basic_body import BasicBody

        return BasicBody
    if name in _BODY_XY_ATTRS:
        from . import body_xy

        return getattr(body_xy, name)
    if name == 'Observation':
        from .observation import Observation

        return Observation
    if name in ('gui', 'run_gui'):
        import importlib

        try:
            gui = importlib.import_module('.gui', __name__)
        except ImportError as e:
            from ._mock_gui_no_tk import get_mocks as _get_mocks

            gui_mock, run_gui_mock = _get_mocks(e)
            return gui_mock if name == 'gui' else run_gui_mock
        return gui if name == 'gui' else gui.run_gui
    if name in _SUBMODULES:
        import importlib

        return importlib.import_module(f'.{name}', __name__)
    raise AttributeError(f'module {__name__!r} has no attribute {name!r}')
