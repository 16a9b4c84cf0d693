"""
ctypes bindings for the native C++ DAF reader (native/daf_reader.cpp).

The shared library is built on demand with the system compiler and cached
next to the source; if no compiler is available (or
``PLANETMAPPER_TPU_NATIVE=0``), the pure-Python parser in :mod:`daf` is used
instead. Parity between the two parsers is enforced by the test suite.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_LIB_FAILED = False

_SOURCE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    'native',
    'daf_reader.cpp',
)
_LIB_PATH = os.path.join(os.path.dirname(_SOURCE), 'libdafreader.so')


def native_enabled() -> bool:
    return os.environ.get('PLANETMAPPER_TPU_NATIVE', '1') != '0'


def _build_library() -> str | None:
    if not os.path.exists(_SOURCE):
        return None
    if os.path.exists(_LIB_PATH) and (
        os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SOURCE)
    ):
        return _LIB_PATH
    for compiler in ('g++', 'clang++', 'c++'):
        try:
            subprocess.run(
                [
                    compiler, '-O2', '-shared', '-fPIC', '-std=c++17',
                    '-o', _LIB_PATH, _SOURCE,
                ],
                check=True,
                capture_output=True,
                timeout=120,
            )
            return _LIB_PATH
        except (OSError, subprocess.SubprocessError):
            continue
    return None


def _get_lib() -> ctypes.CDLL | None:
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        if not native_enabled():
            _LIB_FAILED = True
            return None
        path = _build_library()
        if path is None:
            _LIB_FAILED = True
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            _LIB_FAILED = True
            return None
        lib.daf_open.restype = ctypes.c_void_p
        lib.daf_open.argtypes = [ctypes.c_char_p]
        lib.daf_nd.argtypes = [ctypes.c_void_p]
        lib.daf_ni.argtypes = [ctypes.c_void_p]
        lib.daf_num_segments.argtypes = [ctypes.c_void_p]
        lib.daf_num_words.restype = ctypes.c_long
        lib.daf_num_words.argtypes = [ctypes.c_void_p]
        lib.daf_segment.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int),
        ]
        lib.daf_read_words.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.daf_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return _LIB


def read_daf_native(path: str):
    """
    Parse a DAF file with the native reader. Returns a
    :class:`planetmapper_tpu.kernels.daf.DAFFile` or None if the native
    library is unavailable or parsing fails.
    """
    from .daf import DAFFile, DAFSummary

    lib = _get_lib()
    if lib is None:
        return None
    handle = lib.daf_open(os.fsencode(path))
    if not handle:
        return None
    try:
        nd = lib.daf_nd(handle)
        ni = lib.daf_ni(handle)
        n_seg = lib.daf_num_segments(handle)
        n_words = lib.daf_num_words(handle)

        summaries = []
        dbl_buf = (ctypes.c_double * nd)()
        int_buf = (ctypes.c_int * ni)()
        for i in range(n_seg):
            if lib.daf_segment(handle, i, dbl_buf, int_buf) != 0:
                return None
            summaries.append(
                DAFSummary(tuple(dbl_buf), tuple(int_buf))
            )

        data = np.empty(n_words, dtype=np.float64)
        if lib.daf_read_words(
            handle, 1, n_words,
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ) != 0:
            return None
        with open(path, 'rb') as f:
            idword = f.read(8).decode('ascii', errors='replace')
        return DAFFile(
            path=path, idword=idword, nd=nd, ni=ni,
            summaries=summaries, _data=data,
        )
    finally:
        lib.daf_close(handle)
