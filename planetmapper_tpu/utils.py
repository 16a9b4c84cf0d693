"""
General helper utilities (parity with planetmapper/utils.py): RA/Dec axis
formatting with degree-minute-second ticks, DMS conversions, warning-filter
context managers, normalisation, path creation, and wavelength-array
generation from FITS headers.
"""

from __future__ import annotations

import os
import pathlib
import warnings
from typing import Literal, Sequence

import matplotlib.ticker
import numpy as np
from matplotlib.axes import Axes


def format_radec_axes(
    ax: Axes,
    dec: float,
    dms_ticks: bool = True,
    add_axis_labels: bool = True,
    aspect_adjustable: Literal['box', 'datalim'] | None = 'datalim',
) -> None:
    """
    Format an axis for RA/Dec display: labels, aspect ratio corrected by
    cos(dec), inverted RA axis, and optional DMS tick formatting.
    """
    if add_axis_labels:
        ax.set_xlabel('Right Ascension')
        ax.set_ylabel('Declination')
    if aspect_adjustable is not None:
        ax.set_aspect(1 / np.cos(np.deg2rad(dec)), adjustable=aspect_adjustable)
    if not ax.xaxis_inverted():
        ax.invert_xaxis()
    if dms_ticks:
        ax.yaxis.set_major_locator(DMSLocator())
        ax.yaxis.set_major_formatter(DMSFormatter())
        ax.xaxis.set_major_locator(DMSLocator())
        ax.xaxis.set_major_formatter(DMSFormatter())


class DMSFormatter(matplotlib.ticker.FuncFormatter):
    """
    Tick formatter displaying angles as degrees/minutes/seconds
    (e.g. 12°34′56″); pairs with :class:`DMSLocator`. Parts of the format
    that are constant across the current view are moved into the axis
    offset string.
    """

    def __init__(self) -> None:
        super().__init__(self._format)
        self.skip_parts: set[str] = set()
        self.fmt_s = '02.0f'

    def _format(self, dd, pos):
        d, m, s = decimal_degrees_to_dms(dd)
        out = []
        if 'd' not in self.skip_parts or (m == 0 and s == 0):
            out.append(f'{d}°')
        if 'm' not in self.skip_parts or ('d' in self.skip_parts and s == 0):
            out.append(f'{m:02.0f}′')
        if 's' not in self.skip_parts:
            out.append(f'{s:{self.fmt_s}}″')
        return ''.join(out)

    def set_locs(self, locs) -> None:
        """:meta private:"""
        vmin, vmax = sorted(self.axis.get_view_interval())
        dms_min = decimal_degrees_to_dms(vmin)
        dms_max = decimal_degrees_to_dms(vmax)
        vrange = abs(vmax - vmin)

        self.skip_parts.clear()
        ofs = ''
        if dms_min[:2] == dms_max[:2]:
            d, m, s = dms_min
            self.skip_parts.add('d')
            self.skip_parts.add('m')
            if d != 0 or m != 0:
                ofs = f'{d:+.0f}°{m:02.0f}′'
        elif dms_min[0] == dms_max[0]:
            d, m, s = dms_min
            self.skip_parts.add('d')
            if d != 0:
                ofs = f'{d:+.0f}°'

        if vrange > 10 / 60:
            self.skip_parts.add('s')
        if vrange > 10:
            self.skip_parts.add('m')
        if vrange < 10 / 3600:
            self.skip_parts.add('m')
        if vrange < 10 / 60:
            self.skip_parts.add('d')

        if vrange < 0.01 / 3600:
            self.fmt_s = '.3g'
        elif vrange < 0.1 / 3600:
            self.fmt_s = '.3f'
        elif vrange < 1 / 3600:
            self.fmt_s = '.2f'
        elif vrange < 10 / 3600:
            self.fmt_s = '.1f'
        else:
            self.fmt_s = '02.0f'

        if self.skip_parts == {'d', 'm', 's'}:
            self.skip_parts = set()
        self.set_offset_string(ofs)
        return super().set_locs(locs)


class DMSLocator(matplotlib.ticker.Locator):
    """
    Tick locator choosing sensible degree/minute/second intervals; pairs
    with :class:`DMSFormatter`.
    """

    def __init__(self) -> None:
        super().__init__()
        self.locator = matplotlib.ticker.MaxNLocator(steps=[1, 2, 5, 10], nbins=8)

    def __call__(self):
        vmin, vmax = self.axis.get_view_interval()
        return self.tick_values(vmin, vmax)

    def tick_values(self, vmin: float, vmax: float) -> np.ndarray:
        """:meta private:"""
        vrange = abs(vmax - vmin)
        if vrange < 1 / 60:
            multiplier = 3600
        elif vrange < 1:
            multiplier = 60
        else:
            multiplier = 1
        ticks = self.locator.tick_values(vmin * multiplier, vmax * multiplier)
        return ticks / multiplier


def decimal_degrees_to_dms(decimal_degrees: float) -> tuple[int, int, float]:
    """
    Convert decimal degrees to a (degrees, minutes, seconds) tuple, with the
    sign carried on the most significant nonzero part.
    """
    dd = abs(decimal_degrees)
    minutes, seconds = divmod(dd * 3600, 60)
    degrees, minutes = divmod(minutes, 60)
    if decimal_degrees < 0:
        if degrees:
            degrees = -degrees
        elif minutes:
            minutes = -minutes
        else:
            seconds = -seconds
    return int(degrees), int(minutes), seconds


def decimal_degrees_to_dms_str(
    decimal_degrees: float, seconds_fmt: str = 'g'
) -> str:
    """Formatted DMS string, e.g. ``'12°34′56″'``."""
    d, m, s = decimal_degrees_to_dms(decimal_degrees)
    s_str = f'{s:{seconds_fmt}}'
    if len(s_str.split('.')[0]) < 2:
        s_str = '0' + s_str
    return f'{d}°{m:02d}′{s_str}″'


class ignore_warnings(warnings.catch_warnings):
    """Context manager to ignore warnings matching the given messages."""

    def __init__(self, *warning_strings: str, **kwargs):
        super().__init__(**kwargs)
        self.warning_strings = warning_strings

    def __enter__(self):
        out = super().__enter__()
        for ws in self.warning_strings:
            warnings.filterwarnings('ignore', ws)
        return out


class filter_fits_comment_warning(warnings.catch_warnings):
    """Hide FITS 'comment will be truncated' warnings while saving."""

    def __enter__(self):
        out = super().__enter__()
        warnings.filterwarnings(
            'ignore', message='Card is too long, comment will be truncated.'
        )
        return out


def normalise(
    values: np.ndarray | Sequence[float],
    top: float = 1.0,
    bottom: float = 0.0,
    single_value: float | None = None,
) -> np.ndarray:
    """Normalise values into the range [bottom, top]."""
    assert top > bottom
    values = np.array(values)
    if single_value is not None and len(set(values)) == 1:
        return np.full(values.shape, single_value)
    vmin = np.nanmin(values)
    vmax = np.nanmax(values)
    if vmax != vmin:
        values = (values - vmin) / (vmax - vmin)
    else:
        values = values - vmin
    return values * (top - bottom) + bottom


def check_path(path: str) -> None:
    """Create the directory tree of a file/directory path if needed."""
    path = os.path.expandvars(os.path.expanduser(path))
    if os.path.isdir(path):
        return
    if '.' in os.path.split(path)[1]:
        path = os.path.split(path)[0]
        if os.path.isdir(path):
            return
    if path == '':
        return
    print('Creating directory path "{}"'.format(path))
    pathlib.Path(path).mkdir(parents=True, exist_ok=True)


class GetWavelengthsError(ValueError):
    """Raised when wavelengths cannot be derived from a FITS header."""


def generate_wavelengths_from_header(
    header, *, check_ctype: bool = True, axis: int = 3
) -> np.ndarray:
    """
    Wavelength array from NAXISn/CRVALn/CDELTn (or CDn_n)/CRPIXn header
    keywords (e.g. for JWST IFU cubes).
    """
    try:
        if check_ctype and header[f'CTYPE{axis}'] != 'WAVE':
            raise GetWavelengthsError(
                f'Header item CTYPE{axis} = '
                f'{header[f"CTYPE{axis}"]!r} (not \'WAVE\')'
            )
        naxis3 = int(header[f'NAXIS{axis}'])
        crval3 = float(header[f'CRVAL{axis}'])
        try:
            cdelt3 = float(header[f'CDELT{axis}'])
        except KeyError:
            cdelt3 = float(header[f'CD{axis}_{axis}'])
        try:
            crpix3 = float(header.get(f'CRPIX{axis}', 1))
        except AttributeError:
            crpix3 = 1.0
    except (KeyError, ValueError, TypeError) as e:
        raise GetWavelengthsError(
            'Could not generate wavelength array from FITS Header'
        ) from e
    return (np.arange(naxis3) + crpix3 - 1) * cdelt3 + crval3
