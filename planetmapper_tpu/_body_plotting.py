"""
Wireframe plotting methods for :class:`Body` (parity with the plotting
section of the reference's body.py:3036-3833).

All geometry used by the plots (gridlines, limb, terminator, rings) comes
from the batched device pipelines, so generating a wireframe costs a few
device calls rather than thousands of scalar SPICE calls. Matplotlib stays a
thin CPU shell over the computed curves.
"""

from __future__ import annotations

import functools
from collections import defaultdict
from typing import Any, Callable, Iterable, Literal

import numpy as np

from .body import (
    DEFAULT_WIREFRAME_FORMATTING,
    Body,
    WireframeComponent,
    _AdjustedSurfaceAltitude,
)


def get_poles_to_plot(self) -> list[tuple[float, float, str]]:
    """
    Poles to label when plotting: visible poles labelled 'N'/'S', or both
    poles in brackets when neither is visible.
    """
    poles: list[tuple[float, float, str]] = []
    pole_options = ((0, 90, 'N'), (0, -90, 'S'))
    for lon, lat, s in pole_options:
        if self.test_if_lonlat_visible(lon, lat):
            poles.append((lon, lat, s))
    if len(poles) == 0:
        for lon, lat, s in pole_options:
            poles.append((lon, lat, f'({s})'))
    return poles


@staticmethod
def _get_local_affine_transform_matrix(
    coordinate_func: Callable[[float, float], tuple[float, float]],
    location: tuple[float, float],
) -> np.ndarray:
    """Local affine approximation of a coordinate transform at a location."""
    x0, y0 = location
    eq1, eq2 = coordinate_func(x0, y0)
    eq3, eq4 = coordinate_func(x0 + 1.0, y0)
    eq5, eq6 = coordinate_func(x0, y0 + 1.0)
    a = eq3 - eq1
    b = eq5 - eq1
    c = eq1 - a * x0 - b * y0
    d = eq4 - eq2
    e = eq6 - eq2
    f = eq2 - d * x0 - e * y0
    return np.array([[a, b, c], [d, e, f], [0.0, 0.0, 1.0]])


def _get_matplotlib_transform(self, coordinate_func, location, ax):
    import matplotlib.transforms

    transform = matplotlib.transforms.Affine2D(
        self._get_local_affine_transform_matrix(coordinate_func, location)
    )
    if ax:
        transform = transform + ax.transData
    return transform


def matplotlib_radec2km_transform(self, ax=None):
    """Affine matplotlib transform from radec to km coordinates."""
    return self._get_matplotlib_transform(
        self.radec2km, (self.target_ra, self.target_dec), ax
    )


def matplotlib_km2radec_transform(self, ax=None):
    return self._get_matplotlib_transform(self.km2radec, (0.0, 0.0), ax)


def matplotlib_radec2angular_transform(self, ax=None, **angular_kwargs):
    return self._get_matplotlib_transform(
        functools.partial(self.radec2angular, **angular_kwargs),
        (self.target_ra, self.target_dec),
        ax,
    )


def matplotlib_angular2radec_transform(self, ax=None, **angular_kwargs):
    return self._get_matplotlib_transform(
        functools.partial(self.angular2radec, **angular_kwargs), (0.0, 0.0), ax
    )


@staticmethod
def _get_wireframe_kw(
    *,
    base_formatting: dict[str, Any] | None = None,
    common_formatting: dict[str, Any] | None = None,
    formatting: dict[WireframeComponent, dict[str, Any]] | None = None,
) -> dict[WireframeComponent, dict[str, Any]]:
    formatting = formatting or {}
    base_formatting = base_formatting or {}
    common_formatting = dict(common_formatting or {})
    for k in ('show', 'dms_ticks'):
        common_formatting.pop(k, None)

    kwargs: dict[WireframeComponent, dict[str, Any]] = defaultdict(dict)
    for k in set(DEFAULT_WIREFRAME_FORMATTING.keys()) | set(formatting.keys()):
        kwargs[k] = (
            base_formatting
            | DEFAULT_WIREFRAME_FORMATTING.get('all', {})
            | DEFAULT_WIREFRAME_FORMATTING.get(k, {})
            | common_formatting
            | formatting.get('all', {})
            | formatting.get(k, {})
        )
    return kwargs


def _plot_wireframe(
    self,
    *,
    coordinate_func: Callable[[float, float], tuple[float, float]],
    scale_factor: float | None,
    transform,
    aspect_adjustable: Literal['box', 'datalim'] | None,
    additional_array_func=None,
    ax=None,
    label_poles: bool = True,
    add_title: bool = True,
    grid_interval: float = 30,
    grid_lat_limit: float = 90,
    planetocentric_grid: bool = False,
    indicate_equator: bool = False,
    indicate_prime_meridian: bool = False,
    formatting: dict[WireframeComponent, dict[str, Any]] | None = None,
    alt: float = 0.0,
    **common_formatting,
):
    """Generic wireframe renderer shared by all coordinate-system variants."""
    import matplotlib.pyplot as plt
    import matplotlib.transforms

    if ax is None:
        ax = plt.gca()

    if transform is None:
        transform = matplotlib.transforms.IdentityTransform()
    if scale_factor is not None:
        transform += matplotlib.transforms.Affine2D().scale(scale_factor)
    transform += ax.transData

    with _AdjustedSurfaceAltitude(self, alt):

        def array_func(ras, decs):
            ras = np.asarray(ras, dtype=float)
            decs = np.asarray(decs, dtype=float)
            try:
                xs, ys = coordinate_func(ras, decs)
                xs = np.asarray(xs, dtype=float)
                ys = np.asarray(ys, dtype=float)
                if xs.shape != ras.shape:
                    raise TypeError
            except Exception:
                xs, ys = zip(
                    *(coordinate_func(ra, dec) for ra, dec in zip(ras, decs))
                )
                xs = np.asarray(xs, dtype=float)
                ys = np.asarray(ys, dtype=float)
            if additional_array_func is not None:
                xs, ys = additional_array_func(xs, ys)
            return np.asarray(xs), np.asarray(ys)

        kwargs = self._get_wireframe_kw(
            base_formatting=dict(transform=transform),
            common_formatting=common_formatting,
            formatting=formatting,
        )

        lons = np.arange(0, 360, grid_interval)
        for lon, (ra, dec) in zip(
            lons,
            self.visible_lon_grid_radec(
                lons, lat_limit=grid_lat_limit,
                planetocentric=planetocentric_grid,
            ),
        ):
            ax.plot(
                *array_func(ra, dec),
                **kwargs['grid']
                | (
                    kwargs['prime_meridian']
                    if lon == 0 and indicate_prime_meridian
                    else {}
                ),
            )
        lats = [
            float(lat)
            for lat in np.arange(-90, 90, grid_interval)
            if abs(lat) <= grid_lat_limit
        ]
        for lat, (ra, dec) in zip(
            lats,
            self.visible_lat_grid_radec(
                lats, lat_limit=grid_lat_limit,
                planetocentric=planetocentric_grid,
            ),
        ):
            ax.plot(
                *array_func(ra, dec),
                **kwargs['grid']
                | (kwargs['equator'] if lat == 0 and indicate_equator else {}),
            )

        ax.plot(*array_func(*self.limb_radec()), **kwargs['limb'])
        ax.plot(*array_func(*self.terminator_radec()), **kwargs['terminator'])

        ra_day, dec_day, ra_night, dec_night = self.limb_radec_by_illumination()
        ax.plot(*array_func(ra_day, dec_day), **kwargs['limb_illuminated'])

        if label_poles:
            for lon, lat, s in self.get_poles_to_plot():
                x, y = coordinate_func(
                    *self.lonlat2radec(lon, lat, not_visible_nan=False)
                )
                ax.text(x, y, s, **kwargs['pole'])

        for lon, lat in self.coordinates_of_interest_lonlat:
            if self.test_if_lonlat_visible(lon, lat):
                x, y = coordinate_func(
                    *self.lonlat2radec(lon, lat, not_visible_nan=False)
                )
                ax.scatter(x, y, **kwargs['coordinate_of_interest_lonlat'])
        for ra, dec in self.coordinates_of_interest_radec:
            ax.scatter(
                *coordinate_func(ra, dec),
                **kwargs['coordinate_of_interest_radec'],
            )

        for radius in self.ring_radii:
            x, y = array_func(*self.ring_radec(radius))
            ax.plot(x, y, **kwargs['ring'])

        for body in self.other_bodies_of_interest:
            x, y = coordinate_func(body.target_ra, body.target_dec)
            label = body.target
            hidden = not self.test_if_other_body_visible(body)
            if hidden:
                label = f'({label})'
            ax.text(
                x, y, label + '\n',
                **kwargs['other_body_of_interest_label']
                | (
                    kwargs['hidden_other_body_of_interest_label']
                    if hidden else {}
                ),
            )
            ax.scatter(
                x, y,
                **kwargs['other_body_of_interest_marker']
                | (
                    kwargs['hidden_other_body_of_interest_marker']
                    if hidden else {}
                ),
            )

        if add_title:
            ax.set_title(self.get_description(multiline=True))
        if aspect_adjustable is not None:
            ax.set_aspect(1, adjustable=aspect_adjustable)
        return ax


@staticmethod
def _add_nans_for_radec_array_wraparounds(
    ras: Iterable[float], decs: Iterable[float], *, threshold: float = 270.0
) -> tuple[np.ndarray, np.ndarray]:
    """Insert NaNs wherever RA wraps between 0 and 360 (for plotting)."""
    ra_out: list[float] = []
    dec_out: list[float] = []
    ra_prev = np.nan
    for ra, dec in zip(ras, decs):
        if abs(ra - ra_prev) > threshold:
            ra_out.append(np.nan)
            dec_out.append(np.nan)
        ra_out.append(ra)
        dec_out.append(dec)
        ra_prev = ra
    return np.array(ra_out), np.array(dec_out)


def plot_wireframe_radec(
    self,
    ax=None,
    *,
    scale_factor: float | None = None,
    dms_ticks: bool | None = None,
    add_axis_labels: bool | None = None,
    aspect_adjustable: Literal['box', 'datalim'] | None = 'datalim',
    use_shifted_meridian: bool = False,
    show: bool = False,
    **wireframe_kwargs,
):
    """Wireframe plot in RA/Dec coordinates."""
    import matplotlib.pyplot as plt

    from . import utils

    if dms_ticks is None:
        dms_ticks = scale_factor is None
    if add_axis_labels is None:
        add_axis_labels = scale_factor is None

    if use_shifted_meridian:
        coordinate_func = lambda ra, dec: ((ra + 180.0) % 360.0 - 180.0, dec)
    else:
        coordinate_func = lambda ra, dec: (ra, dec)

    ax = self._plot_wireframe(
        coordinate_func=coordinate_func,
        scale_factor=scale_factor,
        transform=None,
        aspect_adjustable=None,
        ax=ax,
        additional_array_func=self._add_nans_for_radec_array_wraparounds,
        **wireframe_kwargs,
    )
    utils.format_radec_axes(
        ax,
        self.target_dec,
        dms_ticks=dms_ticks,
        add_axis_labels=add_axis_labels,
        aspect_adjustable=aspect_adjustable,
    )
    if show:
        plt.show()
    return ax


def plot_wireframe_km(
    self,
    ax=None,
    *,
    scale_factor: float | None = None,
    add_axis_labels: bool | None = None,
    aspect_adjustable: Literal['box', 'datalim'] | None = 'datalim',
    show: bool = False,
    **wireframe_kwargs,
):
    """Wireframe plot in target-plane km coordinates."""
    import matplotlib.pyplot as plt

    if add_axis_labels is None:
        add_axis_labels = scale_factor is None
    ax = self._plot_wireframe(
        coordinate_func=self.radec2km,
        scale_factor=scale_factor,
        transform=None,
        aspect_adjustable=aspect_adjustable,
        ax=ax,
        **wireframe_kwargs,
    )
    if add_axis_labels:
        ax.set_xlabel('Projected distance (km)')
        ax.set_ylabel('Projected distance (km)')
        ax.ticklabel_format(style='sci', scilimits=(-3, 3))
    if show:
        plt.show()
    return ax


def plot_wireframe_angular(
    self,
    ax=None,
    *,
    origin_ra: float | None = None,
    origin_dec: float | None = None,
    coordinate_rotation: float = 0.0,
    scale_factor: float | None = None,
    add_axis_labels: bool | None = None,
    aspect_adjustable: Literal['box', 'datalim'] | None = 'datalim',
    show: bool = False,
    **wireframe_kwargs,
):
    """Wireframe plot in relative angular coordinates."""
    import matplotlib.pyplot as plt

    if add_axis_labels is None:
        add_axis_labels = scale_factor is None
    ax = self._plot_wireframe(
        coordinate_func=lambda ra, dec: self.radec2angular(
            ra, dec, origin_ra=origin_ra, origin_dec=origin_dec,
            coordinate_rotation=coordinate_rotation,
        ),
        scale_factor=scale_factor,
        transform=None,
        aspect_adjustable=aspect_adjustable,
        ax=ax,
        **wireframe_kwargs,
    )
    if add_axis_labels:
        ax.set_xlabel('Angular distance (arcsec)')
        ax.set_ylabel('Angular distance (arcsec)')
    if show:
        plt.show()
    return ax


def plot_wireframe_custom(
    self,
    ax=None,
    coordinate_func=None,
    *,
    transform=None,
    additional_array_func=None,
    **wireframe_kwargs,
):
    """Wireframe plot in a user-defined coordinate system."""
    if coordinate_func is None:
        coordinate_func = lambda ra, dec: (ra, dec)
    return self._plot_wireframe(
        coordinate_func=coordinate_func,
        scale_factor=None,
        transform=transform,
        aspect_adjustable=None,
        ax=ax,
        additional_array_func=additional_array_func,
        **wireframe_kwargs,
    )


# Attach everything to Body
for _name, _obj in list(globals().items()):
    if _name.startswith('_') and not _name.startswith('__') or _name in (
        'get_poles_to_plot',
        'matplotlib_radec2km_transform',
        'matplotlib_km2radec_transform',
        'matplotlib_radec2angular_transform',
        'matplotlib_angular2radec_transform',
        'plot_wireframe_radec',
        'plot_wireframe_km',
        'plot_wireframe_angular',
        'plot_wireframe_custom',
    ):
        if callable(_obj) or isinstance(_obj, staticmethod):
            if _name in (
                'get_poles_to_plot', '_get_local_affine_transform_matrix',
                '_get_matplotlib_transform', 'matplotlib_radec2km_transform',
                'matplotlib_km2radec_transform',
                'matplotlib_radec2angular_transform',
                'matplotlib_angular2radec_transform', '_get_wireframe_kw',
                '_plot_wireframe', '_add_nans_for_radec_array_wraparounds',
                'plot_wireframe_radec', 'plot_wireframe_km',
                'plot_wireframe_angular', 'plot_wireframe_custom',
            ):
                setattr(Body, _name, _obj)
