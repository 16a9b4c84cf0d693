"""
Plotting methods for :class:`BodyXY` (wireframes in pixel coordinates, map
wireframes, image/map plotting helpers and rasterised wireframe overlays).
Parity with the plotting sections of the reference's body_xy.py.
"""

from __future__ import annotations

import functools
import io
import math
from typing import Any, Literal

import numpy as np

from .body_xy import BodyXY, _extract_map_kwargs_from_dict
from .body import _AdjustedSurfaceAltitude


def plot_wireframe_xy(
    self,
    ax=None,
    *,
    scale_factor: float | None = None,
    add_axis_labels: bool | None = None,
    aspect_adjustable: Literal['box', 'datalim'] | None = 'box',
    show: bool = False,
    freeze_transform: bool = True,
    **wireframe_kwargs,
):
    """Wireframe plot in image pixel coordinates."""
    import matplotlib.pyplot as plt

    if add_axis_labels is None:
        add_axis_labels = scale_factor is None

    transform = self._get_matplotlib_angular_fixed2xy_transform()
    if freeze_transform:
        transform = transform.frozen()

    ax = self._plot_wireframe(
        coordinate_func=self.radec2angular,
        scale_factor=scale_factor,
        transform=transform,
        aspect_adjustable=aspect_adjustable,
        ax=ax,
        **wireframe_kwargs,
    )

    if self._test_if_img_size_valid() and scale_factor is None:
        ax.set_xlim(-0.5, self._nx - 0.5)
        ax.set_ylim(-0.5, self._ny - 0.5)
    if add_axis_labels:
        ax.set_xlabel('x (pixels)')
        ax.set_ylabel('y (pixels)')

    if show:
        plt.show()
    return ax


def plot_map_wireframe(
    self,
    ax=None,
    *,
    label_poles: bool = True,
    add_title: bool = True,
    add_axis_labels: bool = True,
    grid_interval: float = 30,
    grid_lat_limit: float = 90,
    indicate_equator: bool = True,
    indicate_prime_meridian: bool = True,
    aspect_adjustable: Literal['box', 'datalim'] | None = 'box',
    formatting=None,
    **map_and_formatting_kwargs,
):
    """Wireframe (gridlines etc.) of a map projection."""
    import matplotlib.pyplot as plt

    if ax is None:
        ax = plt.gca()

    map_kwargs, common_formatting = _extract_map_kwargs_from_dict(
        map_and_formatting_kwargs
    )
    if 'common_formatting' in common_formatting:
        common_formatting |= common_formatting.pop('common_formatting')

    kwargs = self._get_wireframe_kw(
        common_formatting=common_formatting, formatting=formatting
    )
    _, _, _, _, transformer, map_kw_used = self.generate_map_coordinates(
        **map_kwargs
    )
    projection = map_kw_used['projection']

    if aspect_adjustable is not None:
        ax.set_aspect(1, adjustable=aspect_adjustable)

    lon_ticks = np.arange(0, 360.0001, grid_interval)
    lat_ticks = np.arange(-90, 90.0001, grid_interval)

    if projection in {'azimuthal', 'azimuthal equal area'}:
        npts = 360
        lats_to_plot = [
            np.linspace(-grid_lat_limit, 0, npts),
            np.linspace(0, grid_lat_limit, npts),
        ]
    else:
        npts = 720
        lats_to_plot = [np.linspace(-grid_lat_limit, grid_lat_limit, npts)]
    for lon in lon_ticks:
        if lon == 360 or (lon == 0 and projection == 'rectangular'):
            continue
        for lats in lats_to_plot:
            x, y = transformer.transform(lon * np.ones(len(lats)), lats)
            ax.plot(
                x, y,
                **kwargs['grid']
                | (
                    kwargs['prime_meridian']
                    if lon == 0 and indicate_prime_meridian
                    else {}
                ),
            )
    npts = 720
    for lat in lat_ticks:
        if float(lat) in {-90.0, 90.0}:
            continue
        if abs(lat) > grid_lat_limit:
            continue
        x, y = transformer.transform(
            np.linspace(0, 360, npts), lat * np.ones(npts)
        )
        ax.plot(
            x, y,
            **kwargs['grid']
            | (kwargs['equator'] if lat == 0 and indicate_equator else {}),
        )

    boundary = None
    if projection == 'orthographic':
        x0 = 1
        b = self.r_polar / self.r_eq
        theta = np.radians(map_kw_used['lat'])
        y0 = np.sqrt((np.sin(theta)) ** 2 + b**2 * (np.cos(theta)) ** 2)
        t = np.linspace(0, -2 * np.pi, 100)
        boundary = (x0 * np.cos(t), y0 * np.sin(t))
    elif projection in {'azimuthal', 'azimuthal equal area'}:
        t = np.linspace(0, -2 * np.pi, 100)
        boundary = (np.cos(t), np.sin(t))

    if boundary:
        ax.plot(*boundary, **kwargs['map_boundary'])

    if label_poles and projection != 'rectangular':
        for lat, s in ((90, 'N'), (-90, 'S')):
            x, y = transformer.transform(0, lat)
            if math.isfinite(x) and math.isfinite(y):
                ax.text(x, y, s, **kwargs['pole'])

    if add_axis_labels:
        if projection == 'rectangular':
            if self.positive_longitude_direction == 'W':
                ax.set_xlim(360, 0)
            else:
                ax.set_xlim(0, 360)
            ax.set_ylim(-90, 90)
            ax.set_xlabel(
                f'Planetographic longitude '
                f'({self.positive_longitude_direction})'
            )
            ax.set_ylabel('Planetographic latitude')
            ax.set_xticks(lon_ticks)
            ax.set_xticklabels(
                [f'{x:.0f}°' if x % 90 == 0 else '' for x in lon_ticks]
            )
            ax.set_yticks(lat_ticks)
            ax.set_yticklabels(
                [f'{y:.0f}°' if y % 90 == 0 else '' for y in lat_ticks]
            )
        elif projection in {
            'orthographic', 'azimuthal', 'azimuthal equal area'
        }:
            ax.set_xticks([])
            ax.set_yticks([])

    if add_title:
        ax.set_title(self.get_description(multiline=True))
    return ax


_plot_map_wireframe_impl = plot_map_wireframe


def plot_img(
    self,
    img: np.ndarray,
    ax=None,
    *,
    coordinates: Literal['xy', 'radec', 'km', 'angular'] = 'xy',
    wireframe_kwargs: dict[str, Any] | None = None,
    add_wireframe: bool = True,
    angular_kwargs=None,
    zorder: float = 0.0,
    **kwargs,
):
    """Plot an observed image with a wireframe in a chosen coordinate system."""
    import matplotlib.pyplot as plt

    if ax is None:
        fig, ax = plt.subplots()

    if coordinates == 'xy':
        wireframe_func = self.plot_wireframe_xy
        limits_func = self.get_img_limits_xy
        transform = ax.transData
    elif coordinates == 'radec':
        wireframe_func = self.plot_wireframe_radec
        limits_func = self.get_img_limits_radec
        transform = self.matplotlib_xy2radec_transform(ax)
    elif coordinates == 'km':
        wireframe_func = self.plot_wireframe_km
        limits_func = self.get_img_limits_km
        transform = self.matplotlib_xy2km_transform(ax)
    elif coordinates == 'angular':
        if angular_kwargs is None:
            angular_kwargs = {}
        wireframe_func = functools.partial(
            self.plot_wireframe_angular, **angular_kwargs
        )
        limits_func = functools.partial(
            self.get_img_limits_angular, **angular_kwargs
        )
        transform = self.matplotlib_xy2angular_transform(ax, **angular_kwargs)
    else:
        raise ValueError(f'Unknown coordinates {coordinates!r}')

    if add_wireframe:
        if wireframe_kwargs is None:
            wireframe_kwargs = {}
        wireframe_func(ax=ax, **wireframe_kwargs)

    img = np.asarray(img)
    if img.ndim == 3:
        if img.shape[2] == 3:
            img = np.append(
                img, np.ones_like(img[:, :, 0])[:, :, None], axis=2
            )
        ax.relim()
        xlim_before = ax.get_xlim()
        ylim_before = ax.get_ylim()
        h = ax.imshow(
            img, origin='lower', transform=transform, zorder=zorder, **kwargs
        )
        img_xlim, img_ylim = limits_func()
        ax.set_xlim(
            min(xlim_before[0], img_xlim[0]), max(xlim_before[1], img_xlim[1])
        )
        ax.set_ylim(
            min(ylim_before[0], img_ylim[0]), max(ylim_before[1], img_ylim[1])
        )
    else:
        h = ax.pcolormesh(
            self.get_x_img(), self.get_y_img(), img, transform=transform,
            zorder=zorder, **kwargs,
        )
    return h


def plot_map(
    self,
    map_img: np.ndarray,
    ax=None,
    *,
    wireframe_kwargs: dict[str, Any] | None = None,
    add_wireframe: bool = True,
    **kwargs,
):
    """Plot a mapped image with appropriate extents and gridlines."""
    import matplotlib.pyplot as plt

    if ax is None:
        fig, ax = plt.subplots()

    map_kwargs, kwargs = _extract_map_kwargs_from_dict(kwargs)
    _, _, xx, yy, _, _ = self.generate_map_coordinates(**map_kwargs)
    h = ax.pcolormesh(xx, yy, map_img, **kwargs)
    if add_wireframe:
        self.plot_map_wireframe(ax=ax, **(wireframe_kwargs or {}), **map_kwargs)
    return h


def imshow_map(self, *args, **kwargs):
    """Alias for plot_map (backwards compatibility). :meta private:"""
    return self.plot_map(*args, **kwargs)


def _get_wireframe_overlay(
    self, *, output_size, dpi, nx, ny, rgba, plot_fn
) -> np.ndarray:
    import matplotlib.pyplot as plt
    from matplotlib.figure import Figure

    output_size = output_size or max(nx, ny)
    s = output_size / dpi
    if nx > ny:
        figsize = (s, s * ny / nx)
    else:
        figsize = (s * nx / ny, s)

    fig = Figure(figsize=figsize, dpi=dpi, facecolor='w')
    ax = fig.add_axes([0, 0, 1, 1], facecolor='w')
    plot_fn(ax)
    ax.axis('off')
    ax.set_xticks([])
    ax.set_yticks([])

    with io.BytesIO() as io_buf:
        fig.savefig(io_buf, format='raw', dpi=dpi, transparent=rgba)
        io_buf.seek(0)
        img_arr = np.frombuffer(io_buf.getvalue(), dtype=np.uint8)
    plt.close(fig)
    img = img_arr.reshape((fig.canvas.get_width_height()[::-1]) + (4,))
    if not rgba:
        img = np.asarray(np.mean(img[:, :, :3], axis=-1), dtype=np.uint8)
    img = np.flipud(img)  # FITS orientation convention
    return img


def get_wireframe_overlay_img(
    self, output_size: int | None = 1500, dpi: int = 200, rgba: bool = False,
    **plot_kwargs,
) -> np.ndarray:
    """Rasterised wireframe image matching the observation's aspect ratio."""
    return self._get_wireframe_overlay(
        output_size=output_size,
        dpi=dpi,
        nx=self._nx,
        ny=self._ny,
        rgba=rgba,
        plot_fn=lambda ax: self.plot_wireframe_xy(
            ax=ax,
            add_axis_labels=False,
            add_title=False,
            **(dict(color='k') | plot_kwargs or {}),
        ),
    )


def get_wireframe_overlay_map(
    self, output_size: int | None = 1500, dpi: int = 200, rgba: bool = False,
    **map_and_formatting_kwargs,
) -> np.ndarray:
    """Rasterised wireframe map matching the map's aspect ratio."""
    map_kwargs, plot_kwargs = _extract_map_kwargs_from_dict(
        map_and_formatting_kwargs
    )
    lons, lats, xx, yy, transformer, map_kw_used = (
        self.generate_map_coordinates(**map_kwargs)
    )
    nx = xx.shape[1]
    ny = yy.shape[0]

    def plot_fn(ax):
        self.plot_map_wireframe(
            ax=ax, add_axis_labels=False, add_title=False,
            **(dict(color='k') | plot_kwargs), **map_kwargs,
        )
        dx = abs(xx[0][1] - xx[0][0]) / 2
        ax.set_xlim(np.nanmin(xx) - dx, np.nanmax(xx) + dx)
        dy = abs(yy[1][0] - yy[0][0]) / 2
        ax.set_ylim(np.nanmin(yy) - dy, np.nanmax(yy) + dy)

    return self._get_wireframe_overlay(
        output_size=output_size, dpi=dpi, nx=nx, ny=ny, rgba=rgba,
        plot_fn=plot_fn,
    )


def _attach() -> None:
    from .body import _adjust_surface_altitude_decorator

    BodyXY.plot_wireframe_xy = plot_wireframe_xy
    BodyXY.plot_map_wireframe = _adjust_surface_altitude_decorator(
        _plot_map_wireframe_impl
    )
    BodyXY.plot_img = plot_img
    BodyXY.plot_map = plot_map
    BodyXY.imshow_map = imshow_map
    BodyXY._get_wireframe_overlay = _get_wireframe_overlay
    BodyXY.get_wireframe_overlay_img = get_wireframe_overlay_img
    BodyXY.get_wireframe_overlay_map = get_wireframe_overlay_map


_attach()
