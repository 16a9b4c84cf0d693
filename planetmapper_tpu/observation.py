"""
Observation: observed-data I/O, disc fitting, and FITS export (parity with
planetmapper/observation.py).

Uses the framework's self-contained FITS and WCS implementations (astropy
is not required) and device reductions for disc fitting. The FITS output
format (PLANMAP HIERARCH metadata cards, one ImageHDU per backplane, the
WIREFRAME HDU, map WCS cards) matches the reference so files are
interchangeable between the two packages.
"""

from __future__ import annotations

import datetime
import os
from typing import Any, Callable, Collection, Literal

import numpy as np

from . import common, utils
from .base import _cache_stable_result
from .body import (
    _adjust_surface_altitude_decorator,
    _AdjustedSurfaceAltitude,
    _cache_clearable_alt_dependent_result,
)
from .body_xy import BodyXY
from .exceptions import warn
from .io import fits
from .io.wcs import WCS
from .progress import (
    SaveMapProgressHookCLI,
    SaveNavProgressHookCLI,
    progress_decorator,
)


class Observation(BodyXY):
    """
    An actual observation of an astronomical body at a specific time,
    created from a data file (FITS or image) or an array. Disc parameters
    initialise from previous PlanetMapper-format headers, then WCS, then a
    centred disc - see the reference documentation for full semantics.
    """

    FITS_FILE_EXTENSIONS = ('.fits', '.fits.gz')
    """File extensions read as FITS; everything else is read as an image."""
    FITS_KEYWORD = 'PLANMAP'
    """Keyword prefix used for metadata added to output FITS headers."""

    def __init__(
        self,
        path: str | os.PathLike | None = None,
        *,
        data: np.ndarray | None = None,
        header: fits.Header | None = None,
        **kwargs,
    ) -> None:
        for k in ('nx', 'ny', 'sz'):
            if k in kwargs:
                raise TypeError(f'Cannot set {k} for Observation objects')

        self._path_arg = path
        self._data_arg = data
        self._header_arg = header

        if path is not None:
            path = str(os.path.expandvars(os.path.expanduser(path)))

        self.path: str | None = path
        self.header: fits.Header = None  # type: ignore[assignment]

        if self.path is None:
            if data is None:
                raise ValueError('Either `path` or `data` must be provided')
            self.data = data
            if header is not None:
                self.header = header
        else:
            if data is not None:
                raise ValueError('`path` and `data` are mutually exclusive')
            if header is not None:
                raise ValueError('`path` and `header` are mutually exclusive')
            self._load_data_from_path()

        self.data = np.asarray(self.data)
        if len(self.data.shape) == 2:
            self.data = self.data[np.newaxis, ...]
        if self.header is not None:
            self._add_kw_from_header(kwargs, self.header)

        _fill_in_header_later = self.header is None
        if _fill_in_header_later:
            self.header = fits.Header()

        super().__init__(
            nx=self.data.shape[-1], ny=self.data.shape[-2], **kwargs
        )

        if _fill_in_header_later:
            self.header = fits.Header(
                {'OBJECT': self.target, 'DATE-OBS': self.utc}
            )

        if self._data_arg is not None:
            self._data_arg = self.data
        if self._header_arg is not None:
            self._header_arg = self.header

    def __repr__(self) -> str:
        return self._generate_repr(
            'path',
            formatters={
                'data': self._str_array_formatter,
                'header': self._str_header_formatter,
            },
        )

    @staticmethod
    def _str_array_formatter(array: np.ndarray) -> str:
        return f'<{"x".join(map(str, array.shape))} array>'

    @staticmethod
    def _str_header_formatter(header) -> str:
        return f'<{len(header)} card Header>'

    def to_body_xy(self) -> BodyXY:
        """Create a BodyXY with the same parameters as this observation."""
        new = BodyXY(**BodyXY._get_kwargs(self))
        BodyXY._copy_options_to_other(self, new)
        return new

    def _get_equality_tuple(self) -> tuple:
        return (
            self.path,
            np.nan_to_num(self.data).data.tobytes(),
            np.isnan(self.data).data.tobytes(),
            tuple(self.header.items()),
            super()._get_equality_tuple(),
        )

    def _get_kwargs(self) -> dict[str, Any]:
        kw = super()._get_kwargs() | dict(
            path=self._path_arg,
            data=self._data_arg,
            header=self._header_arg,
        )
        kw.pop('nx')
        kw.pop('ny')
        return kw

    @classmethod
    def _get_default_init_kwargs(cls) -> dict[str, Any]:
        super_defaults = super()._get_default_init_kwargs()
        super_defaults.pop('nx')
        super_defaults.pop('ny')
        return dict(
            path=None, data=None, header=None, target=None, **super_defaults
        )

    # ------------------------------------------------------------------
    # Data loading
    # ------------------------------------------------------------------
    def _load_data_from_path(self) -> None:
        assert self.path is not None
        if any(self.path.endswith(ext) for ext in self.FITS_FILE_EXTENSIONS):
            self._load_fits_data()
        else:
            self._load_image_data()

    def _load_fits_data(self) -> None:
        assert self.path is not None
        with fits.open(self.path) as hdul:
            for idx, hdu in enumerate(hdul):
                if hdu.data is not None:
                    data = hdu.data
                    if idx:
                        header = hdul[0].header.copy()
                        header.update(hdu.header.copy())
                    else:
                        header = hdu.header.copy()
                    break
            else:
                raise ValueError('No data found in provided FITS file')

        if len(data.shape) == 2:
            data = np.array([data])
        self.data = data
        self.header = header

    def _load_image_data(self) -> None:
        assert self.path is not None
        import PIL.Image

        image = np.flipud(np.array(PIL.Image.open(self.path)))
        if len(image.shape) == 2:
            image = np.array([image])
        else:
            image = np.moveaxis(image, 2, 0)
        self.data = image

    @classmethod
    def _add_kw_from_header(cls, kw: dict, header: fits.Header) -> None:
        _try_get_header_value(
            kw, header, 'target',
            [cls._make_fits_kw('TARGET'), 'OBJECT', 'TARGET', 'TARGNAME'],
        )
        _try_get_header_value(
            kw, header, 'observer',
            [cls._make_fits_kw('OBSERVER'), 'TELESCOP'],
            value_fn=lambda v: 'EARTH' if str(v).startswith('ESO-') else v,
        )
        _try_get_header_value(
            kw, header, 'utc',
            [cls._make_fits_kw('UTC-OBS'), 'MJD-AVG', 'EXPMID', 'DATE-AVG'],
        )
        if 'utc' not in kw:
            try:
                beg = float(header['MJD-BEG'])
                end = float(header['MJD-END'])
                kw['utc'] = (beg + end) / 2
            except (KeyError, TypeError, ValueError):
                pass
            if 'utc' not in kw:
                try:
                    kw['utc'] = (
                        str(header['DATE-OBS']) + ' ' + str(header['TIME-OBS'])
                    )
                except KeyError:
                    pass
            _try_get_header_value(
                kw, header, 'utc',
                ['DATE-OBS', 'DATE-BEG', 'DATE-END', 'MJD-BEG', 'MJD-END'],
            )
        _try_get_header_value(
            kw, header, 'observer_frame', [cls._make_fits_kw('OBSERVER-FRAME')]
        )
        _try_get_header_value(
            kw, header, 'illumination_source',
            [cls._make_fits_kw('ILLUMINATION')],
        )
        _try_get_header_value(
            kw, header, 'aberration_correction', [cls._make_fits_kw('ABCORR')]
        )
        _try_get_header_value(
            kw, header, 'subpoint_method',
            [cls._make_fits_kw('SUBPOINT-METHOD')],
        )
        _try_get_header_value(
            kw, header, 'surface_method',
            [cls._make_fits_kw('SURFACE-METHOD')],
        )

    # API overrides
    def set_img_size(self, nx: int | None = None, ny: int | None = None):
        """:meta private:"""
        raise TypeError('Cannot set image size for Observation objects')

    # Utils
    def get_wavelengths_from_header(
        self, *, check_ctype: bool = True
    ) -> np.ndarray:
        """Wavelength array for a spectral cube from FITS header keywords."""
        return utils.generate_wavelengths_from_header(
            self.header, check_ctype=check_ctype
        )

    # ------------------------------------------------------------------
    # Disc initialisation
    # ------------------------------------------------------------------
    def reset_disc_params(self) -> str:
        """Reset disc parameters: header values, then WCS, then centred."""
        try:
            self.disc_from_header()
        except ValueError:
            try:
                self.disc_from_wcs(suppress_warnings=True)
            except (ValueError, NotImplementedError):
                return super(Observation, self).reset_disc_params()
        return self.get_disc_method()

    def disc_from_header(self) -> None:
        """Set disc parameters from PLANMAP DISC header values."""
        if (
            self._make_fits_kw('MAP PROJECTION') in self.header
            or self._make_fits_kw('DEGREE-INTERVAL') in self.header
        ):
            raise ValueError('FITS header refers to mapped data')
        try:
            self.set_disc_params(
                x0=self.header[self._make_fits_kw('DISC X0')],
                y0=self.header[self._make_fits_kw('DISC Y0')],
                r0=self.header[self._make_fits_kw('DISC R0')],
                rotation=self.header[self._make_fits_kw('DISC ROT')],
            )
            self.set_disc_method('header')
        except KeyError as exc:
            raise ValueError('No disc parameters found in FITS header') from exc

    def _get_wcs_from_header(self, suppress_warnings: bool = False) -> WCS:
        del suppress_warnings
        return WCS(self.header).celestial

    @_cache_stable_result
    def _get_disc_params_from_wcs(
        self,
        suppress_warnings: bool = False,
        validate: bool = True,
        use_header_offsets: bool = True,
        distortion_warning_threshold: float | None = 0.25,
    ) -> tuple[float, float, float, float]:
        wcs = self._get_wcs_from_header(suppress_warnings=suppress_warnings)

        if wcs.naxis == 0:
            raise ValueError('No WCS information found in FITS header')

        if validate:
            if not all(u == 'deg' for u in wcs.world_axis_units):
                raise ValueError('WCS coordinates are not in degrees')
            if not wcs.world_axis_physical_types == [
                'pos.eq.ra', 'pos.eq.dec'
            ]:
                raise ValueError('WCS axes are not RA/Dec coordinates')
            if distortion_warning_threshold is not None:
                max_distortion, avg_distortion = (
                    self._get_max_and_average_wcs_distortion(wcs)
                )
                if max_distortion > distortion_warning_threshold:
                    warn(
                        f'The WCS contains distortion of up to '
                        f'{max_distortion:.3f} pixels (average '
                        f'{avg_distortion:.3f} pixels), which is not '
                        'accounted for by PlanetMapper.',
                    )

        x0, y0 = wcs.world_to_pixel_values(self.target_ra, self.target_dec)

        b1, b2 = wcs.pixel_to_world_values(x0, y0 + 1)
        c1, c2 = wcs.pixel_to_world_values(x0, y0)

        rotation = np.rad2deg(np.arctan2(b1 - c1, b2 - c2))

        s = self.angular_dist(b1, b2, c1, c2)
        arcsec_per_px = s * 60 * 60
        r0 = self.target_diameter_arcsec / (2 * arcsec_per_px)

        if use_header_offsets:
            dra_arcsec = float(self.header.get('HIERARCH NAV RA_OFFSET', 0.0))
            ddec_arcsec = float(
                self.header.get('HIERARCH NAV DEC_OFFSET', 0.0)
            )
            if dra_arcsec != 0 or ddec_arcsec != 0:
                body = self.to_body_xy()
                body.set_disc_params(x0, y0, r0, rotation)
                body.add_arcsec_offset(
                    dra_arcsec=dra_arcsec, ddec_arcsec=ddec_arcsec
                )
                x0, y0, r0, rotation = body.get_disc_params()
        return float(x0), float(y0), float(r0), float(rotation)

    def _get_max_and_average_wcs_distortion(self, wcs: WCS):
        if not wcs.has_distortion:
            return 0.0, 0.0
        x, y = np.meshgrid(
            np.arange(0, self.data.shape[2]), np.arange(0, self.data.shape[1])
        )
        x_foc, y_foc = wcs.pix2foc(x, y, 0)
        distortion_img = np.hypot(x_foc - x, y_foc - y)
        return float(np.max(distortion_img)), float(np.mean(distortion_img))

    def disc_from_wcs(
        self,
        suppress_warnings: bool = False,
        validate: bool = True,
        use_header_offsets: bool = True,
        distortion_warning_threshold: float | None = 0.25,
    ) -> None:
        """Set all disc parameters from WCS information in the header."""
        x0, y0, r0, rotation = self._get_disc_params_from_wcs(
            suppress_warnings, validate, use_header_offsets,
            distortion_warning_threshold=distortion_warning_threshold,
        )
        self.set_x0(x0)
        self.set_y0(y0)
        self.set_r0(r0)
        self.set_rotation(rotation)
        self.set_disc_method('wcs')

    def position_from_wcs(self, *args, **kwargs) -> None:
        """Set (x0, y0) from WCS information in the header."""
        x0, y0, r0, rotation = self._get_disc_params_from_wcs(*args, **kwargs)
        self.set_x0(x0)
        self.set_y0(y0)
        self.set_disc_method('wcs_position')

    def rotation_from_wcs(self, *args, **kwargs) -> None:
        """Set the disc rotation from WCS information in the header."""
        x0, y0, r0, rotation = self._get_disc_params_from_wcs(*args, **kwargs)
        self.set_rotation(rotation)
        self.set_disc_method('wcs_rotation')

    def plate_scale_from_wcs(self, *args, **kwargs) -> None:
        """Set the plate scale (r0) from WCS information in the header."""
        x0, y0, r0, rotation = self._get_disc_params_from_wcs(*args, **kwargs)
        self.set_r0(r0)
        self.set_disc_method('wcs_plate_scale')

    def get_wcs_offset(self, *args, **kwargs):
        """(dx, dy, dr, drotation) between current and WCS disc params."""
        x0_wcs, y0_wcs, r0_wcs, rotation_wcs = self._get_disc_params_from_wcs(
            *args, **kwargs
        )
        dx = self.get_x0() - x0_wcs
        dy = self.get_y0() - y0_wcs
        dr = self.get_r0() - r0_wcs
        drotation = (self.get_rotation() - rotation_wcs) % 360
        return dx, dy, dr, drotation

    def get_wcs_arcsec_offset(
        self, *args, check_is_position_offset_only: bool = True, **kwargs
    ) -> tuple[float, float]:
        """(dra, ddec) arcsec offsets between current and WCS disc position."""
        dra_arcsec, ddec_arcsec, dr, drotation = (
            self._get_wcs_offsets_for_arcsec(*args, **kwargs)
        )
        if check_is_position_offset_only:
            if abs(dr) > 1e-3:
                raise ValueError(
                    f'r0 is different between WCS and observation (dr={dr})'
                )
            if abs((drotation + 180) % 360 - 180) > 1e-3:
                raise ValueError(
                    f'rotation is different between WCS and observation '
                    f'(drotation={drotation})'
                )
        return dra_arcsec, ddec_arcsec

    def _get_wcs_offsets_for_arcsec(self, *args, **kwargs):
        dx, dy, dr, drotation = self.get_wcs_offset(*args, **kwargs)
        ra0, dec0 = self.xy2radec(0, 0)
        ra1, dec1 = self.xy2radec(dx, dy)
        dra_arcsec = (ra1 - ra0) * 3600
        ddec_arcsec = (dec1 - dec0) * 3600
        return dra_arcsec, ddec_arcsec, dr, drotation

    # ------------------------------------------------------------------
    # Disc fitting
    # ------------------------------------------------------------------
    def _get_img_for_fitting(self) -> np.ndarray:
        img = np.nansum(self.data, axis=0)
        mask_img = np.isnan(img)
        img[mask_img] = np.nanmin(img)
        return img

    def fit_disc_position(self) -> None:
        """Fit (x0, y0) to the brightest part of the data.

        Device reduction: percentile threshold + first moment of the
        binary mask in one jitted program (:func:`ops.photometry.
        threshold_centroid`); same estimator as the reference
        (observation.py:762-780).
        """
        from .ops.photometry import threshold_centroid

        x0, y0 = threshold_centroid(self._get_img_for_fitting())
        self.set_x0(x0)
        self.set_y0(y0)
        self.set_disc_method('fit_position')

    def fit_disc_radius(self) -> None:
        """
        Fit r0 by annular aperture photometry: the radius where the mean
        aperture brightness decreases the fastest (one vectorised
        exact-overlap reduction over the pixel grid per radius).
        """
        if not self._xy_in_image_frame(self.get_x0(), self.get_y0()):
            raise ValueError(
                'x0 and y0 must be within the image frame to fit the radius'
            )
        from .ops.photometry import circular_aperture_sums

        img = self._get_img_for_fitting()
        centroid = np.array([self.get_x0(), self.get_y0()])

        r_ceil = max(int(min(*centroid, *(img.shape - centroid))), 2)
        if r_ceil > 100:
            r_list = np.linspace(1, r_ceil + 1, 100)
        else:
            r_list = np.array(range(1, r_ceil + 1), dtype=float)

        sums, areas = circular_aperture_sums(
            img, float(centroid[0]), float(centroid[1]), r_list
        )
        val_list = sums / areas

        r_mid = r_list[1:] - 0.5 * (r_list[1] - r_list[0])
        dv_list = np.diff(val_list)
        r0 = r_mid[dv_list.argmin()]
        self.set_r0(r0)
        self.set_disc_method('fit_r0')

    # ------------------------------------------------------------------
    # Mapping
    # ------------------------------------------------------------------
    def get_mapped_data(
        self,
        interpolation: (
            Literal['nearest', 'smooth', 'linear', 'quadratic', 'cubic']
            | int
            | tuple[int, int]
        ) = 'linear',
        *,
        propagate_nan: bool = True,
        spline_smoothing: float = 0,
        smooth_oversample_by: int = 5,
        smooth_max_oversampled_img_size: int = 10_000,
        **map_kwargs,
    ) -> np.ndarray:
        """Project the observed data cube onto a map (cached)."""
        return self._get_mapped_data(
            interpolation=interpolation,
            spline_smoothing=spline_smoothing,
            propagate_nan=propagate_nan,
            smooth_oversample_by=smooth_oversample_by,
            smooth_max_oversampled_img_size=smooth_max_oversampled_img_size,
            **map_kwargs,
        ).copy()

    @_cache_clearable_alt_dependent_result
    @progress_decorator
    def _get_mapped_data(
        self, *, interpolation, spline_smoothing, propagate_nan,
        smooth_oversample_by, smooth_max_oversampled_img_size, **map_kwargs,
    ) -> np.ndarray:
        data = self.data
        if interpolation != 'smooth':
            # One batched call: the device spline/nearest paths map every
            # wavelength frame in a single program (shared sample-weight
            # matrices), instead of a per-frame Python loop
            self._update_progress_hook(0.0)
            # float64 materialisation: the FITS products and the reference
            # API contract are double precision
            return np.asarray(
                self.map_img(
                    data,
                    as_numpy=False,
                    spline_smoothing=spline_smoothing,
                    interpolation=interpolation,
                    propagate_nan=propagate_nan,
                    smooth_oversample_by=smooth_oversample_by,
                    smooth_max_oversampled_img_size=smooth_max_oversampled_img_size,
                    **map_kwargs,
                ),
                dtype=np.float64,
            )
        projected = []
        for idx, img in enumerate(data):
            self._update_progress_hook(idx / len(data))
            projected.append(
                self.map_img(
                    img,
                    spline_smoothing=spline_smoothing,
                    interpolation=interpolation,
                    propagate_nan=propagate_nan,
                    smooth_oversample_by=smooth_oversample_by,
                    smooth_max_oversampled_img_size=smooth_max_oversampled_img_size,
                    **map_kwargs,
                )
            )
        # float64 materialisation, as for the batched branch above
        return np.array(projected, dtype=np.float64)

    # ------------------------------------------------------------------
    # Output
    # ------------------------------------------------------------------
    def append_to_header(
        self,
        keyword: str,
        value,
        comment: str | None = None,
        hierarch_keyword: bool = True,
        header: fits.Header | None = None,
        truncate_strings: bool = True,
        remove_existing: bool = True,
    ) -> None:
        """Add a (PLANMAP-prefixed by default) card to a FITS header."""
        if header is None:
            header = self.header
        if hierarch_keyword:
            keyword = self._make_fits_kw(keyword)
        if truncate_strings and isinstance(value, str):
            if len(keyword) + len(value) + 4 > 80:
                n = 80 - len(keyword) - 4 - 3
                value = value[:n] + '...'
        if remove_existing:
            header.remove(keyword, ignore_missing=True, remove_all=True)
        header.append(fits.Card(keyword=keyword, value=value, comment=comment))

    @classmethod
    def _make_fits_kw(cls, keyword: str) -> str:
        return f'HIERARCH {cls.FITS_KEYWORD} {keyword}'

    def add_header_metadata(self, header: fits.Header | None = None) -> None:
        """Add the automatically-generated PLANMAP metadata cards."""
        a = lambda *args, **kw: self.append_to_header(*args, header=header, **kw)
        a('VERSION', common.__version__, 'PlanetMapper version.')
        a('URL', common.__url__, 'Webpage.')
        a(
            'DATE',
            datetime.datetime.now().strftime('%Y-%m-%dT%H:%M:%S'),
            'File generation datetime.',
        )
        if self.path is not None:
            a('INFILE', os.path.split(self.path)[1], 'Input file name.')
        a('DISC X0', self.get_x0(), '[pixels] x coordinate of disc centre.')
        a('DISC Y0', self.get_y0(), '[pixels] y coordinate of disc centre.')
        a('DISC R0', self.get_r0(), '[pixels] equatorial radius of disc.')
        a('DISC ROT', self.get_rotation(), '[degrees] rotation of image.')
        a('DISC METHOD', self.get_disc_method(), 'Method used to find disc.')
        a(
            'ALTITUDE-ADJUSTMENT', self._alt_adjustment,
            '[km] Adjustment to surface altitude.',
        )
        a('UTC-OBS', self.utc, 'UTC date of observation')
        a('ET-OBS', self.et, 'J2000 ephemeris seconds of observation.')
        a('TARGET', self.target, 'Target body name used in SPICE.')
        a('TARGET-ID', self.target_body_id, 'Target body ID from SPICE.')
        a('SUBPOINT LAT', self.subpoint_lat, '[degrees] Sub-observer pgr latitude.')
        a('SUBPOINT LON', self.subpoint_lon, '[degrees] Sub-observer pgr longitude.')
        a('SUBSOL LAT', self.subsol_lat, '[degrees] Sub-solar pgr latitude.')
        a('SUBSOL LON', self.subsol_lon, '[degrees] Sub-solar pgr longitude.')
        a(
            'LON-DIRECTION', self.positive_longitude_direction,
            'Positive pgr longitude direction.',
        )
        a('NP-ANGLE', self.north_pole_angle(), '[degrees] North pole angle.')
        a('TARGET RA', self.target_ra, '[degrees] RA of target centre.')
        a('TARGET DEC', self.target_dec, '[degrees] Dec of target centre.')
        a(
            'TARGET DIAMETER', self.target_diameter_arcsec,
            '[arcsec] Equatorial angular diameter of target.',
        )
        a('R EQ', self.r_eq, '[km] Target equatorial radius from SPICE.')
        a('R POLAR', self.r_polar, '[km] Target polar radius from SPICE.')
        a('FLATTENING', self.flattening, 'Flattening of target body.')
        a(
            'LIGHT-TIME', self.target_light_time,
            '[seconds] Light time to target from SPICE.',
        )
        a('DISTANCE', self.target_distance, '[km] Distance to target from SPICE.')
        a('OBSERVER', self.observer, 'Observer name used in SPICE.')
        a('TARGET-FRAME', self.target_frame, 'Target frame used in SPICE.')
        a('OBSERVER-FRAME', self.observer_frame, 'Observer frame used in SPICE.')
        a(
            'ILLUMINATION', self.illumination_source,
            'Illumination source used in SPICE.',
        )
        a(
            'ABCORR', self.aberration_correction,
            'Aberration correction used in SPICE.',
        )
        a('SUBPOINT-METHOD', self.subpoint_method, 'Subpoint method used in SPICE.')
        a(
            'SURFACE-METHOD', self.surface_method,
            'Surface intercept method used in SPICE.',
        )
        a('OPTIMIZATION-USED', self._optimize_speed, 'Speed optimizations used.')

    def make_filename(
        self, extension: str = '.fits', prefix: str = '', suffix: str = ''
    ) -> str:
        """Filename from the target and date, e.g. JUPITER_2005-01-01T000000.fits."""
        return '{prefix}{target}_{date}{suffix}{extension}'.format(
            prefix=prefix,
            target=self.target,
            date=self.dtm.strftime('%Y-%m-%dT%H%M%S'),
            extension=extension,
            suffix=suffix,
        )

    @progress_decorator
    def save_observation(
        self,
        path: str | os.PathLike,
        *,
        backplanes_to_save: Collection[str] | None = None,
        backplanes_to_skip: Collection[str] = frozenset(),
        include_wireframe: bool = True,
        wireframe_kwargs: dict[str, Any] | None = None,
        show_progress: bool = False,
        print_info: bool = True,
        alt: float = 0.0,
    ) -> None:
        """
        Save a FITS file containing the observed data and all generated
        backplanes (one ImageHDU each, plus the WIREFRAME overlay).
        """
        path = os.fspath(path)
        backplanes_to_save = self._get_backplane_names_to_save(
            backplanes_to_save, backplanes_to_skip
        )
        if show_progress and self._get_progress_hook() is None:
            print_info = False
            self._set_progress_hook(SaveNavProgressHookCLI())
        else:
            show_progress = False

        if print_info:
            print('Saving observation to', path)

        with _AdjustedSurfaceAltitude(self, alt):
            progress_max = 10 + len(self.backplanes)
            data = self.data
            header = self.header.copy()
            self._update_progress_hook(1 / progress_max)
            self.add_header_metadata(header)
            hdul = fits.HDUList([fits.PrimaryHDU(data=data, header=header)])
            for bp_idx, (name, backplane) in enumerate(self.backplanes.items()):
                self._update_progress_hook((bp_idx + 1) / progress_max)
                if name not in backplanes_to_save:
                    continue
                if print_info:
                    print(' Creating backplane:', name)
                img = backplane.get_img()
                bp_header = fits.Header([('ABOUT', backplane.description)])
                bp_header.add_comment(
                    'Backplane generated by PlanetMapper software.'
                )
                hdul.append(
                    fits.ImageHDU(data=np.asarray(img), header=bp_header,
                                  name=name)
                )

            if include_wireframe:
                if print_info:
                    print(' Creating wireframe...')
                wireframe = self.get_wireframe_overlay_img(
                    **wireframe_kwargs or {}
                )
                wf_header = fits.Header([('ABOUT', 'Wireframe image overlay')])
                wf_header.add_comment(
                    'Wireframe overlay generated by PlanetMapper software.'
                )
                hdul.append(
                    fits.ImageHDU(
                        data=wireframe, header=wf_header, name='WIREFRAME'
                    )
                )

            if print_info:
                print(' Saving file...')
            utils.check_path(path)
            hdul.writeto(path, overwrite=True)
        if print_info:
            print('File saved')
        if show_progress:
            self._update_progress_hook(1)
            self._remove_progress_hook()

    def _get_backplane_names_to_save(
        self,
        backplanes_to_save: Collection[str] | None,
        backplanes_to_skip: Collection[str],
    ) -> set[str]:
        if backplanes_to_save is None:
            backplanes_to_save = self.backplanes.keys()
        return {
            self.standardise_backplane_name(n) for n in backplanes_to_save
        } - {self.standardise_backplane_name(n) for n in backplanes_to_skip}

    @progress_decorator
    @_adjust_surface_altitude_decorator
    def save_mapped_observation(
        self,
        path: str | os.PathLike,
        *,
        interpolation: (
            Literal['nearest', 'smooth', 'linear', 'quadratic', 'cubic']
            | int
            | tuple[int, int]
        ) = 'linear',
        propagate_nan: bool = True,
        spline_smoothing: float = 0,
        smooth_oversample_by: int = 5,
        smooth_max_oversampled_img_size: int = 10_000,
        include_backplanes: bool = True,
        backplanes_to_save: Collection[str] | None = None,
        backplanes_to_skip: Collection[str] = frozenset(),
        include_wireframe: bool = True,
        wireframe_kwargs: dict[str, Any] | None = None,
        show_progress: bool = False,
        print_info: bool = True,
        **map_kwargs,
    ) -> None:
        """
        Save a FITS file containing the mapped observation (and mapped
        backplanes) in the requested projection.
        """
        path = os.fspath(path)
        backplanes_to_save = self._get_backplane_names_to_save(
            backplanes_to_save, backplanes_to_skip
        )
        if show_progress and self._get_progress_hook() is None:
            print_info = False
            self._set_progress_hook(SaveMapProgressHookCLI(len(self.data)))
        else:
            show_progress = False

        if print_info:
            print('Saving map to', path)

        progress_max = 15 + (len(self.backplanes) if include_backplanes else 0)
        if print_info:
            print(' Projecting mapped data...')
        data = self.get_mapped_data(
            interpolation=interpolation,
            spline_smoothing=spline_smoothing,
            propagate_nan=propagate_nan,
            smooth_oversample_by=smooth_oversample_by,
            smooth_max_oversampled_img_size=smooth_max_oversampled_img_size,
            **map_kwargs,
        )
        header = self.header.copy()
        self._update_progress_hook(1 / progress_max)
        self.add_header_metadata(header)
        self._add_map_header_metadata(
            header,
            interpolation=interpolation,
            spline_smoothing=spline_smoothing,
            propagate_nan=propagate_nan,
            smooth_oversample_by=smooth_oversample_by,
            smooth_max_oversampled_img_size=smooth_max_oversampled_img_size,
            **map_kwargs,
        )
        self._add_map_wcs_to_header(header, **map_kwargs)

        hdul = fits.HDUList([fits.PrimaryHDU(data=data, header=header)])
        if include_backplanes:
            for bp_idx, (name, backplane) in enumerate(self.backplanes.items()):
                self._update_progress_hook((bp_idx + 1) / progress_max)
                if name not in backplanes_to_save:
                    continue
                if print_info:
                    print(' Creating backplane:', name)
                img = backplane.get_map(**map_kwargs)
                bp_header = fits.Header([('ABOUT', backplane.description)])
                bp_header.add_comment(
                    'Backplane generated by PlanetMapper software.'
                )
                self._add_map_wcs_to_header(bp_header, **map_kwargs)
                hdul.append(
                    fits.ImageHDU(data=np.asarray(img), header=bp_header,
                                  name=name)
                )

        if include_wireframe:
            if print_info:
                print(' Creating wireframe...')
            wireframe = self.get_wireframe_overlay_map(
                **wireframe_kwargs or {},
                **map_kwargs,
            )
            wf_header = fits.Header([('ABOUT', 'Wireframe map overlay')])
            wf_header.add_comment(
                'Wireframe overlay generated by PlanetMapper software.'
            )
            hdul.append(
                fits.ImageHDU(data=wireframe, header=wf_header,
                              name='WIREFRAME')
            )

        if print_info:
            print(' Saving file...')
        utils.check_path(path)
        hdul.writeto(path, overwrite=True)
        if print_info:
            print('File saved')
        if show_progress:
            self._update_progress_hook(1)
            self._remove_progress_hook()

    def _add_map_header_metadata(
        self, header: fits.Header, *, interpolation, spline_smoothing,
        propagate_nan, smooth_oversample_by, smooth_max_oversampled_img_size,
        **map_kwargs,
    ) -> None:
        lons, lats, xx, yy, transformer, info = self.generate_map_coordinates(
            **map_kwargs
        )
        self.append_to_header(
            'MAP INTERPOLATION',
            str(interpolation)
            if isinstance(interpolation, tuple)
            else interpolation,
            'Interpolation method used in mapping.',
            header=header,
        )
        if interpolation not in {'nearest', 'smooth'}:
            self.append_to_header(
                'MAP SPLINE-SMOOTHING', spline_smoothing,
                'Interpolation spline smoothing factor used in mapping.',
                header=header,
            )
            self.append_to_header(
                'MAP PROPAGATE-NAN', propagate_nan,
                'Propagate NaN pixels to map when mapping.',
                header=header,
            )
        if interpolation == 'smooth':
            self.append_to_header(
                'MAP SMOOTH-OVERSAMPLE-BY', smooth_oversample_by,
                'Oversampling factor used in map interpolation.',
                header=header,
            )
            self.append_to_header(
                'MAP SMOOTH-MAX-OVERSAMPLED-IMG-SIZE',
                smooth_max_oversampled_img_size,
                'Maximum oversampled image size allowed map interpolation.',
                header=header,
            )
        self.append_to_header(
            'MAP PROJECTION', info['projection'],
            'Projection used for mapping.', header=header,
        )
        for key, kw, comment in [
            ('degree_interval', 'MAP DEGREE-INTERVAL',
             '[deg] Degree interval in output map.'),
            ('lon', 'MAP LON', 'Central longitude of map projection.'),
            ('lat', 'MAP LAT', 'Central latitude of map projection.'),
            ('size', 'MAP SIZE', 'Size of output map.'),
        ]:
            try:
                self.append_to_header(kw, info[key], comment, header=header)
            except KeyError:
                pass

    def _add_map_wcs_to_header(self, header: fits.Header, **map_kwargs) -> None:
        lons, lats, xx, yy, transformer, info = self.generate_map_coordinates(
            **map_kwargs
        )
        if info['projection'] == 'rectangular':
            header['CTYPE1'] = (
                'Planetographic longitude, positive {}'.format(
                    self.positive_longitude_direction
                )
            )
            header['CUNIT1'] = 'deg'
            header['CRPIX1'] = 1
            header['CRVAL1'] = lons[0][0]
            header['CDELT1'] = lons[0][1] - lons[0][0]

            header['CTYPE2'] = 'Planetographic latitude'
            header['CUNIT2'] = 'deg'
            header['CRPIX2'] = 1
            header['CRVAL2'] = lats[0][0]
            header['CDELT2'] = lats[1][0] - lats[0][0]
        else:
            for n in ['1', '2']:
                for key in [
                    f'CTYPE{n}', f'CUNIT{n}', f'CRPIX{n}', f'CRVAL{n}',
                    f'CDELT{n}',
                ]:
                    header.remove(key, ignore_missing=True, remove_all=True)

        for a_ in ['1', '2']:
            for b_ in ['1', '2', '3']:
                for key in [
                    f'PC{a_}_{b_}', f'PC{b_}_{a_}', f'CD{a_}_{b_}',
                    f'CD{b_}_{a_}',
                ]:
                    header.remove(key, ignore_missing=True, remove_all=True)

    def run_gui(self) -> list[tuple[float, float]]:
        """Run the interactive GUI to fit this observation in place."""
        from .gui import GUI

        gui = GUI(allow_open=False)
        gui.set_observation(self)
        gui.run()
        return gui.click_locations


def _try_get_header_value(
    kw: dict, header, kw_key: str, header_keys: list[str],
    value_fn: Callable[[Any], Any] | None = None,
) -> bool:
    if value_fn is None:
        value_fn = lambda x: x
    if kw_key not in kw:
        for hk in header_keys:
            try:
                kw[kw_key] = value_fn(header[hk])
                return True
            except KeyError:
                pass
    return False
