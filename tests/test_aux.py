"""Auxiliary subsystem tests: utils, data_loader, progress, io, exceptions."""


import warnings

import numpy as np
import pytest

from common import setup_kernels

import planetmapper_tpu.data_loader as data_loader
import planetmapper_tpu.progress as progress
import planetmapper_tpu.utils as utils
from planetmapper_tpu.exceptions import PlanetmapperWarning, warn
from planetmapper_tpu.io import fits


@pytest.fixture(scope='module', autouse=True)
def kernels():
    setup_kernels()


class TestUtils:
    def test_dms(self):
        assert utils.decimal_degrees_to_dms(-11.111) == (-11, 6, pytest.approx(39.6))
        assert utils.decimal_degrees_to_dms(0.5) == (0, 30, 0.0)
        assert utils.decimal_degrees_to_dms(-0.5) == (0, -30, 0.0)
        s = utils.decimal_degrees_to_dms_str(12.582222)
        assert s.startswith('12°34′')

    def test_dms_reference_goldens(self):
        # reference tests/test_utils.py:59-104 (sign placement on the
        # first nonzero component, exact formatted strings)
        for decimal_degrees, dms in [
            (0, (0, 0, 0)),
            (1, (1, 0, 0)),
            (1.23456789, (1, 14, 4.444404)),
            (-123.456, (-123, 27, 21.6)),
            (360, (360, 0, 0)),
            (-0.1, (0, -6, 0)),
            (-0.001, (0, 0, -3.6)),
        ]:
            d, m, s = utils.decimal_degrees_to_dms(decimal_degrees)
            assert d == dms[0]
            assert m == dms[1]
            assert s == pytest.approx(dms[2], abs=1e-6)
        for decimal_degrees, expected in [
            (0, '0°00′00.0000″'),
            (1, '1°00′00.0000″'),
            (1.23456789, '1°14′04.4444″'),
            (-123.456, '-123°27′21.6000″'),
            (360, '360°00′00.0000″'),
        ]:
            assert utils.decimal_degrees_to_dms_str(
                decimal_degrees, seconds_fmt='.4f'
            ) == expected
        for decimal_degrees, expected in [
            (0, '0°00′00″'),
            (123.46, '123°27′36″'),
            (123.456, '123°27′21.6″'),
            (-123.456, '-123°27′21.6″'),
        ]:
            assert utils.decimal_degrees_to_dms_str(
                decimal_degrees
            ) == expected

    def test_normalise(self):
        out = utils.normalise([1.0, 2.0, 3.0])
        np.testing.assert_allclose(out, [0.0, 0.5, 1.0])
        out = utils.normalise([1.0, 2.0], top=10, bottom=5)
        np.testing.assert_allclose(out, [5.0, 10.0])
        out = utils.normalise([2.0, 2.0], single_value=0.5)
        np.testing.assert_allclose(out, [0.5, 0.5])

    def test_wavelengths(self):
        header = {
            'CTYPE3': 'WAVE', 'NAXIS3': 4, 'CRVAL3': 10.0, 'CDELT3': 0.5,
            'CRPIX3': 1,
        }
        np.testing.assert_allclose(
            utils.generate_wavelengths_from_header(header),
            [10.0, 10.5, 11.0, 11.5],
        )
        with pytest.raises(utils.GetWavelengthsError):
            utils.generate_wavelengths_from_header({'CTYPE3': 'OTHER'})
        with pytest.raises(utils.GetWavelengthsError):
            utils.generate_wavelengths_from_header({})

    def test_ignore_warnings(self):
        with utils.ignore_warnings('test warning message'):
            warnings.warn('test warning message')

    def test_format_radec_axes(self):
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        utils.format_radec_axes(ax, -5.5)
        assert ax.xaxis_inverted()
        plt.close(fig)


class TestDataLoader:
    def test_ring_radii(self):
        data = data_loader.get_ring_radii()
        assert data['SATURN']['A'] == [122340.0, 136780.0]
        assert data['JUPITER']['Halo'] == [89400.0, 123000.0]
        # mutating the copy must not affect the cached data
        data['SATURN']['A'][0] = -1
        assert data_loader.get_ring_radii()['SATURN']['A'] == [
            122340.0, 136780.0
        ]

    def test_ring_aliases(self):
        aliases = data_loader.get_ring_aliases()
        assert aliases['liberte'] == 'liberté'


class TestProgress:
    def test_hook_stack(self):
        events = []

        class Obj:
            _progress_call_stack = []

            def _get_progress_hook(self):
                return lambda p, stack: events.append((p, list(stack)))

            def _update_progress_hook(self, p):
                self._get_progress_hook()(p, self._progress_call_stack)

            @progress.progress_decorator
            def run(self):
                self._update_progress_hook(0.5)
                return 42

        assert Obj().run() == 42
        fractions = [p for p, s in events]
        assert fractions == [0.0, 0.5, 1.0]
        assert all(s[-1].endswith('Obj.run') for p, s in events)

    def test_timing_hook(self):
        hook = progress.TotalTimingProgressHook()
        hook(0.0, ['a'])
        hook(0.5, ['a', 'b'])
        hook(1.0, ['a'])
        assert 'a' in hook.self_times() or 'b' in hook.self_times()
        assert 'Timing summary' in hook.summary()

    def test_weighted_hook(self):
        parent_events = []
        hook = progress.WeightedProgressHook(
            {'a': 1.0, 'b': 3.0},
            parent_hook=lambda p, s: parent_events.append(p),
        )
        hook(1.0, ['a'])
        assert hook.overall_progress() == pytest.approx(0.25)
        hook(0.5, ['x', 'b'])
        assert hook.overall_progress() == pytest.approx(
            (1.0 + 1.5) / 4.0
        )
        assert parent_events

    def test_save_progress_hooks_cli(self, capsys):
        for hook in (
            progress.SaveNavProgressHookCLI(),
            progress.SaveMapProgressHookCLI(7),
        ):
            assert hook.get_description().startswith('Saving')
            for name, part in hook.parts.items():
                # the real decorator pushes QUALIFIED names; part keys
                # are bare - matching must handle both
                stack = ['Observation.save_observation', f'BodyXY.{name}']
                hook(0.5, stack)
                hook(1.0, stack)
            assert hook.overall_progress() == pytest.approx(1.0)
            assert hook.bar.n == pytest.approx(100, abs=1)

    def test_save_progress_closes_on_outer_completion(self):
        # Skipped backplanes leave parts at 0, but the save routine's own
        # final 1.0 event must still drive the bar to 100% and close it
        hook = progress.SaveNavProgressHookCLI()
        hook(0.5, ['Observation.save_observation',
                   'BodyXY._get_targvec_img'])
        hook(1.0, ['Observation.save_observation'])
        assert hook.bar.n == pytest.approx(100, abs=1)
        assert hook.bar.disable  # closed

    def test_save_map_hook_scales_with_wavelengths(self):
        small = progress.SaveMapProgressHookCLI(1)
        big = progress.SaveMapProgressHookCLI(100)
        assert (
            big.parts['_get_mapped_data'].weight
            > small.parts['_get_mapped_data'].weight
        )
        small.bar.close()
        big.bar.close()


class TestExceptions:
    def test_warn(self):
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter('always')
            warn('test message')
        assert any(
            issubclass(w.category, PlanetmapperWarning) for w in caught
        )


class TestFitsHeader:
    def test_header_basics(self):
        h = fits.Header({'A': 1, 'B': 'x'})
        assert h['A'] == 1
        assert h.get('MISSING', 'd') == 'd'
        assert 'B' in h and 'C' not in h
        h['C'] = (3.5, 'a comment')
        assert h['C'] == 3.5
        assert h.comments('C') == 'a comment'
        h2 = h.copy()
        h2['A'] = 2
        assert h['A'] == 1
        del h['A']
        assert 'A' not in h

    def test_hierarch(self):
        h = fits.Header()
        h['HIERARCH PLANMAP DISC X0'] = 1.25
        assert h['PLANMAP DISC X0'] == 1.25
        assert h['HIERARCH PLANMAP DISC X0'] == 1.25

    def test_value_formats(self, tmp_path):
        h = fits.Header()
        h['INT'] = 42
        h['FLOAT'] = 3.14159
        h['BOOL_T'] = True
        h['BOOL_F'] = False
        h['STR'] = "it's a string"
        h['BIGNUM'] = 1.5e-30
        hdu = fits.PrimaryHDU(data=np.zeros((2, 2)), header=h)
        path = str(tmp_path / 'fmt.fits')
        fits.HDUList([hdu]).writeto(path)
        h2 = fits.open(path)[0].header
        assert h2['INT'] == 42
        assert h2['FLOAT'] == pytest.approx(3.14159)
        assert h2['BOOL_T'] is True
        assert h2['BOOL_F'] is False
        assert h2['STR'] == "it's a string"
        assert h2['BIGNUM'] == pytest.approx(1.5e-30)

    def test_int16_roundtrip(self, tmp_path):
        data = np.array([[1, 2], [3, 4]], dtype=np.int16)
        path = str(tmp_path / 'i16.fits')
        fits.HDUList([fits.PrimaryHDU(data=data)]).writeto(path)
        out = fits.open(path)[0].data
        np.testing.assert_array_equal(out, data)

    def test_unsigned_convention_read(self, tmp_path):
        # standard telescope uint16 files: int16 stored + BZERO=32768
        # (previously crashed with OverflowError under numpy 2)
        h = fits.Header()
        h['BZERO'] = 32768
        h['BSCALE'] = 1
        raw = np.array([[-32768, 0, 32767]], dtype=np.int16)
        path = str(tmp_path / 'u16.fits')
        fits.HDUList([fits.PrimaryHDU(data=raw, header=h)]).writeto(path)
        hdu = fits.open(path)[0]
        assert hdu.data.dtype == np.uint16
        np.testing.assert_array_equal(hdu.data, [[0, 32768, 65535]])
        # the applied cards are removed so a rewrite can't double-scale
        assert 'BZERO' not in hdu.header and 'BSCALE' not in hdu.header
        path2 = str(tmp_path / 'rt.fits')
        fits.HDUList([hdu]).writeto(path2)
        np.testing.assert_array_equal(
            fits.open(path2)[0].data, [[0, 32768, 65535]]
        )

    @pytest.mark.parametrize('dtype,values', [
        (np.uint16, [[40000, 1, 65535]]),
        (np.uint32, [[3_000_000_000, 0, 4_294_967_295]]),
        (np.int8, [[-128, -1, 127]]),
    ])
    def test_unsigned_convention_write(self, tmp_path, dtype, values):
        # FITS has no unsigned 16/32-bit (or signed 8-bit) types: the
        # writer must use the BZERO offset convention losslessly
        data = np.array(values, dtype=dtype)
        path = str(tmp_path / 'u.fits')
        fits.HDUList([fits.PrimaryHDU(data=data)]).writeto(path)
        out = fits.open(path)[0].data
        assert out.dtype == dtype
        np.testing.assert_array_equal(out, data)

    def test_general_scaling_applied_once(self, tmp_path):
        h = fits.Header()
        h['BSCALE'] = 2.0
        h['BZERO'] = 1000.0
        path = str(tmp_path / 'sc.fits')
        fits.HDUList([fits.PrimaryHDU(
            data=np.array([[100]], dtype=np.int16), header=h
        )]).writeto(path)
        hdu = fits.open(path)[0]
        np.testing.assert_allclose(hdu.data, [[1200.0]])
        path2 = str(tmp_path / 'sc2.fits')
        fits.HDUList([hdu]).writeto(path2)
        np.testing.assert_allclose(fits.open(path2)[0].data, [[1200.0]])

    def test_long_string_continue_roundtrip(self, tmp_path):
        # >80-byte cards must use the CONTINUE long-string convention
        # (previously silently truncated)
        h = fits.Header()
        h['FILENAME'] = 'a_very/long/path_' + 'x' * 90 + "_with_'quotes'"
        h['AFTER'] = 7
        path = str(tmp_path / 'ls.fits')
        fits.HDUList([fits.PrimaryHDU(
            data=np.zeros((2, 2)), header=h
        )]).writeto(path)
        h2 = fits.open(path)[0].header
        assert h2['FILENAME'] == h['FILENAME']
        assert h2['AFTER'] == 7


class TestWcs:
    def test_tan_roundtrip(self):
        from planetmapper_tpu.io.wcs import WCS

        h = fits.Header(
            {
                'CTYPE1': 'RA---TAN', 'CTYPE2': 'DEC--TAN',
                'CRPIX1': 10, 'CRPIX2': 20, 'CRVAL1': 120.0, 'CRVAL2': -45.0,
                'CDELT1': -0.001, 'CDELT2': 0.001, 'CROTA2': 30.0,
            }
        )
        w = WCS(h)
        for x, y in [(0.0, 0.0), (9.0, 19.0), (100.0, -50.0)]:
            ra, dec = w.pixel_to_world_values(x, y)
            x2, y2 = w.world_to_pixel_values(ra, dec)
            assert x2 == pytest.approx(x, abs=1e-6)
            assert y2 == pytest.approx(y, abs=1e-6)

    def test_no_wcs(self):
        from planetmapper_tpu.io.wcs import WCS

        w = WCS(fits.Header({'A': 1}))
        assert w.naxis == 0

    @pytest.mark.parametrize('proj', ['TAN', 'SIN', 'ARC', 'STG', 'ZEA'])
    def test_zenithal_roundtrip(self, proj):
        from planetmapper_tpu.io.wcs import WCS

        h = fits.Header(
            {
                'CTYPE1': f'RA---{proj}', 'CTYPE2': f'DEC--{proj}',
                'CRPIX1': 10, 'CRPIX2': 20, 'CRVAL1': 120.0, 'CRVAL2': -45.0,
                'CDELT1': -0.001, 'CDELT2': 0.001, 'CROTA2': 30.0,
            }
        )
        w = WCS(h)
        for x, y in [(0.0, 0.0), (9.0, 19.0), (100.0, -50.0)]:
            ra, dec = w.pixel_to_world_values(x, y)
            x2, y2 = w.world_to_pixel_values(ra, dec)
            assert x2 == pytest.approx(x, abs=1e-6), proj
            assert y2 == pytest.approx(y, abs=1e-6), proj

    def test_sin_matches_textbook_orthographic(self):
        # Independent check of the SIN radius law: the orthographic
        # projection about (ra0, dec0) has the closed form
        # xi = cos(d) sin(a - a0), eta = sin(d) cos(d0) - cos(d) sin(d0) cos(a - a0)
        import math

        from planetmapper_tpu.io.wcs import WCS

        ra0, dec0 = 80.0, 25.0
        h = fits.Header(
            {
                'CTYPE1': 'RA---SIN', 'CTYPE2': 'DEC--SIN',
                'CRPIX1': 1.0, 'CRPIX2': 1.0, 'CRVAL1': ra0, 'CRVAL2': dec0,
                'CDELT1': 1.0, 'CDELT2': 1.0,
            }
        )
        w = WCS(h)
        for ra, dec in [(81.0, 25.5), (78.2, 23.9), (85.0, 30.0)]:
            x, y = w.world_to_pixel_values(ra, dec)
            a, a0 = math.radians(ra), math.radians(ra0)
            d, d0 = math.radians(dec), math.radians(dec0)
            xi = math.degrees(math.cos(d) * math.sin(a - a0))
            eta = math.degrees(
                math.sin(d) * math.cos(d0)
                - math.cos(d) * math.sin(d0) * math.cos(a - a0)
            )
            # CRPIX=1, CDELT=1: pixel (0-based) == intermediate coords [deg]
            assert x == pytest.approx(xi, abs=1e-9)
            assert y == pytest.approx(eta, abs=1e-9)

    def test_zenithal_agree_near_axis_diverge_offaxis(self):
        from planetmapper_tpu.io.wcs import WCS

        def make(proj):
            return WCS(fits.Header(
                {
                    'CTYPE1': f'RA---{proj}', 'CTYPE2': f'DEC--{proj}',
                    'CRPIX1': 0.0, 'CRPIX2': 0.0,
                    'CRVAL1': 10.0, 'CRVAL2': 40.0,
                    'CDELT1': 0.001, 'CDELT2': 0.001,
                }
            ))

        tan = make('TAN')
        for proj in ('SIN', 'ARC', 'STG', 'ZEA'):
            w = make(proj)
            # 1 pixel = 3.6 arcsec off-axis: all zenithal projections agree
            # to O(r^3) ~ sub-microarcsec
            ra_t, dec_t = tan.pixel_to_world_values(1.0, 0.0)
            ra_p, dec_p = w.pixel_to_world_values(1.0, 0.0)
            assert ra_p == pytest.approx(ra_t, abs=1e-9)
            assert dec_p == pytest.approx(dec_t, abs=1e-9)
            # 5000 pixels = 5 deg off-axis: they measurably differ
            ra_t, dec_t = tan.pixel_to_world_values(0.0, 5000.0)
            ra_p, dec_p = w.pixel_to_world_values(0.0, 5000.0)
            assert abs(dec_p - dec_t) > 1e-3

    def test_sin_outside_unit_circle_is_nan(self):
        import numpy as np

        from planetmapper_tpu.io.wcs import WCS

        w = WCS(fits.Header(
            {
                'CTYPE1': 'RA---SIN', 'CTYPE2': 'DEC--SIN',
                'CRPIX1': 1.0, 'CRPIX2': 1.0, 'CRVAL1': 0.0, 'CRVAL2': 0.0,
                'CDELT1': 30.0, 'CDELT2': 30.0,
            }
        ))
        ra, dec = w.pixel_to_world_values(3.0, 0.0)  # 90 deg -> r > 1
        assert np.isnan(ra) and np.isnan(dec)

    def test_unsupported_projection_raises(self):
        from planetmapper_tpu.io.wcs import WCS

        w = WCS(fits.Header(
            {
                'CTYPE1': 'RA---AIT', 'CTYPE2': 'DEC--AIT',
                'CRPIX1': 1, 'CRPIX2': 1, 'CRVAL1': 0.0, 'CRVAL2': 0.0,
            }
        ))
        with pytest.raises(NotImplementedError, match='AIT'):
            w.pixel_to_world_values(0.0, 0.0)

    def test_sip_suffixed_ctype(self):
        # 'RA---TAN-SIP' is the standard CTYPE for files carrying the
        # A_*/B_* coefficients this class evaluates
        from planetmapper_tpu.io.wcs import WCS

        base = {
            'CTYPE1': 'RA---TAN', 'CTYPE2': 'DEC--TAN',
            'CRPIX1': 5, 'CRPIX2': 5, 'CRVAL1': 10.0, 'CRVAL2': 20.0,
            'CDELT1': -0.001, 'CDELT2': 0.001,
        }
        plain = WCS(fits.Header(base))
        sip = WCS(fits.Header({
            **base, 'CTYPE1': 'RA---TAN-SIP', 'CTYPE2': 'DEC--TAN-SIP',
            'A_ORDER': 2, 'B_ORDER': 2, 'A_2_0': 0.0, 'B_0_2': 0.0,
        }))
        assert sip.has_distortion
        np.testing.assert_allclose(
            sip.pixel_to_world_values(2.0, 7.0),
            plain.pixel_to_world_values(2.0, 7.0),
        )
        assert sip.world_axis_physical_types == [
            'pos.eq.ra', 'pos.eq.dec'
        ]

    def test_sip_inverse_roundtrip_fixed_point(self):
        # JWST/HST-scale forward-only SIP (no AP/BP in the header):
        # world_to_pixel must invert the A/B polynomials so distorted
        # frames navigate exactly (reference gets this via astropy)
        from planetmapper_tpu.io.wcs import WCS

        w = WCS(fits.Header({
            'CTYPE1': 'RA---TAN-SIP', 'CTYPE2': 'DEC--TAN-SIP',
            'CRPIX1': 512.0, 'CRPIX2': 512.0,
            'CRVAL1': 83.1, 'CRVAL2': -5.4,
            'CDELT1': -1.8e-5, 'CDELT2': 1.8e-5,
            'A_ORDER': 3, 'B_ORDER': 3,
            'A_2_0': 2.3e-6, 'A_0_2': -1.1e-6, 'A_1_1': 4.7e-7,
            'A_3_0': 1.2e-10, 'A_1_2': -3.5e-11,
            'B_2_0': -1.4e-6, 'B_0_2': 2.9e-6, 'B_1_1': -6.1e-7,
            'B_0_3': 2.2e-10, 'B_2_1': 5.0e-11,
        }))
        x = np.array([0.0, 100.0, 511.5, 900.0, 1023.0])
        y = np.array([0.0, 950.0, 511.5, 30.0, 1023.0])
        # distortion is genuinely large at the chip corner (~0.5 px)
        fx, fy = w.pix2foc(x, y, 0)
        assert np.max(np.hypot(fx - x, fy - y)) > 0.4
        ra, dec = w.pixel_to_world_values(x, y)
        x2, y2 = w.world_to_pixel_values(ra, dec)
        np.testing.assert_allclose(x2, x, atol=1e-6)
        np.testing.assert_allclose(y2, y, atol=1e-6)

    def test_sip_inverse_uses_ap_bp_when_present(self):
        # with AP/BP in the header the inverse is the header polynomial,
        # not the iterative solve: check it is actually evaluated
        from planetmapper_tpu.io.wcs import WCS

        base = {
            'CTYPE1': 'RA---TAN-SIP', 'CTYPE2': 'DEC--TAN-SIP',
            'CRPIX1': 50.0, 'CRPIX2': 50.0,
            'CRVAL1': 10.0, 'CRVAL2': 20.0,
            'CDELT1': -0.001, 'CDELT2': 0.001,
            'A_ORDER': 2, 'B_ORDER': 2,
            'A_2_0': 1e-5, 'B_0_2': -1e-5,
        }
        w_iter = WCS(fits.Header(base))
        # exact polynomial inverse of this forward model to O(d^2):
        # AP/BP = -A/B evaluated on (U, V) ~ (u, v)
        w_ap = WCS(fits.Header({
            **base, 'AP_ORDER': 2, 'BP_ORDER': 2,
            'AP_2_0': -1e-5, 'BP_0_2': 1e-5,
        }))
        ra, dec = w_iter.pixel_to_world_values(80.0, 15.0)
        xi, yi = w_iter.world_to_pixel_values(ra, dec)
        xa, ya = w_ap.world_to_pixel_values(ra, dec)
        # iterative solve is exact; AP/BP agree to the O(d^2) truncation
        assert xi == pytest.approx(80.0, abs=1e-9)
        assert yi == pytest.approx(15.0, abs=1e-9)
        assert xa == pytest.approx(80.0, abs=1e-3)
        assert ya == pytest.approx(15.0, abs=1e-3)
        # and the AP/BP path is really the polynomial (differs from the
        # identity fallback by the distortion magnitude)
        assert abs(xa - xi) > 1e-7

    def test_cunit_not_degrees_reported(self):
        from planetmapper_tpu.io.wcs import WCS

        w = WCS(fits.Header({
            'CTYPE1': 'RA---TAN', 'CTYPE2': 'DEC--TAN',
            'CRPIX1': 1, 'CRPIX2': 1, 'CRVAL1': 0.0, 'CRVAL2': 0.0,
            'CUNIT1': 'arcsec', 'CUNIT2': 'arcsec',
        }))
        # observation.disc_from_wcs guards on this being 'deg'; a
        # hardcoded value would navigate 3600x off silently
        assert w.world_axis_units == ['arcsec', 'arcsec']

    def test_pole_centred_lonpole_default(self):
        # CRVAL2=90: the FITS default LONPOLE is 0, not 180 (Calabretta
        # & Greisen 2002); a pixel due +y of the pole reference point
        # must land at the native phi=180 meridian -> RA = CRVAL1 + 180
        from planetmapper_tpu.io.wcs import WCS

        w = WCS(fits.Header({
            'CTYPE1': 'RA---TAN', 'CTYPE2': 'DEC--TAN',
            'CRPIX1': 1, 'CRPIX2': 1, 'CRVAL1': 30.0, 'CRVAL2': 90.0,
            'CDELT1': 0.001, 'CDELT2': 0.001,
        }))
        ra, dec = w.pixel_to_world_values(0.0, 10.0)
        assert dec == pytest.approx(90.0 - 0.01, abs=1e-6)
        # alpha = alpha0 + (phi - phi_p) - 180 at the pole; phi(+y) = 180
        # and the default phi_p = 0 here, so RA = CRVAL1 (the old
        # hardcoded phi_p = 180 put it at CRVAL1 + 180)
        assert ra == pytest.approx(30.0, abs=1e-6)
        # explicit LONPOLE rotates the native frame
        w2 = WCS(fits.Header({
            'CTYPE1': 'RA---TAN', 'CTYPE2': 'DEC--TAN',
            'CRPIX1': 1, 'CRPIX2': 1, 'CRVAL1': 30.0, 'CRVAL2': 90.0,
            'CDELT1': 0.001, 'CDELT2': 0.001, 'LONPOLE': 90.0,
        }))
        ra2, _ = w2.pixel_to_world_values(0.0, 10.0)
        assert (ra2 - (ra - 90.0)) % 360.0 == pytest.approx(
            0.0, abs=1e-6
        )
        # roundtrip consistency under both conventions
        for wcs in (w, w2):
            x, y = wcs.world_to_pixel_values(
                *wcs.pixel_to_world_values(3.0, 4.0)
            )
            assert (x, y) == (pytest.approx(3.0, abs=1e-6),
                              pytest.approx(4.0, abs=1e-6))

    def test_swapped_axis_order(self):
        # DEC on axis 1 / RA on axis 2: values are returned in AXIS
        # order (astropy semantics) and the roundtrip is consistent
        from planetmapper_tpu.io.wcs import WCS

        w = WCS(fits.Header({
            'CTYPE1': 'DEC--TAN', 'CTYPE2': 'RA---TAN',
            'CRPIX1': 1, 'CRPIX2': 1, 'CRVAL1': 20.0, 'CRVAL2': 10.0,
            'CDELT1': 0.001, 'CDELT2': 0.001,
        }))
        assert w.world_axis_physical_types == [
            'pos.eq.dec', 'pos.eq.ra'
        ]
        dec, ra = w.pixel_to_world_values(0.0, 0.0)
        assert dec == pytest.approx(20.0, abs=1e-9)
        assert ra == pytest.approx(10.0, abs=1e-9)
        d2, r2 = w.pixel_to_world_values(0.0, 5.0)
        # +y is the RA-like axis here: dec stays (nearly) put
        assert abs(r2 - 10.0) > 1e-4
        x, y = w.world_to_pixel_values(d2, r2)
        assert (x, y) == (pytest.approx(0.0, abs=1e-6),
                          pytest.approx(5.0, abs=1e-6))

