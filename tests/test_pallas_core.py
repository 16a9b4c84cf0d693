"""
Pallas TPU kernel tests: double-single EFT survival under Mosaic, the
polynomial inverse-trig accuracy, and full-plane parity of the
single-kernel pipeline against the XLA mixed pipeline.

The real-hardware assertions (EFT lo-word grade, 2048-class parity)
need a TPU backend and auto-skip on the CPU test environment; the
structural pieces (coefficient accuracy, builder validation) run
everywhere.
"""

from __future__ import annotations

import numpy as np
import pytest

from common import setup_kernels

setup_kernels()


def _tpu_available() -> bool:
    import jax

    return jax.default_backend() not in ('cpu',)


requires_tpu = pytest.mark.skipif(
    not _tpu_available(), reason='needs a TPU backend (Pallas Mosaic)'
)


class TestDskHost:
    """Pieces checkable without hardware (pure-numpy / XLA:CPU)."""

    def test_atan_poly_accuracy_f64(self):
        # the coefficient set itself (evaluated in f64) is ~1e-9 grade
        from planetmapper_tpu.ops.dsk import _ATAN_C

        t = np.linspace(1e-9, 1.0, 200001)
        s = t * t
        p = np.zeros_like(s)
        for c in _ATAN_C[::-1]:
            p = p * s + c
        err = np.max(np.abs(t + t * s * p - np.arctan(t)))
        assert err < 5e-9

    def test_const_split_exact(self):
        from planetmapper_tpu.ops import dsk

        hi, lo = dsk.const(np.pi)
        assert float(np.float64(hi) + np.float64(lo)) == pytest.approx(
            np.pi, abs=2e-14  # lo itself rounds at ulp(lo)/2 ~ 7e-15
        )
        assert abs(float(lo)) <= np.spacing(np.float32(np.pi)) / 2

    def test_builder_rejects_unaligned(self):
        import jax

        from planetmapper_tpu.ops.pallas_pipeline import (
            build_pallas_pipeline,
        )

        impl = build_pallas_pipeline(
            positive_west=True, prograde=True, have_sun=True,
            optimize_speed=False, lst_quant=True,
        )
        with pytest.raises(ValueError):
            jax.eval_shape(
                lambda: impl(100, 100, np.eye(3), np.zeros(4),
                             np.ones(3), {})
            )

    def test_builder_rejects_unknown_plane(self):
        from planetmapper_tpu.ops.pallas_pipeline import (
            build_pallas_pipeline,
        )

        with pytest.raises(ValueError, match='unknown planes'):
            build_pallas_pipeline(
                positive_west=True, prograde=True, have_sun=True,
                optimize_speed=False, lst_quant=True,
                planes=('EMISSION', 'NO-SUCH-PLANE'),
            )


class TestPlaneSubsets:
    """
    ``build_pallas_pipeline(planes=...)``: subset kernels must agree
    exactly with the full kernel's corresponding planes (the gating
    only removes trace-time sections, never changes surviving math).
    Interpret mode on CPU; Mosaic execution of subsets is covered by
    the TPU parity test running the full set.
    """

    # one subset per gating branch: lonlat+lst (shared lon_e), radec,
    # separable, illumination (sun chain), azimuth, state (u_obs
    # without illumination), limb, ring
    SUBSETS = [
        ('LON-GRAPHIC', 'LOCAL-SOLAR-TIME'),
        ('RA', 'KM-X', 'PIXEL-Y'),
        ('PHASE', 'INCIDENCE', 'EMISSION'),
        ('AZIMUTH',),
        ('DISTANCE', 'DOPPLER'),
        ('LIMB-DISTANCE', 'RING-RADIUS'),
        ('LAT-CENTRIC', 'ANGULAR-Y', 'RING-LON-GRAPHIC'),
    ]

    def _run(self, body, nx, ny, planes):
        import jax

        from planetmapper_tpu.ops.pallas_pipeline import (
            build_pallas_pipeline,
        )

        impl = build_pallas_pipeline(
            positive_west=body.positive_longitude_direction == 'W',
            prograde=body.prograde,
            have_sun=body._engine._pos_s is not None,
            optimize_speed=bool(body._optimize_speed),
            lst_quant=True,
            planes=planes,
            interpret=True,
        )
        out = jax.jit(lambda *a: impl(nx, ny, *a))(
            np.asarray(body._get_xy2angular_matrix()),
            np.asarray(body.get_disc_params(), dtype=np.float64),
            np.asarray(body.radii, dtype=np.float64),
            body._get_pipeline_anchors(),
        )
        return {k: np.asarray(v) for k, v in out.items()}

    def test_subsets_match_full(self):
        from planetmapper_tpu import BodyXY

        nx, ny = 128, 64  # one kernel tile
        body = BodyXY(
            'Jupiter', observer='EARTH', utc='2005-01-01T00:00:00',
            nx=nx, ny=ny,
        )
        body.set_disc_params(nx / 2, ny / 2, ny * 0.45, 12.3)
        full = self._run(body, nx, ny, None)
        for planes in self.SUBSETS:
            out = self._run(body, nx, ny, planes)
            assert set(out) == set(planes)
            for name in planes:
                np.testing.assert_array_equal(
                    out[name], full[name], err_msg=name
                )


class TestTileGateInterpret:
    """
    The optimize_speed tile gate (skip fully-off-disc tiles at run
    time) on a multi-tile frame with an off-centre disc, in interpret
    mode so it runs without hardware. Gated output must equal the
    ungated (optimize_speed=False) kernel: a pixel with a surface
    intercept always lies inside the r_cut circle, so the per-pixel
    and per-tile masks remove the same pixels (bit-exact in practice).
    """

    # a subset keeps interpret-mode tracing tractable while covering
    # every gate-relevant path: EMISSION (disc chain), RING-RADIUS
    # (dist_ref occlusion through off_tile), RA (ungated section)
    PLANES = ('EMISSION', 'RING-RADIUS', 'RA')

    def _run(self, body, nx, ny, optimize_speed):
        import jax

        from planetmapper_tpu.ops.pallas_pipeline import (
            build_pallas_pipeline,
        )

        impl = build_pallas_pipeline(
            positive_west=body.positive_longitude_direction == 'W',
            prograde=body.prograde,
            have_sun=body._engine._pos_s is not None,
            optimize_speed=optimize_speed,
            lst_quant=True,
            planes=self.PLANES,
            interpret=True,
        )
        out = jax.jit(lambda *a: impl(nx, ny, *a))(
            np.asarray(body._get_xy2angular_matrix()),
            np.asarray(body.get_disc_params(), dtype=np.float64),
            np.asarray(body.radii, dtype=np.float64),
            body._get_pipeline_anchors(),
        )
        return {k: np.asarray(v) for k, v in out.items()}

    def test_gated_matches_ungated_multi_tile(self):
        from planetmapper_tpu import BodyXY

        # 2 row-bands x 2 col-tiles; disc confined to the top-left
        # tile so three tiles take the run-time off_tile branch
        # (NaN fill + dist_ref=inf for ring occlusion).
        nx, ny = 256, 128
        body = BodyXY(
            'Jupiter', observer='EARTH', utc='2005-01-01T00:00:00',
            nx=nx, ny=ny,
        )
        body.set_disc_params(40.0, 28.0, 20.0, 12.3)
        gated = self._run(body, nx, ny, True)
        ungated = self._run(body, nx, ny, False)
        assert set(gated) == set(ungated)
        # the off-disc region must actually be NaN in a disc plane
        assert np.isnan(gated['EMISSION'][:, 128:]).all()
        assert np.isfinite(gated['EMISSION'][:64, :128]).any()
        for name in gated:
            np.testing.assert_array_equal(
                gated[name], ungated[name], err_msg=name
            )

    def test_nan_disc_params_degrade_gracefully(self):
        from planetmapper_tpu import BodyXY

        # NaN disc centre: the tile gate must not skip (NaN compares
        # False on the proven-miss test), so geometry-independent
        # planes (RA/DEC etc.) still fill like the ungated kernel.
        nx, ny = 256, 128
        body = BodyXY(
            'Jupiter', observer='EARTH', utc='2005-01-01T00:00:00',
            nx=nx, ny=ny,
        )
        body.set_disc_params(40.0, 28.0, 20.0, 12.3)
        disc = np.array(body.get_disc_params(), dtype=np.float64)
        disc[0] = np.nan

        import jax

        from planetmapper_tpu.ops.pallas_pipeline import (
            build_pallas_pipeline,
        )

        outs = {}
        for speed in (True, False):
            impl = build_pallas_pipeline(
                positive_west=body.positive_longitude_direction == 'W',
                prograde=body.prograde,
                have_sun=body._engine._pos_s is not None,
                optimize_speed=speed,
                lst_quant=True,
                planes=self.PLANES,
                interpret=True,
            )
            out = jax.jit(lambda *a, _i=impl: _i(nx, ny, *a))(
                np.asarray(body._get_xy2angular_matrix()),
                disc,
                np.asarray(body.radii, dtype=np.float64),
                body._get_pipeline_anchors(),
            )
            outs[speed] = {k: np.asarray(v) for k, v in out.items()}
        for name in outs[True]:
            np.testing.assert_array_equal(
                outs[True][name], outs[False][name], err_msg=name
            )


class TestTriaxialKernel:
    """
    Triaxial bodies on the Mosaic kernel: the intercept and normals are
    per-axis already; the geodetic conversions run 4 Bowring refinement
    steps (surface points sit off the biaxial (re, rp) spheroid -
    CSPICE recpgr converts against (re, f) regardless, reference
    body.py:1030). Kernel output must match the XLA robust path (exact
    nearest-point solve) to the f32 noise floor.
    """

    def _body(self):
        from planetmapper_tpu import BodyXY

        # Pan: 17.2 x 15.7 x 10.4 km (pck00010) - strongly triaxial
        # (f = 0.40, re - rm ~ 1.5 km) and covered by the committed
        # sat060.bsp test kernel
        body = BodyXY(
            'PAN', observer='EARTH', utc='2004-01-01T00:00:00',
            nx=128, ny=64,
        )
        # off pixel centres: the sub-observer pixel's limb direction is
        # degenerate (ray through the target centre), so both impls
        # return noise-amplified values there
        body.set_disc_params(64.3, 32.3, 28.0, 12.3)
        return body

    def test_selection(self):
        from planetmapper_tpu.pipeline import (
            _kernel_geodetic_iters,
            _robust_geodetic,
        )

        body = self._body()
        assert _robust_geodetic(body)
        assert _kernel_geodetic_iters(body) == 4

    def test_evolute_margin_gate(self):
        from planetmapper_tpu.pipeline import _kernel_geodetic_iters

        class Fake:
            def __init__(self, radii):
                self.radii = np.asarray(radii, float)

        assert _kernel_geodetic_iters(Fake([100, 100, 60])) == 0
        assert _kernel_geodetic_iters(Fake([100, 95, 60])) == 4
        # Haumea-class: rm/re = 0.8 > e2 = 0.74 - still kernel-safe
        assert _kernel_geodetic_iters(Fake([1050, 840, 537])) == 4
        # pathological: middle axis deep inside the evolute reach
        assert _kernel_geodetic_iters(Fake([1000, 400, 300])) is None

    def test_forced_pallas_refuses_pathological_shape(self):
        # a forced kernel path must refuse rather than silently run 0
        # Bowring iterations (garbage graphic latitudes)
        from planetmapper_tpu.pipeline import select_pipeline_impl

        class Fake:
            radii = np.asarray([1000.0, 400.0, 300.0])

        with pytest.raises(ValueError, match='evolute'):
            select_pipeline_impl(Fake(), 128, 64, use_pallas=True)

    def test_kernel_matches_robust_xla(self):
        import jax

        from planetmapper_tpu.ops.pallas_pipeline import (
            build_pallas_pipeline,
        )
        from planetmapper_tpu.pipeline import select_pipeline_impl

        body = self._body()
        nx, ny = 128, 64
        args = (
            np.asarray(body._get_xy2angular_matrix()),
            np.asarray(body.get_disc_params(), dtype=np.float64),
            np.asarray(body.radii, dtype=np.float64),
            body._get_pipeline_anchors(),
        )
        ref_impl, ref_pallas = select_pipeline_impl(
            body, nx, ny, use_pallas=False
        )
        assert not ref_pallas
        ref = jax.jit(lambda *a: ref_impl(nx, ny, *a))(*args)
        ref = {k: np.asarray(v) for k, v in ref.items()}

        planes = (
            'LON-GRAPHIC', 'LAT-GRAPHIC', 'LIMB-LAT-GRAPHIC',
            'EMISSION',
        )
        impl = build_pallas_pipeline(
            positive_west=body.positive_longitude_direction == 'W',
            prograde=body.prograde,
            have_sun=body._engine._pos_s is not None,
            optimize_speed=bool(body._optimize_speed),
            lst_quant=True,
            planes=planes,
            interpret=True,
            geodetic_iters=4,
        )
        out = jax.jit(lambda *a: impl(nx, ny, *a))(*args)
        # Pan's 17 km radius makes the kernel's f32/ds noise relatively
        # larger than on planet-scale targets (light-time correction
        # terms scale with the 9 AU distance, the surface with 17 km).
        # 1e-3 deg - the sub-millidegree navigation bar - is 0.3 m on
        # Pan's surface; hardware measures 4.6e-4 (lon) / 6.4e-4 (limb
        # lat, whose near-point construction carries the longest ds
        # chain).
        tol = {
            'LAT-GRAPHIC': 6e-4, 'LIMB-LAT-GRAPHIC': 1e-3,
            'LON-GRAPHIC': 6e-4, 'EMISSION': 1e-3,
        }
        for name in planes:
            a = np.asarray(out[name], dtype=np.float64)
            b = np.asarray(ref[name], dtype=np.float64)
            both = np.isfinite(a) & np.isfinite(b)
            n_mask = int(np.sum(np.isfinite(a) != np.isfinite(b)))
            assert n_mask <= 8, f'{name}: {n_mask} mask flips'
            assert both.any(), name
            d = np.abs(a[both] - b[both])
            if 'LON' in name:
                d = np.minimum(d, 360.0 - d)
            assert d.max() <= tol[name], f'{name}: {d.max():.3e}'


class TestWindowedMapEval:
    """
    The windowed Mosaic map evaluator (per-tile coefficient windows for
    sources past the plain kernel's VMEM cap) in interpret mode, against
    the XLA one-hot evaluator and scipy ground truth. Removes the
    map-kernel size cliff (reference body_xy.py:1414-1853 map_img has
    none).
    """

    def _setup(self, propagate_nan=True):
        import jax.numpy as jnp

        from planetmapper_tpu.ops import interp_device as idev
        from planetmapper_tpu.ops.map_pallas import (
            WindowPlan,
            stage_windowed,
        )

        rng = np.random.default_rng(0)
        ny_i = nx_i = 200  # source bigger than the 128-window
        my, mx = 96, 192
        yy, xx = np.meshgrid(
            np.linspace(5, ny_i - 6, my), np.linspace(5, nx_i - 6, mx),
            indexing='ij',
        )
        x_map = xx + 3 * np.sin(yy / 20.0)
        y_map = yy + 2 * np.cos(xx / 30.0)
        x_map[0, :4] = np.nan
        img = rng.normal(size=(ny_i, nx_i))
        img[50:53, 60:70] = np.nan

        kx = ky = 3
        ty, tx, ainv_y, ainv_x = idev._grid_spline_solver(
            ny_i, nx_i, kx, ky
        )
        valid = np.isfinite(x_map) & np.isfinite(y_map)
        x_dev = jnp.asarray(np.where(valid, x_map, 0.0).ravel())
        y_dev = jnp.asarray(np.where(valid, y_map, 0.0).ravel())
        v_dev = jnp.asarray(valid.ravel())
        plan = WindowPlan(
            kx=kx, ky=ky, propagate_nan=propagate_nan, win=128,
            tile_h=32, tile_w=64, my=my, mx=mx,
            n_cy=ny_i, n_cx=nx_i, ny_i=ny_i, nx_i=nx_i,
        )
        staged = stage_windowed(plan, ty, tx, y_dev, x_dev, v_dev)
        cleaned, nans = idev._infill_device(jnp, jnp.asarray(img))
        c2 = (ainv_y @ (cleaned @ ainv_x.T)).astype(jnp.float32)
        nanf = nans.astype(jnp.float32)
        return (
            plan, staged, c2, nanf, cleaned,
            (ty, tx, y_dev, x_dev, v_dev),
            (x_map, y_map, my, mx, ny_i, nx_i, kx, ky),
        )

    def test_windowed_matches_onehot_and_scipy(self):
        import jax
        import jax.numpy as jnp
        import scipy.interpolate

        from planetmapper_tpu.ops import interp_device as idev
        from planetmapper_tpu.ops.map_pallas import (
            make_pallas_eval_windowed,
        )

        (plan, staged, c2, nanf, cleaned, devs, meta) = self._setup()
        by, bx, aux, oyx, onyx, fits = staged
        assert bool(fits)
        ty, tx, y_dev, x_dev, v_dev = devs
        x_map, y_map, my, mx, ny_i, nx_i, kx, ky = meta

        ev = make_pallas_eval_windowed(plan, batched=False,
                                       interpret=True)
        got = np.asarray(jax.jit(lambda *a: ev(*a))(
            c2, nanf, by, bx, aux, oyx, onyx
        )).reshape(my, mx)

        ev_ref = idev._make_onehot_eval(kx, ky, False, True, (my, mx))
        ref = np.asarray(jax.jit(lambda *a: ev_ref(*a))(
            jnp.asarray(ty), jnp.asarray(tx), c2, nanf,
            y_dev, x_dev, v_dev,
        )).reshape(my, mx)

        # identical NaN semantics (valid/outside/4-neighbour tests)
        assert (np.isnan(got) == np.isnan(ref)).all()
        both = np.isfinite(got) & np.isfinite(ref)
        assert both.any()
        # scipy ground truth: the windowed path stages its basis in
        # f64, so it lands ~1e-6 from scipy (the f32-basis one-hot
        # reference is ~4e-5 at these coordinate magnitudes)
        spl = scipy.interpolate.RectBivariateSpline(
            np.arange(ny_i), np.arange(nx_i), np.asarray(cleaned),
            kx=ky, ky=kx, s=0,
        )
        sv = spl.ev(
            np.clip(y_map, 0, ny_i - 1), np.clip(x_map, 0, nx_i - 1)
        )
        assert np.abs(got[both] - sv[both]).max() < 5e-6
        assert np.abs(got[both] - ref[both]).max() < 1e-4

    def test_windowed_batched_cube(self):
        import jax

        from planetmapper_tpu.ops.map_pallas import (
            make_pallas_eval_windowed,
        )

        (plan, staged, c2, nanf, _cleaned, _devs, meta) = self._setup()
        by, bx, aux, oyx, onyx, fits = staged
        my, mx = meta[2], meta[3]
        cube_c2 = np.stack([np.asarray(c2), np.asarray(c2) * 2.0])
        cube_nanf = np.stack([np.asarray(nanf), np.asarray(nanf)])
        ev = make_pallas_eval_windowed(plan, batched=True,
                                       interpret=True)
        got = np.asarray(jax.jit(lambda *a: ev(*a))(
            cube_c2, cube_nanf, by, bx, aux, oyx, onyx
        )).reshape(2, my, mx)
        both = np.isfinite(got[0])
        np.testing.assert_allclose(
            got[1][both], got[0][both] * 2.0, rtol=2e-6
        )

    def test_unfit_footprint_rejected(self):
        # samples scattered across the whole source in one tile: no
        # window covers the footprint, fits must come back False
        import jax.numpy as jnp

        from planetmapper_tpu.ops import interp_device as idev
        from planetmapper_tpu.ops.map_pallas import (
            WindowPlan,
            stage_windowed,
        )

        rng = np.random.default_rng(1)
        ny_i = nx_i = 300
        my, mx = 32, 64  # one tile
        x_map = rng.uniform(0, nx_i - 1, size=(my, mx))
        y_map = rng.uniform(0, ny_i - 1, size=(my, mx))
        kx = ky = 1
        ty, tx, _, _ = idev._grid_spline_solver(ny_i, nx_i, kx, ky)
        plan = WindowPlan(
            kx=kx, ky=ky, propagate_nan=True, win=128,
            tile_h=32, tile_w=64, my=my, mx=mx,
            n_cy=ny_i, n_cx=nx_i, ny_i=ny_i, nx_i=nx_i,
        )
        *_, fits = stage_windowed(
            plan, ty, tx,
            jnp.asarray(y_map.ravel()), jnp.asarray(x_map.ravel()),
            jnp.ones(my * mx, bool),
        )
        assert not bool(fits)


@requires_tpu
class TestDskOnTpu:
    """EFT arithmetic grade inside a real Mosaic kernel."""

    def _run_pairs(self, fn, a64, b64):
        import jax
        import jax.numpy as jnp
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from planetmapper_tpu.ops import dsk

        shape = (8, a64.size // 8)
        ins = []
        for v in (a64, b64):
            h, lo = dsk.split_f64(jnp.asarray(v))
            ins += [np.asarray(h).reshape(shape),
                    np.asarray(lo).reshape(shape)]

        def kernel(ah, al, bh, bl, o1, o2):
            r = fn((ah[:], al[:]), (bh[:], bl[:]))
            o1[:], o2[:] = r

        outs = pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct(shape, jnp.float32)] * 2,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        )(*[jnp.asarray(v) for v in ins])
        return (np.asarray(outs[0], np.float64)
                + np.asarray(outs[1], np.float64)).ravel()

    def test_mul_div_sqrt_grade(self):
        from planetmapper_tpu.ops import dsk

        rng = np.random.default_rng(0)
        n = 8 * 1024
        a = rng.normal(size=n) * 1e9
        b = rng.normal(size=n) * 1e9 + a

        got = self._run_pairs(lambda A, B: dsk.mul(A, B), a, b)
        assert np.max(np.abs(got - a * b) / np.abs(a * b)) < 1e-13
        got = self._run_pairs(lambda A, B: dsk.div(A, B), a, b)
        assert np.max(np.abs(got - a / b) / np.abs(a / b)) < 1e-13
        got = self._run_pairs(
            lambda A, B: dsk.sqrt(dsk.add(dsk.sqr(A), dsk.sqr(B))), a, b
        )
        ref = np.sqrt(a * a + b * b)
        assert np.max(np.abs(got - ref) / ref) < 1e-13

    def test_atan2_ds_grade(self):
        from planetmapper_tpu.ops import dsk

        rng = np.random.default_rng(1)
        n = 8 * 1024
        x = rng.normal(size=n)
        y = rng.normal(size=n)
        got = self._run_pairs(lambda Y, X: dsk.atan2_ds(Y, X), y, x)
        ref = np.arctan2(y, x)
        # absolute angle grade ~2^-40 rad (ds polynomial + reduction)
        assert np.max(np.abs(got - ref)) < 5e-12

    def test_atan2_f32_grade(self):
        import jax
        import jax.numpy as jnp
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from planetmapper_tpu.ops import dsk

        rng = np.random.default_rng(2)
        shape = (8, 1024)
        x = rng.normal(size=shape).astype(np.float32)
        y = rng.normal(size=shape).astype(np.float32)

        def kernel(xr, yr, o):
            o[:] = dsk.atan2(yr[:], xr[:])

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.asarray(x), jnp.asarray(y))
        ref = np.arctan2(y.astype(np.float64), x.astype(np.float64))
        assert np.max(np.abs(np.asarray(out, np.float64) - ref)) < 5e-7


@requires_tpu
class TestPallasPipelineParity:
    """All 26 planes vs the XLA mixed pipeline on real hardware."""

    def test_full_plane_parity(self):
        import jax

        from planetmapper_tpu import BodyXY
        from planetmapper_tpu.ops.pallas_pipeline import (
            PLANE_ORDER,
            build_pallas_pipeline,
        )

        size = 512
        body = BodyXY(
            'Jupiter', observer='EARTH', utc='2005-01-01T00:00:00',
            sz=size,
        )
        body.set_disc_params(size / 2, size / 2, size * 0.4, 12.3)
        # the ref must be the XLA mixed pipeline deterministically (the
        # progressive compute_backplanes path may serve either impl)
        from planetmapper_tpu.pipeline import select_pipeline_impl

        ref_impl, ref_pallas = select_pipeline_impl(
            body, size, size, use_pallas=False
        )
        assert not ref_pallas
        ref = jax.jit(lambda *a: ref_impl(size, size, *a))(
            np.asarray(body._get_xy2angular_matrix()),
            np.asarray(body.get_disc_params(), dtype=np.float64),
            np.asarray(body.radii, dtype=np.float64),
            body._get_pipeline_anchors(),
        )
        ref = {k: np.asarray(v) for k, v in ref.items()}
        impl = build_pallas_pipeline(
            positive_west=body.positive_longitude_direction == 'W',
            prograde=body.prograde,
            have_sun=body._engine._pos_s is not None,
            optimize_speed=bool(body._optimize_speed),
            lst_quant=True,
        )
        anchors = body._get_pipeline_anchors()
        out = jax.jit(lambda *a: impl(size, size, *a))(
            np.asarray(body._get_xy2angular_matrix()),
            np.asarray(body.get_disc_params(), dtype=np.float64),
            np.asarray(body.radii, dtype=np.float64),
            anchors,
        )
        # absolute tolerances per plane kind: f32 output storage rounds
        # at ~value * 6e-8 (3e-5 at 360 deg); boundary pixels may flip
        # masks where a >= / < sits at the ds-vs-f64 noise floor
        tol = {
            'KM-X': 1e-6, 'KM-Y': 1e-6, 'ANGULAR-X': 1e-6,
            'ANGULAR-Y': 1e-6, 'PIXEL-X': 0.0, 'PIXEL-Y': 0.0,
            'DISTANCE': 1e-3, 'RADIAL-VELOCITY': 1e-6, 'DOPPLER': 1e-9,
            'LIMB-DISTANCE': 0.02, 'RING-RADIUS': 1.0,
            'RING-DISTANCE': 1e-3, 'LOCAL-SOLAR-TIME': 2.9e-4,
        }
        for name in PLANE_ORDER:
            a = np.asarray(out[name], dtype=np.float64)
            b = np.asarray(ref[name], dtype=np.float64)
            both = np.isfinite(a) & np.isfinite(b)
            n_mask = int(np.sum(np.isfinite(a) != np.isfinite(b)))
            assert n_mask <= 8, f'{name}: {n_mask} mask flips'
            assert both.any(), name
            d = np.abs(a[both] - b[both])
            atol = tol.get(name, 1e-4)  # angles: deg
            if name == 'LOCAL-SOLAR-TIME':
                # sub-ulp representation noise aside, allow at most a
                # few 1-second quantization bin flips (half-bin = flip)
                flips = int(np.sum(d > 0.5 / 3600.0))
                assert flips <= 8, f'{name}: {flips} bin flips'
                assert d.max() <= atol + 1e-9, f'{name}: {d.max()}'
            else:
                assert d.max() <= atol, f'{name}: {d.max():.3e}'


@requires_tpu
class TestPallasMapEvalOnTpu:
    """The Mosaic map-evaluation kernel vs the XLA one-hot evaluator."""

    def test_spline_device_parity(self):
        import os

        from planetmapper_tpu.ops import interp_device
        from planetmapper_tpu.ops.map_pallas import pallas_map_supported

        assert pallas_map_supported(3, 3, 150, 150, 150, 150)
        rng = np.random.default_rng(0)
        img = rng.normal(size=(150, 150))
        img[40:44, 50:53] = np.nan
        x = rng.uniform(-10, 160, (360, 720))
        y = rng.uniform(-10, 160, (360, 720))
        out = np.asarray(interp_device.spline_interpolation_device(
            img, x, y, interpolation=3, warn_nan=False,
            propagate_nan=True, spline_smoothing=0, as_numpy=False,
        ))
        os.environ['PLANETMAPPER_TPU_MAP_PALLAS'] = '0'
        try:
            ref = np.asarray(interp_device.spline_interpolation_device(
                img, x, y, interpolation=3, warn_nan=False,
                propagate_nan=True, spline_smoothing=0, as_numpy=False,
            ))
        finally:
            os.environ.pop('PLANETMAPPER_TPU_MAP_PALLAS')
        assert np.array_equal(np.isnan(out), np.isnan(ref))
        both = ~np.isnan(ref)
        scale = np.nanmax(np.abs(ref))
        assert np.max(np.abs(out[both] - ref[both])) < 3e-5 * max(
            scale, 1.0
        )

    def test_windowed_large_source_parity(self):
        # The windowed Mosaic evaluator is the product default for
        # sources past the plain kernel's 640 VMEM cap; execute it on
        # hardware against the XLA tiled path. Map-like (smooth)
        # coordinate fields keep per-tile footprints inside the window.
        import os

        from planetmapper_tpu.ops import interp_device
        from planetmapper_tpu.ops.map_pallas import pallas_map_supported

        n = 704  # past the plain-kernel gate
        assert not pallas_map_supported(1, 1, n, n, n, n)
        rng = np.random.default_rng(7)
        img = rng.normal(size=(n, n))
        img[100:104, 200:205] = np.nan
        my, mx = 96, 192
        yy, xx = np.meshgrid(
            np.linspace(3, n - 4, my), np.linspace(3, n - 4, mx),
            indexing='ij',
        )
        x = xx + 5 * np.sin(yy / 40.0)
        y = yy + 4 * np.cos(xx / 60.0)
        out = np.asarray(interp_device.spline_interpolation_device(
            img, x, y, interpolation=3, warn_nan=False,
            propagate_nan=True, spline_smoothing=0, as_numpy=False,
        ))
        # the staging must have accepted the map (otherwise this test
        # silently compares XLA with itself)
        key_hits = [
            k for k, v in interp_device._WINDOWED_CACHE.items()
            if v[0] is not None
        ]
        assert key_hits, 'windowed staging did not engage'
        os.environ['PLANETMAPPER_TPU_MAP_PALLAS'] = '0'
        try:
            ref = np.asarray(interp_device.spline_interpolation_device(
                img, x, y, interpolation=3, warn_nan=False,
                propagate_nan=True, spline_smoothing=0, as_numpy=False,
            ))
        finally:
            os.environ.pop('PLANETMAPPER_TPU_MAP_PALLAS')
        assert np.array_equal(np.isnan(out), np.isnan(ref))
        both = ~np.isnan(ref)
        scale = np.nanmax(np.abs(ref))
        assert np.max(np.abs(out[both] - ref[both])) < 5e-5 * max(
            scale, 1.0
        )

    def test_smooth_device_parity(self):
        # Windowed Mosaic 'smooth' sampler (f32 PCHIP) vs the XLA path
        # (f64 PCHIP): identical NaN mask; values within the f32
        # oversample quantization (~1e-5 relative of the data scale)
        import os

        from planetmapper_tpu.ops import pchip_device

        rng = np.random.default_rng(3)
        img = rng.normal(size=(150, 150))
        img[40:44, 50:53] = np.nan
        # smooth (map-like) coordinate fields so tile footprints are
        # local, matching real map_img usage
        x = np.sort(rng.uniform(-5, 155, (360, 720)), axis=1)
        y = np.sort(rng.uniform(-5, 155, (360, 720)), axis=0)
        kwargs = dict(
            propagate_nan=True, oversample_by=5,
            max_oversampled_img_size=10000,
        )
        pchip_device._SMOOTH_STAGED_CACHE.clear()
        out = pchip_device.smooth_interpolation_device(img, x, y, **kwargs)
        assert pchip_device._SMOOTH_STAGED_CACHE, 'kernel path not taken'
        os.environ['PLANETMAPPER_TPU_MAP_PALLAS'] = '0'
        try:
            pchip_device._SMOOTH_STAGED_CACHE.clear()
            ref = pchip_device.smooth_interpolation_device(
                img, x, y, **kwargs
            )
        finally:
            os.environ.pop('PLANETMAPPER_TPU_MAP_PALLAS')
        assert np.array_equal(np.isnan(out), np.isnan(ref))
        both = ~np.isnan(ref)
        scale = np.nanmax(np.abs(ref))
        assert np.max(np.abs(out[both] - ref[both])) < 1e-4 * max(
            scale, 1.0
        )


@requires_tpu
class TestShardedPallasPipeline:
    """Row-sharded execution runs the Mosaic kernel per device."""

    def test_selection_picks_pallas(self):
        from planetmapper_tpu import BodyXY
        from planetmapper_tpu.pipeline import select_pipeline_impl

        body = BodyXY(
            'Jupiter', observer='EARTH', utc='2005-01-01T00:00:00',
            sz=256,
        )
        _, use_pallas = select_pipeline_impl(body, 256, 256)
        assert use_pallas

    def test_progressive_swap_continuity(self):
        # Cold sessions serve first calls from the XLA graph and swap
        # to the Mosaic kernel when its background build lands; the
        # swap must be value-continuous (~1e-5 grade, the XLA-vs-kernel
        # parity bound) so a streaming consumer never sees a jump.
        from planetmapper_tpu import BodyXY
        from planetmapper_tpu.pipeline import (
            compute_backplanes,
            wait_for_steady_state,
        )

        size = 256
        body = BodyXY(
            'Jupiter', observer='EARTH', utc='2005-01-01T00:00:00',
            sz=size,
        )
        body.set_disc_params(size / 2, size / 2, size * 0.4, 12.3)
        early = compute_backplanes(body, as_numpy=True)
        wait_for_steady_state(body)
        steady = compute_backplanes(body, as_numpy=True)
        for name in ('LON-GRAPHIC', 'EMISSION', 'RING-RADIUS', 'RA'):
            a, b = early[name], steady[name]
            assert (
                np.isnan(a) != np.isnan(b)
            ).sum() <= 8, f'{name}: mask flips across the swap'
            both = np.isfinite(a) & np.isfinite(b)
            d = np.abs(a[both] - b[both])
            if 'LON' in name:
                d = np.minimum(d, 360.0 - d)
            tol = 1.0 if name == 'RING-RADIUS' else 1e-3
            assert d.max() <= tol, f'{name}: {d.max():.2e}'

    def test_sharded_matches_single_chip(self):
        from planetmapper_tpu import BodyXY
        from planetmapper_tpu.parallel import make_mesh, sharded_backplanes
        from planetmapper_tpu.pipeline import compute_backplanes

        size = 256
        body = BodyXY(
            'Jupiter', observer='EARTH', utc='2005-01-01T00:00:00',
            sz=size,
        )
        body.set_disc_params(size / 2, size / 2, size * 0.4, 12.3)
        mesh = make_mesh(1, ('px',))
        out = sharded_backplanes(body, mesh)
        from planetmapper_tpu.pipeline import wait_for_steady_state

        # bit-identity needs the Mosaic kernel serving, not the
        # progressive XLA first-path (which matches only to ~1e-6)
        wait_for_steady_state(body)
        ref = compute_backplanes(body, as_numpy=True)
        for name, plane in ref.items():
            got = np.asarray(out[name])
            # same Mosaic kernel, same shapes, row0=0: bit-identical
            assert np.array_equal(got, plane, equal_nan=True), name

    def test_row0_offsets_match_full_frame(self):
        # Two half-frame runs with row0 offsets reproduce the full frame:
        # the semantics the row-sharded path relies on per device.
        import jax

        from planetmapper_tpu import BodyXY
        from planetmapper_tpu.pipeline import select_pipeline_impl

        size = 256
        body = BodyXY(
            'Jupiter', observer='EARTH', utc='2005-01-01T00:00:00',
            sz=size,
        )
        body.set_disc_params(size / 2, size / 2, size * 0.4, 12.3)
        impl, use_pallas = select_pipeline_impl(body, size, size)
        assert use_pallas
        args = (
            np.asarray(body._get_xy2angular_matrix()),
            np.asarray(body.get_disc_params(), dtype=np.float64),
            np.asarray(body.radii, dtype=np.float64),
            body._get_pipeline_anchors(),
        )
        full = jax.jit(lambda *a: impl(size, size, *a))(*args)
        halves = [
            jax.jit(
                lambda *a, r0=r0: impl(size, 128, *a, row0=r0)
            )(*args)
            for r0 in (0.0, 128.0)
        ]
        for name, plane in full.items():
            got = np.concatenate(
                [np.asarray(h[name]) for h in halves], axis=0
            )
            assert np.array_equal(
                got, np.asarray(plane), equal_nan=True
            ), name
