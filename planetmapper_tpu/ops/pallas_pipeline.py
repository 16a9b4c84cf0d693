"""
Single-kernel Pallas TPU implementation of the fused backplane pipeline.

The XLA graph version (:func:`planetmapper_tpu.pipeline._mixed_impl_fn`)
lowers to ~230 separate fusions per row band; each fusion round-trips
its (band, nx) intermediates through HBM, so at 2048x2048 the program
moves tens of GB per frame against a ~0.5 GB output floor - profiling
shows the pipeline is bound by inter-fusion HBM traffic and per-kernel
overheads, not arithmetic. This module computes ALL 26 default
backplanes (reference planetmapper/body_xy.py:2744-3065's plane list;
the hot loop being replaced is body_xy.py:3195-3225) in ONE
``pallas_call``: every intermediate lives in VMEM/vector registers and
the only HBM traffic is the input row/column term tables and the 26
f32 output tiles.

TPUs have no hardware float64 and Mosaic has no 64-bit types at all, so
every chain whose cancellation exceeds f32 runs in double-single
(hi, lo) f32-pair arithmetic from :mod:`.dsk` (~2^-49 relative - the
same grade the XLA path gets from emulated f64 / graph-level ds).
Numerical structure (recentred anchors, factored rotations, separable
ray trig, Bowring geodetic steps, cancellation-free differences) is
identical to the XLA mixed pipeline; see the section comments there for
the error-budget arguments. Parity is asserted by
``tests/test_pallas_core.py`` against the XLA pipeline on TPU.

Scene-dependent scalars are computed OUTSIDE the kernel in f64 XLA
(cheap: not per-pixel), split into f32 pairs, and passed as one packed
SMEM vector; per-row / per-column separable terms (ray trig, km-plane
affine) are f64-computed 1D tables passed as packed channel matrices.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

from . import dsk

DEG = np.pi / 180.0
CLIGHT = 299792.458  # km/s

#: Output plane order of the kernel's stacked (NP, ny, nx) result.
PLANE_ORDER = (
    'LON-GRAPHIC', 'LAT-GRAPHIC', 'LON-CENTRIC', 'LAT-CENTRIC',
    'RA', 'DEC', 'PIXEL-X', 'PIXEL-Y', 'KM-X', 'KM-Y',
    'ANGULAR-X', 'ANGULAR-Y', 'PHASE', 'INCIDENCE', 'EMISSION',
    'AZIMUTH', 'LOCAL-SOLAR-TIME', 'DISTANCE', 'RADIAL-VELOCITY',
    'DOPPLER', 'LIMB-DISTANCE', 'LIMB-LON-GRAPHIC', 'LIMB-LAT-GRAPHIC',
    'RING-RADIUS', 'RING-LON-GRAPHIC', 'RING-DISTANCE',
)

#: Planes that are NaN everywhere off the disc: for tiles that the
#: optimize_speed disc circle proves fully off-disc, the kernel skips
#: the light-time/intercept chain and these sections at run time and
#: writes NaN directly (~half the tiles of a typical navigated frame).
_DISC_PLANES = (
    'LON-GRAPHIC', 'LAT-GRAPHIC', 'LON-CENTRIC', 'LAT-CENTRIC',
    'PHASE', 'INCIDENCE', 'EMISSION', 'AZIMUTH',
    'LOCAL-SOLAR-TIME', 'DISTANCE', 'RADIAL-VELOCITY', 'DOPPLER',
)

#: Row / column channel layout of the packed 1D term tables.
_ROW_CH = (
    'sar_h', 'sar_l', 'car1_h', 'car1_l',
    'sbr_h', 'sbr_l', 'cbr1_h', 'cbr1_l',
    'kmx_h', 'kmx_l', 'kmy_h', 'kmy_l',
)
_COL_CH = (
    'sac_h', 'sac_l', 'cac1_h', 'cac1_l',
    'sbc_h', 'sbc_l', 'cbc1_h', 'cbc1_l',
    'kmx_h', 'kmx_l', 'kmy_h', 'kmy_l',
)
_N_CH = 16  # padded channel count (last 4 unused)


class _Pack:
    """Builds the packed (1, S) f32 scalar vector during tracing."""

    def __init__(self):
        self.vals: list[Any] = []
        self.idx: dict[str, int] = {}

    def _put(self, name, scalars):
        self.idx[name] = len(self.vals)
        self.vals.extend(scalars)

    def f32(self, name, v):
        import jax.numpy as jnp

        self._put(name, [jnp.asarray(v).astype(jnp.float32)])

    def ds(self, name, v):
        import jax.numpy as jnp

        v = jnp.asarray(v, dtype=jnp.float64)
        h, lo = dsk.split_f64(v)
        self._put(name, [h, lo])

    def vec(self, name, v, n=3):
        import jax.numpy as jnp

        v = jnp.asarray(v)
        self._put(name, [v[i].astype(jnp.float32) for i in range(n)])

    def ds_vec(self, name, v, n=3):
        import jax.numpy as jnp

        v = jnp.asarray(v, dtype=jnp.float64)
        h, lo = dsk.split_f64(v)
        vals = []
        for i in range(n):
            vals.extend([h[i], lo[i]])
        self._put(name, vals)

    def mat(self, name, m):
        import jax.numpy as jnp

        m = jnp.asarray(m).astype(jnp.float32)
        self._put(name, [m[i, j] for i in range(3) for j in range(3)])

    def array(self):
        import jax.numpy as jnp

        pad = (-len(self.vals)) % 8
        vals = self.vals + [jnp.float32(0.0)] * pad
        return jnp.stack(vals)[None, :]


class _Read:
    """Reads the packed scalars back inside the kernel."""

    def __init__(self, idx, ref):
        self.idx = idx
        self.ref = ref

    def _at(self, k):
        return self.ref[0, k]

    def f32(self, name):
        return self._at(self.idx[name])

    def ds(self, name):
        k = self.idx[name]
        return (self._at(k), self._at(k + 1))

    def vec(self, name, n=3):
        k = self.idx[name]
        return [self._at(k + i) for i in range(n)]

    def ds_vec(self, name, n=3):
        k = self.idx[name]
        return [(self._at(k + 2 * i), self._at(k + 2 * i + 1))
                for i in range(n)]

    def mat(self, name):
        k = self.idx[name]
        return [[self._at(k + 3 * i + j) for j in range(3)]
                for i in range(3)]


def _mv(m, v):
    """3x3 scalar-matrix times per-pixel 3-vector (list), f32."""
    return [
        m[i][0] * v[0] + m[i][1] * v[1] + m[i][2] * v[2]
        for i in range(3)
    ]


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _ds_dot(a, b):
    return dsk.add(
        dsk.add(dsk.mul(a[0], b[0]), dsk.mul(a[1], b[1])),
        dsk.mul(a[2], b[2]),
    )


def _unit(v):
    import jax.numpy as jnp
    from jax import lax

    r = lax.rsqrt(_dot(v, v))
    del jnp
    return [v[0] * r, v[1] * r, v[2] * r]


def _vsep(a, b):
    """Angle between unit vectors (SPICE vsep half-angle construction)."""
    import jax.numpy as jnp

    dot = _dot(a, b)
    near = jnp.sqrt(
        (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2
    )
    far = jnp.sqrt(
        (a[0] + b[0]) ** 2 + (a[1] + b[1]) ** 2 + (a[2] + b[2]) ** 2
    )
    return jnp.where(
        dot >= 0.0,
        np.float32(2.0) * dsk.asin(np.float32(0.5) * near),
        np.float32(np.pi)
        - np.float32(2.0) * dsk.asin(np.float32(0.5) * far),
    )


def _mod360_ds(x):
    """x mod 360 in ds for x in (-720, 720): conditional exact adds."""
    import jax.numpy as jnp

    for _ in range(2):
        xa = dsk.add_f(x, np.float32(360.0))
        x = (jnp.where(x[0] < 0.0, xa[0], x[0]),
             jnp.where(x[0] < 0.0, xa[1], x[1]))
    for _ in range(2):
        xs = dsk.add_f(x, np.float32(-360.0))
        x = (jnp.where(x[0] >= 360.0, xs[0], x[0]),
             jnp.where(x[0] >= 360.0, xs[1], x[1]))
    return x


def _bowring_lat(px, py, pz, rho, re32, omf32, e2_32, ep2_32,
                 iters: int = 0):
    """
    Bowring geodetic latitude from the reduced latitude (f32,
    trig-free). ``iters=0`` is the classic one-shot form, exact for
    points ON the (re, rp) spheroid - the biaxial kernel's case.

    ``iters`` refinement steps extend it to OFF-spheroid points:
    triaxial bodies' surface points sit up to (re - rm) inside the
    biaxial geodetic spheroid (CSPICE recpgr converts against (re, f)
    regardless of triaxiality - reference body.py:1030 passes r_eq +
    flattening). The iteration converges for any point outside the
    meridian ellipse's evolute; 4 steps reach f32 noise (~3e-5 deg)
    even for Haumea-class f=0.49 shapes with points ~210 km deep
    (measured; see tests). Eligibility is gated host-side on the
    evolute condition rm/re > e2 (pipeline._kernel_geodetic_iters).
    """
    from jax import lax

    w = rho * omf32
    rb = lax.rsqrt(pz * pz + w * w)
    sin_b = pz * rb
    cos_b = w * rb
    num = pz + ep2_32 * (re32 * omf32) * sin_b * sin_b * sin_b
    den = rho - e2_32 * re32 * cos_b * cos_b * cos_b
    for _ in range(iters):
        rr = lax.rsqrt(num * num + den * den)
        sl = num * rr
        cl = den * rr
        rb2 = lax.rsqrt(omf32 * omf32 * sl * sl + cl * cl)
        sin_b = omf32 * sl * rb2
        cos_b = cl * rb2
        num = pz + ep2_32 * (re32 * omf32) * sin_b * sin_b * sin_b
        den = rho - e2_32 * re32 * cos_b * cos_b * cos_b
    return dsk.atan2(num, den)


def build_pallas_pipeline(
    *,
    positive_west: bool,
    prograde: bool,
    have_sun: bool,
    optimize_speed: bool,
    lst_quant: bool,
    n_lt_iters: int = 2,
    band_rows: int = 64,
    col_tile: int = 128,
    planes: tuple[str, ...] | None = None,
    interpret: bool = False,
    geodetic_iters: int = 0,
):
    """
    Build ``impl(nx, ny, xy2angular, disc, radii, anchors) -> dict`` with
    the same contract as the XLA ``_mixed_impl_fn`` impl, computing all
    26 planes in one Pallas kernel. ``nx``/``ny`` must be multiples of
    ``col_tile``/``band_rows``.

    ``planes`` restricts the kernel to a subset of
    :data:`PLANE_ORDER`: sections whose outputs (and shared
    intermediates) are not requested are omitted at trace time. The
    XLA graph path gets this for free from dead-code elimination; a
    Mosaic kernel computes what it is built with, so the subset must
    be chosen here. Used by the section profiler and by callers that
    stream a few planes at rates where the full set's arithmetic
    would dominate.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = np.float32
    lon_sign = -1.0 if positive_west else 1.0
    spin_sign = 1.0 if prograde else -1.0
    requested = (
        PLANE_ORDER if planes is None
        else tuple(n for n in PLANE_ORDER if n in planes)
    )
    if planes is not None and set(planes) - set(PLANE_ORDER):
        raise ValueError(
            f'unknown planes: {sorted(set(planes) - set(PLANE_ORDER))}'
        )
    NP = len(requested)
    P = {name: i for i, name in enumerate(requested)}

    def need(*names: str) -> bool:
        return any(n in P for n in names)

    def impl(nx, ny, xy2angular, disc, radii, anchors, row0=0.0):
        if ny % band_rows or nx % col_tile:
            raise ValueError(
                f'pallas pipeline needs ny%{band_rows}==0, '
                f'nx%{col_tile}==0, got {ny}x{nx}'
            )
        # ``row0`` (static or traced) offsets the absolute pixel-row
        # coordinate: row-sharded execution (parallel/sharding.py) runs
        # this kernel per device on its block of rows.
        row0 = jnp.asarray(row0, dtype=jnp.float64)

        # ================= XLA preamble: scene scalars (f64) =============
        # Mirrors pipeline._mixed_impl_fn's preamble; see the error-budget
        # comments there. Everything here is per-scene, not per-pixel.
        tau0 = anchors['tau0']
        re = radii[0]
        rp = radii[2]
        flattening = (re - rp) / re
        m_ang = anchors['obsvec2angular']
        m0 = m_ang[0, :]
        targ_rel0 = anchors['targ_pos0'] - anchors['obs_pos']
        targ_vel0 = anchors['targ_vel0']
        o_j = -targ_rel0
        t_ca0 = jnp.dot(targ_rel0, m0)
        q0 = o_j + t_ca0 * m0
        inv_radii = 1.0 / radii
        sp_dist = anchors['subpoint_distance']
        delta0 = sp_dist - t_ca0
        sigma_nf = anchors['target_lt'] * CLIGHT - t_ca0
        rot0 = anchors['rot0']
        rot1 = anchors['rot1']
        rot2h = 0.5 * anchors['rot2']

        # 1D separable ray trig (f64, exact; pipeline.py preamble)
        x1 = lax.iota(jnp.float64, nx)
        y1 = lax.iota(jnp.float64, ny) + row0
        angx_col = xy2angular[0, 0] * x1 + xy2angular[0, 2]
        angx_row = xy2angular[0, 1] * y1
        angy_col = xy2angular[1, 0] * x1 + xy2angular[1, 2]
        angy_row = xy2angular[1, 1] * y1
        k_rad = DEG / 3600.0
        ar = -k_rad * angx_row
        ac = -k_rad * angx_col
        br = k_rad * angy_row
        bc = k_rad * angy_col

        # km-plane separable terms (f64)
        m2 = anchors['angular2km']
        kmx_row = m2[0, 0] * angx_row + m2[0, 1] * angy_row
        kmx_col = m2[0, 0] * angx_col + m2[0, 1] * angy_col
        kmy_row = m2[1, 0] * angx_row + m2[1, 1] * angy_row
        kmy_col = m2[1, 0] * angx_col + m2[1, 1] * angy_col

        def chan(vals):
            h_l = []
            for v in vals:
                h, lo = dsk.split_f64(v)
                h_l.extend([h, lo])
            pad = [jnp.zeros_like(h_l[0])] * (_N_CH - len(h_l))
            return jnp.stack(h_l + pad, axis=-1)  # (n, _N_CH)

        rowt = chan([jnp.sin(ar), jnp.cos(ar) - 1.0,
                     jnp.sin(br), jnp.cos(br) - 1.0,
                     kmx_row, kmy_row])  # (ny, 16)
        colt = chan([jnp.sin(ac), jnp.cos(ac) - 1.0,
                     jnp.sin(bc), jnp.cos(bc) - 1.0,
                     kmx_col, kmy_col]).T  # (16, nx)

        rc = rot0 @ m_ang.T
        rm0 = rot0 @ m0
        rrel0 = rot0 @ targ_rel0
        rq0 = rot0 @ q0

        pk = _Pack()
        pk.ds('rc00', rc[0, 0])  # ds columns for the f64-grade ray build
        pk.ds('rc01', rc[0, 1])
        pk.ds('rc02', rc[0, 2])
        pk.ds('rc10', rc[1, 0])
        pk.ds('rc11', rc[1, 1])
        pk.ds('rc12', rc[1, 2])
        pk.ds('rc20', rc[2, 0])
        pk.ds('rc21', rc[2, 1])
        pk.ds('rc22', rc[2, 2])
        pk.ds_vec('rm0', rm0)
        pk.ds_vec('rrel0', rrel0)
        pk.ds_vec('rq0', rq0)
        pk.ds('t_ca0', t_ca0)
        pk.f32('delta0', delta0)
        pk.f32('sigma_nf', sigma_nf)
        pk.ds('sp_dist', sp_dist)
        pk.f32('sp_dist32', sp_dist)
        pk.ds_vec('inv_radii', inv_radii)
        pk.ds_vec('re_inv_radii', re * inv_radii)
        pk.ds_vec('n_scale', inv_radii * inv_radii * re)
        pk.vec('m0_32', m0)
        pk.ds('re', re)
        pk.f32('re32', re)
        pk.f32('lt_dist', anchors['target_lt'] * CLIGHT)
        # factored-rotation f32 ingredients
        pk.mat('rot0_32', rot0)
        pk.mat('rot1_32', rot1)
        pk.mat('rot2h_32', rot2h)
        pk.mat('r1r0t_32', rot1 @ rot0.T)
        pk.mat('r2hr0t_32', rot2h @ rot0.T)
        pk.vec('rv0_32', rot0 @ targ_vel0)
        pk.vec('rv1_32', rot1 @ targ_vel0)
        pk.vec('rv2h_32', rot2h @ targ_vel0)
        pk.vec('v32', targ_vel0)
        pk.vec('targ_rel0_32', targ_rel0)
        pk.vec('targ_pos0_32', anchors['targ_pos0'])
        pk.vec('obs_vel_32', anchors['obs_vel'])
        # geodetic constants
        e2 = flattening * (2.0 - flattening)
        ep2 = e2 / (1.0 - e2)
        omf = 1.0 - flattening
        pk.f32('e2', e2)
        pk.f32('ep2', ep2)
        pk.f32('omf', omf)
        # angular scaling
        km_per_arcsec = 2.0 * re / (
            2.0 * 60.0 * 60.0 / DEG * jnp.arcsin(
                re / (anchors['target_lt'] * CLIGHT)
            )
        )
        pk.f32('inv_kpa', 1.0 / km_per_arcsec)
        # sun
        if have_sun:
            c_s_j = anchors['sun_pos0'] - anchors['targ_pos0']
            c_o_j = -targ_rel0
            pk.ds_vec('cs_bf', rot0 @ c_s_j)
            pk.ds_vec('co_bf', rot0 @ c_o_j)
            pk.vec('r1_s', rot1 @ c_s_j)
            pk.vec('r2_s', rot2h @ c_s_j)
            pk.vec('r1_o', rot1 @ c_o_j)
            pk.vec('r2_o', rot2h @ c_o_j)
            pk.vec('rsv0_32', rot0 @ anchors['sun_vel0'])
            pk.vec('sun_pos0_32', anchors['sun_pos0'])
            pk.vec('sun_vel0_32', anchors['sun_vel0'])
            pk.f32('sun_depoch', tau0 - anchors['sun_epoch0'])
        pk.ds('solar_lon_e', anchors['solar_lon_e'])
        # limb constants
        o_t = anchors['target_obsvec']
        pk.ds_vec('rot_o_t', rot0 @ o_t)
        pk.ds('a0', jnp.dot(o_t, m0))
        pk.ds_vec('c_off', rot0 @ (o_t - anchors['subpoint_obsvec']))
        pk.ds_vec('spt_c', anchors['subpoint_targvec'])
        pk.vec('spt_c32', anchors['subpoint_targvec'])
        pk.vec('spr32', rot0 @ (-anchors['subpoint_rayvec']))
        # ring constants
        rn = anchors['ring_plane_normal']
        pk.ds_vec('rot_rn', rot0 @ rn)
        pk.ds('rn_m0', jnp.dot(rn, m0))
        pk.ds('ring_const', anchors['ring_plane_constant'])
        pk.f32('ring_const32', anchors['ring_plane_constant'])
        pk.ds_vec('rso_c', rot0 @ anchors['subpoint_obsvec'])
        # disc mask
        if optimize_speed:
            pk.f32('x0', disc[0])
            pk.f32('y0', disc[1])
            r_cut = disc[2] * (jnp.max(radii) / re) * 1.05 + 1.0
            pk.f32('r_cut2', r_cut * r_cut)
        pk.f32('row0', row0)

        scal = pk.array()
        idx = dict(pk.idx)

        # ====================== the kernel ================================
        def kernel(scal_ref, rowt_ref, colt_ref, out_ref, dist_ref):
            sc = _Read(idx, scal_ref)
            i_band = pl.program_id(0)
            j_tile = pl.program_id(1)
            B, T = band_rows, col_tile
            yg = (
                lax.broadcasted_iota(jnp.int32, (B, T), 0)
                + i_band * B
            ).astype(jnp.float32) + sc.f32('row0')
            xg = (
                lax.broadcasted_iota(jnp.int32, (B, T), 1)
                + j_tile * T
            ).astype(jnp.float32)

            def rch(name):
                k = _ROW_CH.index(name)
                return rowt_ref[:, k:k + 1]  # (B, 1)

            def cch(name):
                k = _COL_CH.index(name)
                return colt_ref[k:k + 1, :]  # (1, T)

            def rds(name):
                return (rch(name + '_h'), rch(name + '_l'))

            def cds(name):
                return (cch(name + '_h'), cch(name + '_l'))

            # ---- rays: angle addition over the separable 1D trig, ds ----
            # (pipeline.py 'f64 preamble': sin(ar+ac) = sar cac + car sac)
            sar, car1 = rds('sar'), rds('car1')
            sbr, cbr1 = rds('sbr'), rds('cbr1')
            sac, cac1 = cds('sac'), cds('cac1')
            sbc, cbc1 = cds('sbc'), cds('cbc1')
            sa = dsk.add(
                dsk.add(dsk.mul(sar, cac1), dsk.mul(car1, sac)),
                dsk.add(sar, sac),
            )
            sb = dsk.add(
                dsk.add(dsk.mul(sbr, cbc1), dsk.mul(cbr1, sbc)),
                dsk.add(sbr, sbc),
            )
            dca = dsk.add(
                dsk.sub(dsk.mul(car1, cac1), dsk.mul(sar, sac)),
                dsk.add(car1, cac1),
            )
            dcb = dsk.add(
                dsk.sub(dsk.mul(cbr1, cbc1), dsk.mul(sbr, sbc)),
                dsk.add(cbr1, cbc1),
            )
            dvx = dsk.add(dsk.add(dca, dcb), dsk.mul(dca, dcb))
            dvy = dsk.mul(sa, dsk.add_f(dcb, f32(1.0)))
            dvz = sb
            rcd = [[sc.ds(f'rc{i}{j}') for j in range(3)]
                   for i in range(3)]
            rdd = [
                dsk.add(
                    dsk.add(dsk.mul(dvx, rcd[i][0]),
                            dsk.mul(dvy, rcd[i][1])),
                    dsk.mul(dvz, rcd[i][2]),
                )
                for i in range(3)
            ]
            rm0d = sc.ds_vec('rm0')
            rrel0d = sc.ds_vec('rrel0')
            rq0d = sc.ds_vec('rq0')
            t_ca0d = sc.ds('t_ca0')
            d_bf0 = [dsk.add(rm0d[i], rdd[i]) for i in range(3)]
            d_b32 = [d_bf0[i][0] for i in range(3)]

            # constants shared by the gated disc chain and the
            # always-on RA/Dec / limb / ring sections (the chain
            # shadows its own local copies of several of these)
            r1r0t = sc.mat('r1r0t_32')
            r2hr0t = sc.mat('r2hr0t_32')
            rv0 = sc.vec('rv0_32')
            rv1 = sc.vec('rv1_32')
            rv2h = sc.vec('rv2h_32')
            rot0m = sc.mat('rot0_32')
            nanv = f32(np.nan)
            inv_c = f32(1.0 / CLIGHT)
            inv_deg = f32(1.0 / DEG)
            re32 = sc.f32('re32')
            e2_32 = sc.f32('e2')
            ep2_32 = sc.f32('ep2')
            omf32 = sc.f32('omf')
            ird = sc.ds_vec('inv_radii')

            # ---- the disc chain: light-time fixed point, intercept and
            # every on-disc-only section. Runs per tile, gated off for
            # tiles fully outside the disc circle (optimize_speed).
            def disc_chain():
                tp = _ds_dot(rrel0d, rdd)
                # q_bf0 = rq0 + (t_ca0 + tp) rdd + tp rm0
                tsum = dsk.add(t_ca0d, tp)
                q_bf0 = [
                    dsk.add(
                        dsk.add(rq0d[i], dsk.mul(tsum, rdd[i])),
                        dsk.mul(tp, rm0d[i]),
                    )
                    for i in range(3)
                ]
                q_b32 = [q_bf0[i][0] for i in range(3)]
                r1q = _mv(r1r0t, q_b32)
                r2q = _mv(r2hr0t, q_b32)
                r1d = _mv(r1r0t, d_b32)
                r2d = _mv(r2hr0t, d_b32)

                def corrs(dt):
                    dt2 = dt * dt
                    dt3 = dt2 * dt
                    cq = [
                        dt * (r1q[i] - rv0[i]) + dt2 * (r2q[i] - rv1[i])
                        - dt3 * rv2h[i]
                        for i in range(3)
                    ]
                    cd = [dt * r1d[i] + dt2 * r2d[i] for i in range(3)]
                    return cq, cd

                # ---- f32 light-time fixed point (pipeline.py) ----------------
                inv_c = f32(1.0 / CLIGHT)
                tp32 = tp[0]
                dtau_base = (sc.f32('delta0') - tp32) * inv_c
                sigma_nf32 = sc.f32('sigma_nf') - tp32
                inv_r32 = [sc.ds_vec('inv_radii')[i][0] for i in range(3)]
                re_ir32 = [sc.ds_vec('re_inv_radii')[i][0] for i in range(3)]
                re32 = sc.f32('re32')
                dtau = dtau_base
                for _ in range(n_lt_iters):
                    cq, cd = corrs(dtau)
                    u = [(q_b32[i] + cq[i]) * inv_r32[i] for i in range(3)]
                    v = [(d_b32[i] + cd[i]) * re_ir32[i] for i in range(3)]
                    qa = _dot(v, v)
                    qb = _dot(u, v)
                    qc = _dot(u, u) - f32(1.0)
                    dsc = qb * qb - qa * qc
                    ok = dsc >= 0.0
                    sig = (
                        (-qb - jnp.sqrt(jnp.where(ok, dsc, f32(0.0)))) / qa
                        * re32
                    )
                    sig = jnp.where(ok, sig, sigma_nf32)
                    dtau = dtau_base - sig * inv_c

                # ---- ds intercept (pipeline.py 'f64 intercept') --------------
                corr_q, corr_d = corrs(dtau)
                q_bf = [dsk.add_f(q_bf0[i], corr_q[i]) for i in range(3)]
                d_bf = [dsk.add_f(d_bf0[i], corr_d[i]) for i in range(3)]
                ird = sc.ds_vec('inv_radii')
                reird = sc.ds_vec('re_inv_radii')
                u_d = [dsk.mul(q_bf[i], ird[i]) for i in range(3)]
                v_d = [dsk.mul(d_bf[i], reird[i]) for i in range(3)]
                qa_d = _ds_dot(v_d, v_d)
                qb_d = _ds_dot(u_d, v_d)
                qc_d = dsk.add_f(_ds_dot(u_d, u_d), f32(-1.0))
                dsc_d = dsk.sub(dsk.sqr(qb_d), dsk.mul(qa_d, qc_d))
                found = dsc_d[0] >= 0.0
                dsc_pos = (jnp.where(found, dsc_d[0], f32(0.0)),
                           jnp.where(found, dsc_d[1], f32(0.0)))
                red = sc.ds('re')
                sigma_d = dsk.mul(
                    dsk.mul(
                        dsk.sub(dsk.neg(qb_d), dsk.sqrt(dsc_pos)),
                        dsk.recip(qa_d),
                    ),
                    red,
                )
                dist_d = dsk.add(dsk.add(t_ca0d, tp), sigma_d)
                found = found & (dist_d[0] >= 0.0)
                nanv = f32(np.nan)
                sigma_d = (jnp.where(found, sigma_d[0], nanv),
                           jnp.where(found, sigma_d[1], f32(0.0)))
                spoint = [
                    dsk.add(q_bf[i], dsk.mul(sigma_d, d_bf[i]))
                    for i in range(3)
                ]
                dist_s = (jnp.where(found, dist_d[0], sc.f32('lt_dist')),
                          jnp.where(found, dist_d[1], f32(0.0)))

                if optimize_speed:
                    dx = xg - sc.f32('x0')
                    dy = yg - sc.f32('y0')
                    off_disc = dx * dx + dy * dy > sc.f32('r_cut2')
                    found = found & ~off_disc
                spoint = [
                    (jnp.where(found, s[0], nanv),
                     jnp.where(found, s[1], f32(0.0)))
                    for s in spoint
                ]

                # post-loop epoch: dtau = (sp_dist - dist)/c, ds difference
                dtau32 = dsk.mul_f(
                    dsk.sub(sc.ds('sp_dist'), dist_s), inv_c
                )[0]

                # ---- lon/lat (pipeline.py 'lon/lat') -------------------------
                px32, py32, pz32 = spoint[0][0], spoint[1][0], spoint[2][0]
                rho32 = jnp.sqrt(px32 * px32 + py32 * py32)
                e2_32 = sc.f32('e2')
                ep2_32 = sc.f32('ep2')
                omf32 = sc.f32('omf')
                inv_deg = f32(1.0 / DEG)
                if need('LON-GRAPHIC', 'LON-CENTRIC', 'LOCAL-SOLAR-TIME'):
                    lon_e = dsk.atan2_ds(spoint[1], spoint[0])
                if 'LON-GRAPHIC' in P:
                    lon_deg = dsk.mul_f(lon_e, f32(lon_sign / DEG))
                    lon_graphic = _mod360_ds(lon_deg)
                    out_ref[P['LON-GRAPHIC']] = jnp.where(
                        found, lon_graphic[0], nanv
                    )
                if 'LAT-GRAPHIC' in P:
                    lat_gd = _bowring_lat(
                        px32, py32, pz32, rho32, re32, omf32, e2_32,
                        ep2_32, iters=geodetic_iters,
                    )
                    out_ref[P['LAT-GRAPHIC']] = jnp.where(
                        found, lat_gd * inv_deg, nanv
                    )
                if 'LON-CENTRIC' in P:
                    lon_c = _mod360_ds(dsk.mul_f(lon_e, f32(1.0 / DEG)))
                    out_ref[P['LON-CENTRIC']] = jnp.where(
                        found, lon_c[0], nanv
                    )
                if 'LAT-CENTRIC' in P:
                    out_ref[P['LAT-CENTRIC']] = jnp.where(
                        found, dsk.atan2(pz32, rho32) * inv_deg, nanv
                    )

                # ---- illumination (f32; pipeline.py 'illumination') ----------
                rot1m = sc.mat('rot1_32')
                rot2hm = sc.mat('rot2h_32')
                sp32 = [px32, py32, pz32]
                # bf2j = (rot0 + rot1 dtau + rot2h dtau^2)^T
                dt2 = dtau32 * dtau32

                def bf2j(vv):
                    return [
                        (rot0m[0][i] + rot1m[0][i] * dtau32
                         + rot2hm[0][i] * dt2) * vv[0]
                        + (rot0m[1][i] + rot1m[1][i] * dtau32
                           + rot2hm[1][i] * dt2) * vv[1]
                        + (rot0m[2][i] + rot1m[2][i] * dtau32
                           + rot2hm[2][i] * dt2) * vv[2]
                        for i in range(3)
                    ]

                v32 = sc.vec('v32')
                need_u_obs = need(
                    'PHASE', 'EMISSION', 'RADIAL-VELOCITY', 'DOPPLER'
                )
                need_u_sun = have_sun and need('PHASE', 'INCIDENCE',
                                               'AZIMUTH')
                if need_u_obs or need_u_sun:
                    point_j = bf2j(sp32)
                if need_u_obs:
                    trel = sc.vec('targ_rel0_32')
                    srfvec = [
                        trel[i] + v32[i] * dtau32 + point_j[i]
                        for i in range(3)
                    ]
                    u_obs = _unit([-srfvec[0], -srfvec[1], -srfvec[2]])
                if need_u_sun:
                    tpos = sc.vec('targ_pos0_32')
                    point_ssb = [
                        tpos[i] + v32[i] * dtau32 + point_j[i]
                        for i in range(3)
                    ]
                    spos = sc.vec('sun_pos0_32')
                    svel = sc.vec('sun_vel0_32')
                    sun_off = [spos[i] - point_ssb[i] for i in range(3)]
                    lt_s = jnp.sqrt(_dot(sun_off, sun_off)) * inv_c
                    sun_dtau = sc.f32('sun_depoch') + dtau32 - lt_s
                    sun_dir = [
                        spos[i] + svel[i] * sun_dtau - point_ssb[i]
                        for i in range(3)
                    ]
                    u_sun = _unit(sun_dir)
                elif need('PHASE', 'INCIDENCE'):
                    u_sun = [jnp.full_like(px32, np.nan)] * 3
                if need('INCIDENCE', 'EMISSION'):
                    n_bf = [
                        sp32[i] * (inv_r32[i] * inv_r32[i]) for i in range(3)
                    ]
                    n_bf = _unit(n_bf)
                    n_j = bf2j(n_bf)
                if 'PHASE' in P:
                    out_ref[P['PHASE']] = _vsep(u_sun, u_obs) * inv_deg
                if 'INCIDENCE' in P:
                    out_ref[P['INCIDENCE']] = _vsep(n_j, u_sun) * inv_deg
                if 'EMISSION' in P:
                    out_ref[P['EMISSION']] = _vsep(n_j, u_obs) * inv_deg

                # ---- azimuth (ds projections; pipeline.py 'Azimuth') ---------
                if 'AZIMUTH' not in P:
                    pass
                elif have_sun:
                    csd = sc.ds_vec('cs_bf')
                    cod = sc.ds_vec('co_bf')
                    r1s = sc.vec('r1_s')
                    r2s = sc.vec('r2_s')
                    r1o = sc.vec('r1_o')
                    r2o = sc.vec('r2_o')
                    rsv0 = sc.vec('rsv0_32')
                    nsc = sc.ds_vec('n_scale')
                    s_v, o_v, n_v = [], [], []
                    for i in range(3):
                        sp_i = spoint[i]
                        corr_s = (
                            r1s[i] * dtau32 + r2s[i] * dt2
                            + rsv0[i] * sun_dtau
                            - rv0[i] * dtau32 - rv1[i] * dt2
                        )
                        corr_o = (
                            r1o[i] * dtau32 + r2o[i] * dt2
                            - rv0[i] * dtau32 - rv1[i] * dt2
                        )
                        s_v.append(
                            dsk.add_f(dsk.sub(csd[i], sp_i), corr_s)
                        )
                        o_v.append(
                            dsk.add_f(dsk.sub(cod[i], sp_i), corr_o)
                        )
                        n_v.append(dsk.mul(sp_i, nsc[i]))
                    nn_d = _ds_dot(n_v, n_v)
                    ns_d = _ds_dot(n_v, s_v)
                    no_d = _ds_dot(n_v, o_v)
                    a_v = [
                        dsk.sub(dsk.mul(s_v[i], nn_d),
                                dsk.mul(n_v[i], ns_d))[0]
                        for i in range(3)
                    ]
                    b_v = [
                        dsk.sub(dsk.mul(o_v[i], nn_d),
                                dsk.mul(n_v[i], no_d))[0]
                        for i in range(3)
                    ]
                    crx = a_v[1] * b_v[2] - a_v[2] * b_v[1]
                    cry = a_v[2] * b_v[0] - a_v[0] * b_v[2]
                    crz = a_v[0] * b_v[1] - a_v[1] * b_v[0]
                    saz = jnp.sqrt(crx * crx + cry * cry + crz * crz)
                    caz = _dot(a_v, b_v)
                    out_ref[P['AZIMUTH']] = (
                        f32(np.pi) - dsk.atan2(saz, caz)
                    ) * inv_deg
                else:
                    out_ref[P['AZIMUTH']] = jnp.full_like(px32, np.nan)

                # ---- local solar time (ds; pipeline.py 'local solar time') ---
                if 'LOCAL-SOLAR-TIME' in P:
                    sol = sc.ds('solar_lon_e')
                    lst = dsk.add_f(
                        dsk.mul_pair(
                            dsk.sub(lon_e, sol),
                            dsk.const(spin_sign * 12.0 / np.pi),
                        ),
                        f32(12.0),
                    )
                    for _ in range(2):
                        la = dsk.add_f(lst, f32(24.0))
                        lst = (jnp.where(lst[0] < 0.0, la[0], lst[0]),
                               jnp.where(lst[0] < 0.0, la[1], lst[1]))
                    for _ in range(2):
                        ls = dsk.add_f(lst, f32(-24.0))
                        lst = (jnp.where(lst[0] >= 24.0, ls[0], lst[0]),
                               jnp.where(lst[0] >= 24.0, ls[1], lst[1]))
                    if lst_quant:
                        # floor(lst * 3600)/3600 with the ds value: hi*3600
                        # is not exact in f32; use ds mul + a lo-aware floor
                        m = dsk.mul_f(lst, f32(3600.0))
                        fl = jnp.floor(m[0])
                        frac = (m[0] - fl) + m[1]
                        fl = jnp.where(frac >= 1.0, fl + f32(1.0), fl)
                        fl = jnp.where(frac < 0.0, fl - f32(1.0), fl)
                        # correctly-rounded (matches f64/3600 -> f32)
                        lst_v = fl / f32(3600.0)
                    else:
                        lst_v = lst[0]
                    out_ref[P['LOCAL-SOLAR-TIME']] = jnp.where(
                        found, lst_v, nanv
                    )

                # ---- state (f32; pipeline.py 'state') ------------------------
                if 'DISTANCE' in P:
                    out_ref[P['DISTANCE']] = jnp.where(
                        found, dist_s[0], nanv
                    )

                if need('RADIAL-VELOCITY', 'DOPPLER'):
                    def bf2j_dot(vv):
                        return [
                            (rot1m[0][i] + f32(2.0) * rot2hm[0][i] * dtau32)
                            * vv[0]
                            + (rot1m[1][i]
                               + f32(2.0) * rot2hm[1][i] * dtau32)
                            * vv[1]
                            + (rot1m[2][i]
                               + f32(2.0) * rot2hm[2][i] * dtau32)
                            * vv[2]
                            for i in range(3)
                        ]

                    p_vel = bf2j_dot(sp32)
                    p_vel = [v32[i] + p_vel[i] for i in range(3)]
                    ovel = sc.vec('obs_vel_32')
                    rhat = [-u_obs[0], -u_obs[1], -u_obs[2]]
                    rv_t = _dot(rhat, p_vel)
                    rv_o = _dot(rhat, ovel)
                    dltdt = (rv_t - rv_o) / (f32(CLIGHT) + rv_t)
                    vel = [p_vel[i] * (f32(1.0) - dltdt) - ovel[i]
                           for i in range(3)]
                    rv = _dot(rhat, vel)
                    if 'RADIAL-VELOCITY' in P:
                        out_ref[P['RADIAL-VELOCITY']] = jnp.where(
                            found, rv, nanv
                        )
                    if 'DOPPLER' in P:
                        beta = rv * inv_c
                        out_ref[P['DOPPLER']] = jnp.sqrt(
                            (f32(1.0) + beta) / (f32(1.0) - beta)
                        )


                # ring-occlusion term for the (ungated) ring section:
                # +inf where no surface intercept -> hidden stays False
                dist_ref[:, :] = jnp.where(found, dist_s[0], f32(np.inf))

            def off_tile():
                blk = jnp.full((B, T), nanv, f32)
                for _n in _DISC_PLANES:
                    if _n in P:
                        out_ref[P[_n]] = blk
                dist_ref[:, :] = jnp.full((B, T), np.float32(np.inf), f32)

            chain_needed = need(*_DISC_PLANES) or need(
                'RING-RADIUS', 'RING-LON-GRAPHIC', 'RING-DISTANCE'
            )
            if chain_needed and optimize_speed:
                # Tile-level disc test: closest point of this tile's
                # pixel rectangle to the disc centre vs the same r_cut
                # circle the per-pixel mask uses. Fully-off tiles skip
                # the whole chain at run time.
                fx0 = sc.f32('x0')
                fy0 = sc.f32('y0')
                tx0 = (j_tile * T).astype(jnp.float32)
                ty0 = (i_band * B).astype(jnp.float32) + sc.f32('row0')
                ddx = jnp.clip(fx0, tx0, tx0 + f32(T - 1)) - fx0
                ddy = jnp.clip(fy0, ty0, ty0 + f32(B - 1)) - fy0
                # Skip only on a *proven* miss: NaN disc params compare
                # False here, so degenerate navigation conservatively
                # runs the chain (matching the per-pixel mask) instead
                # of blanking the frame.
                miss = ddx * ddx + ddy * ddy > sc.f32('r_cut2')
                pl.when(jnp.logical_not(miss))(disc_chain)
                pl.when(miss)(off_tile)
            elif chain_needed:
                disc_chain()

            # ---- RA/Dec: J2000 f32 rays (pipeline.py 'RA/Dec') -----------
            # dd32 = rot0^T @ rdd32 (rot0 orthonormal)
            rdd32 = [rdd[i][0] for i in range(3)]
            if need('RA', 'DEC'):
                dj = [
                    rot0m[0][i] * rdd32[0] + rot0m[1][i] * rdd32[1]
                    + rot0m[2][i] * rdd32[2]
                    for i in range(3)
                ]
                m0j = sc.vec('m0_32')
                djx = m0j[0] + dj[0]
                djy = m0j[1] + dj[1]
                djz = m0j[2] + dj[2]
                if 'RA' in P:
                    ra = dsk.atan2(djy, djx)
                    ra = jnp.where(ra < 0.0, ra + f32(2.0 * np.pi), ra)
                    out_ref[P['RA']] = ra * inv_deg
                if 'DEC' in P:
                    out_ref[P['DEC']] = (
                        dsk.atan2(djz, jnp.sqrt(djx * djx + djy * djy))
                        * inv_deg
                    )

            # ---- pixel / km / angular ------------------------------------
            if 'PIXEL-X' in P:
                out_ref[P['PIXEL-X']] = xg
            if 'PIXEL-Y' in P:
                out_ref[P['PIXEL-Y']] = yg
            if need('KM-X', 'KM-Y', 'ANGULAR-X', 'ANGULAR-Y'):
                km_x = dsk.add(rds('kmx'), cds('kmx'))
                km_y = dsk.add(rds('kmy'), cds('kmy'))
                inv_kpa = sc.f32('inv_kpa')
                if 'KM-X' in P:
                    out_ref[P['KM-X']] = km_x[0] + jnp.zeros_like(xg)
                if 'KM-Y' in P:
                    out_ref[P['KM-Y']] = km_y[0] + jnp.zeros_like(xg)
                if 'ANGULAR-X' in P:
                    out_ref[P['ANGULAR-X']] = (
                        km_x[0] * inv_kpa + jnp.zeros_like(xg)
                    )
                if 'ANGULAR-Y' in P:
                    out_ref[P['ANGULAR-Y']] = (
                        km_y[0] * inv_kpa + jnp.zeros_like(xg)
                    )

            # ---- limb (ds chains; pipeline.py 'limb coordinates') --------
            need_limb = need(
                'LIMB-DISTANCE', 'LIMB-LON-GRAPHIC', 'LIMB-LAT-GRAPHIC'
            )
            spd = sc.f32('sp_dist32')
            spr = sc.vec('spr32')
            if need_limb:
                rotot = sc.ds_vec('rot_o_t')
                a_dot = _ds_dot(rotot, rdd)
                t_d = dsk.add(a_dot, sc.ds('a0'))
                p_off = [
                    dsk.sub(dsk.mul(t_d, d_bf0[i]), rotot[i])
                    for i in range(3)
                ]
                dot_a = _ds_dot(p_off, p_off)
                coff = sc.ds_vec('c_off')
                off_d = [dsk.add(p_off[i], coff[i]) for i in range(3)]
                off32 = [off_d[i][0] for i in range(3)]
                amo = _dot(spr, off32)
                num_l = f32(2.0) * amo + _dot(off32, off32)
                r1_l = num_l / (f32(2.0) * spd)
                dtau_l = -(num_l / (f32(2.0) * spd + r1_l)) * inv_c
                dtl2 = dtau_l * dtau_l
                c1 = _mv(r1r0t, off32)
                c2 = _mv(r2hr0t, off32)
                sptc = sc.ds_vec('spt_c')
                near_d = [
                    dsk.add_f(
                        dsk.add(off_d[i], sptc[i]),
                        dtau_l * c1[i] + dtl2 * c2[i],
                    )
                    for i in range(3)
                ]
                nt_d = [dsk.mul(near_d[i], ird[i]) for i in range(3)]
                ss_d = _ds_dot(nt_d, nt_d)
                scale = lax.rsqrt(ss_d[0])
                lx = near_d[0][0] * scale
                ly = near_d[1][0] * scale
                lz = near_d[2][0] * scale
                if 'LIMB-LON-GRAPHIC' in P:
                    limb_lon = dsk.atan2(ly, lx)
                    llg = _mod360_ds((
                        f32(lon_sign / DEG) * limb_lon,
                        jnp.zeros_like(limb_lon),
                    ))
                    out_ref[P['LIMB-LON-GRAPHIC']] = llg[0]
                if 'LIMB-LAT-GRAPHIC' in P:
                    lrho = jnp.sqrt(lx * lx + ly * ly)
                    limb_lat = _bowring_lat(
                        lx, ly, lz, lrho, re32, omf32, e2_32, ep2_32,
                        iters=geodetic_iters,
                    )
                    out_ref[P['LIMB-LAT-GRAPHIC']] = limb_lat * inv_deg
                if 'LIMB-DISTANCE' in P:
                    dot_b = dsk.mul(
                        _ds_dot(near_d, near_d), dsk.recip(ss_d)
                    )
                    den_l = dsk.add(dsk.sqrt(dot_a), dsk.sqrt(dot_b))
                    out_ref[P['LIMB-DISTANCE']] = dsk.mul(
                        dsk.sub(dot_a, dot_b), dsk.recip(den_l)
                    )[0]

            # ---- ring plane (ds; pipeline.py 'ring plane') ---------------
            if need('RING-RADIUS', 'RING-LON-GRAPHIC', 'RING-DISTANCE'):
                rotrn = sc.ds_vec('rot_rn')
                denom_d = dsk.add(_ds_dot(rotrn, rdd), sc.ds('rn_m0'))
                denom32 = denom_d[0]
                rconst32 = sc.f32('ring_const32')
                in_plane = (jnp.abs(denom32) == 0.0) & (
                    jnp.abs(rconst32) == 0.0
                )
                parallel = (jnp.abs(denom32) == 0.0) & ~in_plane
                safe = jnp.abs(denom32) > f32(1e-30)
                denom_safe = (
                    jnp.where(
                        safe, denom_d[0],
                        jnp.where(
                            denom32 < 0.0, f32(-1e-30), f32(1e-30)
                        ),
                    ),
                    jnp.where(safe, denom_d[1], f32(0.0)),
                )
                s_r_d = dsk.mul(
                    sc.ds('ring_const'), dsk.recip(denom_safe)
                )
                s_r = s_r_d[0]
                ring_ok = (~parallel) & (~in_plane) & (s_r >= 0.0)
                hidden = dist_ref[:, :] < s_r
                ring_invalid = (~ring_ok) | hidden
                if need('RING-RADIUS', 'RING-LON-GRAPHIC'):
                    rsoc = sc.ds_vec('rso_c')
                    off_r = [
                        dsk.sub(dsk.mul(s_r_d, d_bf0[i]), rsoc[i])[0]
                        for i in range(3)
                    ]
                    amo_r = _dot(spr, off_r)
                    num_r = f32(2.0) * amo_r + _dot(off_r, off_r)
                    r1_r = num_r / (f32(2.0) * spd)
                    dtau_r = -(num_r / (f32(2.0) * spd + r1_r)) * inv_c
                    dtr2 = dtau_r * dtau_r
                    cr1 = _mv(r1r0t, off_r)
                    cr2 = _mv(r2hr0t, off_r)
                    sptc32 = sc.vec('spt_c32')
                    rx = (sptc32[0] + off_r[0]
                          + dtau_r * cr1[0] + dtr2 * cr2[0])
                    ry = (sptc32[1] + off_r[1]
                          + dtau_r * cr1[1] + dtr2 * cr2[1])
                    rz = (sptc32[2] + off_r[2]
                          + dtau_r * cr1[2] + dtr2 * cr2[2])
                if 'RING-RADIUS' in P:
                    rrho = jnp.sqrt(rx * rx + ry * ry)
                    # Bowring with 2 refinement steps (exterior points)
                    rw = rrho * omf32
                    rrb = lax.rsqrt(rz * rz + rw * rw)
                    rsb = rz * rrb
                    rcb = rw * rrb
                    for _ in range(2):
                        rnum = (rz + ep2_32 * (re32 * omf32)
                                * rsb * rsb * rsb)
                        rden = rrho - e2_32 * re32 * rcb * rcb * rcb
                        rr2 = lax.rsqrt(rnum * rnum + rden * rden)
                        rsl = rnum * rr2
                        rcl = rden * rr2
                        rb2 = lax.rsqrt(
                            omf32 * omf32 * rsl * rsl + rcl * rcl
                        )
                        rsb = omf32 * rsl * rb2
                        rcb = rcl * rb2
                    rnum = (rz + ep2_32 * (re32 * omf32)
                            * rsb * rsb * rsb)
                    rden = rrho - e2_32 * re32 * rcb * rcb * rcb
                    rr2 = lax.rsqrt(rnum * rnum + rden * rden)
                    rsl = rnum * rr2
                    rcl = rden * rr2
                    n_r = re32 * lax.rsqrt(f32(1.0) - e2_32 * rsl * rsl)
                    ring_alt = (
                        rrho * rcl + rz * rsl
                        - n_r * (f32(1.0) - e2_32 * rsl * rsl)
                    )
                    ring_radius = ring_alt + re32
                    out_ref[P['RING-RADIUS']] = jnp.where(
                        ring_invalid, nanv, ring_radius
                    )
                if 'RING-LON-GRAPHIC' in P:
                    ring_lon_e = dsk.atan2(ry, rx)
                    rl = _mod360_ds((
                        f32(lon_sign / DEG) * ring_lon_e,
                        jnp.zeros_like(ring_lon_e),
                    ))
                    out_ref[P['RING-LON-GRAPHIC']] = jnp.where(
                        ring_invalid, nanv, rl[0]
                    )
                if 'RING-DISTANCE' in P:
                    out_ref[P['RING-DISTANCE']] = jnp.where(
                        ring_invalid, nanv, s_r
                    )

        grid = (ny // band_rows, nx // col_tile)
        # Under ``jax.shard_map`` (parallel/sharding.py sharded_backplanes)
        # the traced inputs carry varying-manual-axes (vma) metadata and
        # check_vma requires the pallas_call out_shape to declare its own:
        # the output varies exactly on the union of the input axes (row0
        # is derived from axis_index, so ``scal``/``rowt`` vary on the
        # sharded row axis). Outside shard_map every vma is frozenset()
        # and this is a no-op.
        out_vma = frozenset().union(
            *(getattr(jax.typeof(a), 'vma', None) or frozenset()
              for a in (scal, rowt, colt))
        )
        stacked = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (NP, ny, nx), jnp.float32, vma=out_vma
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, scal.shape[1]),
                    lambda i, j: (np.int32(0), np.int32(0)),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(
                    (band_rows, _N_CH),
                    lambda i, j: (i, np.int32(0)),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (_N_CH, col_tile),
                    lambda i, j: (np.int32(0), j),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (NP, band_rows, col_tile),
                lambda i, j: (np.int32(0), i, j),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((band_rows, col_tile), jnp.float32),
            ],
            interpret=interpret,
        )(scal, rowt, colt)

        out: dict[str, Any] = {}
        for k, name in enumerate(requested):
            plane = stacked[k]
            if name == 'RADIAL-VELOCITY':
                plane = plane.astype(jnp.float64)
            out[name] = plane
        return out

    return impl


def pallas_pipeline_supported(nx_b: int, ny_b: int) -> bool:
    """Whether the Pallas kernel covers this bucketed shape on this
    backend (TPU only; small grids stay on the XLA path where dispatch
    overhead dominates anyway)."""
    import jax

    if os.environ.get('PLANETMAPPER_TPU_PALLAS', '1') == '0':
        return False
    if jax.default_backend() in ('cpu',):
        return False
    return nx_b % 128 == 0 and ny_b % 64 == 0
