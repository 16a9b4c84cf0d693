"""
Fused backplane pipeline: every default backplane computed in ONE jitted
XLA program over the full pixel grid.

This is the performance core of the framework - the TPU-first redesign of
the reference's hot path (body_xy.py:3195-3225: two scalar CSPICE calls per
on-disc pixel, ~10 s for a 500x500 frame). Design:

- **Anchor + derivative linearisation**: per-pixel light-time retargeting
  needs the target position, sun position and frame rotation at a slightly
  different epoch for every pixel (spread ~ +/- r/c ~ 0.25 s). Instead of
  evaluating Chebyshev series and IAU Euler-angle trigonometry per pixel,
  the scene anchors (positions, velocities, rotation matrix and its first
  two time derivatives at the sub-observer epoch) are computed once on the
  host, and per-pixel values come from Taylor expansion. The truncation
  errors are ~1e-9 rad in orientation and sub-metre in position - orders of
  magnitude below the sub-millidegree requirement, and validated against
  the exact per-plane pipeline in the test suite.
- **Everything fused**: the ray generation, ellipsoid intercepts, geodetic
  conversions, illumination angles, states, limb and ring-plane coordinates
  share intermediates inside one XLA computation, so HBM traffic is a
  handful of (ny, nx) arrays instead of dozens of kernel round trips.
- **Shape-stable jit**: disc parameters, time and radii are traced inputs;
  one compilation serves every disc fit iteration and observation epoch of
  a configuration.

The pipeline is differentiable end-to-end (JAX), which also enables
gradient-based disc fitting (see :mod:`planetmapper_tpu.parallel.fit`).
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np

from .core.ephemeris import CLIGHT
from .core import geometry as geom

DEG = math.pi / 180.0


def compute_scene_anchors(body) -> dict[str, np.ndarray]:
    """
    Host-side anchor computation for a Body's scene: positions/velocities
    and frame rotation derivatives at the sub-observer epoch. One-time cost
    per (body, time); all values become device constants for the pipeline.
    """
    import jax
    import jax.numpy as jnp

    engine = body._engine
    et = body.et
    tau0 = body._subpoint_et

    rot_fn = engine.frame_model.j2000_to_bodyfixed_matrix
    r0 = rot_fn(tau0)
    r1 = jax.jacfwd(rot_fn)(tau0)
    r2 = jax.jacfwd(jax.jacfwd(rot_fn))(tau0)

    targ_state = np.asarray(engine._pos_t(tau0))
    obs_state = np.asarray(engine._pos_o(et))

    # Sun anchor: apparent sun epoch from the target at tau0
    lt_s = 0.0
    sun_state = None
    if engine._pos_s is not None:
        for _ in range(4):
            sun_state = np.asarray(engine._pos_s(tau0 - lt_s))
            lt_s = float(
                np.linalg.norm(sun_state[:3] - targ_state[:3]) / CLIGHT
            )
        sun_anchor_epoch = tau0 - lt_s
        sun_state = np.asarray(engine._pos_s(sun_anchor_epoch))
    else:
        sun_anchor_epoch = tau0
        sun_state = np.full(6, np.nan)

    sub = body._sub_consts()
    anchors = dict(
        et=np.float64(et),
        tau0=np.float64(tau0),
        rot0=np.asarray(r0),
        rot1=np.asarray(r1),
        rot2=np.asarray(r2),
        targ_pos0=targ_state[:3],  # target SSB position at tau0
        targ_vel0=targ_state[3:],
        obs_pos=obs_state[:3],  # observer SSB position at et
        obs_vel=obs_state[3:],
        sun_pos0=sun_state[:3],
        sun_vel0=sun_state[3:],
        sun_epoch0=np.float64(sun_anchor_epoch),
        target_lt=np.float64(body.target_light_time),
        target_obsvec=np.asarray(body._target_obsvec),
        subpoint_targvec=np.asarray(sub['subpoint_targvec']),
        subpoint_rayvec=np.asarray(sub['subpoint_rayvec']),
        subpoint_obsvec=np.asarray(sub['subpoint_obsvec']),
        subpoint_distance=np.float64(sub['subpoint_distance']),
        ring_plane_normal=np.asarray(body._ring_plane[0]),
        ring_plane_constant=np.float64(body._ring_plane[1]),
        solar_lon_e=np.float64(
            np.asarray(
                engine.solar_longitude(et - body.target_light_time)
            )
        ),
        obsvec2angular=np.asarray(body._get_obsvec2angular_matrix()),
        angular2km=np.asarray(body._get_angular2km_matrix()),
    )
    return anchors


def _rot_at(anchors, dtau):
    """Frame rotation J2000->body-fixed at tau0 + dtau (2nd order Taylor)."""
    return (
        anchors['rot0']
        + anchors['rot1'] * dtau[..., None, None]
        + 0.5 * anchors['rot2'] * dtau[..., None, None] ** 2
    )


def _rot_dot_at(anchors, dtau):
    return anchors['rot1'] + anchors['rot2'] * dtau[..., None, None]


def _matvec(m, v):
    import jax.numpy as jnp

    return jnp.einsum('...ij,...j->...i', m, v)


def rect_to_geodetic_surface(v, re, f, n_iter: int = 4):
    """
    Bowring geodetic conversion for points on (or near) the spheroid
    surface: converges to machine precision in a few iterations for
    |alt| << re, far cheaper than the exact bisection solve in
    :func:`geometry.rect_to_geodetic` (which remains the general-purpose
    path, valid deep inside the body).
    """
    import jax.numpy as jnp

    x = v[..., 0]
    y = v[..., 1]
    z = v[..., 2]
    rp = re * (1.0 - f)
    e2 = f * (2.0 - f)
    ep2 = e2 / (1.0 - e2)
    lon = jnp.arctan2(y, x)
    rho = jnp.hypot(x, y)
    beta = jnp.arctan2(z, (1.0 - f) * rho)
    lat = beta
    for _ in range(n_iter):
        sb = jnp.sin(beta)
        cb = jnp.cos(beta)
        lat = jnp.arctan2(z + ep2 * rp * sb**3, rho - e2 * re * cb**3)
        beta = jnp.arctan2((1.0 - f) * jnp.sin(lat), jnp.cos(lat))
    sin_lat = jnp.sin(lat)
    cos_lat = jnp.cos(lat)
    n = re / jnp.sqrt(1.0 - e2 * sin_lat * sin_lat)
    alt = rho * cos_lat + z * sin_lat - n * (1.0 - e2 * sin_lat * sin_lat)
    return lon, lat, alt


def fused_backplanes_fn(
    *, positive_west: bool, prograde: bool, have_sun: bool,
    optimize_speed: bool = True,
):
    """
    Build the traced implementation computing all default backplanes.
    Returns ``impl(params, xy2angular, disc, radii, anchors)`` where
    ``params['nx']/['ny']`` are static grid dimensions baked at trace time
    via closure; call through :func:`get_fused_pipeline` which jits and
    caches per static configuration.
    """
    import jax.numpy as jnp
    from jax import lax

    def impl(nx, ny, xy2angular, disc, radii, anchors):
        et = anchors['et']
        tau0 = anchors['tau0']
        re = radii[0]
        rp = radii[2]
        flattening = (re - rp) / re
        lon_sign = -1.0 if positive_west else 1.0

        # -- pixel grid -> angular -> obsvec_norm rays ---------------------
        xg = lax.broadcasted_iota(jnp.float64, (ny, nx), 1)
        yg = lax.broadcasted_iota(jnp.float64, (ny, nx), 0)
        ang_x = (
            xy2angular[0, 0] * xg + xy2angular[0, 1] * yg + xy2angular[0, 2]
        )
        ang_y = (
            xy2angular[1, 0] * xg + xy2angular[1, 1] * yg + xy2angular[1, 2]
        )
        m_ang = anchors['obsvec2angular']
        vec = geom.radec_to_rect(
            jnp.ones_like(ang_x),
            -ang_x / 3600.0 * DEG,
            ang_y / 3600.0 * DEG,
        )
        d = vec @ m_ang  # (ny, nx, 3) unit rays in J2000 (obsvec frame)

        # -- ray-ellipsoid intercept with linearised retargeting -----------
        obs_pos = anchors['obs_pos']
        targ_rel0 = anchors['targ_pos0'] - obs_pos  # target centre at tau0
        targ_vel0 = anchors['targ_vel0']
        lt = jnp.full((ny, nx), anchors['target_lt'])
        spoint = None
        found = None
        s = None
        for _ in range(4):
            tau = et - lt
            dtau = tau - tau0
            targ_rel = targ_rel0 + targ_vel0 * dtau[..., None]
            rot = _rot_at(anchors, dtau)
            o_bf = -_matvec(rot, targ_rel)
            d_bf = _matvec(rot, d)
            s, found = geom.ray_ellipsoid_intercept(o_bf, d_bf, radii)
            spoint = o_bf + s[..., None] * d_bf
            dist = jnp.where(found, s, anchors['target_lt'] * CLIGHT)
            lt = dist / CLIGHT
        tau = et - lt
        dtau = tau - tau0
        spoint = jnp.where(found[..., None], spoint, jnp.nan)

        if optimize_speed:
            # Behaviour parity with the reference's off-disc short circuit
            x0 = disc[0]
            y0 = disc[1]
            r0 = disc[2]
            r_cutoff = r0 * jnp.max(radii) / re * 1.05 + 1.0
            r2_px = (xg - x0) ** 2 + (yg - y0) ** 2
            off = r2_px > r_cutoff**2
            spoint = jnp.where(off[..., None], jnp.nan, spoint)
            found = found & ~off

        out: dict[str, Any] = {}

        # -- lon/lat (graphic + centric) -----------------------------------
        lon_e, lat_gd, _alt = rect_to_geodetic_surface(spoint, re, flattening)
        lon_graphic = jnp.mod(lon_sign * lon_e / DEG, 360.0)
        out['LON-GRAPHIC'] = jnp.where(found, lon_graphic, jnp.nan)
        out['LAT-GRAPHIC'] = jnp.where(found, lat_gd / DEG, jnp.nan)
        _r, lon_c, lat_c = geom.rect_to_latlon_centric(spoint)
        out['LON-CENTRIC'] = jnp.where(found, lon_c / DEG, jnp.nan)
        out['LAT-CENTRIC'] = jnp.where(found, lat_c / DEG, jnp.nan)

        # -- RA/Dec --------------------------------------------------------
        _rr, ra, dec = geom.rect_to_radec(d)
        out['RA'] = ra / DEG
        out['DEC'] = dec / DEG

        # -- pixel coords --------------------------------------------------
        out['PIXEL-X'] = xg
        out['PIXEL-Y'] = yg

        # -- km / angular target plane coords ------------------------------
        m2 = anchors['angular2km']
        km_x = m2[0, 0] * ang_x + m2[0, 1] * ang_y
        km_y = m2[1, 0] * ang_x + m2[1, 1] * ang_y
        out['KM-X'] = km_x
        out['KM-Y'] = km_y
        # ANGULAR backplanes are the KM coordinates scaled to arcsec (same
        # origin/rotation as KM, not the raw camera angular coordinates) -
        # matching the reference (body_xy.py:3610-3656)
        km_per_arcsec = 2.0 * re / (
            2.0 * 60.0 * 60.0 / DEG * jnp.arcsin(
                re / (anchors['target_lt'] * CLIGHT)
            )
        )
        out['ANGULAR-X'] = km_x / km_per_arcsec
        out['ANGULAR-Y'] = km_y / km_per_arcsec

        # -- illumination (phase/incidence/emission + visibl/lit) ----------
        rot_tau = _rot_at(anchors, dtau)
        m_bf2j = jnp.swapaxes(rot_tau, -1, -2)
        srfvec_j2000 = targ_rel0 + targ_vel0 * dtau[..., None] + _matvec(
            m_bf2j, spoint
        )
        srfvec_bf = _matvec(rot_tau, srfvec_j2000)
        if have_sun:
            point_ssb = (
                anchors['targ_pos0'] + targ_vel0 * dtau[..., None]
                + _matvec(m_bf2j, spoint)
            )
            # Apparent sun: anchor epoch already includes the mean light
            # time; refine per-pixel with the linearised sun state
            lt_s = jnp.linalg.norm(
                anchors['sun_pos0'] - point_ssb, axis=-1
            ) / CLIGHT
            sun_dtau = (tau - lt_s) - anchors['sun_epoch0']
            sun_pos = anchors['sun_pos0'] + anchors['sun_vel0'] * (
                sun_dtau[..., None]
            )
            sun_dir_j2000 = sun_pos - point_ssb
            sun_bf = _matvec(rot_tau, sun_dir_j2000)
        else:
            sun_bf = jnp.full_like(spoint, jnp.nan)

        normal = geom.surface_normal(spoint, radii)
        phase = geom.vector_separation(sun_bf, -srfvec_bf) / DEG
        incidence = geom.vector_separation(normal, sun_bf) / DEG
        emission = geom.vector_separation(normal, -srfvec_bf) / DEG
        out['PHASE'] = phase
        out['INCIDENCE'] = incidence
        out['EMISSION'] = emission

        # -- azimuth -------------------------------------------------------
        cp = jnp.cos(phase * DEG)
        ce = jnp.cos(emission * DEG)
        ci = jnp.cos(incidence * DEG)
        azimuth = (
            jnp.pi - jnp.arccos(
                jnp.clip(
                    (cp - ce * ci)
                    / (jnp.sqrt(1 - ce * ce) * jnp.sqrt(1 - ci * ci)),
                    -1.0, 1.0,
                )
            )
        ) / DEG
        out['AZIMUTH'] = azimuth

        # -- local solar time ---------------------------------------------
        spin_sign = 1.0 if prograde else -1.0
        lst = jnp.mod(
            12.0 + spin_sign * (lon_e - anchors['solar_lon_e']) * 12.0 / jnp.pi,
            24.0,
        )
        lst = jnp.floor(lst * 3600.0) / 3600.0
        out['LOCAL-SOLAR-TIME'] = jnp.where(found, lst, jnp.nan)

        # -- state: distance / radial velocity / doppler -------------------
        dist_surface = jnp.where(found, lt * CLIGHT, jnp.nan)
        out['DISTANCE'] = dist_surface
        rot_dot = _rot_dot_at(anchors, dtau)
        m_bf2j_dot = jnp.swapaxes(rot_dot, -1, -2)
        p_vel = targ_vel0 + _matvec(m_bf2j_dot, spoint)  # point SSB velocity
        rel = srfvec_j2000
        rhat = rel / jnp.linalg.norm(rel, axis=-1, keepdims=True)
        obs_vel = anchors['obs_vel']
        rv_t = jnp.sum(rhat * p_vel, axis=-1)
        rv_o = jnp.sum(rhat * obs_vel, axis=-1)
        dltdt = (rv_t - rv_o) / (CLIGHT + rv_t)
        vel = p_vel * (1.0 - dltdt)[..., None] - obs_vel
        radial_velocity = jnp.where(
            found, jnp.sum(rhat * vel, axis=-1), jnp.nan
        )
        out['RADIAL-VELOCITY'] = radial_velocity
        beta = radial_velocity / CLIGHT
        out['DOPPLER'] = jnp.sqrt((1.0 + beta) / (1.0 - beta))

        # -- limb coordinates ----------------------------------------------
        target_obsvec = anchors['target_obsvec']
        near, near_dist = geom.nearest_point_on_line(
            jnp.zeros(3), d, target_obsvec
        )
        near_targvec = _obsvec2targvec_lin(anchors, near)
        limb_surface = geom.radial_surface_point(near_targvec, radii)
        limb_lon_e, limb_lat, _ = rect_to_geodetic_surface(
            limb_surface, re, flattening
        )
        out['LIMB-LON-GRAPHIC'] = jnp.mod(lon_sign * limb_lon_e / DEG, 360.0)
        out['LIMB-LAT-GRAPHIC'] = limb_lat / DEG
        out['LIMB-DISTANCE'] = near_dist - jnp.linalg.norm(
            limb_surface, axis=-1
        )

        # -- ring plane ----------------------------------------------------
        intercept, nxpts = geom.ray_plane_intercept(
            jnp.zeros(3), d,
            anchors['ring_plane_normal'], anchors['ring_plane_constant'],
        )
        ring_ok = nxpts == 1
        ring_targvec = _obsvec2targvec_lin(anchors, intercept)
        ring_lon_e, _ring_lat, ring_alt = geom.rect_to_geodetic(
            ring_targvec, re, flattening
        )
        ring_distance = jnp.linalg.norm(intercept, axis=-1)
        ring_radius = ring_alt + re
        ring_lon = jnp.mod(lon_sign * ring_lon_e / DEG, 360.0)
        hidden = found & (dist_surface < ring_distance)
        ring_invalid = (~ring_ok) | hidden
        out['RING-RADIUS'] = jnp.where(ring_invalid, jnp.nan, ring_radius)
        out['RING-LON-GRAPHIC'] = jnp.where(ring_invalid, jnp.nan, ring_lon)
        out['RING-DISTANCE'] = jnp.where(ring_invalid, jnp.nan, ring_distance)

        return out

    return impl


def _obsvec2targvec_lin(anchors, obsvec):
    """Model-A obsvec->targvec transform with linearised rotation."""
    import jax.numpy as jnp

    off = obsvec - anchors['subpoint_obsvec']
    dist_offset = (
        jnp.linalg.norm(-anchors['subpoint_rayvec'] + off, axis=-1)
        - anchors['subpoint_distance']
    )
    dtau = (anchors['tau0'] - dist_offset / CLIGHT) - anchors['tau0']
    rot = _rot_at(anchors, dtau)
    return anchors['subpoint_targvec'] + _matvec(rot, off)


_PIPELINE_CACHE: dict[tuple, Any] = {}


def get_fused_pipeline(body, nx: int, ny: int):
    """
    Jitted fused pipeline for a body's configuration and image size.
    Returns ``fn(xy2angular, disc, radii, anchors) -> dict of backplanes``.
    """
    import jax

    key = (
        body.target_body_id, body._observer_body_id,
        body.aberration_correction, body.positive_longitude_direction,
        body.prograde, body._engine._pos_s is not None,
        bool(body._optimize_speed), nx, ny,
    )
    fn = _PIPELINE_CACHE.get(key)
    if fn is None:
        impl = fused_backplanes_fn(
            positive_west=body.positive_longitude_direction == 'W',
            prograde=body.prograde,
            have_sun=body._engine._pos_s is not None,
            optimize_speed=bool(body._optimize_speed),
        )

        def wrapped(xy2angular, disc, radii, anchors):
            return impl(nx, ny, xy2angular, disc, radii, anchors)

        fn = jax.jit(wrapped)
        _PIPELINE_CACHE[key] = fn
    return fn


def compute_backplanes(body, *, as_numpy: bool = True) -> dict[str, Any]:
    """
    Compute all default backplane images for a BodyXY in one fused device
    program. Returns a dict keyed by backplane name (same keys and value
    conventions as :attr:`BodyXY.backplanes` image getters).
    """
    nx, ny = body.get_img_size()
    if nx <= 0 or ny <= 0:
        raise ValueError('nx and ny must be positive to generate backplanes')
    anchors = body._get_pipeline_anchors()
    fn = get_fused_pipeline(body, nx, ny)
    out = fn(
        np.asarray(body._get_xy2angular_matrix()),
        np.asarray(body.get_disc_params(), dtype=np.float64),
        np.asarray(body.radii, dtype=np.float64),
        anchors,
    )
    if as_numpy:
        return {k: np.asarray(v) for k, v in out.items()}
    return dict(out)
