"""
SGP4 propagation and TEME->J2000 rotation for SPK type 10 segments.

From-scratch JAX implementation of the standard SGP4 near-earth analytic
satellite propagator (Spacetrack Report #3 as revised by Vallado et al.,
"Revisiting Spacetrack Report #3", the algorithm CSPICE uses for SPK type 10
via ``spice.spkezr`` on spacecraft like HST; reference call site:
planetmapper/base.py:828 with observer='HST').

Everything is expressed as pure jnp functions of time: jit/vmap compatible,
fixed-iteration Kepler solves, and the frame rotation (TEME -> J2000 via IAU
1976 precession + recorded nutation angles) is closed-form. Gravity model
constants (J2, J3, J4, KE, QO, SO, ER, AE) come from the segment itself.

Deep-space (SDP4) element sets (period > 225 min) are not yet supported and
raise at parse time if encountered.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

ARCSEC = math.pi / (180.0 * 3600.0)
CENTURY = 36525.0 * 86400.0


@dataclass(frozen=True)
class Sgp4Constants:
    j2: float
    j3: float
    j4: float
    ke: float  # sqrt(GM) in (earth radii)^1.5 / minute
    qo: float  # density function upper altitude bound [km]
    so: float  # density function lower altitude bound [km]
    er: float  # equatorial earth radius [km]
    ae: float  # distance units / earth radius (1.0)


@dataclass(frozen=True)
class Sgp4Elements:
    """One element set, index layout per CSPICE ``spkw10``."""

    ndt20: float
    ndd60: float
    bstar: float
    inclo: float
    nodeo: float
    ecco: float
    argpo: float
    mo: float
    no_kozai: float  # mean motion [rad/min]
    epoch: float  # TDB seconds past J2000
    nu_obliquity: float  # nutation in obliquity at epoch [rad]
    nu_longitude: float  # nutation in longitude at epoch [rad]
    dnu_obliquity: float  # [rad/s]
    dnu_longitude: float  # [rad/s]


def _jnp():
    import jax.numpy as jnp

    return jnp


def sgp4_init_packets(constants: np.ndarray, packets: np.ndarray) -> dict:
    """
    Vectorised element-set initialisation over all packets of a segment: the
    standard ``sgp4init`` secular/periodic coefficient computation for the
    near-earth case, computed with numpy broadcasting on the host at parse
    time. Returns a dict of (n,)-shaped parameter arrays, ready to be
    gathered per-time on device.
    """
    c = Sgp4Constants(*(float(v) for v in constants[:8]))
    pk = np.asarray(packets, dtype=np.float64)
    bstar = pk[:, 2]
    inclo = pk[:, 3]
    nodeo = pk[:, 4]
    ecco = pk[:, 5]
    argpo = pk[:, 6]
    mo = pk[:, 7]
    no_kozai = pk[:, 8]
    epoch = pk[:, 9]

    j2, j3, j4, xke = c.j2, c.j3, c.j4, c.ke
    x2o3 = 2.0 / 3.0

    eccsq = ecco * ecco
    omeosq = 1.0 - eccsq
    rteosq = np.sqrt(omeosq)
    cosio = np.cos(inclo)
    cosio2 = cosio * cosio
    sinio = np.sin(inclo)

    # Un-Kozai the mean motion
    ak = (xke / no_kozai) ** x2o3
    d1 = 0.75 * j2 * (3.0 * cosio2 - 1.0) / (rteosq * omeosq)
    delp = d1 / (ak * ak)
    adel = ak * (1.0 - delp * delp - delp * (1.0 / 3.0 + 134.0 * delp * delp / 81.0))
    delp = d1 / (adel * adel)
    no = no_kozai / (1.0 + delp)

    if np.any(2.0 * math.pi / no >= 225.0):
        raise NotImplementedError(
            'Deep-space (SDP4) element sets are not supported yet'
        )

    ao = (xke / no) ** x2o3
    po = ao * omeosq
    con42 = 1.0 - 5.0 * cosio2
    con41 = -con42 - 2.0 * cosio2
    posq = po * po
    rp = ao * (1.0 - ecco)

    perige = (rp - 1.0) * c.er
    sfour = np.where(
        perige < 156.0, np.where(perige < 98.0, 20.0, perige - 78.0), np.nan
    )
    qzms24 = np.where(
        perige < 156.0,
        ((120.0 - sfour) / c.er) ** 4,
        ((c.qo - c.so) / c.er) ** 4,
    )
    sfour = np.where(perige < 156.0, sfour / c.er + 1.0, 78.0 / c.er + 1.0)
    pinvsq = 1.0 / posq

    tsi = 1.0 / (ao - sfour)
    eta = ao * ecco * tsi
    etasq = eta * eta
    eeta = ecco * eta
    psisq = np.abs(1.0 - etasq)
    coef = qzms24 * tsi**4
    coef1 = coef / psisq**3.5
    cc2 = coef1 * no * (
        ao * (1.0 + 1.5 * etasq + eeta * (4.0 + etasq))
        + 0.375 * j2 * tsi / psisq * con41
        * (8.0 + 3.0 * etasq * (8.0 + etasq))
    )
    cc1 = bstar * cc2
    with np.errstate(divide='ignore', invalid='ignore'):
        cc3 = np.where(
            ecco > 1.0e-4,
            -2.0 * coef * tsi * (j3 / j2) * no * sinio / np.where(
                ecco > 1.0e-4, ecco, 1.0
            ),
            0.0,
        )
    x1mth2 = 1.0 - cosio2
    cc4 = 2.0 * no * coef1 * ao * omeosq * (
        eta * (2.0 + 0.5 * etasq)
        + ecco * (0.5 + 2.0 * etasq)
        - j2 * tsi / (ao * psisq)
        * (
            -3.0 * con41 * (1.0 - 2.0 * eeta + etasq * (1.5 - 0.5 * eeta))
            + 0.75 * x1mth2 * (2.0 * etasq - eeta * (1.0 + etasq))
            * np.cos(2.0 * argpo)
        )
    )
    cc5 = 2.0 * coef1 * ao * omeosq * (1.0 + 2.75 * (etasq + eeta) + eeta * etasq)
    cosio4 = cosio2 * cosio2
    temp1 = 1.5 * j2 * pinvsq * no
    temp2 = 0.5 * temp1 * j2 * pinvsq
    temp3 = -0.46875 * j4 * pinvsq * pinvsq * no
    mdot = (
        no
        + 0.5 * temp1 * rteosq * con41
        + 0.0625 * temp2 * rteosq * (13.0 - 78.0 * cosio2 + 137.0 * cosio4)
    )
    argpdot = (
        -0.5 * temp1 * con42
        + 0.0625 * temp2 * (7.0 - 114.0 * cosio2 + 395.0 * cosio4)
        + temp3 * (3.0 - 36.0 * cosio2 + 49.0 * cosio4)
    )
    xhdot1 = -temp1 * cosio
    nodedot = xhdot1 + (
        0.5 * temp2 * (4.0 - 19.0 * cosio2)
        + 2.0 * temp3 * (3.0 - 7.0 * cosio2)
    ) * cosio
    omgcof = bstar * cc3 * np.cos(argpo)
    xmcof = np.where(
        ecco > 1.0e-4,
        -x2o3 * coef * bstar / np.where(eeta != 0.0, eeta, 1.0),
        0.0,
    )
    nodecf = 3.5 * omeosq * xhdot1 * cc1
    t2cof = 1.5 * cc1
    denom = np.where(np.abs(cosio + 1.0) > 1.5e-12, 1.0 + cosio, 1.5e-12)
    xlcof = -0.25 * (j3 / j2) * sinio * (3.0 + 5.0 * cosio) / denom
    aycof = -0.5 * (j3 / j2) * sinio
    delmo = (1.0 + eta * np.cos(mo)) ** 3
    sinmao = np.sin(mo)
    x7thm1 = 7.0 * cosio2 - 1.0

    isimp = (rp < (220.0 / c.er + 1.0)).astype(np.float64)
    cc1sq = cc1 * cc1
    d2 = 4.0 * ao * tsi * cc1sq
    temp = d2 * tsi * cc1 / 3.0
    d3 = (17.0 * ao + sfour) * temp
    d4 = 0.5 * temp * ao * tsi * (221.0 * ao + 31.0 * sfour) * cc1
    t3cof = d2 + 2.0 * cc1sq
    t4cof = 0.25 * (3.0 * d3 + cc1 * (12.0 * d2 + 10.0 * cc1sq))
    t5cof = 0.2 * (
        3.0 * d4
        + 12.0 * cc1 * d3
        + 6.0 * d2 * d2
        + 15.0 * cc1sq * (2.0 * d2 + cc1sq)
    )

    return dict(
        no=no, cc1=cc1, cc4=cc4, cc5=cc5, d2=d2, d3=d3, d4=d4,
        t2cof=t2cof, t3cof=t3cof, t4cof=t4cof, t5cof=t5cof,
        mdot=mdot, argpdot=argpdot, nodedot=nodedot, nodecf=nodecf,
        omgcof=omgcof, xmcof=xmcof, eta=eta, delmo=delmo, sinmao=sinmao,
        x1mth2=x1mth2, x7thm1=x7thm1, con41=con41, xlcof=xlcof, aycof=aycof,
        isimp=isimp,
        ecco=ecco, inclo=inclo, nodeo=nodeo, argpo=argpo, mo=mo,
        bstar=bstar, epoch=epoch,
        nu_obliquity=pk[:, 10], nu_longitude=pk[:, 11],
        dnu_obliquity=pk[:, 12], dnu_longitude=pk[:, 13],
    )


def sgp4_propagate(c: Sgp4Constants, p: dict, et):
    """
    Propagate an initialised element set to (scalar or batched) TDB time
    ``et`` [s past J2000]. Returns the TEME state (..., 6) in km and km/s.
    Pure jnp; differentiable.
    """
    jnp = _jnp()
    twopi = 2.0 * math.pi
    x2o3 = 2.0 / 3.0
    xke = c.ke
    j2 = c.j2

    t = (jnp.asarray(et, dtype=jnp.float64) - p['epoch']) / 60.0  # minutes

    xmdf = p['mo'] + p['mdot'] * t
    argpdf = p['argpo'] + p['argpdot'] * t
    nodedf = p['nodeo'] + p['nodedot'] * t
    t2 = t * t
    nodem = nodedf + p['nodecf'] * t2
    tempa = 1.0 - p['cc1'] * t
    tempe = p['bstar'] * p['cc4'] * t
    templ = p['t2cof'] * t2

    # non-simple branch corrections (disabled via isimp flag multiplication)
    use_full = 1.0 - p['isimp']
    delomg = p['omgcof'] * t
    delmtemp = 1.0 + p['eta'] * jnp.cos(xmdf)
    delm = p['xmcof'] * (delmtemp**3 - p['delmo'])
    temp = (delomg + delm) * use_full
    mm = xmdf + temp
    argpm = argpdf - temp
    t3 = t2 * t
    t4 = t3 * t
    tempa = tempa - use_full * (p['d2'] * t2 + p['d3'] * t3 + p['d4'] * t4)
    tempe = tempe + use_full * p['bstar'] * p['cc5'] * (jnp.sin(mm) - p['sinmao'])
    templ = templ + use_full * (
        p['t3cof'] * t3 + t4 * (p['t4cof'] + t * p['t5cof'])
    )

    no = p['no']
    am = (xke / no) ** x2o3 * tempa * tempa
    nm = xke / am**1.5
    em = p['ecco'] - tempe
    em = jnp.clip(em, 1.0e-6, 0.999999)
    mm = mm + no * templ
    xlm = mm + argpm + nodem
    nodem = jnp.mod(nodem, twopi)
    argpm = jnp.mod(argpm, twopi)
    xlm = jnp.mod(xlm, twopi)
    mm = jnp.mod(xlm - argpm - nodem, twopi)

    inclm = p['inclo']
    sinim = jnp.sin(inclm)
    cosim = jnp.cos(inclm)

    axnl = em * jnp.cos(argpm)
    temp = 1.0 / (am * (1.0 - em * em))
    aynl = em * jnp.sin(argpm) + temp * p['aycof']
    xl = mm + argpm + nodem + temp * p['xlcof'] * axnl

    u = jnp.mod(xl - nodem, twopi)
    eo1 = u
    for _ in range(10):
        sineo1 = jnp.sin(eo1)
        coseo1 = jnp.cos(eo1)
        tem5 = 1.0 - coseo1 * axnl - sineo1 * aynl
        tem5 = (u - aynl * coseo1 + axnl * sineo1 - eo1) / tem5
        tem5 = jnp.clip(tem5, -0.95, 0.95)
        eo1 = eo1 + tem5
    sineo1 = jnp.sin(eo1)
    coseo1 = jnp.cos(eo1)

    ecose = axnl * coseo1 + aynl * sineo1
    esine = axnl * sineo1 - aynl * coseo1
    el2 = axnl * axnl + aynl * aynl
    pl = am * (1.0 - el2)
    rl = am * (1.0 - ecose)
    rdotl = jnp.sqrt(am) * esine / rl
    rvdotl = jnp.sqrt(pl) / rl
    betal = jnp.sqrt(1.0 - el2)
    temp = esine / (1.0 + betal)
    sinu = am / rl * (sineo1 - aynl - axnl * temp)
    cosu = am / rl * (coseo1 - axnl + aynl * temp)
    su = jnp.arctan2(sinu, cosu)
    sin2u = (cosu + cosu) * sinu
    cos2u = 1.0 - 2.0 * sinu * sinu
    temp = 1.0 / pl
    temp1 = 0.5 * j2 * temp
    temp2 = temp1 * temp

    mrt = rl * (1.0 - 1.5 * temp2 * betal * p['con41']) \
        + 0.5 * temp1 * p['x1mth2'] * cos2u
    su = su - 0.25 * temp2 * p['x7thm1'] * sin2u
    xnode = nodem + 1.5 * temp2 * cosim * sin2u
    xinc = inclm + 1.5 * temp2 * cosim * sinim * cos2u
    mvt = rdotl - nm * temp1 * p['x1mth2'] * sin2u / xke
    rvdot = rvdotl + nm * temp1 * (p['x1mth2'] * cos2u + 1.5 * p['con41']) / xke

    sinsu = jnp.sin(su)
    cossu = jnp.cos(su)
    snod = jnp.sin(xnode)
    cnod = jnp.cos(xnode)
    sini = jnp.sin(xinc)
    cosi = jnp.cos(xinc)
    xmx = -snod * cosi
    xmy = cnod * cosi
    ux = xmx * sinsu + cnod * cossu
    uy = xmy * sinsu + snod * cossu
    uz = sini * sinsu
    vx = xmx * cossu - cnod * sinsu
    vy = xmy * cossu - snod * sinsu
    vz = sini * cossu

    vkmpersec = c.er * xke / 60.0
    r = jnp.stack([ux, uy, uz], axis=-1) * (mrt * c.er)[..., None]
    v = (
        jnp.stack([ux, uy, uz], axis=-1) * mvt[..., None]
        + jnp.stack([vx, vy, vz], axis=-1) * rvdot[..., None]
    ) * vkmpersec
    return jnp.concatenate([r, v], axis=-1)


# ---------------------------------------------------------------------------
# TEME -> J2000 rotation
# ---------------------------------------------------------------------------

def _rotmat(jnp, angle, axis: int):
    """
    SPICE-convention coordinate rotation matrix: coordinates of a fixed
    vector in a frame rotated by ``angle`` about ``axis`` (1=x, 2=y, 3=z).
    """
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    one = jnp.ones_like(c)
    zero = jnp.zeros_like(c)
    if axis == 1:
        rows = [[one, zero, zero], [zero, c, s], [zero, -s, c]]
    elif axis == 2:
        rows = [[c, zero, -s], [zero, one, zero], [s, zero, c]]
    else:
        rows = [[c, s, zero], [-s, c, zero], [zero, zero, one]]
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def precession_matrix_j2000_to_mod(et):
    """IAU 1976 precession: coordinates in mean-of-date from J2000."""
    jnp = _jnp()
    T = jnp.asarray(et, dtype=jnp.float64) / CENTURY
    zeta = (2306.2181 * T + 0.30188 * T**2 + 0.017998 * T**3) * ARCSEC
    z = (2306.2181 * T + 1.09468 * T**2 + 0.018203 * T**3) * ARCSEC
    theta = (2004.3109 * T - 0.42665 * T**2 - 0.041833 * T**3) * ARCSEC
    # r_MOD = R3(-z) R2(theta) R3(-zeta) r_J2000
    return _rotmat(jnp, -z, 3) @ _rotmat(jnp, theta, 2) @ _rotmat(jnp, -zeta, 3)


def mean_obliquity(et):
    """IAU 1980 mean obliquity of the ecliptic [rad]."""
    jnp = _jnp()
    T = jnp.asarray(et, dtype=jnp.float64) / CENTURY
    return (84381.448 - 46.8150 * T - 0.00059 * T**2 + 0.001813 * T**3) * ARCSEC


def teme_to_j2000_matrix(et, dpsi, deps):
    """
    Rotation matrix taking TEME coordinates to J2000 coordinates, using the
    IAU 1976 precession model, IAU 1980 mean obliquity, and the recorded
    nutation angles (dpsi = nutation in longitude, deps = nutation in
    obliquity) interpolated from the type 10 packet.
    """
    jnp = _jnp()
    eps0 = mean_obliquity(et)
    eps = eps0 + deps
    # Nutation: r_TOD = R1(-eps) R3(-dpsi) R1(eps0) r_MOD
    nut = _rotmat(jnp, -eps, 1) @ _rotmat(jnp, -dpsi, 3) @ _rotmat(jnp, eps0, 1)
    prec = precession_matrix_j2000_to_mod(et)
    # Equation of the equinoxes: TEME differs from TOD by a z-rotation
    eqeq = dpsi * jnp.cos(eps0)
    teme_to_tod = _rotmat(jnp, -eqeq, 3)
    mod_to_j2000 = jnp.swapaxes(prec, -1, -2)
    tod_to_mod = jnp.swapaxes(nut, -1, -2)
    return mod_to_j2000 @ tod_to_mod @ teme_to_tod


def pack_params(params: dict) -> tuple[tuple[str, ...], np.ndarray]:
    """
    Pack the per-packet parameter dict into one (n, P) matrix so device-side
    packet selection is a single row gather (35 separate gathers into
    embedded constants compile pathologically slowly in XLA).
    """
    keys = tuple(sorted(params.keys()))
    matrix = np.stack([np.asarray(params[k], dtype=np.float64) for k in keys],
                      axis=1)
    return keys, matrix


def tle_state_j2000_at_index(
    constants: np.ndarray, params: dict, idx, et
):
    """
    SGP4 propagation + TEME->J2000 for the element set(s) selected by
    (possibly traced) packet index ``idx``. ``params`` is the vectorised
    output of :func:`sgp4_init_packets` (host numpy); gathering happens on
    device so this is jit/vmap compatible.
    """
    jnp = _jnp()
    c = Sgp4Constants(*(float(v) for v in constants[:8]))
    packed = params.get('_packed')
    if packed is None:
        packed = pack_params(
            {k: v for k, v in params.items() if not k.startswith('_')}
        )
        params['_packed'] = packed
    keys, matrix = packed
    rows = jnp.asarray(matrix)[idx]  # (..., P) single gather
    row = {k: rows[..., i] for i, k in enumerate(keys)}
    state_teme = sgp4_propagate(c, row, et)
    tsec = jnp.asarray(et, dtype=jnp.float64)
    dpsi = row['nu_longitude'] + row['dnu_longitude'] * (tsec - row['epoch'])
    deps = row['nu_obliquity'] + row['dnu_obliquity'] * (tsec - row['epoch'])
    m = teme_to_j2000_matrix(tsec, dpsi, deps)
    pos = jnp.einsum('...ij,...j->...i', m, state_teme[..., :3])
    vel = jnp.einsum('...ij,...j->...i', m, state_teme[..., 3:])
    return jnp.concatenate([pos, vel], axis=-1)
