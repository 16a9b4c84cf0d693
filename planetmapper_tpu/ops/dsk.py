"""
Kernel-safe double-single (two-float) arithmetic for Pallas TPU kernels.

The sibling :mod:`.ds` module is written for the XLA graph level, where
fast-math/excess-precision simplification passes can null error-free-
transformation (EFT) terms unless pinned behind ``optimization_barrier``
and division-free seeds. Inside a Pallas TPU kernel neither hazard
exists - Mosaic lowers each f32 op to the VPU instruction as written
(verified on v5e by ``tests/test_pallas_core.py``, which checks the lo
words carry ~2^-49 against host f64) - but two *different* constraints
appear instead: no 64-bit types exist at all, and
``optimization_barrier``/``atan2``/``asin`` have no Mosaic lowering.

This module therefore provides:

- the same (hi, lo) f32-pair arithmetic as :mod:`.ds` with no barriers
  and no f64 anywhere (splits from f64 happen *outside* the kernel via
  :func:`split_f64` / :func:`planetmapper_tpu.ops.ds.from_f64`);
- branch-free polynomial ``atan2``/``asin`` in plain f32 (Mosaic has no
  inverse-trig lowering), and an extended-precision :func:`atan2_ds`
  for the one output whose angle must be f64-grade (longitude, which
  feeds LOCAL-SOLAR-TIME's exact 1-second quantization boundaries);
- small 3-vector helpers over ds components.

All functions are plain jnp expressions, so they also trace under
Pallas interpret mode and in ordinary XLA graphs (where the usual
:mod:`.ds` caveats about fast-math backends apply - use these in real
TPU kernels, use :mod:`.ds`/:mod:`.ds64` at the graph level).

Design references: the two-float EFT kernels follow Dekker (1971) and
the double-double conventions of Hida/Li/Bailey's QD library; the
reference implementation being replaced computes these quantities in
hardware float64 via CSPICE (reference planetmapper/body.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

#: dtype for casts; literal constants use numpy scalars (:func:`f`),
#: which trace as literals - Pallas kernels cannot capture traced
#: jnp constants from enclosing scope.
F32 = jnp.float32

# Dekker splitter for f32: 2^12 + 1 (24-bit mantissa -> 12+12 split).
_SPLIT = np.float32(4097.0)


def f(x):
    """Python float -> f32 literal (numpy scalar: kernel-safe)."""
    return np.float32(x)


def const(x):
    """Python float -> ds literal pair (split exactly via numpy f64)."""
    hi_ = np.float32(x)
    lo_ = np.float32(np.float64(x) - np.float64(hi_))
    return hi_, lo_


def split_f64(x):
    """
    f64 array -> (hi, lo) f32 pair, OUTSIDE a kernel (kernels have no
    f64). No optimization barrier: the pair feeds a ``pallas_call`` as
    data, so XLA's convert-folding cannot trace through it.
    """
    hi_ = x.astype(F32)
    lo_ = (x - hi_.astype(x.dtype)).astype(F32)
    return hi_, lo_


def two_sum(a, b):
    """Knuth two-sum: a + b = s + e exactly (no branch, any magnitudes)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def quick_two_sum(a, b):
    """Fast two-sum, REQUIRES |a| >= |b| (or a == 0)."""
    s = a + b
    e = b - (s - a)
    return s, e


def two_prod(a, b):
    """Dekker product: a * b = p + e exactly (|e| <= ulp(p)/2)."""
    p = a * b
    ah = _SPLIT * a
    ah = ah - (ah - a)
    al = a - ah
    bh = _SPLIT * b
    bh = bh - (bh - b)
    bl = b - bh
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def add(a, b):
    s, e = two_sum(a[0], b[0])
    e = e + (a[1] + b[1])
    return quick_two_sum(s, e)


def sub(a, b):
    return add(a, neg(b))


def neg(a):
    return -a[0], -a[1]


def add_f(a, b):
    """ds + f32."""
    s, e = two_sum(a[0], b)
    e = e + a[1]
    return quick_two_sum(s, e)


def mul(a, b):
    p, e = two_prod(a[0], b[0])
    e = e + (a[0] * b[1] + a[1] * b[0])
    return quick_two_sum(p, e)


def mul_f(a, b):
    """ds * f32."""
    p, e = two_prod(a[0], b)
    e = e + a[1] * b
    return quick_two_sum(p, e)


def mul_pair(a, c):
    """ds * ds-constant pair (e.g. :func:`const` output): exact split
    of the constant keeps irrational scale factors at ds grade where a
    single-f32 constant would inject its 3e-8 rounding wholesale."""
    return add(mul_f(a, c[0]), mul_f(a, c[1]))


def sqr(a):
    p, e = two_prod(a[0], a[0])
    e = e + np.float32(2.0) * (a[0] * a[1])
    return quick_two_sum(p, e)


def recip_seed(x):
    """~f32-accurate 1/x, division-free (see ds.recip_seed)."""
    ax = jnp.abs(x)
    bits = lax.bitcast_convert_type(ax, jnp.int32)
    r = lax.bitcast_convert_type(np.int32(0x7EF311C3) - bits, F32)
    r = jnp.where(x < 0, -r, r)
    for _ in range(3):
        r = r * (np.float32(2.0) - x * r)
    return r


def recip(a):
    """1/a in ds (~2^-47 relative); a = +-0 yields NaN, callers clamp."""
    r0 = recip_seed(a[0])
    ar = mul_f(a, r0)
    d = add_f(neg(ar), np.float32(2.0))
    return mul_f(d, r0)


def div(a, b):
    return mul(a, recip(b))


def rsqrt(a):
    """1/sqrt(a) in ds via f32 seed + one ds Newton step (~2^-47)."""
    r0 = lax.rsqrt(a[0])
    # r = r0 * (3 - a r0^2) / 2
    ar2 = mul_f(mul_f(a, r0), r0)
    d = add_f(neg(ar2), np.float32(3.0))
    return mul_f(mul_f(d, r0), np.float32(0.5))


def sqrt(a):
    """sqrt(a) in ds: 0 -> 0, negative -> NaN (via f32 sqrt of hi)."""
    zero = a[0] == 0.0
    r = rsqrt((jnp.where(zero, np.float32(1.0), a[0]), a[1]))
    s = mul(a, r)
    return jnp.where(zero, jnp.sqrt(a[0]), s[0]), jnp.where(
        zero, np.float32(0.0), s[1]
    )


def hi(a):
    """f32 value of the pair (hi word; |lo| <= ulp(hi)/2 by invariant)."""
    return a[0]


def dot3(ax, ay, az, bx, by, bz):
    """ds dot product of two 3-vectors given per-component pairs."""
    return add(add(mul(ax, bx), mul(ay, by)), mul(az, bz))


# ---------------------------------------------------------------------------
# f32 inverse trigonometry (Mosaic has no atan/atan2/asin lowering)

# Odd polynomial for atan(t) = t + t s P(s), s = t^2, t in [0, 1]:
# degree-8 P fit on Chebyshev nodes with absolute-angle-error weighting
# (max abs error 1.2e-9 rad in f64; 8.1e-8 rad evaluated in f32 - the
# f32 rounding floor of the Horner chain itself).
_ATAN_C = (
    -3.333326173e-01,
    1.999758226e-01,
    -1.425504596e-01,
    1.090806998e-01,
    -8.283304255e-02,
    5.601739415e-02,
    -2.933780249e-02,
    9.967789620e-03,
    -1.589621920e-03,
)


def atan2(y, x):
    """
    Branch-free f32 atan2 (4-quadrant), ~1-2 ulp. NaN propagates;
    (0, 0) returns 0 like the hardware convention.
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi_ = jnp.maximum(ax, ay)
    lo_ = jnp.minimum(ax, ay)
    # t in [0, 1]; guard 0/0
    t = lo_ / jnp.where(hi_ == 0.0, np.float32(1.0), hi_)
    s = t * t
    p = np.float32(_ATAN_C[-1])
    for c in _ATAN_C[-2::-1]:
        p = p * s + np.float32(c)
    r = t + t * (s * p)
    # reflect: t was min/max, so if |y| > |x| the angle is pi/2 - r
    r = jnp.where(ay > ax, np.float32(np.pi / 2) - r, r)
    r = jnp.where(x < 0.0, np.float32(np.pi) - r, r)
    r = jnp.where(y < 0.0, -r, r)
    # propagate NaN inputs (comparisons above silently take branches)
    nan = jnp.isnan(x) | jnp.isnan(y)
    return jnp.where(nan, np.float32(np.nan), r)


def asin(z):
    """f32 arcsin via atan2(z, sqrt(1-z^2)); |z| <= 1 (clipped)."""
    z = jnp.clip(z, -1.0, 1.0)
    return atan2(z, jnp.sqrt(jnp.maximum(np.float32(1.0) - z * z, np.float32(0.0))))


def acos(z):
    """f32 arccos via atan2(sqrt(1-z^2), z); |z| <= 1 (clipped)."""
    z = jnp.clip(z, -1.0, 1.0)
    return atan2(jnp.sqrt(jnp.maximum(np.float32(1.0) - z * z, np.float32(0.0))), z)


# ---------------------------------------------------------------------------
# extended-precision atan2 (ds result, ~2^-45 rad absolute)

# atan(t) for t in [0, tan(pi/8)], odd minimax in ds: Taylor-grade
# coefficients are exact small rationals; with |t| <= 0.4142 the a^(2k+1)
# term is < 0.4142^(2k+1), so 13 odd terms reach ~1e-15 relative.
_ATAN_DS_C = tuple(
    (-1.0) ** k / (2 * k + 1) for k in range(1, 14)
)
_TAN_PI_8 = 0.41421356237309503  # tan(pi/8), f64


def _pi_consts():
    import math

    return const(math.pi / 4), const(math.pi / 2), const(math.pi)


_PI_4, _PI_2, _PI = _pi_consts()


def atan2_ds(y, x):
    """
    Four-quadrant arctangent with a ds (hi, lo) result, ~2^-45 rad.

    ``y``/``x`` are ds pairs. Strategy: exact octant reduction (swap /
    sign fixes are exact; the [0, 1] -> [0, tan(pi/8)] step uses the
    identity atan(t) = pi/4 + atan((t-1)/(t+1)) carried in ds), then a
    13-term odd Taylor series in ds Horner form. Matches emulated-f64
    ``jnp.arctan2`` to ~1e-13 rad (validated on TPU by
    tests/test_pallas_core.py).
    """
    xh, xl = x
    yh, yl = y
    ax = (jnp.abs(xh), jnp.where(xh < 0, -xl, xl))
    ay = (jnp.abs(yh), jnp.where(yh < 0, -yl, yl))
    swap = ay[0] > ax[0]
    num = (jnp.where(swap, ax[0], ay[0]), jnp.where(swap, ax[1], ay[1]))
    den = (jnp.where(swap, ay[0], ax[0]), jnp.where(swap, ay[1], ax[1]))
    den_safe = (
        jnp.where(den[0] == 0.0, np.float32(1.0), den[0]),
        jnp.where(den[0] == 0.0, np.float32(0.0), den[1]),
    )
    t = div(num, den_safe)  # in [0, 1]
    # second reduction: t > tan(pi/8) -> (t - 1)/(t + 1), in [-0.414, 0]
    red = t[0] > np.float32(_TAN_PI_8)
    tm1 = add_f(t, np.float32(-1.0))
    tp1 = add_f(t, np.float32(1.0))
    t2 = div(tm1, tp1)
    u = (jnp.where(red, t2[0], t[0]), jnp.where(red, t2[1], t[1]))
    s = sqr(u)
    cc = const(_ATAN_DS_C[-1])
    p = (jnp.broadcast_to(cc[0], s[0].shape),
         jnp.broadcast_to(cc[1], s[0].shape))
    for c in _ATAN_DS_C[-2::-1]:
        cch, ccl = const(c)
        p = add(mul(p, s), (jnp.broadcast_to(cch, s[0].shape),
                            jnp.broadcast_to(ccl, s[0].shape)))
    # atan(u) = u + u * s * p
    r = add(u, mul(u, mul(s, p)))
    rq = add(r, (jnp.broadcast_to(_PI_4[0], r[0].shape),
                 jnp.broadcast_to(_PI_4[1], r[0].shape)))
    r = (jnp.where(red, rq[0], r[0]), jnp.where(red, rq[1], r[1]))
    # undo swap: angle = pi/2 - r
    rs = add(_PI_2, neg(r))
    r = (jnp.where(swap, rs[0], r[0]), jnp.where(swap, rs[1], r[1]))
    # x < 0: angle = pi - r
    rx = add(_PI, neg(r))
    r = (jnp.where(xh < 0.0, rx[0], r[0]), jnp.where(xh < 0.0, rx[1], r[1]))
    # y < 0: negate
    r = (jnp.where(yh < 0.0, -r[0], r[0]), jnp.where(yh < 0.0, -r[1], r[1]))
    nan = jnp.isnan(xh) | jnp.isnan(yh)
    nanv = np.float32(np.nan)
    return jnp.where(nan, nanv, r[0]), jnp.where(nan, nanv, r[1])
