"""
Mixed-precision building blocks for the fused TPU pipeline.

TPU v5e has no hardware float64: XLA emulates it in software, and the
emulated *transcendentals* (sin/atan2) and div/sqrt are ~10-40x the cost of
a float64 multiply, while float32 ops are effectively free (bandwidth
bound). These helpers give float64-accurate results using only float64
multiplies/adds plus a float32 seed:

- ``recip64`` / ``rsqrt64`` / ``sqrt64``: float32 reciprocal / rsqrt seed
  refined with Newton-Raphson iterations carried out in float64 arithmetic
  (quadratic convergence: f32's 24-bit seed reaches ~53 bits in one step;
  two steps give full float64 accuracy with margin).
- ``norm3_64`` / ``normalize3_64``: 3-vector norms built on the above.

Everything here is shape-polymorphic elementwise jnp code.
"""

from __future__ import annotations

import jax.numpy as jnp


def recip64(x):
    """1/x in float64 accuracy without an emulated f64 divide.

    The f32 seed requires |x| in ~[1e-37, 1e37]; callers guard/clamp
    degenerate denominators (as the plain-division pipeline variants guard
    division by zero anyway).
    """
    r = (1.0 / x.astype(jnp.float32)).astype(jnp.float64)
    # One NR step: the 24-bit seed's error squares to ~2^-48, i.e. ~3e-15
    # relative - ample for every pipeline use (needs ~1e-10 at most)
    r = r * (2.0 - x * r)
    return r


def div64(num, den):
    """num/den via :func:`recip64` with a final residual correction."""
    r = recip64(den)
    q = num * r
    # One residual step so the quotient (not just the reciprocal) is
    # correctly rounded to ~1 ulp
    return q + (num - den * q) * r


def rsqrt64(x):
    """1/sqrt(x) in float64 accuracy without an emulated f64 sqrt.

    The f32 seed requires x in ~[1e-37, 1e37]; the seed input is clamped
    so out-of-range x yields a finite (inaccurate) value rather than
    inf/NaN - call sites never produce such magnitudes for valid pixels.
    """
    import jax.lax as lax

    seed = jnp.clip(x, 1e-37, 1e37).astype(jnp.float32)
    r = lax.rsqrt(seed).astype(jnp.float64)
    r = r * (1.5 - 0.5 * x * r * r)  # ~3e-15 relative after one NR step
    return r


def sqrt64(x):
    """sqrt(x) for x >= 0 (float64 accuracy, f32 seed + NR in mults).

    Returns 0.0 for x <= 0 (rsqrt overflows at 0; negatives are the
    caller's responsibility to mask - matching how the plain pipeline
    clamps discriminants before sqrt).
    """
    r = rsqrt64(jnp.where(x > 0.0, x, 1.0))
    return jnp.where(x > 0.0, x * r, 0.0)


def dot3(a, b):
    return (
        a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1] + a[..., 2] * b[..., 2]
    )


def norm3_64(v):
    return sqrt64(dot3(v, v))


def normalize3_64(v):
    return v * rsqrt64(dot3(v, v))[..., None]


def hypot64(x, y):
    return sqrt64(x * x + y * y)
