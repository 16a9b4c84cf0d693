"""
Aperture photometry (photutils replacement for disc-radius fitting).

Implements exact circular-aperture photometry as a closed-form vectorised
computation: the overlap area between a circle and each pixel is an
inclusion-exclusion sum of the circle / corner-quadrant intersection areas
at the four pixel corners. This replaces the reference's dependency on
photutils (observation.py:808-815) with a pure-array reduction.

Derivation: with the aperture circle of radius r at the origin, define
``A(x) = area{u <= x}`` (a circular cap),

    A(x) = x*sqrt(r^2 - x^2) + r^2*(asin(x/r) + pi/2),

and ``D(x, y) = area{u >= x, v >= y}``. For a corner strictly inside the
circle, D is a right triangle against the chord plus a circular segment;
for corners outside, D reduces to full/cap/zero cases by quadrant. The
quarter-plane area is then ``F(x,y) = A(x) + A(y) - pi*r^2 + D(x,y)`` and a
pixel's overlap is the 4-corner inclusion-exclusion of F.
"""

from __future__ import annotations

import numpy as np


def _cap_area(x, r):
    """A(x): area of the disc with u <= x (x clipped to [-r, r])."""
    x = np.clip(x, -r, r)
    return x * np.sqrt(np.maximum(r * r - x * x, 0.0)) + r * r * (
        np.arcsin(np.clip(x / r, -1.0, 1.0)) + np.pi / 2.0
    )


def _corner_area(x, y, r):
    """D(x, y): area of the disc with u >= x and v >= y."""
    x = np.clip(x, -r, r)
    y = np.clip(y, -r, r)
    full = np.pi * r * r
    inside = x * x + y * y < r * r

    sx = np.sqrt(np.maximum(r * r - x * x, 0.0))  # chord v extents at u=x
    sy = np.sqrt(np.maximum(r * r - y * y, 0.0))
    # Inside-corner region: triangle (x,y),(x,sx),(sy,y) + circular segment
    # between (x, sx) and (sy, y)
    tri = 0.5 * (sx - y) * (sy - x)
    theta = np.arctan2(sx, x) - np.arctan2(y, sy)
    segment = 0.5 * r * r * (theta - np.sin(theta))
    d_in = tri + segment

    cap_x = full - _cap_area(x, r)  # area{u >= x}
    cap_y = full - _cap_area(y, r)  # area{v >= y}
    d_out = np.where(
        (x >= 0) & (y >= 0),
        0.0,
        np.where(
            (x < 0) & (y < 0),
            np.maximum(cap_x + cap_y - full, 0.0),
            np.where(x < 0, cap_y, cap_x),
        ),
    )
    return np.where(inside, d_in, d_out)


def _quarter_plane_area(x, y, r):
    """F(x, y): area of the disc with u <= x and v <= y."""
    return (
        _cap_area(x, r) + _cap_area(y, r) - np.pi * r * r
        + _corner_area(x, y, r)
    )


def circular_aperture_fractions(
    shape: tuple[int, int], x0: float, y0: float, r: float
) -> np.ndarray:
    """Exact overlap fraction of each pixel with the circular aperture."""
    ny, nx = shape
    ys, xs = np.mgrid[0:ny, 0:nx].astype(float)
    x1 = xs - 0.5 - x0
    x2 = xs + 0.5 - x0
    y1 = ys - 0.5 - y0
    y2 = ys + 0.5 - y0
    frac = (
        _quarter_plane_area(x2, y2, r)
        - _quarter_plane_area(x1, y2, r)
        - _quarter_plane_area(x2, y1, r)
        + _quarter_plane_area(x1, y1, r)
    )
    return np.clip(frac, 0.0, 1.0)


def circular_aperture_sums(
    img: np.ndarray, x0: float, y0: float, radii
) -> tuple[np.ndarray, np.ndarray]:
    """
    Exact-overlap circular aperture photometry: ``(sums, areas)`` for
    apertures of the given radii centred at ``(x0, y0)``.
    """
    radii = np.atleast_1d(np.asarray(radii, dtype=float))
    sums = np.empty(len(radii))
    areas = np.pi * radii * radii
    for i, r in enumerate(radii):
        frac = circular_aperture_fractions(img.shape, x0, y0, float(r))
        sums[i] = float(np.sum(img * frac))
    return sums, areas


def threshold_centroid(img: np.ndarray) -> tuple[float, float]:
    """
    Centroid of the above-threshold pixels, as one device reduction.

    The threshold is the mid-point of the image's 5th and 95th
    percentiles and the centroid is the first moment of the binary mask
    ``img > threshold`` - the disc-position estimator of the reference's
    ``fit_disc_position`` (reference observation.py:762-780, which used
    ``scipy.ndimage.center_of_mass``). Returns ``(x0, y0)``.
    """
    import jax

    return tuple(
        float(v) for v in _threshold_centroid_device(jax.numpy.asarray(img))
    )


def _threshold_centroid_device(img):
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(img):
        lo = jnp.percentile(img, 5.0)
        hi = jnp.percentile(img, 95.0)
        mask = (img > 0.5 * (lo + hi)).astype(img.dtype)
        total = jnp.sum(mask)
        ys = lax.broadcasted_iota(img.dtype, img.shape, 0)
        xs = lax.broadcasted_iota(img.dtype, img.shape, 1)
        return (
            jnp.sum(mask * xs) / total,
            jnp.sum(mask * ys) / total,
        )

    return run(img)
