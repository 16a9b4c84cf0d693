"""
Device-side image -> map interpolation kernels for :func:`BodyXY.map_img`.

The reference evaluates scipy interpolators per map cell on the CPU
(body_xy.py:1633-1702). Here the per-cell work (the O(map-size) part) runs
on the TPU as vectorised gathers + B-spline tensor-product evaluation:

- ``nearest``: one gather per cell.
- spline degrees 1-3: FITPACK *coefficients* are still solved on the host
  with scipy (an O(image) banded solve, exactly matching the reference's
  ``RectBivariateSpline`` including its knot/boundary conventions and the
  ``s > 0`` smoothing path), then evaluated on device with a de Boor
  tensor-product kernel - the cheap/precise split. Cube inputs solve one
  set of coefficients per frame on host and evaluate all frames in one
  batched device program.

The NaN conventions match the reference exactly: a map cell is NaN when
any of its 4 surrounding integer pixels is NaN or the sample is outside
the pixel-centre grid (body_xy.py:1855-1866); NaN pixels are in-filled
with 3x3 means before the spline solve (body_xy.py:1871-1904).
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def _eval_fn(kx: int, ky: int, n_frames: int | None):
    """Jitted de Boor tensor-product evaluator for degrees (kx, ky)."""
    import jax
    import jax.numpy as jnp

    def basis(t, k, u):
        """
        Non-zero B-spline basis values N_{i-k..i}(u) by the de Boor-Cox
        triangle, plus the knot interval index i. ``t`` is the full FITPACK
        knot vector; evaluation clamps to the valid span like FITPACK.
        """
        i = jnp.clip(
            jnp.searchsorted(t, u, side='right') - 1, k, t.shape[0] - k - 2
        )
        # Triangular recursion: N has k+1 entries
        n = [jnp.ones_like(u)]
        for d in range(1, k + 1):
            left = jnp.stack([t[i + 1 - j] for j in range(d, 0, -1)], -1)
            right = jnp.stack([t[i + j] for j in range(1, d + 1)], -1)
            denom = right - left
            denom = jnp.where(denom == 0.0, 1.0, denom)
            term = (u[..., None] - left) / denom
            n_prev = jnp.stack(n, -1)
            n_new = [n_prev[..., 0] * (1.0 - term[..., 0])]
            for j in range(1, d):
                n_new.append(
                    n_prev[..., j - 1] * term[..., j - 1]
                    + n_prev[..., j] * (1.0 - term[..., j])
                )
            n_new.append(n_prev[..., d - 1] * term[..., d - 1])
            n = n_new
        return jnp.stack(n, -1), i

    def eval_single(ty, tx, c, y, x):
        ny_b, iy = basis(ty, ky, y)  # (..., ky+1)
        nx_b, ix = basis(tx, kx, x)  # (..., kx+1)
        val = jnp.zeros_like(y)
        n_cx = tx.shape[0] - kx - 1
        for a in range(ky + 1):
            row = iy - ky + a
            for b in range(kx + 1):
                col = ix - kx + b
                val = val + ny_b[..., a] * nx_b[..., b] * c[
                    row * n_cx + col
                ]
        return val

    if n_frames is None:
        fn = eval_single
    else:
        def fn(ty, tx, c, y, x):
            return jax.vmap(
                lambda cf: eval_single(ty, tx, cf, y, x)
            )(c)

    return jax.jit(fn)


def _fitpack_coeffs(img, kx, ky, spline_smoothing, warn_nan):
    """Host-side FITPACK solve (reference body_xy.py:1673-1680)."""
    import scipy.interpolate

    from .interp import replace_nans_with_interpolated_values

    cleaned = replace_nans_with_interpolated_values(img, warn_nan)
    spline = scipy.interpolate.RectBivariateSpline(
        np.arange(img.shape[0]),
        np.arange(img.shape[1]),
        cleaned,
        kx=ky,  # scipy's first axis is our y
        ky=kx,
        s=spline_smoothing,
    )
    ty, tx = spline.get_knots()
    c = spline.get_coeffs()
    return ty, tx, c


def spline_interpolation_device(
    img, x_map, y_map, *, interpolation, warn_nan: bool,
    propagate_nan: bool, spline_smoothing: float,
):
    """
    Device-evaluated spline reprojection. ``img`` may be 2D ``(ny, nx)``
    or a cube ``(nz, ny, nx)`` (one host coefficient solve per frame, one
    batched device evaluation). Returns a float64 array shaped like the
    map (or ``(nz,) + map``).
    """
    import jax
    import jax.numpy as jnp

    from .interp import should_propagate_nan_to_map

    if isinstance(interpolation, int):
        kx = ky = interpolation
    else:
        kx, ky = interpolation

    cube = img.ndim == 3
    frames = img if cube else img[None]
    out_shape = (frames.shape[0],) + x_map.shape

    valid = np.isfinite(x_map) & np.isfinite(y_map)
    x = np.where(valid, x_map, 0.0)
    y = np.where(valid, y_map, 0.0)

    results = np.full(out_shape, np.nan)
    coeffs = []
    knots = None
    good_frames = []
    for i, frame in enumerate(frames):
        if np.all(np.isnan(frame)):
            continue
        ty, tx, c = _fitpack_coeffs(
            frame, kx, ky, spline_smoothing, warn_nan
        )
        if knots is None:
            knots = (ty, tx)
        elif ty.shape != knots[0].shape or tx.shape != knots[1].shape:
            # Different smoothing outcomes per frame: rare; evaluate alone
            fn = _eval_fn(kx, ky, None)
            vals = np.asarray(fn(
                jnp.asarray(ty), jnp.asarray(tx), jnp.asarray(c),
                jnp.asarray(y.ravel()), jnp.asarray(x.ravel()),
            )).reshape(x_map.shape)
            mask = valid
            if propagate_nan:
                mask = mask & ~should_propagate_nan_to_map(
                    x_map, y_map, np.isnan(frame), frame.shape
                )
            results[i][mask] = vals[mask]
            continue
        coeffs.append(c)
        good_frames.append(i)

    if good_frames:
        if len(good_frames) == 1:
            fn = _eval_fn(kx, ky, None)
            vals = np.asarray(fn(
                jnp.asarray(knots[0]), jnp.asarray(knots[1]),
                jnp.asarray(coeffs[0]),
                jnp.asarray(y.ravel()), jnp.asarray(x.ravel()),
            )).reshape((1,) + x_map.shape)
        else:
            fn = _eval_fn(kx, ky, len(good_frames))
            vals = np.asarray(fn(
                jnp.asarray(knots[0]), jnp.asarray(knots[1]),
                jnp.asarray(np.stack(coeffs)),
                jnp.asarray(y.ravel()), jnp.asarray(x.ravel()),
            )).reshape((len(good_frames),) + x_map.shape)
        for j, i in enumerate(good_frames):
            mask = valid
            if propagate_nan:
                mask = mask & ~should_propagate_nan_to_map(
                    x_map, y_map, np.isnan(frames[i]), frames[i].shape
                )
            results[i][mask] = vals[j][mask]

    return results if cube else results[0]


@functools.lru_cache(maxsize=None)
def _nearest_fn():
    import jax
    import jax.numpy as jnp

    def fn(img, x, y, valid):
        xi = jnp.clip(jnp.round(x).astype(jnp.int32), 0, img.shape[-1] - 1)
        yi = jnp.clip(jnp.round(y).astype(jnp.int32), 0, img.shape[-2] - 1)
        vals = img[..., yi, xi]
        return jnp.where(valid, vals, jnp.nan)

    return jax.jit(fn)


def nearest_interpolation_device(img, x_map, y_map):
    """Nearest-pixel gather on device (reference body_xy.py:1633-1649)."""
    import jax.numpy as jnp

    valid = np.isfinite(x_map) & np.isfinite(y_map)
    x = np.where(valid, x_map, 0.0)
    y = np.where(valid, y_map, 0.0)
    fn = _nearest_fn()
    out = np.asarray(fn(
        jnp.asarray(img), jnp.asarray(x), jnp.asarray(y), jnp.asarray(valid)
    ))
    return out
