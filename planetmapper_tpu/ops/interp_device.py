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

The NaN conventions match the reference exactly and are applied inside the
device program: a map cell is NaN when any of its 4 surrounding integer
pixels is NaN or the sample is outside the pixel-centre grid
(body_xy.py:1855-1866); NaN pixels are in-filled with 3x3 means before the
spline solve (body_xy.py:1871-1904).

The map sample coordinates are constant across frames of an observation,
so their device copies (and the derived validity mask) are cached keyed on
the host arrays' identity - repeated ``map_img`` calls only upload the
per-frame spline coefficients.
"""

from __future__ import annotations

import functools

import numpy as np

_XY_CACHE: dict[tuple, tuple] = {}
_XY_CACHE_MAX = 8


def _device_xy(x_map: np.ndarray, y_map: np.ndarray):
    """
    Device-resident ``(x, y, valid)`` for the map sample coordinates.
    Keyed on the arrays' data pointers; the host arrays are retained in
    the cache entry so the pointers stay valid for the entry's lifetime.
    """
    import jax.numpy as jnp

    key = (
        x_map.ctypes.data, y_map.ctypes.data, x_map.shape, y_map.shape
    )
    hit = _XY_CACHE.get(key)
    if hit is not None:
        return hit[:3]
    valid = np.isfinite(x_map) & np.isfinite(y_map)
    x = np.where(valid, x_map, 0.0).ravel()
    y = np.where(valid, y_map, 0.0).ravel()
    out = (
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(valid.ravel()),
        x_map, y_map,  # keep alive: pins the data pointers in `key`
    )
    if len(_XY_CACHE) >= _XY_CACHE_MAX:
        _XY_CACHE.pop(next(iter(_XY_CACHE)))
    _XY_CACHE[key] = out
    return out[:3]


def _propagate_nan_mask(jnp, x, y, nans):
    """
    4-neighbour NaN / outside-grid test on device (reference
    body_xy.py:1855-1866). ``nans`` is the (ny, nx) image NaN grid;
    x/y are flattened map sample coordinates.
    """
    ny, nx = nans.shape
    outside = (x < 0.0) | (y < 0.0) | (x > nx - 1) | (y > ny - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, nx - 1)
    x1 = jnp.clip(jnp.ceil(x).astype(jnp.int32), 0, nx - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, ny - 1)
    y1 = jnp.clip(jnp.ceil(y).astype(jnp.int32), 0, ny - 1)
    neighbour = (
        nans[y0, x0] | nans[y0, x1] | nans[y1, x0] | nans[y1, x1]
    )
    return outside | neighbour


def _bspline_basis(jnp, t, k, u):
    """
    Non-zero B-spline basis values N_{i-k..i}(u) by the de Boor-Cox
    triangle, plus the knot interval index i. ``t`` is the full FITPACK
    knot vector; evaluation clamps to the valid span like FITPACK.
    """
    i = jnp.clip(
        jnp.searchsorted(t, u, side='right') - 1, k, t.shape[0] - k - 2
    )
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


@functools.lru_cache(maxsize=None)
def _spline_eval_fn(kx: int, ky: int, batched: bool, propagate_nan: bool):
    """Jitted masked de Boor tensor-product evaluator."""
    import jax
    import jax.numpy as jnp

    def eval_one(ty, tx, c, nans, y, x, valid):
        # f32 evaluation throughout: a ~1e-5 px sample-position rounding
        # times O(1/px) image gradients sits below the 2e-5 comparison
        # tolerance, and TPU f32 is ~10x f64
        ty = ty.astype(jnp.float32)
        tx = tx.astype(jnp.float32)
        c = c.astype(jnp.float32)
        y = y.astype(jnp.float32)
        x = x.astype(jnp.float32)
        # FITPACK's fpbisp clamps evaluation coordinates into the knot
        # domain (scipy .ev returns the boundary value outside the grid);
        # without this the boundary polynomial would extrapolate. The
        # NaN-propagation mask below tests the UNCLAMPED coordinates.
        yc = jnp.clip(y, ty[ky], ty[-ky - 1])
        xc = jnp.clip(x, tx[kx], tx[-kx - 1])
        ny_b, iy = _bspline_basis(jnp, ty, ky, yc)
        nx_b, ix = _bspline_basis(jnp, tx, kx, xc)
        n_cx = tx.shape[0] - kx - 1
        val = jnp.zeros_like(y)
        for a in range(ky + 1):
            row = iy - ky + a
            for b in range(kx + 1):
                col = ix - kx + b
                val = val + ny_b[..., a] * nx_b[..., b] * c[
                    row * n_cx + col
                ]
        mask = valid
        if propagate_nan:
            mask = mask & ~_propagate_nan_mask(jnp, x, y, nans)
        # f32 result: halves the device->host transfer (which dominates on
        # remote-TPU transports); 6e-8 relative rounding of *data* values
        # is far below any science use of a reprojected image
        return jnp.where(mask, val, jnp.nan).astype(jnp.float32)

    if batched:
        def fn(ty, tx, c, nans, y, x, valid):
            return jax.vmap(
                lambda cf, nf: eval_one(ty, tx, cf, nf, y, x, valid)
            )(c, nans)
    else:
        fn = eval_one

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
    batched device evaluation). Returns an array shaped like the map (or
    ``(nz,) + map``); values carry float32 precision (relative 6e-8).
    """
    import jax.numpy as jnp

    if isinstance(interpolation, int):
        kx = ky = interpolation
    else:
        kx, ky = interpolation

    cube = img.ndim == 3
    frames = img if cube else img[None]
    nz = frames.shape[0]
    x_dev, y_dev, valid_dev = _device_xy(x_map, y_map)

    results = np.full((nz,) + x_map.shape, np.nan)
    coeffs: list[np.ndarray] = []
    nan_grids: list[np.ndarray] = []
    knots = None
    good: list[int] = []
    singles: list[int] = []
    for i, frame in enumerate(frames):
        if np.all(np.isnan(frame)):
            continue
        ty, tx, c = _fitpack_coeffs(
            frame, kx, ky, spline_smoothing, warn_nan
        )
        if knots is None:
            knots = (ty, tx)
        elif not (
            np.array_equal(ty, knots[0]) and np.array_equal(tx, knots[1])
        ):
            # FITPACK places knots adaptively when smoothing: frames can
            # share knot counts but not positions, so compare values
            # Different smoothing outcomes per frame: rare; evaluate alone
            fn = _spline_eval_fn(kx, ky, False, propagate_nan)
            vals = fn(
                jnp.asarray(ty), jnp.asarray(tx), jnp.asarray(c),
                jnp.asarray(np.isnan(frame)), y_dev, x_dev, valid_dev,
            )
            results[i] = np.asarray(vals).reshape(x_map.shape)
            singles.append(i)
            continue
        coeffs.append(c)
        nan_grids.append(np.isnan(frame))
        good.append(i)

    if good:
        if len(good) == 1:
            fn = _spline_eval_fn(kx, ky, False, propagate_nan)
            vals = np.asarray(fn(
                jnp.asarray(knots[0]), jnp.asarray(knots[1]),
                jnp.asarray(coeffs[0]), jnp.asarray(nan_grids[0]),
                y_dev, x_dev, valid_dev,
            )).reshape((1,) + x_map.shape)
        else:
            fn = _spline_eval_fn(kx, ky, True, propagate_nan)
            vals = np.asarray(fn(
                jnp.asarray(knots[0]), jnp.asarray(knots[1]),
                jnp.asarray(np.stack(coeffs)),
                jnp.asarray(np.stack(nan_grids)),
                y_dev, x_dev, valid_dev,
            )).reshape((len(good),) + x_map.shape)
        for j, i in enumerate(good):
            results[i] = vals[j]

    return results if cube else results[0]


@functools.lru_cache(maxsize=None)
def _nearest_fn(batched: bool):
    import jax
    import jax.numpy as jnp

    def one(img, y, x, valid):
        xi = jnp.clip(jnp.round(x).astype(jnp.int32), 0, img.shape[-1] - 1)
        yi = jnp.clip(jnp.round(y).astype(jnp.int32), 0, img.shape[-2] - 1)
        return jnp.where(valid, img[yi, xi], jnp.nan)

    if batched:
        def fn(img, y, x, valid):
            return jax.vmap(lambda f: one(f, y, x, valid))(img)
    else:
        fn = one
    return jax.jit(fn)


def nearest_interpolation_device(img, x_map, y_map):
    """Nearest-pixel gather on device (reference body_xy.py:1633-1649)."""
    import jax.numpy as jnp

    x_dev, y_dev, valid_dev = _device_xy(x_map, y_map)
    cube = img.ndim == 3
    fn = _nearest_fn(cube)
    out = np.asarray(fn(jnp.asarray(img), y_dev, x_dev, valid_dev))
    shape = (img.shape[0],) + x_map.shape if cube else x_map.shape
    return out.reshape(shape)
