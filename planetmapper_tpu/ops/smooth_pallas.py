"""
Windowed Pallas TPU kernel for the 'smooth' (PCHIP) map sampling stage.

The smooth mode's final stage is a bilinear sample of the PCHIP
*oversampled* grid (reference body_xy.py:1704-1853: ``zoom`` by 5 then
linear interpolation). That grid (~611x641 for the benchmark Jupiter
map) is too large for :mod:`.map_pallas`'s whole-grid-in-VMEM
contraction - and a dense one-hot matmul against a 640-wide grid wastes
~320x the MXU work of the 2 nonzero weights per axis. The XLA
tiled-window path (:mod:`.pchip_device`) fixes the flop count but still
materialises its per-tile weight matrices through HBM (~19 ms/frame of
a ~25 ms smooth call measured on v5e).

This kernel gets both right by exploiting what is *static per map*:

1. **Host staging (numpy, once per (map, box origin)):** the map is cut
   into square spatial tiles (samples of a tile hit a localized patch
   of the oversampled grid). For each tile the window origin, the
   window-local bilinear indices/fractions, validity and the original-
   grid NaN-propagation neighbour indices are computed in f64 numpy and
   packed into the same ``(G, 8, T_S)`` channel layout as
   :mod:`.map_pallas`. Tiles are rejected statically if any care
   sample's footprint exceeds the window - the caller then keeps the
   XLA path, so the kernel never needs a runtime fallback branch.
2. **Per-frame (XLA + Pallas):** XLA slices one ``(W, W)`` window per
   tile out of the oversampled grid (transposed, NaN-padded) with a
   ``vmap``'d ``dynamic_slice``, and the kernel contracts each window
   against weight matrices built in VMEM from the staged channels -
   identical discipline to :mod:`.map_pallas`, but the matmul is
   (W, W) @ (W, T_S) per tile instead of (grid, grid) @ (grid, T_S).

NaN semantics reproduced exactly (both gated by per-frame SMEM any-NaN
flags so clean frames skip the indicator matmuls):

- scipy ``RegularGridInterpolator`` corner semantics on the oversampled
  grid: any NaN among the 2x2 bilinear corners -> NaN. The window is
  passed raw (NaN included); the kernel derives the indicator grid with
  ``isnan`` and zero-fills for the value matmul, so NaN padding outside
  the true grid is harmless (indicators are 0/1, and zeroed values
  multiply zero weights).
- the reference's 4-neighbour propagation on the ORIGINAL image grid
  (body_xy.py:1855-1866), whole-grid in VMEM (the original image is
  small by construction - the oversampled one is what grew).

Everything traced in the kernel stays strictly 32-bit (Mosaic has no
64-bit types; see ops/map_pallas.py for the x64 poisoning pitfalls).
"""

from __future__ import annotations

import functools
import os
import sys

import numpy as np

from .map_pallas import _pad8

#: spatial tile shape (rows x cols of the map): one kernel grid step
#: handles T_S = rows*cols samples on the lane axis. 32x64 = 2048 keeps
#: the NaN-skip ``lax.cond`` pipeline-friendly - the same measurement
#: as ops/map_pallas.py's tile sweep (conds at 4096-lane tiles stop
#: overlapping the next step's DMA and serialise the whole frame).
_T_SP = tuple(
    int(v) for v in os.environ.get(
        'PLANETMAPPER_TPU_SMOOTH_TILE', '32x64'
    ).split('x')
)

#: skip the NaN contractions at run time via lax.cond on the per-frame
#: any-NaN flags ('1', default), or always compute them ('0')
_NAN_COND = os.environ.get(
    'PLANETMAPPER_TPU_SMOOTH_NAN_COND', '1'
) != '0'

#: oversampled-grid window side per tile (both axes); 128 keeps the
#: three (W, T_S) f32 weight/product matrices + the raw window well
#: inside VMEM
_W = 128

#: original-image NaN grid must fit VMEM whole for the propagation
#: contraction (padded side, f32 + bf16 indicator copies)
_MAX_IMG_PAD = 384

#: channel rows (same layout as ops/map_pallas.py)
_CH_I0 = 6
_CH_VALID, _CH_OUT, _CH_Y0, _CH_Y1, _CH_X0, _CH_X1 = range(6)


def smooth_pallas_enabled() -> bool:
    import jax

    if os.environ.get('PLANETMAPPER_TPU_MAP_PALLAS', '1') == '0':
        return False
    return jax.default_backend() not in ('cpu',)


def stage_smooth_tiles(x_map, y_map, iy0: int, ix0: int,
                       n_ys: int, n_xs: int,
                       y_step: float, x_step: float,
                       ny: int, nx: int, propagate_nan: bool):
    """
    Host staging for one (map, box) configuration: channel arrays +
    per-tile window origins, or ``None`` when any tile's care footprint
    exceeds the window (the caller keeps the XLA path; the check is
    static, so the compiled program never needs a fallback branch).

    Returns ``(by, bx, aux, oy, ox, my_p, mx_p)`` as numpy arrays in
    the (G, 8, T_S) / (G,) layouts the kernel consumes.
    """
    if propagate_nan and max(_pad8(ny), _pad8(nx)) > _MAX_IMG_PAD:
        return None
    my, mx = x_map.shape
    yb = (np.asarray(y_map, dtype=np.float64) - iy0) / y_step
    xb = (np.asarray(x_map, dtype=np.float64) - ix0) / x_step
    valid = np.isfinite(xb) & np.isfinite(yb)
    inside = (
        (yb >= 0.0) & (yb <= n_ys - 1) & (xb >= 0.0) & (xb <= n_xs - 1)
    )
    care = valid & inside
    ybz = np.where(care, yb, 0.0)
    xbz = np.where(care, xb, 0.0)
    iy = np.clip(np.floor(ybz), 0, max(n_ys - 2, 0))
    ix = np.clip(np.floor(xbz), 0, max(n_xs - 2, 0))
    ty = (ybz - iy).astype(np.float32)
    tx = (xbz - ix).astype(np.float32)

    tr, tc = _T_SP
    T_S = tr * tc
    my_p = -(-my // tr) * tr
    mx_p = -(-mx // tc) * tc

    def tiles(a, fill):
        a2 = np.pad(
            a, ((0, my_p - my), (0, mx_p - mx)), constant_values=fill
        )
        return (
            a2.reshape(my_p // tr, tr, mx_p // tc, tc)
            .swapaxes(1, 2)
            .reshape(-1, T_S)
        )

    care_t = tiles(care, False)
    iy_t = tiles(iy, 0.0)
    ix_t = tiles(ix, 0.0)
    big = float(n_ys + n_xs + 10)
    oy = np.clip(
        np.min(np.where(care_t, iy_t, big), axis=1).astype(np.int64) - 1,
        0, max(n_ys - _W, 0),
    )
    ox = np.clip(
        np.min(np.where(care_t, ix_t, big), axis=1).astype(np.int64) - 1,
        0, max(n_xs - _W, 0),
    )
    # +1 covers the bilinear's second corner
    fits = np.where(
        care_t,
        (iy_t >= oy[:, None]) & (iy_t + 1 <= oy[:, None] + _W - 1)
        & (ix_t >= ox[:, None]) & (ix_t + 1 <= ox[:, None] + _W - 1),
        True,
    )
    if not fits.all():
        return None

    iy_loc = tiles(iy, 0.0) - oy[:, None]
    ix_loc = tiles(ix, 0.0) - ox[:, None]
    zeros = np.zeros_like(care_t, dtype=np.float32)

    def pack(rows):
        rows = list(rows) + [zeros] * (8 - len(rows))
        return np.stack(
            [r.astype(np.float32) for r in rows], axis=1
        )  # (G, 8, T_S)

    by = pack([
        tiles(1.0 - ty, 0.0), tiles(ty, 0.0), zeros, zeros, zeros,
        zeros, iy_loc,
    ])
    bx = pack([
        tiles(1.0 - tx, 0.0), tiles(tx, 0.0), zeros, zeros, zeros,
        zeros, ix_loc,
    ])
    aux_rows = [care_t]
    if propagate_nan:
        # 4-neighbour indices + outside flag on the UNSCALED pixel
        # coordinates (reference body_xy.py:1855-1866)
        xm = np.where(valid, np.asarray(x_map, np.float64), 0.0)
        ym = np.where(valid, np.asarray(y_map, np.float64), 0.0)
        outside = (
            (xm < 0.0) | (ym < 0.0) | (xm > nx - 1) | (ym > ny - 1)
        )
        clip = lambda v, hi: np.clip(v, 0, hi)
        aux_rows += [
            tiles(outside, True),
            tiles(clip(np.floor(ym), ny - 1), 0.0),
            tiles(clip(np.ceil(ym), ny - 1), 0.0),
            tiles(clip(np.floor(xm), nx - 1), 0.0),
            tiles(clip(np.ceil(xm), nx - 1), 0.0),
        ]
    aux = pack(aux_rows)
    return (
        by, bx, aux,
        oy.astype(np.int32), ox.astype(np.int32), my_p, mx_p,
    )


@functools.lru_cache(maxsize=None)
def _smooth_eval_fn(propagate_nan: bool, n_ys: int, n_xs: int,
                    ny: int, nx: int, n_tiles: int,
                    interpret: bool = False):
    """
    Build the windowed kernel program:
    ``fn(final, img_nan, oy, ox, by, bx, aux) -> (G, T_S) f32`` with
    ``final`` the raw (n_ys, n_xs) oversampled grid (NaN included) and
    ``img_nan`` the (ny, nx) original-image NaN grid (f32 0/1).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if sys.getrecursionlimit() < 10_000:
        sys.setrecursionlimit(10_000)

    f32 = jnp.float32
    tr, tc = _T_SP
    T_S = tr * tc
    G = n_tiles
    W = _W
    ny_p = _pad8(ny)
    nx_p = _pad8(nx)

    def weight_rows(block, row_a: int, row_b: int, n_p: int):
        i0 = block[_CH_I0 : _CH_I0 + 1, :].astype(jnp.int32)
        jc = lax.broadcasted_iota(jnp.int32, (n_p, T_S), 0)
        return (
            jnp.where(jc == i0, block[row_a : row_a + 1, :],
                      np.float32(0.0))
            + jnp.where(jc == i0 + np.int32(1),
                        block[row_b : row_b + 1, :], np.float32(0.0))
        )

    def corner_rows(block, n_p: int, dtype):
        i0 = block[_CH_I0 : _CH_I0 + 1, :].astype(jnp.int32)
        jc = lax.broadcasted_iota(jnp.int32, (n_p, T_S), 0)
        return ((jc == i0) | (jc == i0 + np.int32(1))).astype(dtype)

    def kernel(flags_ref, winT_ref, nanf_ref, by_ref, bx_ref, aux_ref,
               out_ref):
        winT = winT_ref[0]  # (W, W) f32 raw: [x-local, y-local]
        nw = jnp.isnan(winT)
        cw = jnp.where(nw, np.float32(0.0), winT)
        by = by_ref[0]
        bx = bx_ref[0]
        aux = aux_ref[0]
        wyT = weight_rows(by, 0, 1, W)  # (W, T_S)
        wxT = weight_rows(bx, 0, 1, W)
        rowsT = jnp.dot(
            cw, wyT, preferred_element_type=f32,
            precision=lax.Precision.HIGHEST,
        )
        val = jnp.sum(rowsT * wxT, axis=0, keepdims=True)
        mask = aux[_CH_VALID : _CH_VALID + 1, :] > np.float32(0.5)

        # scipy RegularGridInterpolator corner semantics on the
        # oversampled grid: any NaN among the 2x2 corners -> NaN.
        # 0/1 bf16 products are exact (counts <= 4).
        def with_grid_nan():
            cyT = corner_rows(by, W, jnp.bfloat16)
            cxT = corner_rows(bx, W, f32)
            c = jnp.dot(
                nw.astype(jnp.bfloat16), cyT, preferred_element_type=f32
            )
            return jnp.sum(c * cxT, axis=0, keepdims=True)

        def no_nan():
            return jnp.zeros((1, T_S), f32)

        if _NAN_COND:
            cnt_g = lax.cond(flags_ref[0] > np.int32(0), with_grid_nan,
                             no_nan)
        else:
            cnt_g = with_grid_nan()
        mask = mask & (cnt_g < np.float32(0.5))

        if propagate_nan:
            def with_img_nan():
                y0 = aux[_CH_Y0 : _CH_Y0 + 1, :].astype(jnp.int32)
                y1 = aux[_CH_Y1 : _CH_Y1 + 1, :].astype(jnp.int32)
                x0 = aux[_CH_X0 : _CH_X0 + 1, :].astype(jnp.int32)
                x1 = aux[_CH_X1 : _CH_X1 + 1, :].astype(jnp.int32)
                jy = lax.broadcasted_iota(jnp.int32, (ny_p, T_S), 0)
                jx = lax.broadcasted_iota(jnp.int32, (nx_p, T_S), 0)
                uyT = ((jy == y0) | (jy == y1)).astype(jnp.bfloat16)
                uxT = ((jx == x0) | (jx == x1)).astype(f32)
                nf = nanf_ref[:, :].astype(jnp.bfloat16)
                cntT = jnp.dot(nf, uyT, preferred_element_type=f32)
                return jnp.sum(cntT * uxT, axis=0, keepdims=True)

            if _NAN_COND:
                cnt_i = lax.cond(
                    flags_ref[1] > np.int32(0), with_img_nan, no_nan
                )
            else:
                cnt_i = with_img_nan()
            outside = aux[_CH_OUT : _CH_OUT + 1, :] > np.float32(0.5)
            mask = mask & ~outside & (cnt_i < np.float32(0.5))
        out_ref[0] = jnp.where(mask, val, np.float32(np.nan))

    zero = np.int32(0)
    in_specs = [
        pl.BlockSpec((2,), lambda *_: (zero,), memory_space=pltpu.SMEM),
        pl.BlockSpec(
            (1, W, W), lambda g: (g, zero, zero),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (nx_p, ny_p), lambda *_: (zero, zero),
            memory_space=pltpu.VMEM,
        ),
    ]
    channel_spec = pl.BlockSpec(
        (1, 8, T_S), lambda g: (g, zero, zero), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, 1, T_S), lambda g: (g, zero, zero), memory_space=pltpu.VMEM
    )
    in_specs += [channel_spec] * 3

    call = pl.pallas_call(
        kernel,
        grid=(G,),
        out_shape=jax.ShapeDtypeStruct((G, 1, T_S), f32),
        in_specs=in_specs,
        out_specs=out_spec,
        interpret=interpret,
    )

    def fn(final, img_nan, oy, ox, by, bx, aux):
        # Transposed + NaN-padded so any window origin in
        # [0, n-W] x [0, n-W] slices in-bounds even when the grid is
        # smaller than the window; NaN padding is safe (see module doc)
        finT = jnp.pad(
            jnp.swapaxes(final.astype(f32), -1, -2),
            ((0, max(W - n_xs, 0)), (0, max(W - n_ys, 0))),
            constant_values=np.float32(np.nan),
        )
        nanfT = jnp.pad(
            jnp.swapaxes(img_nan.astype(f32), -1, -2),
            ((0, nx_p - nx), (0, ny_p - ny)),
        )
        flags = jnp.stack([
            jnp.isnan(final).any().astype(jnp.int32),
            (jnp.sum(nanfT) > 0.0).astype(jnp.int32),
        ])
        windows = jax.vmap(
            lambda o_x, o_y: lax.dynamic_slice(finT, (o_x, o_y), (W, W))
        )(ox, oy)
        out = call(flags, windows, nanfT, by, bx, aux)
        return out.reshape(G, T_S)

    # NOT jitted: always invoked from the caller's jitted program (see
    # ops/map_pallas.py on nested-jit recursion depth)
    return fn


def make_smooth_eval(propagate_nan: bool, n_ys: int, n_xs: int,
                     ny: int, nx: int, n_tiles: int,
                     interpret: bool = False):
    """Public builder (thin lru-cached wrapper; see `_smooth_eval_fn`)."""
    return _smooth_eval_fn(
        propagate_nan, n_ys, n_xs, ny, nx, n_tiles, interpret
    )


def untile(vals, my: int, mx: int):
    """
    Inverse of `stage_smooth_tiles`' spatial tiling: ``(G, T_S)`` kernel
    output -> ``(my, mx)`` map (jnp or numpy array in, same out).
    """
    tr, tc = _T_SP
    my_p = -(-my // tr) * tr
    mx_p = -(-mx // tc) * tc
    return (
        vals.reshape(my_p // tr, mx_p // tc, tr, tc)
        .swapaxes(1, 2)
        .reshape(my_p, mx_p)[:my, :mx]
    )
