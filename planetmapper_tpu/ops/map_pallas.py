"""
Pallas TPU kernel for the map-reprojection spline evaluation.

This is the kernel-level sibling of :mod:`.interp_device`'s one-hot XLA
evaluator, built for the same reason as :mod:`.pallas_pipeline`: the XLA
formulation materialises its (samples, n_coeffs) one-hot weight matrices
to HBM between the VPU build and the MXU contraction, so a 720x1440 map
against a 150^2 coefficient grid moves ~5 GB of weight/indicator traffic
per frame (~38 ms measured on v5e) for ~0.1 GB of useful output.

The work splits by what varies per frame:

1. **Staging (XLA, once per map):** the de Boor-Cox basis values, knot
   interval indices, 4-neighbour indices and validity/outside flags
   depend only on the map sample coordinates and the knot vectors - not
   on the image - so they are computed once (in f64, gather-free: the
   2k knots around each sample come from an exactly-representable f32
   one-hot matmul) and packed into three ``(G, 8, T_S)`` f32 channel
   arrays that live in the device cache across the whole frame stream.
2. **Evaluation (Pallas, per frame):** each grid step loads one tile of
   staged channels, scatters the basis rows into transposed weight
   matrices ``W^T (n_coeffs, T_S)`` with a sublane-iota compare, and
   contracts ``C^T @ Wy^T`` on the MXU; every intermediate stays in
   VMEM. An earlier revision computed the basis *inside* the kernel:
   correct, but the ~100-op de Boor chain on (1, T_S) rows ran on
   1/8-utilised vregs and dominated the per-step time (~11 us/step,
   6-7 ms/frame). Staging cut the kernel to the weight build + matmuls.

Numerics:

- The coefficient contraction runs as an f32 matmul with
  ``precision=HIGHEST``: a DEFAULT-precision f32 MXU matmul quantizes
  its operands to bf16 (0.4 % relative - measured, both on hardware and
  in interpret mode), far outside the evaluator's 1e-5 parity bar.
- bf16 operands appear only where exact: the 0/1 NaN-indicator count
  (integer sums <= 4).
- Basis values are staged from f64 coordinates, so the kernel's only
  approximation is the f32 contraction itself (~1e-6 relative observed).

The NaN-propagation contraction is wrapped in a ``lax.cond`` on a
per-frame "has any NaN" scalar: NaN-free frames (the common streaming
case) skip that matmul and the indicator build entirely at run time.

Everything traced inside the kernel is kept strictly 32-bit: with
``jax_enable_x64`` on, a bare Python int in ``jnp.clip`` or an index map
becomes an i64 operand, and Mosaic (which has no 64-bit types) either
recurses infinitely lowering the convert or rejects the module
("func.return (i64)").

Reference semantics being reproduced: scipy ``RectBivariateSpline.ev``
clamped evaluation + the reference's 4-neighbour NaN propagation
(planetmapper/body_xy.py:1651-1702, 1855-1866).
"""

from __future__ import annotations

import functools
import os
import sys
from typing import NamedTuple

import numpy as np

#: samples per kernel tile (lane-axis length of the transposed weights).
#: Larger tiles amortise the per-grid-step overhead over more samples,
#: but past 2048 the NaN-propagation ``lax.cond`` stops overlapping with
#: the next step's DMA and the whole frame serialises (measured on the
#: 720x1440 smooth map: 3.9 ms at 2048 vs 29.6 ms at 4096 with the cond,
#: 4.4 ms at 4096 without it). 2048 is fastest with and without NaNs.
_T_S = int(os.environ.get('PLANETMAPPER_TPU_MAP_TILE', '2048'))

#: skip the NaN contraction at run time via lax.cond on the per-frame
#: any-NaN flag ('1', default), or always compute it ('0')
_NAN_COND = os.environ.get('PLANETMAPPER_TPU_MAP_NAN_COND', '1') != '0'

#: padded-dimension ceiling for keeping the coefficient grid + weight
#: matrices in VMEM; grids bigger than this stay on the XLA evaluator
_MAX_PAD = 640

#: channel rows of the packed per-axis basis arrays (G, 8, T_S):
#: rows 0..k = basis values, row _CH_I0 = first coefficient index (f32)
_CH_I0 = 6

#: channel rows of the packed aux array: valid, outside, y0, y1, x0, x1
_CH_VALID, _CH_OUT, _CH_Y0, _CH_Y1, _CH_X0, _CH_X1 = range(6)


def _pad8(n: int) -> int:
    """Sublane-dimension padding: Mosaic only needs multiples of 8 on
    the second-to-last axis, and every padded row is wasted VPU/MXU
    work, so coefficient/indicator matrices pad to 8 not 128."""
    return -(-n // 8) * 8


def pallas_map_supported(kx: int, ky: int, n_cy: int, n_cx: int,
                         ny_i: int, nx_i: int) -> bool:
    """Whether the Pallas evaluator covers this spline configuration on
    this backend (TPU only; CPU tests exercise the XLA path)."""
    import jax

    if os.environ.get('PLANETMAPPER_TPU_MAP_PALLAS', '1') == '0':
        return False
    if jax.default_backend() in ('cpu',):
        return False
    if not (1 <= kx <= 3 and 1 <= ky <= 3):
        return False
    return max(_pad8(d) for d in (n_cy, n_cx, ny_i, nx_i)) <= _MAX_PAD


def pallas_map_windowed_candidate(kx: int, ky: int) -> bool:
    """Whether the windowed Mosaic evaluator may apply (backend/degree
    gate only - per-map footprint feasibility is decided by
    :func:`stage_windowed`'s fits flag)."""
    import jax

    if os.environ.get('PLANETMAPPER_TPU_MAP_PALLAS', '1') == '0':
        return False
    if jax.default_backend() in ('cpu',):
        return False
    return 1 <= kx <= 3 and 1 <= ky <= 3


# ---------------------------------------------------------------------------
# Staging (XLA): per-map basis/index/flag channels
# ---------------------------------------------------------------------------
def _staged_axis_basis(jnp, lax, t, k: int, u, n_c: int,
                       chunk: int = 131072):
    """
    f64 de Boor-Cox basis for one axis over all samples: ``(basis list
    of k+1 (S,) f64, i0 (S,) i32)`` with ``i0 = interval - k`` the first
    coefficient index. Gather-free: the interval index is a compare
    count and the 2k surrounding knots come from a one-hot matmul
    against the shifted-knot table (knot values and 0/1 one-hots are
    f32-exact, so the f32 matmul reproduces the knots exactly).

    Samples stream in ``chunk`` blocks: the (S, n_knots) compare/one-hot
    intermediates would otherwise reach gigabytes for large sources
    (1M map samples x 1024-class knot vectors). Staging is one-time per
    map configuration, so the serialized chunks cost nothing per frame.
    """
    S = u.shape[0]
    if S > chunk:
        n_chunks = -(-S // chunk)
        pad = n_chunks * chunk - S
        up = jnp.pad(u, (0, pad)).reshape(n_chunks, chunk)

        def body(uc):
            basis, i0 = _staged_axis_basis(jnp, lax, t, k, uc, n_c)
            return jnp.stack(
                [b for b in basis] + [i0.astype(jnp.float64)]
            )

        out = lax.map(body, up)  # (n_chunks, k+2, chunk)
        out = jnp.moveaxis(out, 1, 0).reshape(k + 2, n_chunks * chunk)
        out = out[:, :S]
        return list(out[: k + 1]), out[k + 1].astype(jnp.int32)
    n_t = t.shape[0]
    t = t.astype(jnp.float64)
    u = jnp.clip(u.astype(jnp.float64), t[k], t[-k - 1])
    ge = u[:, None] >= t[None, :]
    i = jnp.clip(jnp.sum(ge.astype(jnp.int32), axis=1) - 1, k, n_c - 1)
    oh = (
        jnp.arange(n_t, dtype=jnp.int32)[None, :] == i[:, None]
    ).astype(jnp.float32)
    tp = jnp.concatenate(
        [jnp.full((k,), t[0]), t, jnp.full((k,), t[-1])]
    )
    tmat = jnp.stack(
        [tp[m + 1 : m + 1 + n_t] for m in range(2 * k)], axis=-1
    ).astype(jnp.float32)
    knots = jnp.matmul(
        oh, tmat, precision=lax.Precision.HIGHEST
    ).astype(jnp.float64)

    def t_at(o: int):  # t[i + o], o in [1-k, k]
        return knots[:, o + k - 1]

    n = [jnp.ones_like(u)]
    for d in range(1, k + 1):
        left = [t_at(1 - j) for j in range(d, 0, -1)]
        right = [t_at(j) for j in range(1, d + 1)]
        terms = []
        for j in range(d):
            denom = right[j] - left[j]
            denom = jnp.where(denom == 0.0, 1.0, denom)
            terms.append((u - left[j]) / denom)
        n_new = [n[0] * (1.0 - terms[0])]
        for j in range(1, d):
            n_new.append(n[j - 1] * terms[j - 1] + n[j] * (1.0 - terms[j]))
        n_new.append(n[d - 1] * terms[d - 1])
        n = n_new
    return n, i - k


@functools.lru_cache(maxsize=None)
def _stage_fn(kx: int, ky: int, propagate_nan: bool, n_ty: int,
              n_tx: int, n_samples: int, ny_i: int, nx_i: int):
    """
    Jitted stager: ``(ty, tx, y64, x64, valid) -> (by, bx, aux)``, three
    ``(G, 8, T_S)`` f32 channel arrays (see module docstring). Run once
    per (map, knots, degree) and cached by the caller - its cost (a few
    ms of f64 XLA) amortises over the frame stream.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    n_cy = n_ty - ky - 1
    n_cx = n_tx - kx - 1
    T_S = _T_S
    G = -(-n_samples // T_S)
    S_pad = G * T_S

    def pack(rows):
        rows = list(rows) + [jnp.zeros((n_samples,), jnp.float32)] * (
            8 - len(rows)
        )
        stacked = jnp.stack(
            [jnp.pad(r.astype(jnp.float32), (0, S_pad - n_samples))
             for r in rows]
        )  # (8, S_pad)
        return jnp.moveaxis(stacked.reshape(8, G, T_S), 1, 0)

    def fn(ty, tx, y64, x64, valid):
        by, iy0 = _staged_axis_basis(jnp, lax, ty, ky, y64, n_cy)
        bx, ix0 = _staged_axis_basis(jnp, lax, tx, kx, x64, n_cx)
        by_rows = by + [jnp.zeros((n_samples,), jnp.float32)] * (
            _CH_I0 - len(by)
        ) + [iy0.astype(jnp.float32)]
        bx_rows = bx + [jnp.zeros((n_samples,), jnp.float32)] * (
            _CH_I0 - len(bx)
        ) + [ix0.astype(jnp.float32)]
        aux_rows = [valid.astype(jnp.float32)]
        if propagate_nan:
            # 4-neighbour indices + outside flag on the UNCLAMPED f64
            # coordinates (reference body_xy.py:1855-1866)
            outside = (
                (x64 < 0.0) | (y64 < 0.0)
                | (x64 > nx_i - 1) | (y64 > ny_i - 1)
            )
            clip = lambda v, hi: jnp.clip(v, 0, hi).astype(jnp.float32)
            aux_rows += [
                outside.astype(jnp.float32),
                clip(jnp.floor(y64), ny_i - 1),
                clip(jnp.ceil(y64), ny_i - 1),
                clip(jnp.floor(x64), nx_i - 1),
                clip(jnp.ceil(x64), nx_i - 1),
            ]
        return pack(by_rows), pack(bx_rows), pack(aux_rows)

    return jax.jit(fn)


def stage_samples(ty, tx, kx: int, ky: int, propagate_nan: bool,
                  y64, x64, valid, ny_i: int, nx_i: int):
    """Public staging entry: channel arrays for :func:`make_pallas_eval_staged`."""
    fn = _stage_fn(
        kx, ky, propagate_nan, ty.shape[0], tx.shape[0],
        y64.shape[0], ny_i, nx_i,
    )
    return fn(ty, tx, y64, x64, valid)


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def _pallas_eval_fn(kx: int, ky: int, n_frames: int, batched: bool,
                    propagate_nan: bool,
                    n_cy: int, n_cx: int, ny_i: int, nx_i: int,
                    n_samples: int, interpret: bool = False):
    """
    Build the kernel program for one static configuration:
    ``fn(c2, nanf, by, bx, aux) -> (F?, n_samples) f32`` with ``c2`` the
    (batched) coefficient grid, ``nanf`` the 0/1 NaN grid and by/bx/aux
    the staged channel arrays.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # Tracing a pallas_call nested inside the caller's jit plus Mosaic
    # lowering exceeds CPython's default 1000-frame recursion limit
    if sys.getrecursionlimit() < 10_000:
        sys.setrecursionlimit(10_000)

    f32 = jnp.float32
    F = n_frames
    n_cyp = _pad8(n_cy)
    n_cxp = _pad8(n_cx)
    ny_p = _pad8(ny_i)
    nx_p = _pad8(nx_i)
    T_S = _T_S
    G = -(-n_samples // T_S)
    S_pad = G * T_S

    def weightT(basis_block, k: int, n_p: int):
        i0 = basis_block[_CH_I0 : _CH_I0 + 1, :].astype(jnp.int32)
        jc = lax.broadcasted_iota(jnp.int32, (n_p, T_S), 0)
        w = jnp.zeros((n_p, T_S), f32)
        for a in range(k + 1):
            w = w + jnp.where(
                jc == i0 + np.int32(a),
                basis_block[a : a + 1, :],
                np.float32(0.0),
            )
        return w

    def kernel(anynan_ref, ct_ref, nanf_ref, by_ref, bx_ref, aux_ref,
               out_ref):
        by = by_ref[0]   # (8, T_S)
        bx = bx_ref[0]
        aux = aux_ref[0]
        wyT = weightT(by, ky, n_cyp)
        wxT = weightT(bx, kx, n_cxp)

        # HIGHEST: a DEFAULT-precision f32 MXU matmul quantizes its
        # operands to bf16 (0.4% relative - measured), in interpret
        # mode and on hardware alike
        rowsT = jnp.dot(
            ct_ref[:, :], wyT, preferred_element_type=f32,
            precision=lax.Precision.HIGHEST,
        )
        val = jnp.sum(rowsT * wxT, axis=0, keepdims=True)
        mask = aux[_CH_VALID : _CH_VALID + 1, :] > np.float32(0.5)
        if propagate_nan:
            def with_nan():
                # indicator build lives inside the cond so NaN-free
                # frames (the common streaming case) skip it entirely
                y0 = aux[_CH_Y0 : _CH_Y0 + 1, :].astype(jnp.int32)
                y1 = aux[_CH_Y1 : _CH_Y1 + 1, :].astype(jnp.int32)
                x0 = aux[_CH_X0 : _CH_X0 + 1, :].astype(jnp.int32)
                x1 = aux[_CH_X1 : _CH_X1 + 1, :].astype(jnp.int32)
                jy = lax.broadcasted_iota(jnp.int32, (ny_p, T_S), 0)
                jx = lax.broadcasted_iota(jnp.int32, (nx_p, T_S), 0)
                uyT = ((jy == y0) | (jy == y1)).astype(jnp.bfloat16)
                uxT = ((jx == x0) | (jx == x1)).astype(f32)
                nf = nanf_ref[:, :].astype(jnp.bfloat16)
                # cnt[s] = sum_xy Ux[s,x] nanf[y,x] Uy[s,y]; nanf is
                # stored transposed (nx_p, ny_p) so the reduction rides
                # the sublane axis twice; 0/1 bf16 products are exact
                cntT = jnp.dot(nf, uyT, preferred_element_type=f32)
                return jnp.sum(cntT * uxT, axis=0, keepdims=True)

            def no_nan():
                return jnp.zeros((1, T_S), f32)

            if _NAN_COND:
                cnt = lax.cond(
                    anynan_ref[0] > np.int32(0), with_nan, no_nan
                )
            else:
                cnt = with_nan()
            outside = aux[_CH_OUT : _CH_OUT + 1, :] > np.float32(0.5)
            mask = mask & ~outside & (cnt < np.float32(0.5))
        out_ref[0] = jnp.where(mask, val, np.float32(np.nan))

    # np.int32 literals: with jax_enable_x64 a bare 0 traces the index
    # maps to i64 returns, which Mosaic rejects
    zero = np.int32(0)
    full = lambda *_: (zero, zero)
    in_specs = [
        # the frame's any-NaN flag in SMEM. The index map must be
        # explicit: a shapeless SMEM spec's default index map returns
        # Python-int zeros, which trace to i64 under x64 and fail
        # Mosaic legalization ("func.return (i64)")
        pl.BlockSpec((1,), lambda *_: (zero,), memory_space=pltpu.SMEM),
        pl.BlockSpec((n_cxp, n_cyp), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((nx_p, ny_p), full, memory_space=pltpu.VMEM),
    ]
    channel_spec = pl.BlockSpec(
        (1, 8, T_S), lambda g: (g, zero, zero),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, 1, T_S), lambda g: (g, zero, zero),
        memory_space=pltpu.VMEM,
    )
    in_specs += [channel_spec] * 3

    # The program is always single-frame; cubes run it per frame under
    # lax.map (a grid axis over frames measured 4-15x slower per frame:
    # per-step block churn swamps the tiny per-frame state change).
    call = pl.pallas_call(
        kernel,
        grid=(G,),
        out_shape=jax.ShapeDtypeStruct((G, 1, T_S), f32),
        in_specs=in_specs,
        out_specs=out_spec,
        interpret=interpret,
    )

    def fn(c2, nanf, by, bx, aux):
        cf = c2 if batched else c2[None]
        nf = nanf if batched else nanf[None]
        ct = jnp.pad(
            jnp.swapaxes(cf.astype(f32), -1, -2),
            ((0, 0), (0, n_cxp - n_cx), (0, n_cyp - n_cy)),
        )
        nanfT = jnp.pad(
            jnp.swapaxes(nf.astype(f32), -1, -2),
            ((0, 0), (0, nx_p - nx_i), (0, ny_p - ny_i)),
        )
        anynan = (
            jnp.sum(nanfT, axis=(-1, -2), keepdims=False) > 0.0
        ).astype(jnp.int32)[:, None]  # (F, 1)
        if batched:
            out = lax.map(
                lambda a: call(a[0], a[1], a[2], by, bx, aux),
                (anynan, ct, nanfT),
            )
            return out.reshape(F, S_pad)[:, :n_samples]
        out = call(anynan[0], ct[0], nanfT[0], by, bx, aux)
        return out.reshape(S_pad)[:n_samples]

    # NOT jitted: fn is always invoked from inside an already-jitted
    # program; a nested jit level only deepens the trace stack
    # (pallas_call tracing inside double-jit overflowed Python's
    # default recursion limit).
    return fn


def make_pallas_eval_staged(kx: int, ky: int, batched: bool,
                            propagate_nan: bool, n_samples: int,
                            interpret: bool = False):
    """
    ``eval(c2, nanf, by, bx, aux) -> flat f32 values`` against
    pre-staged channel arrays (:func:`stage_samples`) - the fast path
    for frame streams, where staging is cached across calls.
    """
    def eval_staged(c2, nanf, by, bx, aux):
        n_frames = c2.shape[0] if batched else 1
        fn = _pallas_eval_fn(
            kx, ky, n_frames, batched, propagate_nan,
            c2.shape[-2], c2.shape[-1], nanf.shape[-2], nanf.shape[-1],
            n_samples, interpret,
        )
        return fn(c2, nanf, by, bx, aux)

    return eval_staged


class WindowPlan(NamedTuple):
    """
    Static configuration of the windowed Mosaic evaluator (hashable:
    keys the compiled-program caches). Produced by
    :func:`stage_windowed` when every map tile's coefficient footprint
    fits a ``win`` window; large source images then evaluate at kernel
    speed instead of falling off to the XLA tiled path (the size cliff
    this removes: the plain kernel keeps the WHOLE grid in VMEM, so
    ``pallas_map_supported`` caps it at ``_MAX_PAD``).
    """

    kx: int
    ky: int
    propagate_nan: bool
    win: int          # coefficient/NaN window side (128 or 256)
    tile_h: int       # map-tile height in cells
    tile_w: int       # map-tile width in cells
    my: int           # map shape
    mx: int
    n_cy: int         # coefficient grid shape
    n_cx: int
    ny_i: int         # image (NaN grid) shape
    nx_i: int

    @property
    def g(self) -> int:
        return (-(-self.my // self.tile_h)) * (-(-self.mx // self.tile_w))

    @property
    def t_s(self) -> int:
        return self.tile_h * self.tile_w


#: candidate window sides for the windowed evaluator, tried in order.
#: 128^2 windows keep the per-step VMEM footprint ~2.5 MB; 256^2 (for
#: 2048-class sources whose tiles span ~230 coefficients) ~10 MB.
_WIN_SIDES = (128, 256)


def _tile_order(jnp, a, my: int, mx: int, tile_h: int, tile_w: int,
                fill):
    """(my*mx,) flat map-order -> (G, tile_h*tile_w) tile-order."""
    my_p = -(-my // tile_h) * tile_h
    mx_p = -(-mx // tile_w) * tile_w
    a2 = jnp.pad(
        a.reshape(my, mx), ((0, my_p - my), (0, mx_p - mx)),
        constant_values=fill,
    )
    return (
        a2.reshape(my_p // tile_h, tile_h, mx_p // tile_w, tile_w)
        .swapaxes(1, 2)
        .reshape(-1, tile_h * tile_w)
    )


def _untile_order(jnp, a, my: int, mx: int, tile_h: int, tile_w: int):
    """Inverse of :func:`_tile_order`: (..., G, T_S) -> (..., my*mx)."""
    my_p = -(-my // tile_h) * tile_h
    mx_p = -(-mx // tile_w) * tile_w
    lead = a.shape[:-2]
    a = a.reshape(
        lead + (my_p // tile_h, mx_p // tile_w, tile_h, tile_w)
    )
    a = a.swapaxes(-3, -2).reshape(lead + (my_p, mx_p))
    return a[..., :my, :mx].reshape(lead + (my * mx,))


@functools.lru_cache(maxsize=None)
def _stage_windowed_fn(plan: WindowPlan, n_ty: int, n_tx: int):
    """
    Jitted windowed stager: ``(ty, tx, y64, x64, valid) -> (by, bx,
    aux, oyx, onyx, fits)`` with per-tile basis channels in TILE order,
    window-RELATIVE coefficient/neighbour indices, per-tile window
    origins ``oyx``/``onyx`` ((G, 2) i32, (x, y) order for the
    transposed gathers) and a scalar ``fits`` that is True iff every
    tile's footprint fits its window (checked on the host once per
    map+spline configuration; unfit maps stay on the XLA tiled path -
    no run-time fallback branch in the kernel).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    kx, ky, W = plan.kx, plan.ky, plan.win
    my, mx, th, tw = plan.my, plan.mx, plan.tile_h, plan.tile_w
    n_cy, n_cx, ny_i, nx_i = plan.n_cy, plan.n_cx, plan.ny_i, plan.nx_i
    T_S = plan.t_s
    G = plan.g

    def pack(rows):
        rows = list(rows) + [jnp.zeros((G, T_S), jnp.float32)] * (
            8 - len(rows)
        )
        return jnp.stack(
            [r.astype(jnp.float32) for r in rows], axis=1
        )  # (G, 8, T_S)

    def fn(ty, tx, y64, x64, valid):
        yt = _tile_order(jnp, y64, my, mx, th, tw, 0.0)  # (G, T_S)
        xt = _tile_order(jnp, x64, my, mx, th, tw, 0.0)
        vt = _tile_order(jnp, valid, my, mx, th, tw, False)

        by, iy0 = _staged_axis_basis(
            jnp, lax, ty, ky, yt.ravel(), n_cy
        )
        bx, ix0 = _staged_axis_basis(
            jnp, lax, tx, kx, xt.ravel(), n_cx
        )
        iy0 = iy0.reshape(G, T_S)
        ix0 = ix0.reshape(G, T_S)
        big = np.int32(n_cy + n_cx + ny_i + nx_i)

        def tmin(v, care):
            return jnp.min(jnp.where(care, v, big), axis=1)

        def tmax(v, care):
            return jnp.max(jnp.where(care, v, -1), axis=1)

        # per-tile coefficient window origin + footprint check; the
        # spline support of sample s is [i0, i0 + k]
        oy = jnp.clip(tmin(iy0, vt), 0, max(n_cy - W, 0))
        ox = jnp.clip(tmin(ix0, vt), 0, max(n_cx - W, 0))
        fits = jnp.all(
            (tmax(iy0, vt) + ky <= oy + W - 1)
            & (tmax(ix0, vt) + kx <= ox + W - 1)
        )
        iy0r = jnp.clip(iy0 - oy[:, None], -1, W)
        ix0r = jnp.clip(ix0 - ox[:, None], -1, W)

        by = [b.reshape(G, T_S) for b in by]
        bx = [b.reshape(G, T_S) for b in bx]
        by_rows = by + [jnp.zeros((G, T_S), jnp.float32)] * (
            _CH_I0 - len(by)
        ) + [iy0r.astype(jnp.float32)]
        bx_rows = bx + [jnp.zeros((G, T_S), jnp.float32)] * (
            _CH_I0 - len(bx)
        ) + [ix0r.astype(jnp.float32)]
        aux_rows = [vt.astype(jnp.float32)]

        oyn = jnp.zeros((G,), jnp.int32)
        oxn = jnp.zeros((G,), jnp.int32)
        if plan.propagate_nan:
            outside = (
                (xt < 0.0) | (yt < 0.0)
                | (xt > nx_i - 1) | (yt > ny_i - 1)
            )
            y0 = jnp.clip(jnp.floor(yt), 0, ny_i - 1).astype(jnp.int32)
            y1 = jnp.clip(jnp.ceil(yt), 0, ny_i - 1).astype(jnp.int32)
            x0 = jnp.clip(jnp.floor(xt), 0, nx_i - 1).astype(jnp.int32)
            x1 = jnp.clip(jnp.ceil(xt), 0, nx_i - 1).astype(jnp.int32)
            care = vt & ~outside
            oyn = jnp.clip(tmin(y0, care), 0, max(ny_i - W, 0))
            oxn = jnp.clip(tmin(x0, care), 0, max(nx_i - W, 0))
            fits = fits & jnp.all(
                (tmax(y1, care) <= oyn + W - 1)
                & (tmax(x1, care) <= oxn + W - 1)
            )
            clipw = lambda v, o: jnp.clip(
                v - o[:, None], 0, W - 1
            ).astype(jnp.float32)
            aux_rows += [
                outside.astype(jnp.float32),
                clipw(y0, oyn), clipw(y1, oyn),
                clipw(x0, oxn), clipw(x1, oxn),
            ]
        oyx = jnp.stack([ox, oy], axis=1)   # transposed-gather order
        onyx = jnp.stack([oxn, oyn], axis=1)
        return (
            pack(by_rows), pack(bx_rows), pack(aux_rows),
            oyx, onyx, fits,
        )

    return jax.jit(fn)


def stage_windowed(plan: WindowPlan, ty, tx, y64, x64, valid):
    """Run the windowed stager for ``plan``; returns the staged tuple
    (``fits`` still a device scalar - caller decides)."""
    fn = _stage_windowed_fn(plan, ty.shape[0], tx.shape[0])
    return fn(ty, tx, y64, x64, valid)


@functools.lru_cache(maxsize=None)
def _pallas_eval_windowed_fn(plan: WindowPlan, n_frames: int,
                             batched: bool, interpret: bool = False):
    """
    Windowed kernel program: ``fn(c2, nanf, by, bx, aux, oyx, onyx) ->
    (F?, my*mx) f32`` in flat MAP order. Per grid step the kernel sees
    one (W, W) coefficient window and one (W, W) NaN window - gathered
    per frame in XLA from the per-tile origins - so VMEM use is bounded
    by ``win``, not the source-image size.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if sys.getrecursionlimit() < 10_000:
        sys.setrecursionlimit(10_000)

    f32 = jnp.float32
    kx, ky, W = plan.kx, plan.ky, plan.win
    T_S = plan.t_s
    G = plan.g
    propagate_nan = plan.propagate_nan

    def weightT(basis_block, k: int):
        i0 = basis_block[_CH_I0 : _CH_I0 + 1, :].astype(jnp.int32)
        jc = lax.broadcasted_iota(jnp.int32, (W, T_S), 0)
        w = jnp.zeros((W, T_S), f32)
        for a in range(k + 1):
            w = w + jnp.where(
                jc == i0 + np.int32(a),
                basis_block[a : a + 1, :],
                np.float32(0.0),
            )
        return w

    def kernel(anynan_ref, ctw_ref, nanfw_ref, by_ref, bx_ref, aux_ref,
               out_ref):
        by = by_ref[0]
        bx = bx_ref[0]
        aux = aux_ref[0]
        wyT = weightT(by, ky)
        wxT = weightT(bx, kx)
        rowsT = jnp.dot(
            ctw_ref[0], wyT, preferred_element_type=f32,
            precision=lax.Precision.HIGHEST,
        )
        val = jnp.sum(rowsT * wxT, axis=0, keepdims=True)
        mask = aux[_CH_VALID : _CH_VALID + 1, :] > np.float32(0.5)
        if propagate_nan:
            def with_nan():
                y0 = aux[_CH_Y0 : _CH_Y0 + 1, :].astype(jnp.int32)
                y1 = aux[_CH_Y1 : _CH_Y1 + 1, :].astype(jnp.int32)
                x0 = aux[_CH_X0 : _CH_X0 + 1, :].astype(jnp.int32)
                x1 = aux[_CH_X1 : _CH_X1 + 1, :].astype(jnp.int32)
                jy = lax.broadcasted_iota(jnp.int32, (W, T_S), 0)
                jx = lax.broadcasted_iota(jnp.int32, (W, T_S), 0)
                uyT = ((jy == y0) | (jy == y1)).astype(jnp.bfloat16)
                uxT = ((jx == x0) | (jx == x1)).astype(f32)
                nf = nanfw_ref[0].astype(jnp.bfloat16)
                cntT = jnp.dot(nf, uyT, preferred_element_type=f32)
                return jnp.sum(cntT * uxT, axis=0, keepdims=True)

            def no_nan():
                return jnp.zeros((1, T_S), f32)

            if _NAN_COND:
                cnt = lax.cond(
                    anynan_ref[0] > np.int32(0), with_nan, no_nan
                )
            else:
                cnt = with_nan()
            outside = aux[_CH_OUT : _CH_OUT + 1, :] > np.float32(0.5)
            mask = mask & ~outside & (cnt < np.float32(0.5))
        out_ref[0] = jnp.where(mask, val, np.float32(np.nan))

    zero = np.int32(0)
    block = lambda g: (g, zero, zero)
    in_specs = [
        pl.BlockSpec((1,), lambda *_: (zero,), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, W, W), block, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, W, W), block, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, T_S), block, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, T_S), block, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, T_S), block, memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((1, 1, T_S), block, memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        kernel,
        grid=(G,),
        out_shape=jax.ShapeDtypeStruct((G, 1, T_S), f32),
        in_specs=in_specs,
        out_specs=out_spec,
        interpret=interpret,
    )

    n_cyp = max(_pad8(plan.n_cy), W)
    n_cxp = max(_pad8(plan.n_cx), W)
    ny_p = max(_pad8(plan.ny_i), W)
    nx_p = max(_pad8(plan.nx_i), W)

    def fn(c2, nanf, by, bx, aux, oyx, onyx):
        F = n_frames
        cf = c2 if batched else c2[None]
        nf = nanf if batched else nanf[None]
        ctT = jnp.pad(
            jnp.swapaxes(cf.astype(f32), -1, -2),
            ((0, 0), (0, n_cxp - plan.n_cx), (0, n_cyp - plan.n_cy)),
        )
        nanfT = jnp.pad(
            jnp.swapaxes(nf.astype(f32), -1, -2),
            ((0, 0), (0, nx_p - plan.nx_i), (0, ny_p - plan.ny_i)),
        )
        anynan = (
            jnp.sum(nanfT, axis=(-1, -2)) > 0.0
        ).astype(jnp.int32)[:, None]  # (F, 1)

        def windows(mT, origins, any_flag):
            def gather(_):
                return jax.vmap(
                    lambda o: lax.dynamic_slice(
                        mT, (o[0], o[1]), (W, W)
                    )
                )(origins)

            def skip(_):
                return jnp.zeros((G, W, W), f32)

            # NaN-free frames skip the (G, W, W) NaN-window gather
            return lax.cond(any_flag > 0, gather, skip, None)

        def one(args):
            any_f, ctT_f, nanfT_f = args
            ctw = jax.vmap(
                lambda o: lax.dynamic_slice(
                    ctT_f, (o[0], o[1]), (W, W)
                )
            )(oyx)
            if propagate_nan:
                nanfw = windows(nanfT_f, onyx, any_f[0])
            else:
                nanfw = jnp.zeros((G, W, W), f32)
            return call(any_f, ctw, nanfw, by, bx, aux)

        if batched:
            out = lax.map(one, (anynan, ctT, nanfT))
            out = out.reshape(F, G, T_S)
            flat = _untile_order(
                jnp, out, plan.my, plan.mx, plan.tile_h, plan.tile_w
            )
            return flat
        out = one((anynan[0], ctT[0], nanfT[0])).reshape(G, T_S)
        return _untile_order(
            jnp, out, plan.my, plan.mx, plan.tile_h, plan.tile_w
        )

    return fn


def make_pallas_eval_windowed(plan: WindowPlan, batched: bool,
                              interpret: bool = False):
    """``eval(c2, nanf, by, bx, aux, oyx, onyx) -> flat f32 values``
    (map order) against a :func:`stage_windowed` staging."""
    def eval_windowed(c2, nanf, by, bx, aux, oyx, onyx):
        n_frames = c2.shape[0] if batched else 1
        fn = _pallas_eval_windowed_fn(
            plan, n_frames, batched, interpret
        )
        return fn(c2, nanf, by, bx, aux, oyx, onyx)

    return eval_windowed


def make_pallas_eval(kx: int, ky: int, batched: bool,
                     propagate_nan: bool, interpret: bool = False):
    """
    ``eval_all(ty, tx, c2, nanf, y, x, valid) -> flat f32 values`` with
    the same contract as :func:`interp_device._make_onehot_eval`'s
    return value: stages the sample channels and evaluates in one
    traced program. Callers with a frame stream should stage once via
    :func:`stage_samples` + :func:`make_pallas_eval_staged` instead.
    """
    def eval_all(ty, tx, c2, nanf, y, x, valid):
        ny_i, nx_i = nanf.shape[-2:]
        by, bx, aux = stage_samples(
            ty, tx, kx, ky, propagate_nan, y, x, valid, ny_i, nx_i
        )
        n_frames = c2.shape[0] if batched else 1
        fn = _pallas_eval_fn(
            kx, ky, n_frames, batched, propagate_nan,
            c2.shape[-2], c2.shape[-1], ny_i, nx_i,
            y.shape[0], interpret,
        )
        return fn(c2, nanf, by, bx, aux)

    return eval_all
