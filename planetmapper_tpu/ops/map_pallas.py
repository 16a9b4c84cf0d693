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


# ---------------------------------------------------------------------------
# Staging (XLA): per-map basis/index/flag channels
# ---------------------------------------------------------------------------
def _staged_axis_basis(jnp, lax, t, k: int, u, n_c: int):
    """
    f64 de Boor-Cox basis for one axis over all samples: ``(basis list
    of k+1 (S,) f64, i0 (S,) i32)`` with ``i0 = interval - k`` the first
    coefficient index. Gather-free: the interval index is a compare
    count and the 2k surrounding knots come from a one-hot matmul
    against the shifted-knot table (knot values and 0/1 one-hots are
    f32-exact, so the f32 matmul reproduces the knots exactly).
    """
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
