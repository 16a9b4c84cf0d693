#!/usr/bin/env python3
"""
Marginal-cost profile of the fused pipeline's plane groups.

For each group of backplanes, jit the full-minus-group subset of the
fused program (XLA dead-code-eliminates everything only that group
needed) and time it pipelined; ``full - subset`` is the group's marginal
device cost. Also times a bare minimal core. Grounds the roofline
analysis in docs/performance.md.

Usage: PROF_SIZE=2048 PROF_RUNS=8 python scripts/profile_sections.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
os.environ.setdefault(
    'PLANETMAPPER_KERNEL_PATH', '/root/reference/tests/data/kernels'
)

SIZE = int(os.environ.get('PROF_SIZE', '2048'))
RUNS = int(os.environ.get('PROF_RUNS', '8'))

GROUPS = {
    'lonlat': ['LON-GRAPHIC', 'LAT-GRAPHIC', 'LON-CENTRIC', 'LAT-CENTRIC'],
    'radec': ['RA', 'DEC'],
    'pix/km/ang': ['PIXEL-X', 'PIXEL-Y', 'KM-X', 'KM-Y',
                   'ANGULAR-X', 'ANGULAR-Y'],
    'illum': ['PHASE', 'INCIDENCE', 'EMISSION'],
    'azimuth': ['AZIMUTH'],
    'lst': ['LOCAL-SOLAR-TIME'],
    'state': ['DISTANCE', 'RADIAL-VELOCITY', 'DOPPLER'],
    'limb': ['LIMB-DISTANCE', 'LIMB-LON-GRAPHIC', 'LIMB-LAT-GRAPHIC'],
    'ring': ['RING-RADIUS', 'RING-LON-GRAPHIC', 'RING-DISTANCE'],
}


def main() -> None:
    import jax
    import jax.numpy as jnp

    from planetmapper_tpu import BodyXY
    from planetmapper_tpu.pipeline import get_fused_pipeline

    body = BodyXY(
        'Jupiter', observer='EARTH', utc='2005-01-01T00:00:00', sz=SIZE
    )
    body.set_disc_params(SIZE / 2, SIZE / 2, SIZE * 0.4, 12.3)
    anchors = jax.device_put(body._get_pipeline_anchors())
    fn = get_fused_pipeline(body, SIZE, SIZE)
    xy2a = np.asarray(body._get_xy2angular_matrix())
    disc = np.asarray(body.get_disc_params(), dtype=np.float64)
    radii = np.asarray(body.radii, dtype=np.float64)

    # The XLA path gets subset costs for free (dead-code elimination of
    # unrequested outputs); the Mosaic kernel computes what it is built
    # with, so subsets must be built as separate kernels (planes=...).
    from planetmapper_tpu.pipeline import _bucket_size, select_pipeline_impl

    _, use_pallas = select_pipeline_impl(
        body, _bucket_size(SIZE), _bucket_size(SIZE)
    )
    print(f'pipeline: {"Mosaic kernel" if use_pallas else "XLA graph"}',
          flush=True)

    def subset_fn(keep):
        if use_pallas:
            from planetmapper_tpu.ops.pallas_pipeline import (
                build_pallas_pipeline,
            )

            impl = build_pallas_pipeline(
                positive_west=body.positive_longitude_direction == 'W',
                prograde=body.prograde,
                have_sun=body._engine._pos_s is not None,
                optimize_speed=bool(body._optimize_speed),
                lst_quant=True,
                planes=tuple(keep),
            )

            @jax.jit
            def run(xy2a, disc, radii, anchors):
                out = impl(SIZE, SIZE, xy2a, disc, radii, anchors)
                return sum(
                    jnp.sum(jnp.nan_to_num(
                        v[::128, ::128].astype(jnp.float32)
                    ))
                    for v in out.values()
                )
            return run

        @jax.jit
        def run(xy2a, disc, radii, anchors):
            out = fn(xy2a, disc, radii, anchors)
            planes = [
                v for k, v in out.items()
                if k in keep
            ]
            return sum(
                jnp.sum(jnp.nan_to_num(v[::128, ::128].astype(jnp.float32)))
                for v in planes
            )
        return run

    all_names = [n for g in GROUPS.values() for n in g]

    def timed(keep, label):
        run = subset_fn(keep)
        t_c0 = time.time()
        d = disc.copy()
        float(run(xy2a, d, radii, anchors))  # compile
        compile_s = time.time() - t_c0
        best = float('inf')
        for _ in range(3):
            t0 = time.time()
            for i in range(RUNS):
                d = d + 1e-4
                cs = run(xy2a, d, radii, anchors)
            float(cs)
            best = min(best, (time.time() - t0) / RUNS)
        print(
            f'{label:>22s}: {best * 1e3:8.2f} ms  '
            f'(compile {compile_s:.0f}s)',
            flush=True,
        )
        return best

    t_full = timed(all_names, 'FULL (26 planes)')
    t_min = timed(['PIXEL-X'], 'PIXEL-X only')
    results = {}
    for gname, gplanes in GROUPS.items():
        keep = [n for n in all_names if n not in gplanes]
        t = timed(keep, f'all minus {gname}')
        results[gname] = t_full - t
    print(f'\n{"group":>22s}  marginal ms')
    for gname, dt in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f'{gname:>22s}: {dt * 1e3:8.2f}')
    print(f'{"core (PIXEL-X only)":>22s}: {t_min * 1e3:8.2f}')
    print(f'{"full":>22s}: {t_full * 1e3:8.2f}')


if __name__ == '__main__':
    main()
