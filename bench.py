#!/usr/bin/env python3
"""
Benchmark: full default backplane set throughput (the BASELINE.json metric).

Generates every default backplane for a 2048x2048 Jupiter frame with the
fused device pipeline and reports throughput in megapixels/second. The CPU
reference point is the reference implementation's ~80 us/pixel scalar
CSPICE loop (~0.0125 Mpix/s, BASELINE.md).

Prints one JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault(
    'PLANETMAPPER_KERNEL_PATH', '/root/reference/tests/data/kernels'
)

BASELINE_MPIX_PER_S = 0.0125  # reference CPU loop (BASELINE.md)


def main() -> None:
    size = int(os.environ.get('BENCH_SIZE', '2048'))
    n_warmup = 2
    n_runs = int(os.environ.get('BENCH_RUNS', '5'))

    import jax

    from planetmapper_tpu import BodyXY
    from planetmapper_tpu.pipeline import compute_backplanes

    t_setup0 = time.time()
    body = BodyXY(
        'Jupiter', observer='EARTH', utc='2005-01-01T00:00:00', sz=size
    )
    body.set_disc_params(size / 2, size / 2, size * 0.4, 12.3)
    setup_time = time.time() - t_setup0

    def run():
        out = compute_backplanes(body, as_numpy=False)
        # Block on one representative output per plane
        for v in out.values():
            v.block_until_ready()
        return out

    t_compile0 = time.time()
    for _ in range(n_warmup):
        out = run()
        # Disc params change between GUI-style calls; make sure that path
        # is warm too (no recompile - traced arguments)
        body.adjust_disc_params(dx=0.25)
    compile_time = time.time() - t_compile0

    times = []
    for _ in range(n_runs):
        body.adjust_disc_params(dx=0.1)  # defeat any caching
        t0 = time.time()
        out = run()
        times.append(time.time() - t0)
    best = min(times)

    n_planes = len(out)
    mpix = size * size / 1e6
    mpix_per_s = mpix / best

    result = {
        'metric': (
            'Backplane Mpix/sec (2048^2 full default set); '
            'map reprojection ms/frame'
        ),
        'value': round(mpix_per_s, 3),
        'unit': 'Mpix/s',
        'vs_baseline': round(mpix_per_s / BASELINE_MPIX_PER_S, 1),
        'detail': {
            'size': size,
            'n_backplanes': n_planes,
            'full_set_ms': round(best * 1e3, 3),
            'all_times_ms': [round(t * 1e3, 3) for t in times],
            'setup_s': round(setup_time, 3),
            'warmup_s': round(compile_time, 3),
            'device': str(jax.devices()[0]),
            'backend': jax.default_backend(),
        },
    }
    print(json.dumps(result))


if __name__ == '__main__':
    main()
