#!/usr/bin/env python3
"""
Pipeline timing sweep: honest (fetch-barrier) per-call timing of the
fused backplane pipeline for one env configuration. Env knobs:
PLANETMAPPER_TPU_BAND_ROWS, PLANETMAPPER_TPU_LT_ITERS, BENCH_SIZE.

Prints one line: ``config -> blocked ms, pipelined ms/call``.
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

os.environ.setdefault(
    'PLANETMAPPER_KERNEL_PATH', '/root/reference/tests/data/kernels'
)


def main() -> None:

    from planetmapper_tpu import BodyXY
    from planetmapper_tpu.pipeline import compute_backplanes

    size = int(os.environ.get('BENCH_SIZE', '2048'))
    body = BodyXY(
        'Jupiter', observer='EARTH', utc='2005-01-01T00:00:00', sz=size
    )
    body.set_disc_params(size / 2, size / 2, size * 0.4, 12.3)

    t0 = time.time()
    out, cs = compute_backplanes(body, as_numpy=False, with_checksum=True)
    float(cs)
    warm = time.time() - t0

    ts = []
    for _ in range(5):
        body.adjust_disc_params(dx=0.1)
        t0 = time.time()
        out, cs = compute_backplanes(
            body, as_numpy=False, with_checksum=True
        )
        float(cs)
        ts.append((time.time() - t0) * 1e3)
    blocked = min(ts)

    n = 12
    body.adjust_disc_params(dx=0.1)
    t0 = time.time()
    for _ in range(n):
        body.adjust_disc_params(dx=0.1)
        out, cs = compute_backplanes(
            body, as_numpy=False, with_checksum=True
        )
    float(cs)
    pipelined = (time.time() - t0) * 1e3 / n

    cfg = {
        'size': size,
        'band': os.environ.get('PLANETMAPPER_TPU_BAND_ROWS', '256'),
        'lt': os.environ.get('PLANETMAPPER_TPU_LT_ITERS', '2'),
    }
    print(
        f'{cfg} -> blocked {blocked:.1f} ms, pipelined {pipelined:.1f} '
        f'ms/call (warm {warm:.0f}s)',
        flush=True,
    )


if __name__ == '__main__':
    main()
