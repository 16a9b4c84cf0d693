#!/usr/bin/env python3
"""
Benchmark covering both halves of the BASELINE.json metric:

1. Full default backplane set throughput at 2048x2048 (Mpix/s) with the
   fused device pipeline - the primary value. CPU reference point: the
   reference's ~80 us/pixel scalar CSPICE loop (~0.0125 Mpix/s, BASELINE.md).
2. Map reprojection: Jupiter observation -> 1440x720 equirectangular
   ``map_img``, linear + cubic interpolation, ms/frame (BASELINE config 4).
3. JWST-cube style ephemeris-time batch: backplanes vmapped over many
   observation epochs, ms/frame (BASELINE config 5).

Prints one JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

os.environ.setdefault(
    'PLANETMAPPER_KERNEL_PATH', '/root/reference/tests/data/kernels'
)

BASELINE_MPIX_PER_S = 0.0125  # reference CPU loop (BASELINE.md)


def _make_sync(example_tree):
    """
    Build ``sync(tree) -> float``: a jitted reduction over tiny strided
    slices of every array leaf, fetched to the host as one scalar.

    This is the only *honest* completion timer on this transport:
    ``block_until_ready`` through the remote-TPU proxy acks when the
    execution is accepted, not when it finishes (measured: 0.3 ms
    "blocked" for a 26-plane 2048x2048 set whose real execution takes
    ~30 ms, while a data-dependent scalar fetch waits correctly). The
    scalar's value depends on every output, so its arrival proves the
    full set was computed; fetching one element keeps the D2H transfer
    out of the measurement.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def reduce_tree(tree):
        leaves = [
            v for v in jax.tree_util.tree_leaves(tree)
            if hasattr(v, 'dtype') and jnp.issubdtype(v.dtype, jnp.floating)
        ]
        return sum(
            jnp.sum(jnp.nan_to_num(v[(slice(None, None, 128),) * v.ndim]))
            for v in leaves
        )

    def sync(tree) -> float:
        return float(reduce_tree(tree))

    return sync


def bench_backplanes(size: int, n_runs: int) -> dict:
    from planetmapper_tpu import BodyXY
    from planetmapper_tpu.pipeline import compute_backplanes

    t_setup0 = time.time()
    body = BodyXY(
        'Jupiter', observer='EARTH', utc='2005-01-01T00:00:00', sz=size
    )
    body.set_disc_params(size / 2, size / 2, size * 0.4, 12.3)
    # the one-time transport/device session init (started on a thread at
    # body construction; 10-130 s through remote tunnels, independent of
    # any program) belongs to session establishment, not compile warmup -
    # join it here so setup_s and warmup_s decompose honestly
    from planetmapper_tpu._session_warm import wait_for_session

    wait_for_session()
    setup_time = time.time() - t_setup0

    def run():
        # completion via the checksum computed INSIDE the fused program:
        # a separate reduce program would compile through the (shared)
        # remote compile service right after the first call kicks off
        # the background steady-kernel build, and queue behind it -
        # adding the whole kernel build to the measured warmup
        out, cs = compute_backplanes(
            body, as_numpy=False, with_checksum=True
        )
        float(cs)
        return out

    t_compile0 = time.time()
    for _ in range(2):
        out = run()
        # Disc params change between GUI-style calls; make sure that path
        # is warm too (no recompile - traced arguments)
        body.adjust_disc_params(dx=0.25)
    compile_time = time.time() - t_compile0

    # Cold sessions serve the first calls from the XLA graph while the
    # Mosaic kernel compiles in the background (progressive cold start);
    # the timed loops below measure STEADY-STATE throughput, so block
    # until the kernel serves and report how long that took separately.
    from planetmapper_tpu.pipeline import wait_for_steady_state

    t_steady0 = time.time()
    wait_for_steady_state(body)
    steady_wait = time.time() - t_steady0

    from planetmapper_tpu.pipeline import compute_backplanes as _cb

    # one warm call through the (possibly just-swapped) steady kernel
    body.adjust_disc_params(dx=0.1)
    out, cs = _cb(body, as_numpy=False, with_checksum=True)
    float(cs)

    # Blocked: one synchronous call per timing. Completion is proven by
    # fetching the checksum scalar the fused program computes from
    # strided samples of every output plane - data-dependent like the
    # separate reduce program, but without paying a second program
    # dispatch through the tunnel.
    times = []
    for _ in range(n_runs):
        body.adjust_disc_params(dx=0.1)
        t0 = time.time()
        out, cs = _cb(body, as_numpy=False, with_checksum=True)
        float(cs)
        times.append(time.time() - t0)
    blocked_best = min(times)

    # Pipelined: enqueue n_runs full sets (disc params change per call,
    # so nothing is cached), then prove completion of the LAST set with
    # one scalar fetch - in-order device execution makes it a barrier
    # for the whole stream.
    t0 = time.time()
    for _ in range(n_runs):
        body.adjust_disc_params(dx=0.1)
        out, cs = _cb(body, as_numpy=False, with_checksum=True)
    float(cs)
    per_call = (time.time() - t0) / n_runs

    best = min(blocked_best, per_call)
    return {
        'mpix_per_s': size * size / 1e6 / best,
        'full_set_ms': round(best * 1e3, 3),
        'blocked_call_ms': round(blocked_best * 1e3, 3),
        'pipelined_call_ms': round(per_call * 1e3, 3),
        'all_times_ms': [round(t * 1e3, 3) for t in times],
        'n_backplanes': len(out),
        'setup_s': round(setup_time, 3),
        'warmup_s': round(compile_time, 3),
        'steady_kernel_extra_s': round(steady_wait, 3),
    }


def bench_map(n_runs: int) -> dict:
    from planetmapper_tpu import BodyXY

    size = 150
    body = BodyXY(
        'Jupiter', observer='EARTH', utc='2005-01-01T00:00:00', sz=size
    )
    body.set_disc_params(size / 2, size / 2, size * 0.4, 12.3)
    map_kwargs = {'projection': 'rectangular', 'degree_interval': 0.25}
    # x/y map generation is cached across frames (as in get_mapped_data)
    body.get_x_map(**map_kwargs)
    body.get_y_map(**map_kwargs)

    rng = np.random.default_rng(0)
    out = {}
    sync = None
    n_stream = max(n_runs * 4, 16)
    for name, interp in (('linear', 'linear'), ('cubic', 'cubic')):
        img = rng.normal(size=(size, size))
        m = body.map_img(img, interpolation=interp, **map_kwargs)
        if sync is None:
            sync = _make_sync(m)
        sync(m)  # warm/compile
        assert m.shape == (720, 1440), m.shape
        # Default-path per-frame cost: map_img returns device-resident
        # maps and dispatches asynchronously, so a stream of fresh frames
        # pipelines (host solve-free: coefficients are solved on device);
        # prove completion of the final result and amortise.
        frames = [rng.normal(size=(size, size)) for _ in range(n_stream)]
        t0 = time.time()
        for f in frames:
            m = body.map_img(f, interpolation=interp, **map_kwargs)
        sync(m)
        out[f'map_{name}_ms_per_frame'] = round(
            (time.time() - t0) / n_stream * 1e3, 3
        )
        # fully-synchronous numpy-returning call (pays one device->host
        # fetch of the f32 map through the transport); min-of-3 to match
        # the transport-floor methodology
        img = rng.normal(size=(size, size))
        t_sync = []
        for i in range(3):
            t0 = time.time()
            body.map_img(img * (1.0 + 1e-6 * i), interpolation=interp,
                         as_numpy=True, **map_kwargs)
            t_sync.append(time.time() - t0)
        out[f'map_{name}_sync_ms'] = round(min(t_sync) * 1e3, 3)

    # reduced-precision synchronous fetch: f16 halves the D2H bytes, the
    # dominant term of a synchronous map call on remote transports.
    # min-of-3 like the transport floor: single samples through the
    # shared tunnel are noisy enough to mask the 2x byte saving.
    img = rng.normal(size=(size, size))
    body.map_img(img, interpolation='linear', as_numpy=True,
                 fetch_dtype=np.float16, **map_kwargs)  # warm
    t_f16 = []
    for i in range(3):
        t0 = time.time()
        body.map_img(img * (1.0 + 1e-6 * (i + 1)), interpolation='linear',
                     as_numpy=True, fetch_dtype=np.float16, **map_kwargs)
        t_f16.append(time.time() - t0)
    out['map_linear_sync_f16_ms'] = round(min(t_f16) * 1e3, 3)

    # 'smooth' (monotone PCHIP) mode, also fully device-resident
    img = rng.normal(size=(size, size))
    m = body.map_img(img, interpolation='smooth', **map_kwargs)
    sync(m)  # warm/compile
    frames = [rng.normal(size=(size, size)) for _ in range(n_stream)]
    t0 = time.time()
    for f in frames:
        m = body.map_img(f, interpolation='smooth', **map_kwargs)
    sync(m)
    out['map_smooth_ms_per_frame'] = round(
        (time.time() - t0) / n_stream * 1e3, 3
    )

    # Large-source reprojection: a 1024^2 navigated observation through
    # the same 720x1440 map. The windowed Mosaic evaluator (per-tile
    # coefficient windows) keeps kernel speed past the plain kernel's
    # VMEM cap - this entry guards the size cliff (must stay within ~2x
    # of the 150^2 per-frame cost; device-resident cube so the 4 MB/
    # frame host->device upload of large frames doesn't mask the
    # kernel).
    import jax.numpy as jnp

    size_l = 1024
    body_l = BodyXY(
        'Jupiter', observer='EARTH', utc='2005-01-01T00:00:00', sz=size_l
    )
    body_l.set_disc_params(size_l / 2, size_l / 2, size_l * 0.4, 12.3)
    body_l.get_x_map(**map_kwargs)
    body_l.get_y_map(**map_kwargs)
    n_cube_l = 8
    cube_l = jnp.asarray(
        rng.normal(size=(n_cube_l, size_l, size_l)), jnp.float32
    )
    m = body_l.map_img(cube_l, interpolation='linear', as_numpy=False,
                       **map_kwargs)
    sync_l = _make_sync(m)
    sync_l(m)  # warm
    m = body_l.map_img(cube_l * 1.000001, interpolation='linear',
                       as_numpy=False, **map_kwargs)
    sync_l(m)  # second warm: the scale mul compiles lazily
    t_l = []
    for i in range(3):
        t0 = time.time()
        m = body_l.map_img(cube_l * (1.0 + 1e-6 * i),
                           interpolation='linear', as_numpy=False,
                           **map_kwargs)
        sync_l(m)
        t_l.append(time.time() - t0)
    out['map_linear_1024_cube_device_ms_per_frame'] = round(
        min(t_l) / n_cube_l * 1e3, 3
    )

    # throughput mode: a cube maps all frames in ONE batched device
    # program, and ``as_numpy=False`` leaves the result on device - this
    # measures the reprojection itself.
    n_cube = 16
    cube = rng.normal(size=(n_cube, size, size))
    for interp in ('linear', 'cubic', 'smooth'):
        m = body.map_img(cube, interpolation=interp, as_numpy=False,
                         **map_kwargs)
        cube_sync = _make_sync(m)
        cube_sync(m)  # warm
        t0 = time.time()
        m = body.map_img(cube * 1.000001, interpolation=interp,
                         as_numpy=False, **map_kwargs)
        cube_sync(m)
        assert m.shape == (n_cube, 720, 1440), m.shape
        out[f'map_{interp}_cube_device_ms_per_frame'] = round(
            (time.time() - t0) / n_cube * 1e3, 3
        )
    return out


def bench_transport() -> dict:
    """
    Measure the host<->device transport floor so the synchronous
    numpy-returning numbers can be decomposed: a blocked call is
    ``compute + rtt``; a numpy fetch adds ``bytes / d2h_rate``. Through
    a remote-TPU tunnel these floors (not compute) dominate synchronous
    single calls - e.g. a 720x1440 f32 map is 4 MB, so ``map_*_sync_ms``
    can never beat ``rtt + 4 MB / rate`` regardless of kernel speed.
    """
    import functools
    import jax
    import jax.numpy as jnp

    @jax.jit
    def tiny(i):
        return jnp.sum(jnp.ones((128,)) * i)

    rtts = []
    for i in range(8):
        v = tiny(float(i))
        t0 = time.time()
        float(v)
        rtts.append(time.time() - t0)

    @functools.partial(jax.jit, static_argnums=1)
    def make(key, n):
        return jax.random.uniform(key, (n,), jnp.float32)

    mb = 4.0
    n = int(mb * 1024 * 1024 // 4)
    fetches = []
    for i in range(3):
        x = make(jax.random.PRNGKey(i), n)
        x.block_until_ready()
        t0 = time.time()
        np.asarray(x)
        fetches.append(time.time() - t0)
    rtt = min(rtts)
    fetch = min(fetches)
    rate = mb / max(fetch - rtt, 1e-9)
    return {
        'rtt_ms': round(rtt * 1e3, 2),
        'd2h_mb_per_s': round(rate, 1),
        'map_sync_floor_ms': round((rtt + 4.0 / rate) * 1e3, 1),
    }


def bench_time_batch(n_frames: int) -> dict:
    from planetmapper_tpu import BodyXY
    from planetmapper_tpu.parallel import backplane_time_series

    size = 50
    body = BodyXY(
        'Jupiter', observer='EARTH', utc='2005-01-01T00:00:00', sz=size
    )
    body.set_disc_params(size / 2, size / 2, size * 0.4, 0.0)
    ets = body.et + 60.0 * np.arange(n_frames)
    # warm with the same batch size (the vmapped program is shape-static)
    out = backplane_time_series(
        body, ets, names=['EMISSION', 'LON-GRAPHIC'], as_numpy=False
    )
    sync = _make_sync(out)
    sync(out)
    # compute: device-resident result, completion proven by checksum
    # (the full-cube device->host copy is ~20 MB and transport-bound
    # through remote tunnels - measured separately below)
    t0 = time.time()
    out = backplane_time_series(
        body, ets + 30.0, names=['EMISSION', 'LON-GRAPHIC'],
        as_numpy=False,
    )
    sync(out)
    elapsed = time.time() - t0
    assert out['EMISSION'].shape == (n_frames, size, size)
    t0 = time.time()
    fetched = {k: np.asarray(v) for k, v in out.items()}
    fetch_s = time.time() - t0
    assert fetched['EMISSION'].shape == (n_frames, size, size)
    return {
        'cube_frames': n_frames,
        'cube_ms_per_frame': round(elapsed / n_frames * 1e3, 3),
        'cube_total_s': round(elapsed, 3),
        'cube_fetch_s': round(fetch_s, 3),
    }


def main() -> None:
    import jax

    size = int(os.environ.get('BENCH_SIZE', '2048'))
    # min-of-N: 8 runs give the min a better chance of landing in a
    # quiet window of the shared TPU host (each run is ~50 ms)
    n_runs = int(os.environ.get('BENCH_RUNS', '8'))
    cube_frames = int(os.environ.get('BENCH_CUBE_FRAMES', '1000'))

    detail = {'size': size, 'device': str(jax.devices()[0]),
              'backend': jax.default_backend()}
    bp = bench_backplanes(size, n_runs)
    detail.update(bp)
    try:
        detail.update(bench_map(n_runs))
    except Exception as exc:  # pragma: no cover - keep primary metric alive
        detail['map_error'] = f'{type(exc).__name__}: {exc}'
    try:
        detail.update(bench_time_batch(cube_frames))
    except Exception as exc:  # pragma: no cover
        detail['cube_error'] = f'{type(exc).__name__}: {exc}'
    try:
        detail.update(bench_transport())
    except Exception as exc:  # pragma: no cover
        detail['transport_error'] = f'{type(exc).__name__}: {exc}'

    mpix_per_s = bp['mpix_per_s']
    result = {
        'metric': (
            'Backplane Mpix/sec (2048^2 full default set); '
            'map reprojection ms/frame'
        ),
        'value': round(mpix_per_s, 3),
        'unit': 'Mpix/s',
        'vs_baseline': round(mpix_per_s / BASELINE_MPIX_PER_S, 1),
        'detail': detail,
    }
    print(json.dumps(result))


if __name__ == '__main__':
    main()
