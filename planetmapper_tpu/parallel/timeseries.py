"""
Batched ephemeris-time evaluation: backplanes for many observation epochs
in one vmapped device program (the "JWST IFU cube" use case - per-frame or
per-wavelength observation times).

The reference creates one ``Body`` object per time and loops the scalar
pipeline (SURVEY §2.4); here the per-time scene anchors are computed with
the shared jitted engine programs (one compile, reused across all epochs)
and the fused backplane pipeline is vmapped over the stacked anchors -
optionally sharded over the mesh 'data' axis for multi-chip scaling.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np


def backplane_time_series(
    body,
    times: Iterable,
    names: Sequence[str] | None = None,
    *,
    mesh=None,
) -> dict[str, np.ndarray]:
    """
    Compute backplane images for a sequence of observation times.

    Args:
        body: Template :class:`BodyXY` (or Observation): target/observer
            configuration, image size and disc parameters are taken from it.
        times: Sequence of UTC strings / datetimes / MJD floats, or float
            TDB seconds (``et`` values).
        names: Backplane names to return (default: all default backplanes).
        mesh: Optional :func:`planetmapper_tpu.parallel.make_mesh` mesh; the
            time axis is sharded across its first axis.

    Returns:
        Dict of ``(n_times, ny, nx)`` arrays keyed by backplane name.
    """
    import jax
    import jax.numpy as jnp

    from ..pipeline import DEFAULT_PRECISION, fused_backplanes_fn

    nx, ny = body.get_img_size()
    if nx <= 0 or ny <= 0:
        raise ValueError('Template body must have a valid image size')

    bodies = [_body_at_time(body, t) for t in times]
    anchor_list = [b._get_pipeline_anchors() for b in bodies]
    # Stack on host, transfer once: per-key jnp.stack would issue hundreds
    # of tiny device ops (expensive through a remote-TPU transport)
    anchors = jax.device_put({
        k: np.stack([np.asarray(a[k]) for a in anchor_list])
        for k in anchor_list[0]
    })
    xy2angular = jax.device_put(
        np.stack([np.asarray(b._get_xy2angular_matrix()) for b in bodies])
    )
    disc = np.asarray(body.get_disc_params(), dtype=np.float64)
    radii = np.asarray(body.radii, dtype=np.float64)

    wanted = (
        None
        if names is None
        else tuple(sorted(body.standardise_backplane_name(n) for n in names))
    )
    precision = getattr(body, '_pipeline_precision', DEFAULT_PRECISION)
    key = (
        body.target_body_id, body._observer_body_id,
        body.aberration_correction, body.positive_longitude_direction,
        body.prograde, body._engine._pos_s is not None,
        bool(body._optimize_speed), nx, ny, len(bodies), precision,
        wanted, None if mesh is None else tuple(mesh.axis_names),
    )
    batched = _BATCHED_CACHE.get(key)
    if batched is None:
        impl = fused_backplanes_fn(
            positive_west=body.positive_longitude_direction == 'W',
            prograde=body.prograde,
            have_sun=body._engine._pos_s is not None,
            optimize_speed=bool(body._optimize_speed),
            precision=precision,
        )

        def single(xy2ang_t, anchors_t, disc, radii):
            out = impl(nx, ny, xy2ang_t, disc, radii, anchors_t)
            if wanted is not None:
                # Selecting at trace time lets XLA drop unused planes
                out = {k: out[k] for k in wanted}
            return out

        batched = jax.vmap(single, in_axes=(0, 0, None, None))
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            batched = jax.jit(
                batched,
                out_shardings=NamedSharding(
                    mesh, P(mesh.axis_names[0], None, None)
                ),
            )
        else:
            batched = jax.jit(batched)
        _BATCHED_CACHE[key] = batched

    out = batched(xy2angular, anchors, disc, radii)
    return jax.device_get(out)


_BATCHED_CACHE: dict = {}


def _body_at_time(body, t):
    if isinstance(t, (int, float)) and abs(float(t)) > 1e6:
        # Treat large floats as TDB seconds past J2000 (et); reference-style
        # MJD floats are far smaller
        from ..core.time import et_to_utc_string

        t = et_to_utc_string(float(t), body._lsk())
    new = body.replace(utc=t) if not _same_time(body, t) else body
    if hasattr(new, 'set_disc_params'):
        try:
            new.set_disc_params(*body.get_disc_params())
        except Exception:
            pass
    return new


def _same_time(body, t) -> bool:
    return isinstance(t, str) and t == body.utc
