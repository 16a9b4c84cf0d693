"""
Multi-chip scaling: device meshes and sharded execution of the geometry
pipelines.

The reference is a single-process, single-thread library (SURVEY §2.4); its
implicit parallelism axes are pixels, map cells, cube wavelengths, and
ephemeris times. Here those become real sharding axes over a
``jax.sharding.Mesh``:

- ``px``: the pixel-row axis of backplane images (spatial parallelism).
  The geometry pass is embarrassingly parallel, so sharded execution needs
  no communication; XLA partitions the fused pipeline via GSPMD from the
  output sharding alone.
- ``data``: the frame/time axis of observation cubes and time batches
  (data parallelism). Reductions (e.g. the disc-fit loss) cross this axis
  with ``psum`` over ICI.

Use :func:`make_mesh` to build a mesh over the available devices and
:func:`sharded_backplanes` / :func:`planetmapper_tpu.parallel.fit` for the
sharded compute paths.
"""

from __future__ import annotations

from typing import Any

import numpy as np


def make_mesh(n_devices: int | None = None, axis_names=('px',)):
    """
    Build a 1D (or reshaped) device mesh. With the default single axis the
    mesh spans all (or the first ``n_devices``) devices on the ``px`` axis.
    """
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    arr = np.array(devices)
    if len(axis_names) > 1:
        # Put all devices on the first axis by default
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
        arr = arr.reshape(shape)
    return Mesh(arr, axis_names)


def _pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def sharded_backplanes(body, mesh=None) -> dict[str, Any]:
    """
    Compute all default backplanes with the pixel-row axis sharded across
    the mesh. The forward geometry pass is communication-free: each device
    computes its row block of every backplane; results are returned as
    globally-sharded arrays (an ``all_gather`` happens only if the caller
    converts to a single host array, mirroring the reference's
    backplane-assembly step in FITS export).
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..pipeline import (
        DEFAULT_PRECISION,
        _robust_geodetic,
        fused_backplanes_fn,
    )

    if mesh is None:
        mesh = make_mesh()
    axis = mesh.axis_names[0]
    n_shard = mesh.shape[axis]
    nx, ny = body.get_img_size()
    ny_padded = _pad_to_multiple(ny, n_shard)

    anchors = body._get_pipeline_anchors()
    impl = fused_backplanes_fn(
        positive_west=body.positive_longitude_direction == 'W',
        prograde=body.prograde,
        have_sun=body._engine._pos_s is not None,
        optimize_speed=bool(body._optimize_speed),
        precision=getattr(body, '_pipeline_precision', DEFAULT_PRECISION),
        robust_geodetic=_robust_geodetic(body),
    )

    def wrapped(xy2angular, disc, radii, anchors):
        return impl(nx, ny_padded, xy2angular, disc, radii, anchors)

    out_sharding = NamedSharding(mesh, P(axis, None))
    fn = jax.jit(wrapped, out_shardings=out_sharding)

    out = fn(
        np.asarray(body._get_xy2angular_matrix()),
        np.asarray(body.get_disc_params(), dtype=np.float64),
        np.asarray(body.radii, dtype=np.float64),
        anchors,
    )
    if ny_padded != ny:
        out = {k: v[:ny] for k, v in out.items()}
    return out
