"""
Multi-chip scaling: device meshes, sharded pipelines, gradient disc fitting
and batched-time evaluation.
"""

from .sharding import make_mesh, sharded_backplanes, sharded_map_img
from .fit import fit_disc_gradient, make_training_step
from .timeseries import backplane_time_series
from .multihost import (
    frame_sharding,
    initialize_distributed,
    make_multihost_mesh,
    pixel_row_sharding,
)

__all__ = [
    'make_mesh',
    'sharded_backplanes',
    'sharded_map_img',
    'fit_disc_gradient',
    'make_training_step',
    'backplane_time_series',
    'initialize_distributed',
    'make_multihost_mesh',
    'frame_sharding',
    'pixel_row_sharding',
]
