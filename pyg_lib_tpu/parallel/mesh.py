"""Device-mesh helpers."""

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['make_mesh', 'named_sharding']


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = ('data', 'model'),
              devices=None) -> Mesh:
    """Builds a named mesh.  Default: all devices on the 'data' axis,
    'model' axis of size 1.  ICI-friendly: axes follow the device order
    JAX reports, which tracks the physical torus."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, ) + (1, ) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f'mesh shape {shape} != {n} devices')
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def named_sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))
