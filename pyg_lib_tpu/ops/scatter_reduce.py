"""Fused multi-reduction scatter (analog of the reference Triton op).

TPU-native counterpart of reference ``fused_scatter_reduce``
(reference ``pyg_lib/ops/scatter_reduce.py:15-181``, forward-only Triton
kernel with up to 4 reductions side by side).

On TPU a single XLA program already fuses the multiple scatter reductions
into one pass over ``inputs`` (the gathers/scatters share the HBM read), so
this is expressed as a composite; no hand-rolled kernel is needed.  Output
layout matches the reference exactly: ``[dim_size, len(reduce_list) * F]``
with empty min/max buckets mapped to ``0``.
"""

from typing import List

import jax.numpy as jnp

from pyg_lib_tpu.ops.scatter import (
    scatter_max,
    scatter_mean,
    scatter_min,
    scatter_sum,
)
from pyg_lib_tpu.utils import Array

__all__ = ['fused_scatter_reduce']

REDUCTIONS = ['sum', 'mean', 'min', 'max']


def fused_scatter_reduce(inputs: Array, index: Array, dim_size: int,
                         reduce_list: List[str]) -> Array:
    """Parity: reference ``pyg_lib.ops.fused_scatter_reduce``
    (``pyg_lib/ops/scatter_reduce.py:94-181``). Unlike the reference (CUDA
    Triton only, forward only), this version is differentiable and runs on
    any backend."""
    if inputs.ndim != 2 or index.ndim != 1:
        raise ValueError('fused_scatter_reduce expects 2-D inputs, 1-D index')
    if not jnp.issubdtype(inputs.dtype, jnp.floating):
        raise ValueError('fused_scatter_reduce requires floating inputs')
    if len(reduce_list) > len(REDUCTIONS):
        raise ValueError(f'at most {len(REDUCTIONS)} reductions')
    outs = []
    for reduce in reduce_list:
        if reduce == 'sum':
            outs.append(scatter_sum(inputs, index, 0, dim_size=dim_size))
        elif reduce == 'mean':
            outs.append(scatter_mean(inputs, index, 0, dim_size=dim_size))
        elif reduce == 'min':
            outs.append(scatter_min(inputs, index, 0, dim_size=dim_size)[0])
        elif reduce == 'max':
            outs.append(scatter_max(inputs, index, 0, dim_size=dim_size)[0])
        else:
            raise ValueError(f'Unknown reduction: {reduce!r}')
    return jnp.concatenate(outs, axis=1)
