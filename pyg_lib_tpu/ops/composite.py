"""Pure-composite scatter ops: softmax / log_softmax / std / logsumexp.

Direct TPU-native counterparts of the reference Python composites
(reference ``pyg_lib/ops/__init__.py:838-984``), built on the scatter
primitives.  All numerically stabilised by per-bucket max-recentering.
XLA fuses the gather/exp/scatter chains into a small number of kernels.
"""

from typing import Optional

import jax.numpy as jnp

from pyg_lib_tpu.ops.scatter import scatter_max, scatter_sum
from pyg_lib_tpu.utils import (
    Array,
    broadcast_index,
    canonicalize_dim,
    infer_dim_size,
)

__all__ = [
    'scatter_softmax',
    'scatter_log_softmax',
    'scatter_std',
    'scatter_logsumexp',
]


def _check_float(src: Array, name: str):
    if not jnp.issubdtype(src.dtype, jnp.floating):
        raise ValueError(
            f'{name} requires a floating-point src tensor (got {src.dtype})')


def _take_along(per_bucket: Array, index: Array, src: Array,
                dim: int) -> Array:
    idx = broadcast_index(index, src.shape, dim)
    return jnp.take_along_axis(per_bucket, idx, axis=dim)


def scatter_softmax(
    src: Array,
    index: Array,
    dim: int = -1,
    dim_size: Optional[int] = None,
) -> Array:
    """Per-bucket softmax (reference ``pyg_lib/ops/__init__.py:838-860``)."""
    _check_float(src, 'scatter_softmax')
    dim = canonicalize_dim(dim, src.ndim)
    dim_size = infer_dim_size(index, dim_size)
    max_per_idx = scatter_max(src, index, dim, dim_size=dim_size)[0]
    max_per_src = _take_along(max_per_idx, index, src, dim)
    recentered_exp = jnp.exp(src - max_per_src)
    sum_per_idx = scatter_sum(recentered_exp, index, dim, dim_size=dim_size)
    sum_per_src = _take_along(sum_per_idx, index, src, dim)
    return recentered_exp / sum_per_src


def scatter_log_softmax(
    src: Array,
    index: Array,
    dim: int = -1,
    dim_size: Optional[int] = None,
    eps: float = 1e-12,
) -> Array:
    """Per-bucket log-softmax (reference
    ``pyg_lib/ops/__init__.py:863-884``)."""
    _check_float(src, 'scatter_log_softmax')
    dim = canonicalize_dim(dim, src.ndim)
    dim_size = infer_dim_size(index, dim_size)
    max_per_idx = scatter_max(src, index, dim, dim_size=dim_size)[0]
    max_per_src = _take_along(max_per_idx, index, src, dim)
    recentered = src - max_per_src
    sum_per_idx = scatter_sum(jnp.exp(recentered), index, dim,
                              dim_size=dim_size)
    sum_per_src = _take_along(sum_per_idx, index, src, dim)
    return recentered - jnp.log(sum_per_src + eps)


def scatter_std(
    src: Array,
    index: Array,
    dim: int = -1,
    out: Optional[Array] = None,
    dim_size: Optional[int] = None,
    unbiased: bool = True,
) -> Array:
    """Per-bucket standard deviation (reference
    ``pyg_lib/ops/__init__.py:887-927``)."""
    _check_float(src, 'scatter_std')
    dim = canonicalize_dim(dim, src.ndim)
    if out is not None:
        dim_size = out.shape[dim]
    dim_size = infer_dim_size(index, dim_size)

    ones = jnp.ones_like(src)
    count = scatter_sum(ones, index, dim, dim_size=dim_size)
    sum_per_idx = scatter_sum(src, index, dim, dim_size=dim_size)
    count_safe = jnp.maximum(count, 1)
    mean = sum_per_idx / count_safe

    var = src - _take_along(mean, index, src, dim)
    var = var * var
    result = scatter_sum(var, index, dim, out, dim_size)
    if unbiased:
        denom = jnp.maximum(count - 1, 1)
    else:
        denom = count_safe
    return jnp.sqrt(result / denom)


def scatter_logsumexp(
    src: Array,
    index: Array,
    dim: int = -1,
    out: Optional[Array] = None,
    dim_size: Optional[int] = None,
    eps: float = 1e-12,
) -> Array:
    """Per-bucket log-sum-exp (reference
    ``pyg_lib/ops/__init__.py:930-984``): recenter by per-bucket max; empty
    buckets map to 0 (or back to the caller's ``out`` values)."""
    _check_float(src, 'scatter_logsumexp')
    dim = canonicalize_dim(dim, src.ndim)
    if out is not None:
        dim_size = out.shape[dim]
    dim_size = infer_dim_size(index, dim_size)

    neg_inf = jnp.array(-jnp.inf, src.dtype)
    max_init = jnp.full([
        dim_size if d == dim else s for d, s in enumerate(src.shape)
    ], neg_inf, dtype=src.dtype)
    max_per_idx = scatter_max(src, index, dim, out=max_init,
                              dim_size=dim_size)[0]

    max_per_src = _take_along(max_per_idx, index, src, dim)
    recentered = src - max_per_src
    recentered = jnp.where(jnp.isnan(recentered), neg_inf, recentered)
    sum_per_idx = scatter_sum(jnp.exp(recentered), index, dim,
                              dim_size=dim_size)
    result = max_per_idx + jnp.log(sum_per_idx + eps)

    if out is None:
        return jnp.nan_to_num(result, nan=0.0, posinf=0.0, neginf=0.0)
    return jnp.where(jnp.isfinite(result), result, out)
