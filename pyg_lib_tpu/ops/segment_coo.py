"""Sorted-COO segment reductions and ``gather_coo``.

TPU-native counterpart of the reference COO segment subsystem
(reference ``pyg_lib/csrc/ops/cpu/segment_coo_kernel.cpp``,
``csrc/ops/cuda/segment_coo_kernel.cu`` warp kernels,
``csrc/ops/autograd/segment_coo_kernel.cpp`` gradients, Python wrappers
``pyg_lib/ops/__init__.py:502-631,793-813``).

The sorted-index precondition is a gift on TPU: no atomics are ever needed
and XLA's scatter can be told ``indices_are_sorted=True``.  The reduction
axis is fixed at ``index.ndim - 1`` (reference contract,
``segment_coo_kernel.cpp:40-43``).  Leading dims of ``index`` broadcast to
``src.shape[:index.ndim]`` (reference :46-51): each batch row reduces its
OWN sorted index run. Batched inputs flatten to one global sorted problem
by offsetting each batch's ids with ``b * N`` — per-batch sortedness plus
increasing offsets keeps the flattened index globally sorted, so the same
CSR/Pallas route applies.
"""

import math
from typing import Optional, Tuple

import jax.numpy as jnp

from pyg_lib_tpu.ops.scatter import (
    scatter_max,
    scatter_mean,
    scatter_min,
    scatter_sum,
)
from pyg_lib_tpu.utils import Array, infer_dim_size

__all__ = [
    'segment_sum_coo',
    'segment_add_coo',
    'segment_mean_coo',
    'segment_min_coo',
    'segment_max_coo',
    'gather_coo',
    'segment_coo',
]


def _coo_dim(index: Array) -> int:
    return index.ndim - 1


def _coo_to_indptr(index: Array, dim_size: int) -> Array:
    """Sorted COO index -> CSR indptr in O(R log E) (one searchsorted)."""
    return jnp.searchsorted(index, jnp.arange(dim_size + 1,
                                              dtype=index.dtype),
                            side='left').astype(jnp.int32)


def _check_batched(src: Array, index: Array):
    if src.ndim < index.ndim:
        raise ValueError(
            f'segment_coo: src.ndim ({src.ndim}) must be >= index.ndim '
            f'({index.ndim})')


def _flatten_batched(src: Array, index: Array, n: int):
    """Flatten [*B, E, *K] / [*B, E] into a single sorted 1-D problem.

    Returns (src_flat [B*E, K'], idx_flat [B*E] offset by b*n, B, E,
    kshape) — reference layout factoring ``segment_coo_kernel.cpp:19-27``.
    """
    bshape = src.shape[:index.ndim - 1]
    e = src.shape[index.ndim - 1]
    kshape = src.shape[index.ndim:]
    b = math.prod(bshape) if bshape else 1
    k = math.prod(kshape) if kshape else 1
    index_b = jnp.broadcast_to(index, bshape + (e, ))
    offs = (jnp.arange(b, dtype=index.dtype) * n)[:, None]
    idx_flat = (index_b.reshape(b, e) + offs).reshape(b * e)
    src_flat = src.reshape(b * e, k)
    return src_flat, idx_flat, b, e, bshape, kshape


def _infer_n(index: Array, out: Optional[Array], dim_size: Optional[int]):
    if out is not None:
        return out.shape[index.ndim - 1]
    return infer_dim_size(index, dim_size)


def segment_sum_coo(
    src: Array,
    index: Array,
    out: Optional[Array] = None,
    dim_size: Optional[int] = None,
) -> Array:
    """Parity: reference ``segment_sum_coo``
    (``pyg_lib/ops/__init__.py:502-530``).

    Sorted indices are equivalent to a CSR, so the reduction routes
    through :func:`pyg_lib_tpu.ops.segment_sum_csr` (Pallas membership-
    matmul kernel on TPU; ~2x XLA's sorted scatter-add) via one
    ``searchsorted`` — for batched (multi-dim index) inputs too, after
    offset-flattening.
    """
    _check_batched(src, index)
    from pyg_lib_tpu.ops.segment_csr import segment_sum_csr

    n = _infer_n(index, out, dim_size)
    if index.ndim > 1:
        src_flat, idx_flat, b, e, bshape, kshape = _flatten_batched(
            src, index, n)
        indptr = _coo_to_indptr(idx_flat, b * n)
        sums = segment_sum_csr(src_flat, indptr)
        result = sums.reshape(bshape + (n, ) + kshape)
        return result if out is None else out + result
    if src.ndim == 2 and src.shape[0] == index.shape[0]:
        indptr = _coo_to_indptr(index, n)
        return segment_sum_csr(src, indptr, out)
    return scatter_sum(src, index, _coo_dim(index), out, dim_size)


segment_add_coo = segment_sum_coo


def segment_mean_coo(
    src: Array,
    index: Array,
    out: Optional[Array] = None,
    dim_size: Optional[int] = None,
) -> Array:
    _check_batched(src, index)
    from pyg_lib_tpu.ops.segment_csr import segment_mean_csr

    n = _infer_n(index, out, dim_size)
    # Reference ``out=`` contract for COO mean (probed against libpyg):
    # non-empty buckets are OVERWRITTEN with the plain mean, empty
    # buckets KEEP ``out`` (unlike CSR mean, which zeroes them).
    if index.ndim > 1:
        src_flat, idx_flat, b, e, bshape, kshape = _flatten_batched(
            src, index, n)
        indptr = _coo_to_indptr(idx_flat, b * n)
        means = segment_mean_csr(src_flat, indptr)
        result = means.reshape(bshape + (n, ) + kshape)
        if out is None:
            return result
        counts = (indptr[1:] - indptr[:-1]).reshape(
            bshape + (n, ) + (1, ) * len(kshape))
        return jnp.where(counts > 0, result, out)
    if src.ndim == 2 and src.shape[0] == index.shape[0]:
        # Sorted indices are a CSR: sum via the Pallas kernel, divide by
        # per-segment counts (same routing as segment_sum_coo).
        indptr = _coo_to_indptr(index, n)
        result = segment_mean_csr(src, indptr)
        if out is None:
            return result
        counts = (indptr[1:] - indptr[:-1])[:, None]
        return jnp.where(counts > 0, result, out)
    if out is None:
        return scatter_mean(src, index, _coo_dim(index), None, dim_size)
    result = scatter_mean(src, index, _coo_dim(index), None,
                          out.shape[_coo_dim(index)])
    dim = _coo_dim(index)
    counts = jnp.zeros((out.shape[dim], ), jnp.int32).at[
        index.reshape(-1)].add(1, mode='drop')
    shape = [1] * out.ndim
    shape[dim] = out.shape[dim]
    return jnp.where(counts.reshape(shape) > 0, result, out)


def _minmax_coo(src, index, out, dim_size, is_min):
    scatter_fn = scatter_min if is_min else scatter_max
    if index.ndim == 1:
        return scatter_fn(src, index, 0, out, dim_size)
    n = _infer_n(index, out, dim_size)
    src_flat, idx_flat, b, e, bshape, kshape = _flatten_batched(
        src, index, n)
    vals, arg = scatter_fn(src_flat, idx_flat, 0, None, b * n)
    # Flattened argindices (sentinel b*e) -> per-batch positions along the
    # reduction axis (sentinel e, reference empty-bucket contract).
    vals = vals.reshape(bshape + (n, ) + kshape)
    arg = arg.reshape((b, n) + kshape if kshape else (b, n))
    batch_base = (jnp.arange(b, dtype=arg.dtype) * e).reshape(
        (b, 1) + (1, ) * len(kshape))
    arg = jnp.where(arg >= b * e, e, arg - batch_base)
    arg = arg.reshape(bshape + (n, ) + kshape)
    if out is not None:
        # Reference contract: elementwise merge with ``out``; wherever
        # ``out`` wins (strictly better, or empty bucket) the argindex is
        # the sentinel ``e`` — no src element is the winner.
        nonempty = arg < e
        merge = jnp.minimum if is_min else jnp.maximum
        out_wins = (out < vals) if is_min else (out > vals)
        merged = jnp.where(nonempty, merge(out, vals), out)
        arg = jnp.where(nonempty & ~out_wins, arg, jnp.int32(e))
        vals = merged
    return vals, arg


def segment_min_coo(
    src: Array,
    index: Array,
    out: Optional[Array] = None,
    dim_size: Optional[int] = None,
) -> Tuple[Array, Array]:
    _check_batched(src, index)
    return _minmax_coo(src, index, out, dim_size, True)


def segment_max_coo(
    src: Array,
    index: Array,
    out: Optional[Array] = None,
    dim_size: Optional[int] = None,
) -> Tuple[Array, Array]:
    _check_batched(src, index)
    return _minmax_coo(src, index, out, dim_size, False)


def gather_coo(
    src: Array,
    index: Array,
    out: Optional[Array] = None,
) -> Array:
    """``out[..., i, k] = src[..., index[..., i], k]`` along axis
    ``index.ndim - 1``; symmetric inverse of :func:`segment_sum_coo`
    (reference ``pyg_lib/ops/__init__.py:612-631``)."""
    if index.ndim == 1:
        result = jnp.take(src, index, axis=0)
    else:
        _check_batched(src, index)
        dim = index.ndim - 1
        bshape = src.shape[:dim]
        index_b = jnp.broadcast_to(index, bshape + index.shape[-1:])
        expand = index_b.reshape(index_b.shape + (1, ) *
                                 (src.ndim - index.ndim))
        result = jnp.take_along_axis(
            src, expand.astype(jnp.int32), axis=dim)
    if out is not None:
        result = result.astype(out.dtype)
    return result


def segment_coo(
    src: Array,
    index: Array,
    out: Optional[Array] = None,
    dim_size: Optional[int] = None,
    reduce: str = 'sum',
) -> Array:
    """Polymorphic dispatcher (reference
    ``pyg_lib/ops/__init__.py:793-813``)."""
    if reduce in ('sum', 'add'):
        return segment_sum_coo(src, index, out, dim_size)
    if reduce == 'mean':
        return segment_mean_coo(src, index, out, dim_size)
    if reduce == 'min':
        return segment_min_coo(src, index, out, dim_size)[0]
    if reduce == 'max':
        return segment_max_coo(src, index, out, dim_size)[0]
    raise ValueError(f'Unknown reduce: {reduce!r}')
