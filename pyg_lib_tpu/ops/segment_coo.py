"""Sorted-COO segment reductions and ``gather_coo``.

TPU-native counterpart of the reference COO segment subsystem
(reference ``pyg_lib/csrc/ops/cpu/segment_coo_kernel.cpp``,
``csrc/ops/cuda/segment_coo_kernel.cu`` warp kernels,
``csrc/ops/autograd/segment_coo_kernel.cpp`` gradients, Python wrappers
``pyg_lib/ops/__init__.py:502-631,793-813``).

The sorted-index precondition is a gift on TPU: no atomics are ever needed
and XLA's scatter can be told ``indices_are_sorted=True``.  The reduction
axis is fixed at ``index.ndim - 1`` (reference contract).  Leading axes of
``index`` (if any) must match leading axes of ``src`` (batched segments).
"""

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
    ``searchsorted``.
    """
    if index.ndim > 1:
        raise NotImplementedError(
            'multi-dimensional COO index: use vmap over leading axes')
    if src.ndim == 2 and index.ndim == 1 and src.shape[0] == index.shape[0]:
        from pyg_lib_tpu.ops.segment_csr import segment_sum_csr

        if out is not None:
            dim_size = out.shape[0]
        n = infer_dim_size(index, dim_size)
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
    if index.ndim > 1:
        raise NotImplementedError(
            'multi-dimensional COO index: use vmap over leading axes')
    if (src.ndim == 2 and index.ndim == 1
            and src.shape[0] == index.shape[0]):
        # Sorted indices are a CSR: sum via the Pallas kernel, divide by
        # per-segment counts (same routing as segment_sum_coo).
        from pyg_lib_tpu.ops.segment_csr import segment_mean_csr

        if out is not None:
            dim_size = out.shape[0]
        n = infer_dim_size(index, dim_size)
        indptr = _coo_to_indptr(index, n)
        return segment_mean_csr(src, indptr, out)
    return scatter_mean(src, index, _coo_dim(index), out, dim_size)


def segment_min_coo(
    src: Array,
    index: Array,
    out: Optional[Array] = None,
    dim_size: Optional[int] = None,
) -> Tuple[Array, Array]:
    if index.ndim > 1:
        raise NotImplementedError(
            'multi-dimensional COO index: use vmap over leading axes')
    return scatter_min(src, index, _coo_dim(index), out, dim_size)


def segment_max_coo(
    src: Array,
    index: Array,
    out: Optional[Array] = None,
    dim_size: Optional[int] = None,
) -> Tuple[Array, Array]:
    if index.ndim > 1:
        raise NotImplementedError(
            'multi-dimensional COO index: use vmap over leading axes')
    return scatter_max(src, index, _coo_dim(index), out, dim_size)


def gather_coo(
    src: Array,
    index: Array,
    out: Optional[Array] = None,
) -> Array:
    """``out[i] = src[index[i]]`` along axis ``index.ndim - 1``; symmetric
    inverse of :func:`segment_sum_coo` (reference
    ``pyg_lib/ops/__init__.py:612-631``)."""
    if index.ndim > 1:
        raise NotImplementedError(
            'multi-dimensional COO index: use vmap over leading axes')
    result = jnp.take(src, index, axis=0)
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
