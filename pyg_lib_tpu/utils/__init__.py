"""Shared helpers for pyg_lib_tpu device ops.

TPU-first conventions used across the framework:

* Reductions along an arbitrary ``dim`` are canonicalised by moving the
  reduction axis to the front (XLA folds the transposes).
* Output sizes (``dim_size`` / ``num_segments``) must be static under
  ``jax.jit``; helpers below infer them eagerly when running op-by-op.
"""

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def canonicalize_dim(dim: int, ndim: int) -> int:
    if dim < -ndim or dim >= ndim:
        raise ValueError(f'dim {dim} out of range for ndim {ndim}')
    return dim + ndim if dim < 0 else dim


def infer_dim_size(index: Array, dim_size: Optional[int]) -> int:
    """Resolve the output size along the reduction axis.

    Mirrors the reference contract (``dim_size=None`` -> minimal size,
    reference ``pyg_lib/ops/__init__.py`` scatter docstrings) but requires a
    concrete value under tracing: XLA has no dynamic shapes.
    """
    if dim_size is not None:
        return int(dim_size)
    if isinstance(index, jax.core.Tracer):
        raise ValueError(
            'dim_size must be given explicitly under jax.jit '
            '(output shapes must be static)')
    if index.size == 0:
        return 0
    return int(jax.device_get(index.max())) + 1


def broadcast_index(index: Array, src_shape, dim: int) -> Array:
    """Broadcast a 1-D ``index`` to ``src_shape`` along ``dim``.

    Port of the reference ``_broadcast`` helper
    (reference ``pyg_lib/ops/__init__.py:748-761``).
    """
    if index.ndim == 1 and len(src_shape) > 1:
        shape = [1] * len(src_shape)
        shape[dim] = src_shape[dim]
        index = index.reshape(shape)
    return jnp.broadcast_to(index, src_shape)


def move_dim_front(x: Array, dim: int) -> Array:
    return jnp.moveaxis(x, dim, 0)


def move_dim_back(x: Array, dim: int) -> Array:
    return jnp.moveaxis(x, 0, dim)


def is_floating(x: Array) -> bool:
    return jnp.issubdtype(x.dtype, jnp.floating)


def min_identity(dtype):
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.array(jnp.inf, dtype=dtype)
    return jnp.array(jnp.iinfo(dtype).max, dtype=dtype)


def max_identity(dtype):
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.array(-jnp.inf, dtype=dtype)
    return jnp.array(jnp.iinfo(dtype).min, dtype=dtype)


def indptr_to_index(indptr: Array, num_elements: int) -> Array:
    """Expand a CSR ``indptr`` of shape ``[R+1]`` to per-element segment ids
    of shape ``[num_elements]`` (``num_elements`` static).

    Elements at positions >= indptr[-1] (padding) get segment id ``R`` and
    positions < indptr[0] (leading gap) get ``-1`` — both out of range, so
    downstream ``mode='drop'`` scatters with ``num_segments=R`` drop them.
    Matches the reference's row loops, which only consume
    ``[indptr[r], indptr[r+1])`` (reference
    ``csrc/ops/cpu/segment_csr_kernel.cpp:96-130``: positions outside
    ``[indptr[0], indptr[-1])`` contribute to no row).

    The ids are NON-DECREASING (``-1`` leads, ``R`` trails): callers may
    pass ``indices_are_sorted=True`` to scatters. The leading gap must
    NOT map to ``R`` — that would put the largest id first and break the
    sortedness promise, which is undefined behavior in XLA scatter on
    TPU (the CPU backend ignores the hint, so tests alone can't catch
    it).
    """
    positions = jnp.arange(num_elements, dtype=indptr.dtype)
    ids = jnp.searchsorted(indptr[1:], positions, side='right').astype(
        jnp.int32)
    return jnp.where(positions < indptr[0], jnp.int32(-1), ids)


def index_to_indptr(index: Array, size: int) -> Array:
    """Sorted COO index -> CSR indptr of shape ``[size+1]``.

    Accepts out-of-range ids on either side (e.g. the ``-1`` leading-gap
    / ``R`` trailing ids :func:`indptr_to_index` emits): the +1 shift
    into a padded counts row keeps them dropped — a raw ``.at[index]``
    would WRAP ``-1`` into the last bucket before the ``mode='drop'``
    check (see ops/segment_csr.py).
    """
    counts = jnp.zeros((size + 2, ), dtype=jnp.int32).at[index + 1].add(
        1, mode='drop', indices_are_sorted=True)[1:size + 1]
    return jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)]).astype(jnp.int32)
