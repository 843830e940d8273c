"""Fused multi-reduction scatter (analog of the reference Triton op).

TPU-native counterpart of reference ``fused_scatter_reduce``
(reference ``pyg_lib/ops/scatter_reduce.py:15-181``, forward-only Triton
kernel with up to 4 reductions side by side).

Two paths:

* **Fused Pallas path** (TPU, sorted concrete index, lane-aligned F,
  >=64K rows): ONE chunked slab pass computes sum and max together
  (``pallas/segment_minmax_kernel.segment_max_sum_planned_exact`` — the
  HBM read is shared like the reference's single Triton kernel shares its
  atomics pass), a second pass on the negated slab adds min when
  requested; mean divides the fused sums by counts. Differentiable with
  exact gradients (sum -> broadcast, min/max -> winner-only via the
  kernel's argpositions), unlike the reference's forward-only kernel.
* **Composite fallback** (everything else): one scatter per reduction;
  XLA shares the input read across them.

Output layout matches the reference exactly: ``[dim_size,
len(reduce_list) * F]`` with empty min/max buckets mapped to ``0``.
"""

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from pyg_lib_tpu.ops.scatter import (
    scatter_max,
    scatter_mean,
    scatter_min,
    scatter_sum,
)
from pyg_lib_tpu.utils import Array

__all__ = ['fused_scatter_reduce']

REDUCTIONS = ['sum', 'mean', 'min', 'max']

_FUSED_MIN_ROWS = 65536
_FUSED_CACHE: dict = {}


def _use_fused(inputs, index, reduce_list) -> bool:
    import os

    if os.environ.get('PYGT_DISABLE_PALLAS'):
        return False
    if jax.default_backend() != 'tpu':
        return False
    if inputs.ndim != 2 or inputs.dtype != jnp.float32:
        return False
    if inputs.shape[1] % 128 or inputs.shape[0] < _FUSED_MIN_ROWS:
        return False
    if not isinstance(index, (np.ndarray, list, tuple)):
        # Tracers can't be inspected; DEVICE arrays would pay an O(E)
        # device->host readback (~0.1 MB/s tunnel) on every call just to
        # test sortedness — plans need host indices anyway.
        return False
    idx = np.asarray(index)
    return bool(len(idx) == inputs.shape[0] and (np.diff(idx) >= 0).all())


def _fused(index, dim_size: int, reduce_list):
    """Cached per-(index, dim_size, reduces) custom_vjp closure."""
    import hashlib

    from pyg_lib_tpu.ops.pallas.plan_cache import plan_for_ptr
    from pyg_lib_tpu.ops.pallas.segment_minmax_kernel import (
        segment_max_planned_exact,
        segment_max_sum_planned_exact,
    )
    from pyg_lib_tpu.ops.pallas.spmm_chunked import TR

    idx = np.asarray(index)
    key = (hashlib.sha1(idx.tobytes()).hexdigest(), dim_size,
           tuple(reduce_list))
    hit = _FUSED_CACHE.get(key)
    if hit is not None and np.array_equal(hit[1], idx):
        return hit[0]

    indptr = np.searchsorted(idx, np.arange(dim_size + 1)).astype(np.int64)
    plan = plan_for_ptr(indptr)
    counts = np.diff(indptr).astype(np.float32)
    counts_j = jnp.asarray(np.maximum(counts, 1.0))
    empty = jnp.asarray((counts == 0)[:, None])
    rows = jnp.arange(dim_size, dtype=jnp.int32)
    shift = jnp.take(plan.tile_shift, rows // TR)[:, None]
    need_max = 'max' in reduce_list
    need_min = 'min' in reduce_list
    need_sum = 'sum' in reduce_list or 'mean' in reduce_list

    def fwd_impl(inputs):
        n = inputs.shape[0]
        xp = jnp.take(inputs, plan.edge_perm, axis=0)
        sums = maxv = minv = None
        arg_max = arg_min = None
        if need_max or (need_sum and not need_min):
            if need_sum:
                maxv, pos, sums = segment_max_sum_planned_exact(xp, plan)
            else:
                maxv, pos = segment_max_planned_exact(xp, plan)
            arg_max = pos - shift
        if need_min:
            if need_sum and sums is None:
                minv, pos, nsums = segment_max_sum_planned_exact(-xp, plan)
                sums = -nsums
            else:
                minv, pos = segment_max_planned_exact(-xp, plan)
            minv = -minv
            arg_min = pos - shift
        blocks, residual = [], {}
        for r in reduce_list:
            if r == 'sum':
                blocks.append(jnp.where(empty, 0.0, sums))
            elif r == 'mean':
                blocks.append(
                    jnp.where(empty, 0.0, sums / counts_j[:, None]))
            elif r == 'max':
                blocks.append(jnp.where(empty, 0.0, maxv))
                residual['arg_max'] = jnp.where(empty, jnp.int32(n),
                                                arg_max)
            elif r == 'min':
                blocks.append(jnp.where(empty, 0.0, minv))
                residual['arg_min'] = jnp.where(empty, jnp.int32(n),
                                                arg_min)
        return jnp.concatenate(blocks, axis=1), residual

    @jax.custom_vjp
    def f(inputs):
        return fwd_impl(inputs)[0]

    def f_fwd(inputs):
        out, residual = fwd_impl(inputs)
        return out, (residual, jnp.zeros((inputs.shape[0], 0),
                                         inputs.dtype))

    def f_bwd(res, g):
        residual, proto = res
        n = proto.shape[0]
        f_dim = g.shape[1] // len(reduce_list)
        grad = jnp.zeros((n, f_dim), g.dtype)
        ids = jnp.asarray(idx)
        cols2 = jnp.broadcast_to(
            jnp.arange(f_dim, dtype=jnp.int32)[None, :], (dim_size, f_dim))
        for bi, r in enumerate(reduce_list):
            gb = g[:, bi * f_dim:(bi + 1) * f_dim]
            if r == 'sum':
                grad = grad + jnp.take(gb, ids, axis=0)
            elif r == 'mean':
                grad = grad + jnp.take(gb / counts_j[:, None], ids, axis=0)
            elif r == 'max':
                grad = grad.at[residual['arg_max'], cols2].add(
                    gb, mode='drop')
            elif r == 'min':
                grad = grad.at[residual['arg_min'], cols2].add(
                    gb, mode='drop')
        return (grad.astype(proto.dtype), )

    f.defvjp(f_fwd, f_bwd)
    if key not in _FUSED_CACHE and len(_FUSED_CACHE) >= 8:
        _FUSED_CACHE.pop(next(iter(_FUSED_CACHE)))
    _FUSED_CACHE[key] = (f, idx.copy())
    return f


def fused_scatter_reduce(inputs: Array, index: Array, dim_size: int,
                         reduce_list: List[str]) -> Array:
    """Parity: reference ``pyg_lib.ops.fused_scatter_reduce``
    (``pyg_lib/ops/scatter_reduce.py:94-181``). Unlike the reference (CUDA
    Triton only, forward only), this version is differentiable and runs on
    any backend; on TPU with a sorted concrete index it runs the fused
    Pallas pass (module docstring)."""
    if inputs.ndim != 2 or index.ndim != 1:
        raise ValueError('fused_scatter_reduce expects 2-D inputs, 1-D index')
    if not jnp.issubdtype(inputs.dtype, jnp.floating):
        raise ValueError('fused_scatter_reduce requires floating inputs')
    if len(reduce_list) > len(REDUCTIONS):
        raise ValueError(f'at most {len(REDUCTIONS)} reductions')
    for reduce in reduce_list:
        if reduce not in REDUCTIONS:
            raise ValueError(f'Unknown reduction: {reduce!r}')
    if _use_fused(inputs, index, reduce_list):
        return _fused(index, dim_size, tuple(reduce_list))(inputs)
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
    return jnp.concatenate(outs, axis=1)
