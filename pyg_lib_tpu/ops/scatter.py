"""Unsorted scatter reductions (``scatter_{sum,mul,mean,min,max}``).

TPU-native re-design of the reference scatter subsystem
(reference ``pyg_lib/csrc/ops/scatter.cpp:156-172`` schemas,
``pyg_lib/csrc/ops/cpu/scatter_kernel.cpp`` CPU kernels,
``pyg_lib/csrc/ops/cuda/scatter_kernel.cu`` atomic CUDA kernels,
``pyg_lib/csrc/ops/autograd/scatter_kernel.cpp`` gradients, and the Python
wrappers ``pyg_lib/ops/__init__.py:353-499,764-790``).

Design notes (TPU-first, not a port):

* There are no atomics: XLA lowers ``x.at[idx].add`` to a deterministic
  scatter.  For sorted indices prefer the ``segment_coo`` family which
  passes ``indices_are_sorted`` hints.
* ``dim_size`` must be a static int under ``jax.jit``.
* ``out=`` is functional: a new array is returned with the reference's
  accumulate-into-`out` semantics.
* min/max return ``(values, argindex)``; empty buckets yield value ``0`` and
  argindex ``src.shape[dim]`` (the reference sentinel).  The VJP routes the
  cotangent only to the recorded argindex winner — exactly the reference
  gradient (``csrc/ops/autograd/scatter_kernel.cpp``), not JAX's default
  split-among-ties behaviour.
"""

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pyg_lib_tpu.utils import (
    Array,
    broadcast_index,
    canonicalize_dim,
    infer_dim_size,
    max_identity,
    min_identity,
)

__all__ = [
    'scatter_sum',
    'scatter_add',
    'scatter_mul',
    'scatter_mean',
    'scatter_min',
    'scatter_max',
    'scatter',
]


def _flatten_for_scatter(src: Array, index: Array, dim: int):
    """Canonicalise to (src2d [N, F], index1d [N]) with dim moved to front.

    ``index`` may be 1-D (broadcast along ``dim``) or same-shape as ``src``.
    Same-shape index is handled by flattening to 1-D with per-column offsets
    removed — we instead scatter elementwise in that case.
    """
    src_moved = jnp.moveaxis(src, dim, 0)
    if index.ndim == 1:
        flat = src_moved.reshape(src_moved.shape[0], -1)
        return flat, index, src_moved.shape, False
    # Elementwise index (same shape as src): move dim, flatten feature dims.
    index_moved = jnp.moveaxis(broadcast_index(index, src.shape, dim), dim, 0)
    flat = src_moved.reshape(src_moved.shape[0], -1)
    idx_flat = index_moved.reshape(index_moved.shape[0], -1)
    return flat, idx_flat, src_moved.shape, True


def _unflatten(out_flat: Array, moved_shape, dim: int, dim_size: int):
    out = out_flat.reshape((dim_size, ) + tuple(moved_shape[1:]))
    return jnp.moveaxis(out, 0, dim)


def scatter_sum(
    src: Array,
    index: Array,
    dim: int = -1,
    out: Optional[Array] = None,
    dim_size: Optional[int] = None,
) -> Array:
    """Sum-reduce ``src`` rows into buckets given by ``index`` along ``dim``.

    Parity: reference ``pyg_lib.ops.scatter_sum``
    (``pyg_lib/ops/__init__.py:353-381``). With ``out`` given, values are
    accumulated into it.
    """
    dim = canonicalize_dim(dim, src.ndim)
    if out is not None:
        dim_size = out.shape[dim]
    dim_size = infer_dim_size(index, dim_size)
    flat, idx, moved_shape, elementwise = _flatten_for_scatter(
        src, index, dim)
    if elementwise:
        zero = jnp.zeros((dim_size, flat.shape[1]), dtype=src.dtype)
        cols = jnp.broadcast_to(
            jnp.arange(flat.shape[1], dtype=idx.dtype)[None, :], idx.shape)
        result = zero.at[idx, cols].add(flat, mode='drop')
    else:
        zero = jnp.zeros((dim_size, flat.shape[1]), dtype=src.dtype)
        result = zero.at[idx].add(flat, mode='drop')
    result = _unflatten(result, moved_shape, dim, dim_size)
    if out is not None:
        result = out + result
    return result


scatter_add = scatter_sum


def scatter_mul(
    src: Array,
    index: Array,
    dim: int = -1,
    out: Optional[Array] = None,
    dim_size: Optional[int] = None,
) -> Array:
    """Product-reduce. Empty buckets yield ``1`` (multiplicative identity);
    with ``out`` given, multiplies into it.

    Parity: reference ``pyg_lib.ops.scatter_mul``
    (``pyg_lib/ops/__init__.py:384-410``).
    """
    dim = canonicalize_dim(dim, src.ndim)
    if out is not None:
        dim_size = out.shape[dim]
    dim_size = infer_dim_size(index, dim_size)
    flat, idx, moved_shape, elementwise = _flatten_for_scatter(
        src, index, dim)
    cols = None
    if elementwise:
        cols = jnp.broadcast_to(
            jnp.arange(flat.shape[1], dtype=idx.dtype)[None, :], idx.shape)
    result = _scatter_mul_flat(flat, idx, cols, dim_size)
    result = _unflatten(result, moved_shape, dim, dim_size)
    if out is not None:
        result = out * result
    return result


def _scatter_mul_flat(flat, idx, cols, dim_size: int):
    """Product scatter with the reference gradient.

    JAX's native ``.at[].mul`` autodiff rejects duplicate indices, so the
    backward is the reference's closed form ``(grad * out).gather(index)
    / src`` (``csrc/ops/autograd/scatter_kernel.cpp`` ScatterMul) —
    ``out / src[i]`` is the product of the *other* bucket members.
    Zero entries get gradient 0 (the true derivative is the others'
    product, unrecoverable from out/src there; the reference emits
    inf/nan instead).
    """

    @jax.custom_vjp
    def f(flat):
        one = jnp.ones((dim_size, flat.shape[1]), dtype=flat.dtype)
        if cols is None:
            return one.at[idx].mul(flat, mode='drop')
        return one.at[idx, cols].mul(flat, mode='drop')

    def fwd(flat):
        res = f(flat)
        return res, (flat, res)

    def bwd(saved, g):
        flat, res = saved
        num = g * res
        if cols is None:
            gathered = jnp.take(num, idx, axis=0, mode='fill',
                                fill_value=0)
        else:
            gathered = num.at[idx, cols].get(mode='fill', fill_value=0)
        return (jnp.where(flat == 0, jnp.zeros_like(flat),
                          gathered / jnp.where(flat == 0, 1, flat)), )

    f.defvjp(fwd, bwd)
    return f(flat)


def scatter_mean(
    src: Array,
    index: Array,
    dim: int = -1,
    out: Optional[Array] = None,
    dim_size: Optional[int] = None,
) -> Array:
    """Mean-reduce; empty buckets yield zero. Integer inputs floor-divide
    (parity with reference ``scatter_mean``,
    ``pyg_lib/ops/__init__.py:413-441``).
    """
    dim = canonicalize_dim(dim, src.ndim)
    if out is not None:
        dim_size = out.shape[dim]
    dim_size = infer_dim_size(index, dim_size)
    sums = scatter_sum(src, index, dim, None, dim_size)
    if index.ndim > 1:
        # Elementwise index: each (bucket, column) has its own count.
        count_b = scatter_sum(jnp.ones_like(src, dtype=jnp.int32), index,
                              dim, None, dim_size)
    else:
        count = jnp.zeros((dim_size, ), jnp.int32).at[index].add(
            jnp.ones((src.shape[dim], ), jnp.int32), mode='drop')
        count_shape = [1] * src.ndim
        count_shape[dim] = dim_size
        count_b = count.reshape(count_shape)
    count_safe = jnp.maximum(count_b, 1)
    if out is not None:
        # Reference contract (probed against libpyg): ``out`` is folded
        # into the SUM before dividing by the count — (out + Σsrc)/n —
        # and empty buckets keep ``out`` unchanged. Integer inputs
        # FLOOR-divide and keep their dtype (probed: (-4-7-4)/2 -> -8).
        if jnp.issubdtype(src.dtype, jnp.floating):
            merged = (out + sums) / count_safe.astype(src.dtype)
        else:
            merged = (out + sums) // count_safe.astype(src.dtype)
        return jnp.where(count_b > 0, merged, out)
    if jnp.issubdtype(src.dtype, jnp.floating):
        result = sums / count_safe.astype(src.dtype)
    else:
        result = sums // count_safe.astype(src.dtype)
    return result


def _scatter_minmax_fwd(src, index, dim, out, dim_size, is_min):
    dim = canonicalize_dim(dim, src.ndim)
    if out is not None:
        dim_size = out.shape[dim]
    dim_size = infer_dim_size(index, dim_size)
    n = src.shape[dim]
    flat, idx, moved_shape, elementwise = _flatten_for_scatter(
        src, index, dim)
    ident = min_identity(src.dtype) if is_min else max_identity(src.dtype)
    init = jnp.full((dim_size, flat.shape[1]), ident, dtype=src.dtype)
    if elementwise:
        cols = jnp.broadcast_to(
            jnp.arange(flat.shape[1], dtype=idx.dtype)[None, :], idx.shape)
        vals = (init.at[idx, cols].min(flat, mode='drop') if is_min else
                init.at[idx, cols].max(flat, mode='drop'))
        picked = vals[idx, cols]
    else:
        vals = (init.at[idx].min(flat, mode='drop')
                if is_min else init.at[idx].max(flat, mode='drop'))
        picked = vals[idx]
    # argindex: the smallest position along dim attaining the extremum
    # (reference records a single winner; sentinel n for empty buckets).
    pos = jnp.arange(n, dtype=jnp.int32).reshape(-1, 1)
    pos = jnp.broadcast_to(pos, flat.shape)
    cand = jnp.where(flat == picked, pos, jnp.int32(n))
    arg_init = jnp.full((dim_size, flat.shape[1]), jnp.int32(n))
    if elementwise:
        arg = arg_init.at[idx, cols].min(cand, mode='drop')
    else:
        arg = arg_init.at[idx].min(cand, mode='drop')
    touched = arg < n
    vals = jnp.where(touched, vals, jnp.zeros_like(vals))
    vals_out = _unflatten(vals, moved_shape, dim, dim_size)
    arg_out = _unflatten(arg, moved_shape, dim, dim_size)
    if out is not None:
        mask = jnp.moveaxis(
            touched.reshape((dim_size, ) + tuple(moved_shape[1:])), 0, dim)
        combine = jnp.minimum if is_min else jnp.maximum
        better = (out < vals_out) if is_min else (out > vals_out)
        combined = jnp.where(mask, combine(out, vals_out), out)
        # Where out (strictly) wins or the bucket is empty, no src element
        # produced the value: record the sentinel so the VJP drops the
        # cotangent there instead of crediting a losing src element.
        out_wins = jnp.logical_or(jnp.logical_not(mask), better)
        arg_out = jnp.where(out_wins, jnp.int32(n), arg_out)
        vals_out = combined
    return vals_out, arg_out


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _scatter_minmax(src, index, out, dim, dim_size, is_min, n):
    return _scatter_minmax_fwd(src, index, dim, out, dim_size, is_min)


def _scatter_minmax_vjp_fwd(src, index, out, dim, dim_size, is_min, n):
    vals, arg = _scatter_minmax_fwd(src, index, dim, out, dim_size, is_min)
    return (vals, arg), arg


def _scatter_minmax_vjp_bwd(dim, dim_size, is_min, n, res, cot):
    arg = res
    g, _ = cot
    dim_c = canonicalize_dim(dim, arg.ndim)
    # Scatter cotangent rows to the argindex winners (reference:
    # csrc/ops/autograd/scatter_kernel.cpp min/max backward); the sentinel
    # n drops empty-bucket cotangents via mode='drop'.
    g_moved = jnp.moveaxis(g, dim_c, 0)
    arg_moved = jnp.moveaxis(arg, dim_c, 0)
    gf = g_moved.reshape(g_moved.shape[0], -1)
    af = arg_moved.reshape(arg_moved.shape[0], -1)
    cols = jnp.broadcast_to(
        jnp.arange(gf.shape[1], dtype=jnp.int32)[None, :], af.shape)
    grad_flat = jnp.zeros((n, gf.shape[1]), dtype=g.dtype)
    grad_flat = grad_flat.at[af, cols].add(gf, mode='drop')
    grad_src = jnp.moveaxis(
        grad_flat.reshape((n, ) + g_moved.shape[1:]), 0, dim_c)
    return grad_src, None, None


_scatter_minmax.defvjp(_scatter_minmax_vjp_fwd, _scatter_minmax_vjp_bwd)


def scatter_min(
    src: Array,
    index: Array,
    dim: int = -1,
    out: Optional[Array] = None,
    dim_size: Optional[int] = None,
) -> Tuple[Array, Array]:
    """Min-reduce; returns ``(values, argindex)``.

    Parity: reference ``pyg_lib.ops.scatter_min``
    (``pyg_lib/ops/__init__.py:444-470``).
    """
    if out is not None:
        dim_size = out.shape[canonicalize_dim(dim, src.ndim)]
    dim_size = infer_dim_size(index, dim_size)
    n = src.shape[canonicalize_dim(dim, src.ndim)]
    return _scatter_minmax(src, index, out, dim, dim_size, True, n)


def scatter_max(
    src: Array,
    index: Array,
    dim: int = -1,
    out: Optional[Array] = None,
    dim_size: Optional[int] = None,
) -> Tuple[Array, Array]:
    """Max-reduce; returns ``(values, argindex)``.

    Parity: reference ``pyg_lib.ops.scatter_max``
    (``pyg_lib/ops/__init__.py:473-499``).
    """
    if out is not None:
        dim_size = out.shape[canonicalize_dim(dim, src.ndim)]
    dim_size = infer_dim_size(index, dim_size)
    n = src.shape[canonicalize_dim(dim, src.ndim)]
    return _scatter_minmax(src, index, out, dim, dim_size, False, n)


def scatter(
    src: Array,
    index: Array,
    dim: int = -1,
    out: Optional[Array] = None,
    dim_size: Optional[int] = None,
    reduce: str = 'sum',
) -> Array:
    """Polymorphic scatter dispatcher (reference
    ``pyg_lib/ops/__init__.py:764-790``).

    Dispatch policy (measured on TPU v5e, ``bench/bench_scatter_strategies.py``,
    BENCHMARKS.md "Scatter strategy"): for UNSORTED indices XLA's native
    scatter and an explicit argsort+gather+segment-sum tie (~34-77 GB/s
    at E in {1M,4M}, F in {128,512}), so the native scatter stays the
    default — the sort buys nothing once paid per call.  When indices
    are ALREADY sorted (loader/plan pipelines), ``segment_coo`` with
    ``sorted=True`` is ~2x faster (65-145 GB/s): sort once at plan-build
    time, then stay on the segment path."""
    if reduce in ('sum', 'add'):
        return scatter_sum(src, index, dim, out, dim_size)
    if reduce == 'mul':
        return scatter_mul(src, index, dim, out, dim_size)
    if reduce == 'mean':
        return scatter_mean(src, index, dim, out, dim_size)
    if reduce == 'min':
        return scatter_min(src, index, dim, out, dim_size)[0]
    if reduce == 'max':
        return scatter_max(src, index, dim, out, dim_size)[0]
    raise ValueError(f'Unknown reduce: {reduce!r}')
