"""Sparse (CSR-grouped) softmax with custom backward.

TPU-native counterpart of the reference fused sparse softmax
(reference ``pyg_lib/csrc/ops/cpu/softmax_kernel.cpp:55-155`` forward /
``:157-233`` backward, ``csrc/ops/autograd/softmax_kernel.cpp``, Python
wrapper ``pyg_lib/ops/__init__.py:324-350``).

Forward: 3 logical passes (group max → exp/sum → normalise) over `ptr`
groups; backward is the fused ``out * (grad - sum(out*grad))`` per group —
same closed form as the reference.  XLA fuses all passes; no Pallas needed
for this op until the attention benchmarks say otherwise.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pyg_lib_tpu.utils import Array, canonicalize_dim, indptr_to_index

__all__ = ['softmax_csr']


def _group_ops(src: Array, ptr: Array, dim: int):
    n = src.shape[dim]
    ids = indptr_to_index(ptr, n)
    num_groups = ptr.shape[0] - 1
    return ids, num_groups


def _softmax_fwd_impl(src: Array, ptr: Array, dim: int) -> Array:
    ids, num_groups = _group_ops(src, ptr, dim)
    src_m = jnp.moveaxis(src, dim, 0)
    neg_inf = jnp.array(-jnp.inf, src.dtype)
    # ids+1 / padded row 0: a raw -1 leading-gap id would WRAP into the
    # last group before mode='drop' sees it (see segment_csr).
    gmax = jnp.full((num_groups + 1, ) + src_m.shape[1:], neg_inf,
                    src.dtype)
    gmax = gmax.at[ids + 1].max(src_m, mode='drop',
                                indices_are_sorted=True)[1:]
    safe = jnp.clip(ids, 0, num_groups - 1)
    centered = src_m - gmax[safe]
    e = jnp.exp(centered)
    gsum = jnp.zeros((num_groups + 1, ) + src_m.shape[1:], src.dtype)
    gsum = gsum.at[ids + 1].add(e, mode='drop',
                                indices_are_sorted=True)[1:]
    out_m = e / gsum[safe]
    return jnp.moveaxis(out_m, 0, dim)


@partial(jax.custom_vjp, nondiff_argnums=(2, ))
def _softmax_csr(src: Array, ptr: Array, dim: int = 0) -> Array:
    return _softmax_fwd_impl(src, ptr, dim)


def _softmax_vjp_fwd(src, ptr, dim):
    out = _softmax_fwd_impl(src, ptr, dim)
    return out, (out, ptr)


def _softmax_vjp_bwd(dim, res, g):
    out, ptr = res
    # Fused backward: grad_in = out * (g - sum_group(out * g))
    # (reference csrc/ops/cpu/softmax_kernel.cpp:207-227).
    ids, num_groups = _group_ops(out, ptr, dim)
    out_m = jnp.moveaxis(out, dim, 0)
    g_m = jnp.moveaxis(g, dim, 0)
    prod = out_m * g_m
    gsum = jnp.zeros((num_groups + 1, ) + out_m.shape[1:], out.dtype)
    gsum = gsum.at[ids + 1].add(prod, mode='drop',
                                indices_are_sorted=True)[1:]
    grad_m = out_m * (g_m - gsum[jnp.clip(ids, 0, num_groups - 1)])
    return jnp.moveaxis(grad_m, 0, dim), None


_softmax_csr.defvjp(_softmax_vjp_fwd, _softmax_vjp_bwd)


# Planned fused-kernel path: cache one SpmmPlan per (ptr identity, chunk).
# The cache holds a reference to ptr, so its data pointer stays valid.
_PLAN_CACHE: dict = {}
_PLANNED_MIN_EDGES = 65536


def _plan_for(ptr) -> 'object':
    ptr_np = np.asarray(ptr)
    from pyg_lib_tpu.ops.pallas.plan_cache import plan_for_ptr, plan_key

    key = plan_key(ptr, ptr_np)
    hit = _PLAN_CACHE.get(key)
    if hit is not None and np.array_equal(hit[1], ptr_np):
        return hit[0]
    # The plan only needs the layout; col ids are unused by softmax. The
    # shared cache dedups it with segment_{min,max}_csr's plan.
    plan = plan_for_ptr(ptr)
    if key not in _PLAN_CACHE and len(_PLAN_CACHE) >= 8:
        _PLAN_CACHE.pop(next(iter(_PLAN_CACHE)))
    # Cache the custom_vjp wrapper too, so repeated calls hit one trace;
    # a COPY of ptr guards against callers mutating the buffer in place.
    _PLAN_CACHE[key] = (_make_planned(plan), ptr_np.copy(), plan)
    return _PLAN_CACHE[key][0]


def _make_planned(plan):
    from pyg_lib_tpu.ops.pallas.segment_softmax_kernel import (
        segment_softmax_planned, )

    @jax.custom_vjp
    def fwd(src, ptr):
        xp = jnp.take(src, plan.edge_perm, axis=0)
        outp = segment_softmax_planned(xp, plan)
        return jnp.take(outp, plan.edge_pos, axis=0)

    def vjp_fwd(src, ptr):
        out = fwd(src, ptr)
        return out, (out, ptr)

    fwd.defvjp(vjp_fwd, lambda res, g: (_softmax_vjp_bwd(0, res, g)[0],
                                        None))
    return fwd


def _use_planned(src, ptr, dim: int) -> bool:
    import os

    if os.environ.get('PYGT_DISABLE_PALLAS'):
        return False
    if dim != 0 or src.ndim != 2 or src.shape[1] % 128:
        return False
    # Plans need a concrete ptr; traced src is fine (the plan only
    # depends on ptr).
    if isinstance(ptr, jax.core.Tracer):
        return False
    if jax.default_backend() != 'tpu':
        return False
    if src.shape[0] != int(np.asarray(ptr)[-1]):
        # Trailing pad edges past ptr[-1] (the repo's padded-batch
        # convention): the planned path would change the output shape;
        # keep the XLA composite.
        return False
    return src.shape[0] >= _PLANNED_MIN_EDGES


def softmax_csr(src: Array, ptr: Array, dim: int = 0) -> Array:
    """Sparsely-evaluated softmax over CSR groups.

    Parity: reference ``pyg_lib.ops.softmax_csr``
    (``pyg_lib/ops/__init__.py:324-350``).  On TPU with a concrete ``ptr``
    and ≥64K rows, dispatches to the fused 3-pass Pallas kernel
    (``pyg_lib_tpu/ops/pallas/segment_softmax_kernel.py``; measured 12×
    the XLA composite at 2M×128 on v5e); otherwise the XLA composite.
    """
    dim = canonicalize_dim(dim, src.ndim)
    if _use_planned(src, ptr, dim):
        return _plan_for(ptr)(src, ptr)
    return _softmax_csr(src, ptr, dim)
