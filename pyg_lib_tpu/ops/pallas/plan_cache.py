"""Shared per-``indptr`` SpmmPlan cache for planned kernel paths.

``softmax_csr`` and ``segment_{min,max}_csr`` both dispatch to chunked
Pallas kernels that need a host-built :class:`SpmmPlan` for the group
layout (cols unused — zeros). Plans are O(E) to build, so they are cached
per ptr: identity-keyed for stable numpy buffers (validated against a
stored copy), content-keyed for device arrays/lists whose host copy is
fresh each call (an address key would miss — or collide on allocator
address reuse — every call; advisor finding r1).
"""

import hashlib

import jax
import numpy as np

from pyg_lib_tpu.ops.pallas.spmm_chunked import SpmmPlan, build_spmm_plan

_CACHE: dict = {}
_MAX_ENTRIES = 8


def plan_key(ptr, ptr_np: np.ndarray):
    if isinstance(ptr, np.ndarray):
        return ('id', ptr_np.ctypes.data, ptr_np.shape[0])
    return ('sha', hashlib.sha1(ptr_np.tobytes()).hexdigest(),
            ptr_np.shape[0])


def plan_for_ptr(ptr, chunk: int = 512) -> SpmmPlan:
    """Cached layout-only plan (``with_edge_maps=True``) for one indptr."""
    ptr_np = np.asarray(ptr)
    key = plan_key(ptr, ptr_np)
    hit = _CACHE.get(key)
    if hit is not None and np.array_equal(hit[1], ptr_np):
        return hit[0]
    e = int(ptr_np[-1])
    # Built eagerly even during a jit trace: plan arrays must be constants
    # (not tracers) to be cacheable across traces.
    with jax.ensure_compile_time_eval():
        plan = build_spmm_plan(ptr_np, np.zeros(e, np.int32), chunk=chunk,
                               with_edge_maps=True)
    if key not in _CACHE and len(_CACHE) >= _MAX_ENTRIES:
        _CACHE.pop(next(iter(_CACHE)))
    _CACHE[key] = (plan, ptr_np.copy())
    return plan
