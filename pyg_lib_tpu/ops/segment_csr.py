"""CSR segment reductions and ``gather_csr`` — THE message-passing primitive.

TPU-native counterpart of the reference CSR segment subsystem
(reference ``pyg_lib/csrc/ops/cpu/segment_csr_kernel.cpp:31-155`` CPU loops,
``csrc/ops/cuda/segment_csr_kernel.cu:17-76`` warp-per-row kernels,
``csrc/ops/autograd/segment_csr_kernel.cpp`` gradients, Python wrappers
``pyg_lib/ops/__init__.py:634-745,816-835``).

GCN-style aggregation is ``gather(x, col)`` followed by
``segment_sum_csr(msgs, rowptr)``.  Rows are contiguous (CSR), so the
reduction is deterministic and atomic-free — ideal for TPU.  Two paths:

* XLA path (default): expand ``indptr`` to sorted per-element segment ids and
  use a sorted scatter-add.  XLA fuses the expansion with the reduction.
* Pallas path (``pyg_lib_tpu.ops.pallas.segment_csr_matmul_kernel``): blocks
  of rows are reduced by a 0/1-membership matmul on the MXU, streaming
  ``src`` through VMEM — used for the bandwidth roofline benchmark.

The number of segments ``R = indptr.shape[-1] - 1`` is static, so these ops
are fully jittable with no extra arguments.
"""

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pyg_lib_tpu.utils import (
    Array,
    indptr_to_index,
    max_identity,
    min_identity,
)

__all__ = [
    'segment_sum_csr',
    'segment_add_csr',
    'segment_mean_csr',
    'segment_min_csr',
    'segment_max_csr',
    'gather_csr',
    'segment_csr',
]


def _check_indptr(indptr: Array):
    if indptr.ndim < 1:
        raise ValueError('indptr must have at least 1 dimension')
    # Concrete indptrs are validated (a non-monotonic indptr silently
    # produces garbage segments — reference TORCH_CHECK role). Tracers
    # cannot be inspected, and TPU-resident arrays are deliberately
    # skipped: np.asarray on an axon device array is a device->host
    # readback at ~0.1 MB/s (~80 s for a 1M-row indptr on every eager
    # call). Host/CPU-backend arrays read back for free.
    import numpy as np

    if isinstance(indptr, jax.core.Tracer):
        return
    if not isinstance(indptr,
                      (np.ndarray, list,
                       tuple)) and jax.default_backend() == 'tpu':
        return
    ip = np.asarray(indptr)
    if ip.shape[-1] and (np.diff(ip, axis=-1) < 0).any():
        raise ValueError('indptr must be non-decreasing')


def _segment_ids(indptr: Array, num_elements: int) -> Array:
    return indptr_to_index(indptr, num_elements)


def _row_counts(indptr: Array) -> Array:
    return indptr[1:] - indptr[:-1]


# -- batched (multi-dim) indptr -----------------------------------------------
#
# The reference CSR family accepts an ``indptr`` with leading batch dims: the
# reduction axis is ``dim = indptr.ndim - 1``, indptr's leading dims broadcast
# against src's, and every leading slice applies its own row ranges
# (reference ``csrc/ops/cpu/segment_csr_kernel.cpp:44-52`` broadcast +
# :96-130 flat (slice, row) loop).  TPU-natively this flattens to ONE sorted
# scatter over a fused (slice, row) id space — no Python loop, no per-slice
# retrace.


def _batched_setup(src: Array, indptr: Array):
    """Broadcast indptr leading dims against src and flatten both to
    ``(L, E, *feat)`` / ``(L, R+1)``."""
    b = indptr.ndim - 1
    if src.ndim < indptr.ndim:
        raise ValueError(
            f'src.ndim ({src.ndim}) must be >= indptr.ndim ({indptr.ndim})')
    lead = src.shape[:b]
    indptr_b = jnp.broadcast_to(indptr, lead + indptr.shape[-1:])
    feat = src.shape[b + 1:]
    num_el = src.shape[b]
    size_l = 1
    for d in lead:
        size_l *= d
    ip2 = indptr_b.reshape((size_l, indptr.shape[-1]))
    src2 = src.reshape((size_l, num_el) + feat)
    return lead, size_l, num_el, feat, ip2, src2


def _batched_flat_ids(ip2: Array, num_el: int, num_rows: int) -> Array:
    """Fused (slice, row) segment id per element, shape ``(L, E)``.

    Elements outside their slice's ``[indptr[0], indptr[-1])`` get the
    out-of-range id ``L*R`` so ``mode='drop'`` scatters ignore them (they
    must NOT fall into a neighbouring slice's rows; leading-gap ids come
    back as ``-1`` from ``indptr_to_index``, trailing as ``R``)."""
    size_l = ip2.shape[0]
    ids = jax.vmap(lambda p: indptr_to_index(p, num_el))(ip2)
    base = (jnp.arange(size_l, dtype=jnp.int32) * num_rows)[:, None]
    return jnp.where((ids >= 0) & (ids < num_rows), ids + base,
                     jnp.int32(size_l * num_rows))


def _segment_sum_csr_batched(src: Array, indptr: Array) -> Array:
    lead, size_l, num_el, feat, ip2, src2 = _batched_setup(src, indptr)
    num_rows = indptr.shape[-1] - 1
    gids = _batched_flat_ids(ip2, num_el, num_rows).reshape(-1)
    flat = src2.reshape((size_l * num_el, ) + feat)
    out = jnp.zeros((size_l * num_rows, ) + feat, src.dtype)
    # Plain scatter-add: XLA's transpose (gather at gids, dropped -> 0) IS
    # the reference backward, so no custom_vjp is needed on this path.
    out = out.at[gids].add(flat, mode='drop')
    return out.reshape(lead + (num_rows, ) + feat)


def _segment_mean_csr_batched(src: Array, indptr: Array) -> Array:
    sums = _segment_sum_csr_batched(src, indptr)
    b = indptr.ndim - 1
    lead = src.shape[:b]
    indptr_b = jnp.broadcast_to(indptr, lead + indptr.shape[-1:])
    count = jnp.maximum(jnp.diff(indptr_b, axis=-1), 1)
    count = count.reshape(count.shape + (1, ) * (src.ndim - b - 1))
    if jnp.issubdtype(src.dtype, jnp.floating):
        return sums / count.astype(src.dtype)
    return sums // count.astype(src.dtype)


def _minmax_batched_impl(src: Array, indptr: Array, is_min: bool):
    lead, size_l, num_el, feat, ip2, src2 = _batched_setup(src, indptr)
    num_rows = indptr.shape[-1] - 1
    flat_ids = _batched_flat_ids(ip2, num_el, num_rows).reshape(-1)
    flat = src2.reshape((size_l * num_el, ) + feat)
    ident = min_identity(src.dtype) if is_min else max_identity(src.dtype)
    init = jnp.full((size_l * num_rows, ) + feat, ident, dtype=src.dtype)
    if is_min:
        vals = init.at[flat_ids].min(flat, mode='drop')
    else:
        vals = init.at[flat_ids].max(flat, mode='drop')
    safe = jnp.minimum(flat_ids, size_l * num_rows - 1)
    picked = jnp.take(vals, safe, axis=0)
    # First-winner argindex in PER-SLICE coordinates; sentinel = E
    # (reference sentinel src.size(dim), segment_csr_kernel.cpp:324-326).
    pos = jnp.tile(jnp.arange(num_el, dtype=jnp.int32), size_l)
    pos = pos.reshape((size_l * num_el, ) + (1, ) * len(feat))
    pos = jnp.broadcast_to(pos, flat.shape)
    valid = (flat_ids < size_l * num_rows).reshape(
        (size_l * num_el, ) + (1, ) * len(feat))
    cand = jnp.where(valid & (flat == picked), pos, jnp.int32(num_el))
    arg = jnp.full((size_l * num_rows, ) + feat, jnp.int32(num_el))
    arg = arg.at[flat_ids].min(cand, mode='drop')
    counts = ip2[:, 1:] - ip2[:, :-1]
    empty = (counts == 0).reshape((size_l * num_rows, ) + (1, ) * len(feat))
    vals = jnp.where(empty, jnp.zeros_like(vals), vals)
    out_shape = lead + (num_rows, ) + feat
    return vals.reshape(out_shape), arg.reshape(out_shape)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _segment_minmax_csr_batched(src, indptr, is_min, meta):
    return _minmax_batched_impl(src, indptr, is_min)


def _minmax_batched_fwd(src, indptr, is_min, meta):
    vals, arg = _minmax_batched_impl(src, indptr, is_min)
    return (vals, arg), arg


def _minmax_batched_bwd(is_min, meta, res, cot):
    b, src_shape = meta
    arg = res
    g, _ = cot
    num_el = src_shape[b]
    feat = src_shape[b + 1:]
    size_l = 1
    for d in src_shape[:b]:
        size_l *= d
    num_rows = arg.shape[b]
    kf = 1
    for d in feat:
        kf *= d
    gf = g.reshape(size_l * num_rows, kf)
    af = arg.reshape(size_l * num_rows, kf)
    rowbase = (jnp.arange(size_l * num_rows, dtype=jnp.int32) //
               jnp.int32(max(num_rows, 1))) * jnp.int32(num_el)
    # Winner-only gradient; the sentinel E maps to the drop id L*E (NOT
    # l*E + E, which would leak into the next slice's element 0).
    tgt = jnp.where(af < num_el, rowbase[:, None] + af,
                    jnp.int32(size_l * num_el))
    cols = jnp.broadcast_to(
        jnp.arange(kf, dtype=jnp.int32)[None, :], af.shape)
    grad = jnp.zeros((size_l * num_el, kf), g.dtype).at[tgt, cols].add(
        gf, mode='drop')
    return grad.reshape(src_shape), None


_segment_minmax_csr_batched.defvjp(_minmax_batched_fwd, _minmax_batched_bwd)


def _gather_csr_batched(src: Array, indptr: Array, out_size: int,
                        out: Optional[Array]) -> Array:
    b = indptr.ndim - 1
    if src.ndim < indptr.ndim:
        raise ValueError(
            f'src.ndim ({src.ndim}) must be >= indptr.ndim ({indptr.ndim})')
    num_rows = indptr.shape[-1] - 1
    if src.shape[b] != num_rows:
        raise ValueError(
            'gather_csr: src.shape[dim] must equal indptr.shape[-1] - 1')
    lead = src.shape[:b]
    feat = src.shape[b + 1:]
    indptr_b = jnp.broadcast_to(indptr, lead + indptr.shape[-1:])
    size_l = 1
    for d in lead:
        size_l *= d
    ip2 = indptr_b.reshape((size_l, indptr.shape[-1]))
    ids = jax.vmap(lambda p: indptr_to_index(p, out_size))(ip2)
    base = (jnp.arange(size_l, dtype=jnp.int32) * num_rows)[:, None]
    flat_ids = jnp.where((ids >= 0) & (ids < num_rows), ids + base,
                         jnp.int32(size_l * num_rows)).reshape(-1)
    src_flat = src.reshape((size_l * num_rows, ) + feat)
    safe = jnp.minimum(flat_ids, size_l * num_rows - 1)
    res = jnp.take(src_flat, safe, axis=0)
    pad = (flat_ids >= size_l * num_rows).reshape(
        (size_l * out_size, ) + (1, ) * len(feat))
    res = jnp.where(pad, jnp.zeros_like(res), res)
    res = res.reshape(lead + (out_size, ) + feat)
    if out is not None:
        written = (~pad).reshape(lead + (out_size, ) + (1, ) * len(feat))
        res = jnp.where(written, res.astype(out.dtype), out)
    return res


# -- sum ---------------------------------------------------------------------


def _use_pallas(src: Array, num_rows: int) -> bool:
    import os

    if os.environ.get('PYGT_DISABLE_PALLAS'):
        return False
    if jax.default_backend() != 'tpu':
        return False
    if src.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    from pyg_lib_tpu.ops.pallas.segment_csr_kernel import pallas_supported

    return pallas_supported(src.shape, num_rows)


@jax.custom_vjp
def segment_sum_csr_(src: Array, indptr: Array) -> Array:
    num_rows = indptr.shape[0] - 1
    if _use_pallas(src, num_rows):
        from pyg_lib_tpu.ops.pallas.segment_csr_kernel import (
            segment_sum_csr_pallas, )

        return segment_sum_csr_pallas(src, indptr)
    ids = _segment_ids(indptr, src.shape[0])
    # ids+1 into a one-row-padded target: the leading-gap id (-1) must
    # NOT reach .at[] directly — negative indices WRAP (NumPy semantics)
    # before the mode='drop' OOB check, landing in the last row. Shifted,
    # the gap is row 0 (trash, sliced off) and ids stay non-decreasing
    # for the indices_are_sorted promise.
    out = jnp.zeros((num_rows + 1, ) + src.shape[1:], dtype=src.dtype)
    return out.at[ids + 1].add(src, mode='drop', indices_are_sorted=True,
                               unique_indices=False)[1:]


def _sum_fwd(src, indptr):
    return segment_sum_csr_(src, indptr), (indptr, src.shape[0])


def _sum_bwd(res, g):
    indptr, num_elements = res
    # Reference backward: gather_csr(grad, indptr)
    # (csrc/ops/autograd/segment_csr_kernel.cpp SegmentSumCSR).
    return gather_csr_impl(g, indptr, num_elements), None


segment_sum_csr_.defvjp(_sum_fwd, _sum_bwd)


def segment_sum_csr(src: Array, indptr: Array,
                    out: Optional[Array] = None) -> Array:
    """Parity: reference ``segment_sum_csr``
    (``pyg_lib/ops/__init__.py:634-656``). ``out`` accumulates.

    ``indptr`` may carry leading batch dims (reduction axis
    ``indptr.ndim - 1``, leading dims broadcast against ``src`` — reference
    ``csrc/ops/cpu/segment_csr_kernel.cpp:44-52``)."""
    _check_indptr(indptr)
    if indptr.ndim == 1:
        result = segment_sum_csr_(src, indptr)
    else:
        result = _segment_sum_csr_batched(src, indptr)
    if out is not None:
        result = out + result
    return result


segment_add_csr = segment_sum_csr


# -- mean --------------------------------------------------------------------


def segment_mean_csr(src: Array, indptr: Array,
                     out: Optional[Array] = None) -> Array:
    """Mean over CSR rows; empty rows yield zero (reference
    ``pyg_lib/ops/__init__.py:659-676``)."""
    _check_indptr(indptr)
    if indptr.ndim != 1:
        return _segment_mean_csr_batched(src, indptr)
    sums = segment_sum_csr_(src, indptr)
    count = jnp.maximum(_row_counts(indptr), 1)
    count = count.reshape((-1, ) + (1, ) * (src.ndim - 1))
    if jnp.issubdtype(src.dtype, jnp.floating):
        result = sums / count.astype(src.dtype)
    else:
        result = sums // count.astype(src.dtype)
    # Reference contract (probed against libpyg): mean IGNORES prior
    # ``out`` contents entirely — the buffer is overwritten, empty rows
    # included (they get 0, same as without out).
    return result


# -- min / max ---------------------------------------------------------------


_MINMAX_PLANNED_MIN_EDGES = 65536


def _use_planned_minmax(src, indptr) -> bool:
    import os

    if os.environ.get('PYGT_DISABLE_PALLAS'):
        return False
    if jax.default_backend() != 'tpu':
        return False
    if src.ndim != 2 or src.dtype != jnp.float32 or src.shape[1] % 128:
        return False
    if isinstance(indptr, jax.core.Tracer):
        return False  # plans need a concrete indptr
    if src.shape[0] != int(jax.device_get(indptr[-1])):
        return False  # trailing pad edges: keep the XLA path
    return src.shape[0] >= _MINMAX_PLANNED_MIN_EDGES


# Per-(plan, is_min) custom_vjp closures: the plan must ride the closure,
# not the custom_vjp arguments — wrapped args become tracers even when
# the caller passed concrete numpy (which silently disabled this path
# until the wrapper-level dispatch below was added).
_PLANNED_MINMAX_CACHE: dict = {}


def _planned_minmax(indptr, is_min):
    import numpy as np

    from pyg_lib_tpu.ops.pallas.plan_cache import plan_for_ptr, plan_key

    ptr_np = np.asarray(indptr)
    key = (plan_key(indptr, ptr_np), is_min)
    hit = _PLANNED_MINMAX_CACHE.get(key)
    if hit is not None and np.array_equal(hit[1], ptr_np):
        return hit[0]
    plan = plan_for_ptr(indptr)
    empty_np = (np.diff(ptr_np) == 0)[:, None]

    from pyg_lib_tpu.ops.pallas.segment_minmax_kernel import (
        segment_max_planned_exact, )
    from pyg_lib_tpu.ops.pallas.spmm_chunked import TR

    def fwd_impl(src):
        n = src.shape[0]
        xp = jnp.take(src, plan.edge_perm, axis=0)  # pads masked in-kernel
        if is_min:
            xp = -xp
        vals, pos = segment_max_planned_exact(xp, plan)
        if is_min:
            vals = -vals
        empty = jnp.asarray(empty_np)
        rows = jnp.arange(plan.num_rows, dtype=jnp.int32)
        shift = jnp.take(plan.tile_shift, rows // TR)[:, None]
        arg = jnp.where(empty, jnp.int32(n), pos - shift)
        vals = jnp.where(empty, jnp.zeros_like(vals), vals)
        return vals, arg

    @jax.custom_vjp
    def f(src):
        return fwd_impl(src)

    def f_fwd(src):
        vals, arg = fwd_impl(src)
        return (vals, arg), (arg, jnp.zeros((src.shape[0], 0), src.dtype))

    def f_bwd(res, cot):
        arg, proto = res
        g, _ = cot
        n = proto.shape[0]
        f_dim = g.shape[1]
        cols = jnp.broadcast_to(
            jnp.arange(f_dim, dtype=jnp.int32)[None, :], arg.shape)
        grad = jnp.zeros((n, f_dim), g.dtype).at[arg, cols].add(
            g, mode='drop')  # sentinel n drops
        return (grad.astype(proto.dtype), )

    f.defvjp(f_fwd, f_bwd)
    if key not in _PLANNED_MINMAX_CACHE and len(
            _PLANNED_MINMAX_CACHE) >= 16:
        _PLANNED_MINMAX_CACHE.pop(next(iter(_PLANNED_MINMAX_CACHE)))
    _PLANNED_MINMAX_CACHE[key] = (f, ptr_np.copy())
    return f


def _minmax_csr_fwd_impl(src, indptr, is_min):
    num_rows = indptr.shape[0] - 1
    n = src.shape[0]
    ids = _segment_ids(indptr, n)
    ident = min_identity(src.dtype) if is_min else max_identity(src.dtype)
    # ids+1 / padded row 0: see segment_sum_csr_ — a raw -1 gap id would
    # WRAP into the last row before mode='drop' sees it.
    init = jnp.full((num_rows + 1, ) + src.shape[1:], ident,
                    dtype=src.dtype)
    if is_min:
        vals = init.at[ids + 1].min(src, mode='drop',
                                    indices_are_sorted=True)[1:]
    else:
        vals = init.at[ids + 1].max(src, mode='drop',
                                    indices_are_sorted=True)[1:]
    picked = vals[jnp.clip(ids, 0, num_rows - 1)]
    pos = jnp.arange(n, dtype=jnp.int32).reshape((-1, ) + (1, ) *
                                                 (src.ndim - 1))
    pos = jnp.broadcast_to(pos, src.shape)
    cand = jnp.where(src == picked, pos, jnp.int32(n))
    arg = jnp.full((num_rows + 1, ) + src.shape[1:],
                   jnp.int32(n)).at[ids + 1].min(
                       cand, mode='drop', indices_are_sorted=True)[1:]
    empty = (_row_counts(indptr) == 0).reshape((-1, ) + (1, ) *
                                               (src.ndim - 1))
    vals = jnp.where(empty, jnp.zeros_like(vals), vals)
    return vals, arg


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _segment_minmax_csr(src, indptr, is_min, n):
    return _minmax_csr_fwd_impl(src, indptr, is_min)


def _minmax_fwd(src, indptr, is_min, n):
    vals, arg = _minmax_csr_fwd_impl(src, indptr, is_min)
    return (vals, arg), arg


def _minmax_bwd(is_min, n, res, cot):
    arg = res
    g, _ = cot
    gf = g.reshape(g.shape[0], -1)
    af = arg.reshape(arg.shape[0], -1)
    cols = jnp.broadcast_to(
        jnp.arange(gf.shape[1], dtype=jnp.int32)[None, :], af.shape)
    grad = jnp.zeros((n, gf.shape[1]), dtype=g.dtype)
    grad = grad.at[af, cols].add(gf, mode='drop')
    return grad.reshape((n, ) + g.shape[1:]), None


_segment_minmax_csr.defvjp(_minmax_fwd, _minmax_bwd)


def _merge_minmax_out(vals, arg, out, indptr, src, is_min):
    """Reference ``out=`` contract (probed against libpyg): values merge
    elementwise with ``out``, and wherever ``out`` wins — strictly better,
    or the row is empty — the argindex is the SENTINEL ``src.size(dim)``
    (no src element is the winner)."""
    b = indptr.ndim - 1
    lead = src.shape[:b]
    indptr_b = jnp.broadcast_to(indptr, lead + indptr.shape[-1:])
    counts = jnp.diff(indptr_b, axis=-1)
    nonempty = (counts > 0).reshape(counts.shape + (1, ) *
                                    (src.ndim - b - 1))
    merge = jnp.minimum if is_min else jnp.maximum
    merged = jnp.where(nonempty, merge(out, vals), out)
    out_wins = (out < vals) if is_min else (out > vals)
    arg = jnp.where(nonempty & ~out_wins, arg, jnp.int32(src.shape[b]))
    return merged, arg


def segment_min_csr(src: Array, indptr: Array,
                    out: Optional[Array] = None) -> Tuple[Array, Array]:
    """Parity: reference ``segment_min_csr``
    (``pyg_lib/ops/__init__.py:679-700``)."""
    _check_indptr(indptr)
    if indptr.ndim != 1:
        vals, arg = _segment_minmax_csr_batched(
            src, indptr, True, (indptr.ndim - 1, tuple(src.shape)))
    elif _use_planned_minmax(src, indptr):
        vals, arg = _planned_minmax(indptr, True)(src)
    else:
        vals, arg = _segment_minmax_csr(src, indptr, True, src.shape[0])
    if out is not None:
        vals, arg = _merge_minmax_out(vals, arg, out, indptr, src, True)
    return vals, arg


def segment_max_csr(src: Array, indptr: Array,
                    out: Optional[Array] = None) -> Tuple[Array, Array]:
    """Parity: reference ``segment_max_csr``
    (``pyg_lib/ops/__init__.py:703-724``)."""
    _check_indptr(indptr)
    if indptr.ndim != 1:
        vals, arg = _segment_minmax_csr_batched(
            src, indptr, False, (indptr.ndim - 1, tuple(src.shape)))
    elif _use_planned_minmax(src, indptr):
        vals, arg = _planned_minmax(indptr, False)(src)
    else:
        vals, arg = _segment_minmax_csr(src, indptr, False, src.shape[0])
    if out is not None:
        vals, arg = _merge_minmax_out(vals, arg, out, indptr, src, False)
    return vals, arg


# -- gather ------------------------------------------------------------------


def gather_csr_impl(src: Array, indptr: Array, out_size: int) -> Array:
    ids = _segment_ids(indptr, out_size)
    safe = jnp.clip(ids, 0, src.shape[0] - 1)
    result = jnp.take(src, safe, axis=0)
    # Out-of-range = trailing pad (id R) AND leading gap (id -1).
    pad = ((ids < 0) | (ids >= src.shape[0])).reshape(
        (-1, ) + (1, ) * (src.ndim - 1))
    return jnp.where(pad, jnp.zeros_like(result), result)


def gather_csr(src: Array, indptr: Array, out: Optional[Array] = None,
               out_size: Optional[int] = None) -> Array:
    """Broadcast ``src[r]`` to positions ``[indptr[r], indptr[r+1])``
    (reference ``pyg_lib/ops/__init__.py:727-745``).

    ``out_size`` (== ``indptr[-1]``) must be given under ``jax.jit`` since
    output shapes are static; eagerly it is inferred.

    ``indptr`` may carry leading batch dims (reference reads the output
    size from the flattened-last indptr entry,
    ``csrc/ops/cpu/segment_csr_kernel.cpp:586``).
    """
    _check_indptr(indptr)
    dim = indptr.ndim - 1
    if out is not None:
        out_size = out.shape[dim]
    if out_size is None:
        if isinstance(indptr, jax.core.Tracer):
            raise ValueError('gather_csr needs static out_size under jit')
        out_size = int(jax.device_get(indptr.reshape(-1)[-1]))
    if indptr.ndim != 1:
        return _gather_csr_batched(src, indptr, out_size, out)
    result = gather_csr_impl(src, indptr, out_size)
    if out is not None:
        # Only positions [0, indptr[-1]) are written; out's tail is kept
        # (reference writes in place, csrc/ops/cpu/segment_csr_kernel.cpp).
        ids = indptr_to_index(indptr, out_size)
        written = ((ids >= 0) & (ids < indptr.shape[0] - 1)).reshape(
            (-1, ) + (1, ) * (src.ndim - 1))
        result = jnp.where(written, result.astype(out.dtype), out)
    return result


def segment_csr(
    src: Array,
    indptr: Array,
    out: Optional[Array] = None,
    reduce: str = 'sum',
) -> Array:
    """Polymorphic dispatcher (reference
    ``pyg_lib/ops/__init__.py:816-835``)."""
    if reduce in ('sum', 'add'):
        return segment_sum_csr(src, indptr, out)
    if reduce == 'mean':
        return segment_mean_csr(src, indptr, out)
    if reduce == 'min':
        return segment_min_csr(src, indptr, out)[0]
    if reduce == 'max':
        return segment_max_csr(src, indptr, out)[0]
    raise ValueError(f'Unknown reduce: {reduce!r}')
