"""Fused multi-range SpMM kernel — range-partitioned gathers, one output.

Companion to :class:`pyg_lib_tpu.ops.spmm.RangeSpmmPlan` (see its
docstring for why splitting the source-node space into S static ranges
cuts the dominant gather cost on v5e: the XLA row-gather's per-row
transaction cost scales with the table *operand* size). The separate
per-range form pays for the cheaper gathers with S partial ``[N, F]``
outputs plus their final add — ~4 GB of extra stream traffic at the
bench scale. This kernel removes that: ONE chunked-membership kernel
consumes all S gathered slabs and writes the output tile exactly once.

Schedule: steps are tile-major — for each 128-row output tile ``t``,
``K(t) = max_r chunks_r(t)`` grid steps each reduce one chunk from
*every* range's slab into the resident output tile (S membership
matmuls per step). Scalar-prefetched arrays drive the per-range slab
block index; when range ``r`` has fewer chunks in tile ``t`` than
``K(t)``, its block index re-visits its previous block (Pallas skips
the DMA on consecutive revisits) and a sentinel position base makes its
membership mask all-false, so nothing is double-counted and no padding
traffic is streamed.

No single reference counterpart (the reference's CUDA kernels gather
implicitly per element, ``csrc/ops/cuda/segment_csr_kernel.cu:17-76``);
this is the TPU answer to the same memory-system problem.
"""

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyg_lib_tpu.ops.pallas.spmm_chunked import (
    PTR_SUB,
    TP,
    TR,
    build_spmm_plan,
    quantize_columns,
    split_dot,
    spmm_plan_apply,
)

__all__ = ['FusedRangePlan', 'build_fused_range_plan', 'fused_range_apply']

# Position base for inactive (range, step) pairs: far below any valid
# padded coordinate so the membership mask is identically false.
_INACTIVE = -(1 << 30)

# Per-buffer VMEM budget for the S double-buffered message slabs.
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


class FusedRangePlan(NamedTuple):
    """Tile-major fused schedule over S column ranges (host-built)."""
    plans: tuple  # per-range SpmmPlan (slab layouts + fallback path)
    bounds: tuple  # ((lo, hi), ...) static source-node ranges
    step_tile: jax.Array  # [NS] int32 — output tile of each step
    blocks: jax.Array  # [S, NS] int32 — slab block per range per step
    posb: jax.Array  # [S, NS] int32 — block*chunk, or _INACTIVE
    tile_ptrs: jax.Array  # [T, S8, TP] int32 — per-range padded rowptr
    # rows stacked on the sublane axis (S padded up to a multiple of 8),
    # ONE operand instead of S PTR_SUB-replicated tables (8/S x smaller).
    num_rows: int
    num_edges: int
    chunk: int
    # Optional per-edge weights in each range's padded coordinates
    # (``out[r] = Σ w_e · x[col_e]``) — e.g. per-relation R-GCN mean
    # normalisation baked into a per-relation-sliced hetero plan.
    weights: Optional[tuple] = None


from pyg_lib_tpu.utils.pytree import register_plan_pytree  # noqa: E402

register_plan_pytree(FusedRangePlan,
                     ('bounds', 'num_rows', 'num_edges', 'chunk'))


def build_fused_range_plan(rowptr, col, num_cols: int, range_split: int,
                           chunk=512, bounds=None,
                           edge_weight=None) -> FusedRangePlan:
    """Host-side: per-range chunked layouts + the tile-major step tables.

    ``chunk='auto'`` sizes the chunk on the per-range degree
    distributions (``pallas.auto_chunk``). ``bounds`` optionally gives
    EXPLICIT (lo, hi) column ranges instead of ``range_split`` uniform
    ones — e.g. per-relation segments of a stacked hetero source space,
    so each gather operand is one relation's (small) table slice.
    ``edge_weight`` (length ``num_edges``, in the CSR's edge order)
    bakes a per-edge scale into the plan: ``out[r] = Σ w_e · x[col_e]``.
    """
    from pyg_lib_tpu.ops.pallas.spmm_chunked import _build_padded_layout

    rowptr = np.asarray(rowptr, dtype=np.int64)
    col = np.asarray(col, dtype=np.int64)
    num_rows = rowptr.shape[0] - 1
    if edge_weight is not None:
        edge_weight = np.asarray(edge_weight, dtype=np.float32)
        if edge_weight.shape[0] != col.shape[0]:
            raise ValueError('edge_weight must have one entry per edge')
    if bounds is None:
        ns = -(-num_cols // range_split)
        bounds = [(r * ns, min((r + 1) * ns, num_cols))
                  for r in range(range_split)]
    else:
        bounds = [(int(lo), int(hi)) for lo, hi in bounds]
        for (alo, ahi), (blo, bhi) in zip(bounds, bounds[1:]):
            if ahi > blo:
                raise ValueError('bounds must be sorted and disjoint')
        if len(col) and (col.min() < bounds[0][0]
                         or col.max() >= bounds[-1][1]):
            raise ValueError('bounds must cover every column id')
    row_of_edge = np.repeat(np.arange(num_rows, dtype=np.int64),
                            np.diff(rowptr).astype(np.int64))
    csrs, kept = [], []
    covered = 0
    for lo, hi in bounds:
        if lo >= hi:
            continue
        mask = (col >= lo) & (col < hi)
        if not mask.any():
            continue  # edgeless range: no slab, no kernel operand
        covered += int(mask.sum())
        col_r = (col[mask] - lo).astype(np.int64)
        cnt = np.bincount(row_of_edge[mask], minlength=num_rows)
        rp_r = np.zeros(num_rows + 1, np.int64)
        np.cumsum(cnt, out=rp_r[1:])
        w_r = edge_weight[mask] if edge_weight is not None else None
        csrs.append((rp_r, col_r, w_r))
        kept.append((int(lo), int(hi)))
    if covered != int(col.shape[0]):
        # The min/max envelope check above cannot see GAPS between
        # bounds; an uncovered edge would silently vanish from the sum.
        raise ValueError(
            f'bounds leave {int(col.shape[0]) - covered} edges uncovered '
            '(column ids falling in gaps between ranges)')
    bounds = kept
    if chunk == 'auto':
        # Sized on the per-range CSRs: each is ~1/S the full density,
        # and per-tile counts near a chunk boundary pad up to 2x with
        # the dense graph's chunk size.
        from pyg_lib_tpu.ops.pallas.spmm_chunked import auto_chunk
        chunk = (max(auto_chunk(rp) for rp, _, _ in csrs)
                 if csrs else auto_chunk(rowptr))
    # Compact layouts: a range with no edges in a tile gets ZERO chunks
    # there (no gather, no stream traffic) — the fused schedule masks
    # the step instead.
    plans, weights = [], []
    for rp_r, col_r, w_r in csrs:
        layout = _build_padded_layout(rp_r, chunk, allow_empty_tiles=True)
        plans.append(build_spmm_plan(rp_r, col_r, chunk=chunk,
                                     allow_empty_tiles=True,
                                     _layout=layout))
        if w_r is not None:
            orig, valid = layout[0], layout[1]
            wp = np.where(valid,
                          w_r[np.minimum(orig, max(len(w_r) - 1, 0))],
                          0.0).astype(np.float32)
            weights.append(jnp.asarray(wp))
    if not plans:
        # Edgeless graph: one ordinary (floored) plan covers everything.
        plans.append(build_spmm_plan(rowptr, col, chunk=chunk))
        bounds.append((0, int(num_cols)))
        if edge_weight is not None:
            weights.append(jnp.zeros((plans[0].col_padded.shape[0], ),
                                     jnp.float32))
    s_eff = len(plans)

    # Per (tile, range) chunk counts from each plan's chunk->tile list
    # (contiguous and non-decreasing by construction).
    num_tiles = plans[0].tile_ptr.shape[0]
    per_tile = np.zeros((s_eff, num_tiles), np.int64)
    offs = np.zeros((s_eff, num_tiles), np.int64)
    for r, p in enumerate(plans):
        ct = np.asarray(jax.device_get(p.chunk_tile))
        per_tile[r] = np.bincount(ct, minlength=num_tiles)
        offs[r, 1:] = np.cumsum(per_tile[r])[:-1]

    # Every tile needs >=1 step so its output block is written (a fully
    # empty tile gets one all-masked step that zeroes it).
    k_t = np.maximum(per_tile.max(axis=0), 1)
    n_steps = int(k_t.sum())
    step_tile = np.repeat(np.arange(num_tiles, dtype=np.int32), k_t)
    k_in_tile = (np.arange(n_steps, dtype=np.int64) -
                 np.repeat(np.cumsum(k_t) - k_t, k_t))
    t_of_step = step_tile.astype(np.int64)
    blocks = np.empty((s_eff, n_steps), np.int32)
    posb = np.empty((s_eff, n_steps), np.int32)
    for r in range(s_eff):
        active = k_in_tile < per_tile[r, t_of_step]
        # Inactive steps carry the previous block (offs-1 for a tile
        # with no chunks in this range) so consecutive revisits skip
        # the DMA; clamp covers steps before the range's first chunk.
        blk = np.maximum(
            offs[r, t_of_step] + np.minimum(k_in_tile,
                                            per_tile[r, t_of_step] - 1), 0)
        blocks[r] = blk.astype(np.int32)
        posb[r] = np.where(active, blk * chunk, _INACTIVE).astype(np.int32)

    s8 = -(-s_eff // PTR_SUB) * PTR_SUB
    tile_ptrs = np.zeros((num_tiles, s8, TP), np.int32)
    for r, p in enumerate(plans):
        tile_ptrs[:, r, :] = np.asarray(jax.device_get(p.tile_ptr))[:, 0, :]

    return FusedRangePlan(
        plans=tuple(plans),
        bounds=tuple(bounds),
        step_tile=jnp.asarray(step_tile),
        blocks=jnp.asarray(blocks),
        posb=jnp.asarray(posb),
        tile_ptrs=jnp.asarray(tile_ptrs),
        num_rows=int(num_rows),
        num_edges=int(col.shape[0]),
        chunk=int(chunk),
        weights=tuple(weights) if weights else None,
    )


def _fused_kernel(s_eff, st_ref, bl_ref, pb_ref, ptr_ref, *refs):
    msgs_refs = refs[:s_eff]
    out_ref = refs[s_eff]
    s = pl.program_id(0)
    chunk = msgs_refs[0].shape[0]

    tile = st_ref[s]
    prev = st_ref[jnp.maximum(s, 1) - 1]
    is_first = jnp.logical_or(s == 0, tile != prev)

    dims = (((0, ), (0, )), ((), ()))
    contrib = None
    for r in range(s_eff):
        bounds = ptr_ref[0][r:r + 1, :]  # [1, TP]
        lo = bounds[:, :TR]
        hi = bounds[:, 1:TR + 1]
        pos = pb_ref[r, s] + jax.lax.broadcasted_iota(
            jnp.int32, (chunk, TR), 0)
        m = ((pos >= lo) & (pos < hi)).astype(jnp.bfloat16)
        data = msgs_refs[r][:]
        if data.dtype == jnp.bfloat16:
            c = jax.lax.dot_general(m, data, dimension_numbers=dims,
                                    preferred_element_type=jnp.float32)
        elif data.dtype == jnp.int8:
            c = jax.lax.dot_general(m, data.astype(jnp.bfloat16),
                                    dimension_numbers=dims,
                                    preferred_element_type=jnp.float32)
        else:
            c = split_dot(m, data.astype(jnp.float32), dims)
        contrib = c if contrib is None else contrib + c

    @pl.when(is_first)
    def _():
        out_ref[:] = contrib

    @pl.when(jnp.logical_not(is_first))
    def _():
        out_ref[:] = out_ref[:] + contrib


@partial(jax.jit, static_argnums=(0, 1, 2, 8))
def _fused_call(s_eff: int, num_rows: int, chunk: int, step_tile, blocks,
                posb, tile_ptrs, slabs, interpret: bool = False):
    n_steps = step_tile.shape[0]
    f = slabs[0].shape[1]
    num_tiles = tile_ptrs.shape[0]
    s8 = tile_ptrs.shape[1]
    r_pad = num_tiles * TR

    ptr_spec = pl.BlockSpec((1, s8, TP),
                            lambda s, st, bl, pb: (st[s], 0, 0),
                            memory_space=pltpu.VMEM)

    def msgs_spec(r):
        return pl.BlockSpec((chunk, f),
                            lambda s, st, bl, pb, r=r: (bl[r, s], 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_steps, ),
        in_specs=[ptr_spec] + [msgs_spec(r) for r in range(s_eff)],
        out_specs=pl.BlockSpec((TR, f), lambda s, st, bl, pb: (st[s], 0),
                               memory_space=pltpu.VMEM),
    )

    e_pad_total = sum(int(s.shape[0]) for s in slabs)
    out = pl.pallas_call(
        partial(_fused_kernel, s_eff),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r_pad, f), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * e_pad_total * TR * f,
            bytes_accessed=(sum(
                int(s.shape[0]) * s.dtype.itemsize
                for s in slabs) * f + r_pad * f * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(step_tile, blocks, posb, tile_ptrs, *slabs)
    return out[:num_rows]


def fused_range_apply(x: jax.Array, plan: FusedRangePlan,
                      precision: Optional[str] = None,
                      interpret: Optional[bool] = None) -> jax.Array:
    """``out[r] = Σ_{e in row r} x[col[e]]`` with per-range slice gathers
    and ONE fused reduction kernel. Precision modes match
    :func:`pyg_lib_tpu.ops.pallas.spmm_chunked.spmm_plan_apply`.

    ``interpret`` follows the kernel-family convention
    (``segment_sum_chunked``): ``None`` picks the kernel on TPU and the
    XLA fallback elsewhere; ``True`` forces the Pallas interpreter
    (kernel unit tests); ``False`` forces the compiled kernel (invalid
    off-TPU). Note the fallback loop here is NOT ``_range_plan_apply``:
    these compact layouts are only kernel-safe inside the fused
    schedule, so the fallback must stay on the XLA segment-sum path.
    """
    s_eff = len(plan.plans)
    f = x.shape[1]
    scale = None
    if precision == 'int8':
        if plan.weights is not None:
            raise ValueError("precision='int8' is not supported on "
                             'weighted fused-range plans (the per-edge '
                             'multiply would upcast the int8 slab)')
        xm, scale = quantize_columns(x)
        itemsize = 1
    elif precision == 'bf16' and x.dtype != jnp.bfloat16:
        xm = x.astype(jnp.bfloat16)
        itemsize = 2
    else:
        xm = x
        itemsize = xm.dtype.itemsize

    slab_vmem = s_eff * 2 * plan.chunk * f * itemsize
    use_kernel = (jax.default_backend() == 'tpu'
                  if interpret is None else True)
    if use_kernel and slab_vmem > _VMEM_BUDGET_BYTES:
        # The compact per-range layouts are only valid inside the fused
        # kernel (empty tiles write no block), so there is no TPU
        # fallback once the S double-buffered slabs exceed VMEM.
        raise ValueError(
            f'fused range plan needs {slab_vmem} B of VMEM for '
            f'{s_eff} double-buffered ({plan.chunk}, {f}) slabs '
            f'(budget {_VMEM_BUDGET_BYTES}); rebuild with a smaller '
            f'chunk / range_split, or use range_fused=False')
    if not use_kernel:
        # Non-TPU backends (and F too wide for S double-buffered slabs):
        # per-range partial sums, accumulated in f32 like the kernel.
        # int8 slices the pre-quantised table (global column scales);
        # bf16 slices the original so each partial comes back f32.
        from pyg_lib_tpu.ops.pallas.spmm_chunked import segment_sum_chunked

        src = xm if scale is not None else x
        sub_prec = 'int8' if scale is not None else precision
        out = None
        for r, ((lo, hi), p) in enumerate(zip(plan.bounds, plan.plans)):
            xr = jax.lax.slice_in_dim(src, lo, hi, axis=0)
            if plan.weights is not None:
                msgs = (jnp.take(xr, p.col_padded, axis=0).astype(
                    jnp.float32) * plan.weights[r][:, None])
                o = segment_sum_chunked(msgs, p)
            else:
                o = spmm_plan_apply(xr, p, precision=sub_prec)
            o = o.astype(jnp.float32)
            out = o if out is None else out + o
        if scale is not None:
            out = out * scale[None, :]
        return out.astype(x.dtype)

    slabs = []
    for r, ((lo, hi), p) in enumerate(zip(plan.bounds, plan.plans)):
        # The barrier keeps each slice a real (small) gather operand —
        # fused away, the access pattern is back on the full table and
        # loses the small-table transaction rate.
        xr = jax.lax.optimization_barrier(
            jax.lax.slice_in_dim(xm, lo, hi, axis=0))
        slab = jnp.take(xr, p.col_padded, axis=0)
        if plan.weights is not None:
            # Per-edge scale fuses into the gather consumer; slab dtype
            # is preserved (bf16 stays bf16).
            slab = (slab.astype(jnp.float32) *
                    plan.weights[r][:, None]).astype(slab.dtype)
        slabs.append(slab)
    out = _fused_call(s_eff, plan.num_rows, plan.chunk, plan.step_tile,
                      plan.blocks, plan.posb, plan.tile_ptrs, tuple(slabs),
                      bool(interpret))
    if scale is not None:
        out = out * scale[None, :]
    return out.astype(x.dtype)
