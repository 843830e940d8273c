"""Planned SpMM — the TPU-first fused message-passing aggregation.

This op has no single counterpart in the reference: it fuses the two hot
ops of every GNN layer, ``gather(x, col)`` followed by
``segment_sum_csr(msgs, rowptr)`` (reference call stack SURVEY.md §3.3;
kernels ``pyg_lib/csrc/ops/cpu/segment_csr_kernel.cpp:31-155``,
``csrc/ops/cuda/segment_csr_kernel.cu:17-76``), into one planned pipeline:

* a one-time host-built :class:`SpmmPlan` (MEGABLOCKS-style chunk layout,
  see ``pyg_lib_tpu.ops.pallas.spmm_chunked``) amortised over the life of
  the graph — the TPU analog of the reference's requirement that callers
  hand it a prebuilt CSR;
* per step: one XLA row-gather + one auto-pipelined Pallas membership-
  matmul reduction, sustaining HBM stream bandwidth on the reduce side.

Gradients mirror the reference (``csrc/ops/autograd/segment_csr_kernel.cpp``
composed with gather):  d/dx (A @ x) = Aᵀ @ g, i.e. the same planned SpMM
over the transposed graph — the plan carries its transpose.
"""

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pyg_lib_tpu.ops.pallas.spmm_chunked import (
    SpmmPlan,
    build_spmm_plan,
    spmm_plan_apply,
)

__all__ = ['SpmmGraph', 'build_spmm_graph', 'spmm', 'spmm_csr', 'sddmm',
           'segment_sum_padded', 'segment_softmax_padded',
           'segment_max_padded', 'segment_min_padded',
           'ShardedSpmmGraph', 'build_spmm_graph_sharded',
           'spmm_sharded', 'RangeSpmmPlan', 'build_weighted_fused_graph']


class RangeSpmmPlan(NamedTuple):
    """Column-range-partitioned SpMM schedule (gather-locality optimised).

    The XLA row-gather's per-row cost on v5e depends on the size of the
    table *operand* (~7 ns/row from <=150 MB tables vs ~13 ns/row from
    ~500 MB ones — the same effect that makes per-relation hetero plans
    beat a fused stacked-table plan 2.3x, BENCHMARKS.md). This plan
    splits the source-node space into ``S`` static ranges and builds one
    sub-plan per range over the edges whose col falls in it; apply
    gathers each range's messages from a materialised table *slice* and
    sums the per-range partial outputs.

    Trade-off: +S-1 output-plane adds (stream-bound, cheap) and slightly
    more chunk padding, against a ~2x cheaper gather on big graphs.
    """
    plans: tuple  # per-range SpmmPlan, cols rebased to the range
    bounds: tuple  # ((lo, hi), ...) static source-node ranges
    num_rows: int
    num_edges: int


from pyg_lib_tpu.utils.pytree import register_plan_pytree  # noqa: E402

register_plan_pytree(RangeSpmmPlan, ('bounds', 'num_rows', 'num_edges'))


def _range_csrs(rowptr, col, num_cols: int, range_split: int):
    """Split a CSR into per-column-range CSRs (rebased cols)."""
    num_rows = rowptr.shape[0] - 1
    ns = -(-num_cols // range_split)
    row_of_edge = np.repeat(np.arange(num_rows, dtype=np.int64),
                            np.diff(rowptr).astype(np.int64))
    csrs, bounds = [], []
    for r in range(range_split):
        lo, hi = r * ns, min((r + 1) * ns, num_cols)
        if lo >= hi:
            break
        mask = (col >= lo) & (col < hi)
        col_r = (col[mask] - lo).astype(np.int64)
        cnt = np.bincount(row_of_edge[mask], minlength=num_rows)
        rp_r = np.zeros(num_rows + 1, np.int64)
        np.cumsum(cnt, out=rp_r[1:])
        csrs.append((rp_r, col_r))
        bounds.append((int(lo), int(hi)))
    return csrs, bounds


def _plan_chunks(rp, chunk: int) -> int:
    """Chunk count the (floored) padded layout will produce for ``rp``."""
    from pyg_lib_tpu.ops.pallas.spmm_chunked import TR

    num_rows = rp.shape[0] - 1
    tb = np.minimum(
        np.arange(num_rows // TR + (num_rows % TR > 0) + 1) * TR, num_rows)
    counts = rp[tb[1:]] - rp[tb[:-1]]
    return int(np.maximum(-(-counts // chunk), 1).sum())


def _build_range_plan(rowptr, col, num_cols: int, range_split: int,
                      chunk: int,
                      pad_to_chunks: int = None) -> RangeSpmmPlan:
    from pyg_lib_tpu.ops.pallas.spmm_chunked import auto_chunk, build_spmm_plan

    num_rows = rowptr.shape[0] - 1
    csrs, bounds = _range_csrs(rowptr, col, num_cols, range_split)
    if chunk == 'auto':
        # Sized on the per-range CSRs (each ~1/S the full density).
        chunk = max(auto_chunk(rp) for rp, _ in csrs)
    # Pad every range to a common chunk count: all S kernel applications
    # then share ONE compiled Mosaic kernel (shape-keyed compile cache)
    # instead of S near-identical multi-minute remote compiles.
    cmax = max(_plan_chunks(rp, chunk) for rp, _ in csrs)
    if pad_to_chunks is not None:
        cmax = max(cmax, pad_to_chunks)
    plans = [
        build_spmm_plan(rp, cl, chunk=chunk, pad_to_chunks=cmax)
        for rp, cl in csrs
    ]
    return RangeSpmmPlan(plans=tuple(plans), bounds=tuple(bounds),
                         num_rows=int(num_rows),
                         num_edges=int(col.shape[0]))


def _range_plan_apply(x, rp: RangeSpmmPlan, precision=None):
    out = None
    for (lo, hi), plan in zip(rp.bounds, rp.plans):
        # The barrier keeps the slice a real (small) operand — fusing it
        # into the gather would put the access back on the full table
        # and lose the small-table transaction rate.
        xr = jax.lax.optimization_barrier(
            jax.lax.slice_in_dim(x, lo, hi, axis=0))
        o = spmm_plan_apply(xr, plan, precision=precision)
        out = o if out is None else out + o
    return out


def _plan_apply_any(x, plan, precision=None):
    from pyg_lib_tpu.ops.pallas.spmm_dedup import (DedupSpmmPlan,
                                                   dedup_plan_apply)
    from pyg_lib_tpu.ops.pallas.spmm_range_fused import (FusedRangePlan,
                                                         fused_range_apply)

    if isinstance(plan, DedupSpmmPlan):
        return dedup_plan_apply(x, plan, precision=precision)
    if isinstance(plan, FusedRangePlan):
        return fused_range_apply(x, plan, precision=precision)
    if isinstance(plan, RangeSpmmPlan):
        return _range_plan_apply(x, plan, precision=precision)
    return spmm_plan_apply(x, plan, precision=precision)


class SpmmGraph(NamedTuple):
    """Forward + transpose plans for one CSR graph, plus degree vector.

    ``mm`` (optional, ``build_spmm_graph(minmax=...)``) is a dedicated
    min/max schedule over PAIR-DEDUPED edges — duplicate ``(row, col)``
    edges are redundant for order statistics — either a
    ``DedupMinmaxPlan`` (tile-scope unique gathers, the hub fix) or a
    plain ``SpmmPlan`` when tile-scope reuse would not pay."""
    fwd: SpmmPlan
    bwd: SpmmPlan  # plan over the transposed graph (for grad_x)
    deg: jax.Array  # [num_rows] f32 row degrees (for reduce='mean')
    mm: Optional[object] = None  # min/max plan (pair-deduped edges)
    # Cluster reordering (build_spmm_graph(reorder=...)): plans are laid
    # out over the RELABELED graph; spmm permutes x in and the output
    # back out per call (two stream passes, exact-VJP). perm[new]=old,
    # rank[old]=new.
    perm: Optional[jax.Array] = None
    rank: Optional[jax.Array] = None


@jax.custom_vjp
def _permute_rows(x, perm, inv):
    """``x[perm]`` with the exact inverse-permutation backward.

    Plain ``jnp.take``'s transpose is an XLA scatter (~35 GB/s measured,
    BENCHMARKS.md) — on a permutation the cotangent is just the inverse
    gather, which runs at stream rate."""
    return jnp.take(x, perm, axis=0)


def _permute_rows_fwd(x, perm, inv):
    return jnp.take(x, perm, axis=0), inv


def _permute_rows_bwd(inv, g):
    return (jnp.take(g, inv, axis=0),
            np.zeros(jnp.shape(inv), jax.dtypes.float0),
            np.zeros(jnp.shape(inv), jax.dtypes.float0))


_permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


def _transpose_csr(rowptr, col, num_cols, return_order: bool = False):
    """Counting-sort transpose of a (possibly rectangular) CSR."""
    num_rows = rowptr.shape[0] - 1
    row = np.repeat(np.arange(num_rows, dtype=np.int64),
                    np.diff(rowptr).astype(np.int64))
    order = np.argsort(col, kind='stable')
    t_col = row[order]
    t_ptr = np.zeros(num_cols + 1, np.int64)
    np.cumsum(np.bincount(col, minlength=num_cols)[:num_cols],
              out=t_ptr[1:])
    if return_order:
        return t_ptr, t_col, order
    return t_ptr, t_col


def build_weighted_fused_graph(rowptr, col, num_cols: int, bounds,
                               edge_weight, chunk='auto',
                               bounds_t=None) -> SpmmGraph:
    """Fused-range :class:`SpmmGraph` with per-edge weights baked in.

    ``out[r] = Σ_e w_e · x[col_e]`` over explicit column ``bounds``
    (e.g. per-relation segments of a stacked hetero source space — each
    gather then reads one relation's small table slice). Differentiable
    through :func:`spmm`: the transpose plan carries the same weights,
    so ``grad_x = Σ_e w_e · g[row_e]``. Weights are plan constants, not
    differentiable parameters.

    ``bounds_t`` optionally range-partitions the TRANSPOSE gathers the
    same way: destination-row ranges of the forward graph, so the
    backward pass reads the cotangent table ``g`` in slices when it is
    also large (e.g. per-type segments of a stacked destination space).
    """
    from pyg_lib_tpu.ops.pallas.spmm_range_fused import (
        build_fused_range_plan, )

    rowptr = np.asarray(rowptr, dtype=np.int64)
    col = np.asarray(col, dtype=np.int64)
    edge_weight = np.asarray(edge_weight, dtype=np.float32)
    num_rows = rowptr.shape[0] - 1
    fwd = build_fused_range_plan(rowptr, col, num_cols, 1, chunk=chunk,
                                 bounds=bounds, edge_weight=edge_weight)
    t_ptr, t_col, order = _transpose_csr(rowptr, col, num_cols,
                                         return_order=True)
    bwd = build_fused_range_plan(t_ptr, t_col, num_rows, 1, chunk=chunk,
                                 bounds=bounds_t,
                                 edge_weight=edge_weight[order])
    deg = jnp.asarray(np.diff(rowptr).astype(np.float32))
    return SpmmGraph(fwd=fwd, bwd=bwd, deg=deg)


def build_spmm_graph(rowptr, col, chunk=512,
                     with_edge_maps: bool = False,
                     num_cols: int = None,
                     range_split: int = 1,
                     range_fused: bool = False,
                     dedup='off',
                     edge_weight=None,
                     minmax='off',
                     reorder='off') -> SpmmGraph:
    """Host-side, one-time: build fwd and transpose SpMM plans.

    ``with_edge_maps=True`` equips the forward plan for the padded-space
    primitives (:func:`segment_sum_padded` / :func:`segment_softmax_padded`).
    ``num_cols`` is the source-node count for rectangular (bipartite)
    adjacencies — it sizes the transpose plan so gradients match ``x``;
    defaults to the row count (square adjacency). ``chunk='auto'`` sizes
    the chunk from the degree distribution (``pallas.auto_chunk``).

    ``range_split=S`` (S > 1) builds :class:`RangeSpmmPlan` schedules that
    gather from S static table slices instead of the full feature table —
    faster when the table exceeds ~150 MB (sum/mean reduces only; see
    RangeSpmmPlan). Incompatible with ``with_edge_maps``.
    ``range_fused=True`` upgrades them to the fused multi-range kernel
    (``pallas.spmm_range_fused``): same cheap slice gathers, but one
    kernel pass writes the output once instead of summing S partials.

    ``dedup`` in {'off', 'auto', 'on'} selects the deduplicated-gather
    schedule (``pallas.spmm_dedup``): each (128-row tile, source column)
    pair is gathered ONCE and duplicates are re-expanded on the MXU —
    the gather-transaction saving on power-law / cluster-reordered
    graphs whose tiles re-fetch the same source rows. ``'auto'``
    estimates the per-side gain from the host layout and picks dedup
    only past the measured ~1.3x crossover (uniform-random graphs stay
    on the single plan). Sum/mean reduces only; incompatible with
    ``with_edge_maps`` and ``range_split``. ``edge_weight`` (an ``[E]``
    f32 vector, dedup paths only) bakes per-edge weights into the
    expansion, computing ``out[r] = Σ w_e · x[col_e]``; weights are plan
    constants, and the transpose plan carries them so gradients match.

    ``minmax`` in {'off', 'auto', 'on'} additionally builds a dedicated
    ``reduce='max'/'min'`` schedule over PAIR-DEDUPED edges (duplicate
    ``(row, col)`` pairs are semantically redundant for order
    statistics): ``'on'`` forces the dedup-gather min/max kernel
    (``pallas.spmm_dedup_minmax`` — each (tile, column) pair gathered
    once, the hub-penalty fix), ``'auto'`` picks it past the ~1.3x
    estimated gather gain and otherwise keeps a plain plan over the
    deduped edges. Without it, min/max requires a single-plan graph.

    ``reorder`` in {'off', 'auto', 'on'} or an int partition count:
    cluster-relabel the graph (``partition.metis`` +
    ``partition.cluster_reorder``) before planning, so each 128-row
    tile's gathers concentrate in one region and the dedup estimator
    sees the clustered layout; :func:`spmm` then permutes ``x`` in and
    the output back per call (two stream passes with exact-permutation
    VJPs — callers keep the original id space). ``'auto'`` adopts the
    relabeling only when it raises the estimated dedup gain past the
    crossover (uniform-random graphs have no cluster structure to
    recover — measured negative, BENCHMARKS.md round-5). Square
    adjacencies only; incompatible with ``with_edge_maps``.
    """
    rowptr = np.asarray(rowptr, dtype=np.int64)
    col = np.asarray(col, dtype=np.int64)
    num_rows = rowptr.shape[0] - 1
    if num_cols is None:
        num_cols = num_rows
    if dedup not in ('off', 'auto', 'on', False, True):
        raise ValueError(f"dedup must be 'off', 'auto' or 'on', got "
                         f"{dedup!r}")
    dedup = {'off': 'off', False: 'off', 'on': 'on', True: 'on',
             'auto': 'auto'}[dedup]
    if minmax not in ('off', 'auto', 'on', False, True):
        raise ValueError(f"minmax must be 'off', 'auto' or 'on', got "
                         f"{minmax!r}")
    minmax = {'off': 'off', False: 'off', 'on': 'on', True: 'on',
              'auto': 'auto'}[minmax]
    perm_j = rank_j = None
    deg_np = np.diff(rowptr).astype(np.float32)  # ORIGINAL row order
    if reorder not in ('off', 'auto', 'on', False, True) and not isinstance(
            reorder, int):
        raise ValueError(f"reorder must be 'off', 'auto', 'on' or a "
                         f"partition count, got {reorder!r}")
    reorder = {'off': 'off', False: 'off', 'on': 'on', True: 'on',
               'auto': 'auto'}.get(reorder, reorder)
    if reorder != 'off':
        if num_cols != num_rows:
            raise ValueError('reorder requires a square adjacency')
        if with_edge_maps:
            raise ValueError('reorder is incompatible with with_edge_maps '
                             '(padded-edge coordinates must stay stable)')
        from pyg_lib_tpu import partition as _partition
        k = reorder if isinstance(reorder, int) else 256
        k = min(k, max(num_rows // 128, 2))
        part = _partition.metis(rowptr, col, k)
        rp_r, cl_r, node_perm, edge_perm = _partition.cluster_reorder(
            rowptr, col, part)
        adopt = True
        if reorder == 'auto':
            # Adopt only when the relabeling actually creates tile-scope
            # reuse the dedup schedule can cash in (uniform-random
            # graphs have no cluster structure to recover — measured
            # negative, BENCHMARKS.md round-5).
            from pyg_lib_tpu.ops.pallas.spmm_dedup import estimate_dedup
            ecr = 512 if chunk == 'auto' else int(chunk)
            _, g0 = estimate_dedup(rowptr, col, ec=ecr)
            _, g1 = estimate_dedup(rp_r, cl_r, ec=ecr)
            adopt = g1 >= max(1.3, 1.1 * g0)
        if adopt:
            rowptr, col = rp_r, cl_r
            if edge_weight is not None:
                edge_weight = np.asarray(edge_weight,
                                         np.float32)[edge_perm]
            perm_j = jnp.asarray(node_perm.astype(np.int32)
                                 if num_rows < 2**31 else node_perm)
            rank = np.empty(num_rows, np.int64)
            rank[node_perm] = np.arange(num_rows, dtype=np.int64)
            rank_j = jnp.asarray(rank.astype(np.int32)
                                 if num_rows < 2**31 else rank)
    mm = None
    if minmax != 'off':
        from pyg_lib_tpu.ops.pallas.spmm_dedup import estimate_dedup
        from pyg_lib_tpu.ops.pallas.spmm_dedup_minmax import (
            build_dedup_minmax_plan, dedup_pairs, estimate_minmax_config)
        rp_d, cl_d = dedup_pairs(rowptr, col)
        # (ec, uc) are picked by the min/max kernel's own chip-calibrated
        # cost model (scan/extraction cost is per edge SLOT — unlike the
        # sum kernel's MXU-borne expansion; BENCHMARKS.md round-5 sweep).
        ec_mm, uc_mm = estimate_minmax_config(rp_d, cl_d)
        use_kernel = minmax == 'on'
        if not use_kernel:
            _, gain = estimate_dedup(rp_d, cl_d, ec=ec_mm)
            use_kernel = gain >= 1.3
        if use_kernel:
            mm = build_dedup_minmax_plan(rp_d, cl_d, ec=ec_mm, uc=uc_mm,
                                         _pre_deduped=True)
            mm = mm._replace(num_edges=int(col.shape[0]))
        elif dedup == 'off' and range_split <= 1:
            mm = None  # fwd is a single plan: it serves min/max as-is
            # (a rebuilt pair-dedup plan measured SLOWER on uniform
            # graphs — more grid steps for a ~1% edge saving)
        else:
            mm = build_spmm_plan(rp_d, cl_d, chunk=512)
    if edge_weight is not None and dedup == 'off':
        raise ValueError('edge_weight requires dedup="on"/"auto" (or use '
                         'build_weighted_fused_graph)')
    if dedup != 'off':
        if with_edge_maps or range_split > 1:
            raise ValueError('dedup is incompatible with with_edge_maps '
                             'and range_split')
        from pyg_lib_tpu.ops.pallas.spmm_dedup import (build_dedup_plan,
                                                       estimate_dedup)
        # 'auto' fits ec to the degree distribution: low-degree tiles
        # with ec=512 store mostly-empty [8, EC] metadata blocks
        # (measured 236 B/edge on a deg-10 graph — scale audit).
        from pyg_lib_tpu.ops.pallas.spmm_chunked import auto_chunk as _ac
        ec = _ac(rowptr) if chunk == 'auto' else int(chunk)
        if edge_weight is not None:
            edge_weight = np.asarray(edge_weight, dtype=np.float32)
        t_ptr, t_col, order = _transpose_csr(rowptr, col, num_cols,
                                             return_order=True)
        t_weight = edge_weight[order] if edge_weight is not None else None

        def side(rp, cl, w):
            if dedup == 'auto':
                _, gain = estimate_dedup(rp, cl, ec=ec)
                if gain < 1.3:
                    return build_spmm_plan(rp, cl, chunk=ec)
                # uc='auto': re-estimated inside on the cold remainder
                # (the hot level removes hub edges from the chunks).
                return build_dedup_plan(rp, cl, ec=ec, edge_weight=w)
            return build_dedup_plan(rp, cl, ec=ec, edge_weight=w)

        if dedup == 'auto' and edge_weight is not None:
            # Weighted graphs need the weights baked in on BOTH sides;
            # the plain plan can't carry them, so force dedup plans.
            dedup = 'on'
        fwd = side(rowptr, col, edge_weight)
        bwd = side(t_ptr, t_col, t_weight)
        return SpmmGraph(fwd=fwd, bwd=bwd, deg=jnp.asarray(deg_np),
                         mm=mm, perm=perm_j, rank=rank_j)
    if chunk == 'auto' and range_split == 1:
        from pyg_lib_tpu.ops.pallas.spmm_chunked import auto_chunk
        chunk = auto_chunk(rowptr)
    if range_split > 1:
        if with_edge_maps:
            raise ValueError('range_split is incompatible with '
                             'with_edge_maps (padded-space ops need the '
                             'single-plan edge layout)')
        if range_fused:
            from pyg_lib_tpu.ops.pallas.spmm_range_fused import (
                build_fused_range_plan, )
            fwd = build_fused_range_plan(rowptr, col, num_cols,
                                         range_split, chunk)
            t_ptr, t_col = _transpose_csr(rowptr, col, num_cols)
            bwd = build_fused_range_plan(t_ptr, t_col, num_rows,
                                         range_split, chunk)
        else:
            fwd = _build_range_plan(rowptr, col, num_cols, range_split,
                                    chunk)
            t_ptr, t_col = _transpose_csr(rowptr, col, num_cols)
            bwd = _build_range_plan(t_ptr, t_col, num_rows, range_split,
                                    chunk)
        return SpmmGraph(fwd=fwd, bwd=bwd, deg=jnp.asarray(deg_np),
                         mm=mm, perm=perm_j, rank=rank_j)
    fwd = build_spmm_plan(rowptr, col, chunk=chunk,
                          with_edge_maps=with_edge_maps)

    t_ptr, t_col = _transpose_csr(rowptr, col, num_cols)
    bwd = build_spmm_plan(t_ptr, t_col, chunk=chunk,
                          with_edge_maps=with_edge_maps)

    return SpmmGraph(fwd=fwd, bwd=bwd, deg=jnp.asarray(deg_np),
                     mm=mm, perm=perm_j, rank=rank_j)


def _zero_cot(tree):
    """Zero cotangent for a plan/graph pytree: float leaves get dense
    zeros, integer/bool leaves get float0 zeros (the JAX convention for
    non-differentiable array types)."""
    def z(leaf):
        if hasattr(leaf, 'dtype') and jnp.issubdtype(leaf.dtype,
                                                     jnp.inexact):
            return jnp.zeros_like(leaf)
        return np.zeros(jnp.shape(leaf), jax.dtypes.float0)

    return jax.tree_util.tree_map(z, tree)


# Graphs/plans are DIFFERENTIABLE arguments with zero cotangents — not
# nondiff_argnums slots, which reject tracers and would force plans back
# into jit closures (see utils/pytree.py: closure constants inline the
# plan arrays into the compiled module).
@partial(jax.custom_vjp, nondiff_argnums=(2, ))
def _spmm_sum(x, graph: SpmmGraph, precision: Optional[str] = None):
    return _plan_apply_any(x, graph.fwd, precision=precision)


def _spmm_fwd(x, graph, precision):
    return _plan_apply_any(x, graph.fwd, precision=precision), graph


def _spmm_bwd(precision, graph, g):
    # d/dx (A @ x) = Aᵀ @ g over the transpose plan; gradient messages
    # stream at the same precision as the forward.
    return (_plan_apply_any(g, graph.bwd, precision=precision),
            _zero_cot(graph))


_spmm_sum.defvjp(_spmm_fwd, _spmm_bwd)


def spmm(x: jax.Array, graph: SpmmGraph, reduce: str = 'sum',
         precision: Optional[str] = None) -> jax.Array:
    """``out[r] = reduce_{e in row r} x[col[e]]`` with a prebuilt plan.

    The flagship aggregation primitive: equivalent to the reference
    composition ``segment_csr(x[col], rowptr, reduce=...)``
    (``pyg_lib/ops/__init__.py:816-835``) but gather-fused and planned.

    PASS ``graph`` through jit boundaries as an argument (plans are
    registered pytrees whose config rides static aux data — see
    ``utils/pytree.py``) rather than closing over it: closure constants
    are inlined into the compiled module (~260 MB of dense constants at
    headline scale — measured to 413 the remote-compile tunnel and
    stretch one compile to ~990 s), while arguments lower to cheap
    parameters and let same-shaped graphs share one executable.

    ``reduce`` in {'sum', 'add', 'mean', 'max', 'min'}. max/min return
    EXACT values with the reference's winner-only gradient (the single
    winning source node per (row, feature) receives the cotangent —
    reference ``csrc/ops/autograd/scatter_kernel.cpp:432-456``); any
    plan works (edge maps not required).

    ``precision=None`` (default) keeps exact float32 message semantics
    (bf16 hi/lo split contraction); ``precision='bf16'`` streams messages
    in bfloat16 with float32 accumulation — the MXU-native training
    contract — halving the materialised-slab traffic. The step stays
    gather-transaction-bound, so the measured gain is ~10% at F=512 on
    v5e (49.7 vs 55 ms/iter on the 4.2M-edge bench graph) plus half the
    slab memory. ``precision='int8'`` quantises the gathered table with
    one round-to-nearest scale per feature column (resolution 1/127 of
    the column max) and streams int8 messages — quarter traffic, for
    wide-feature (F >= 1024) bandwidth-bound regimes; see
    ``spmm_plan_apply``. All modes apply to 'sum'/'add'/'mean' and their
    gradients (the backward streams gradient messages through the same
    mode, so 'int8' also quantises the cotangent per column).
    """
    if precision not in (None, 'highest', 'bf16', 'int8'):
        raise ValueError(f"spmm precision must be None, 'highest', "
                         f"'bf16' or 'int8', got {precision!r}")
    if precision == 'highest':
        precision = None
    xp = x
    if graph.perm is not None:
        # Cluster-reordered layout: permute in, compute over the
        # relabeled graph, permute back (graph.deg stays original-order).
        xp = _permute_rows(x, graph.perm, graph.rank)
    if reduce in ('max', 'min'):
        from pyg_lib_tpu.ops.pallas.spmm_dedup_minmax import DedupMinmaxPlan
        plan = graph.mm if graph.mm is not None else graph.fwd
        if not isinstance(plan, (SpmmPlan, DedupMinmaxPlan)):
            raise ValueError(
                "spmm reduce='max'/'min' needs a single-plan graph or "
                "one built with minmax='auto'/'on' (range_split/dedup "
                'plans carry no min/max schedule of their own)')
        out = _spmm_minmax(xp, graph, reduce == 'min').astype(x.dtype)
        if graph.perm is not None:
            out = _permute_rows(out, graph.rank, graph.perm)
        return out
    if reduce not in ('sum', 'add', 'mean'):
        raise ValueError(
            f"spmm reduce must be 'sum', 'add', 'mean', 'max' or 'min', "
            f"got {reduce!r}")
    out = _spmm_sum(xp, graph, precision)
    if graph.perm is not None:
        out = _permute_rows(out, graph.rank, graph.perm)
    if reduce == 'mean':
        d = jnp.maximum(graph.deg, 1.0).astype(out.dtype)
        out = out / d[:, None]
    return out


# -- padded-space primitives (for attention GNNs) -----------------------------
#
# These operate directly in a plan's padded edge coordinates, so a GAT layer
# (gather -> attention logits -> per-row softmax -> weighted aggregation)
# runs with ZERO per-edge re-permutations: one gather in, one tile write out.


@jax.custom_vjp
def segment_sum_padded(msgs_padded: jax.Array, plan: SpmmPlan) -> jax.Array:
    """``out[r] = Σ msgs_padded[slots of row r]`` via the chunked kernel.

    Requires a plan built ``with_edge_maps=True``. Differentiable: the
    backward broadcast is ``g[row_padded]``.
    """
    from pyg_lib_tpu.ops.pallas.spmm_chunked import segment_sum_chunked

    if plan.row_padded is None:
        raise ValueError('segment_sum_padded needs a plan built '
                         'with_edge_maps=True (the VJP uses row_padded)')
    return segment_sum_chunked(msgs_padded, plan)


def _ssp_fwd(msgs_padded, plan):
    return segment_sum_padded(msgs_padded, plan), plan


def _ssp_bwd(plan, g):
    # Pad slots alias row 0 via row_padded; the forward masks them, so
    # their cotangent must be zero (not g[0]).
    grad = jnp.take(g, plan.row_padded, axis=0)
    return (grad * plan.valid_mask[:, None].astype(grad.dtype),
            _zero_cot(plan))


segment_sum_padded.defvjp(_ssp_fwd, _ssp_bwd)


@jax.custom_vjp
def segment_softmax_padded(x_padded: jax.Array,
                           plan: SpmmPlan) -> jax.Array:
    """Per-row softmax in padded edge coordinates (fused Pallas kernel).

    Backward is the fused closed form ``out * (g - Σ_row(out·g))``
    (reference ``csrc/ops/cpu/softmax_kernel.cpp:207-227``), with the row
    sums going through :func:`segment_sum_padded`.
    """
    from pyg_lib_tpu.ops.pallas.segment_softmax_kernel import (
        segment_softmax_planned, )

    if plan.row_padded is None:
        raise ValueError('segment_softmax_padded needs a plan built '
                         'with_edge_maps=True')
    return segment_softmax_planned(x_padded, plan)


def _ssm_fwd(x_padded, plan):
    out = segment_softmax_padded(x_padded, plan)
    return out, (out, plan)


def _ssm_bwd(res, g):
    out, plan = res
    s = segment_sum_padded(out * g, plan)
    return (out * (g - jnp.take(s, plan.row_padded, axis=0)),
            _zero_cot(plan))


segment_softmax_padded.defvjp(_ssm_fwd, _ssm_bwd)


def sddmm(x: jax.Array, y: jax.Array, graph: SpmmGraph) -> jax.Array:
    """Sampled dense-dense matmul: ``out[e] = <x[row_e], y[col_e]>``.

    The SpMM's dual (BASELINE.md names the pair): per-edge scores from
    node embeddings, e.g. attention logits or link predictions. Runs in
    the plan's padded coordinates (requires ``with_edge_maps=True``) and
    returns ``[num_edges]`` in original edge order. Gathers are the cost
    (transaction-bound, see ``pallas/spmm_chunked.py``); the contraction
    fuses into them. Differentiable via plain JAX AD.
    """
    plan = graph.fwd
    if not isinstance(plan, SpmmPlan) or plan.row_padded is None:
        raise ValueError('sddmm needs build_spmm_graph(with_edge_maps=True)')
    xs = jnp.take(x, plan.row_padded, axis=0)
    ys = jnp.take(y, plan.col_padded, axis=0)
    scores = jnp.sum(xs * ys, axis=-1)
    return jnp.take(scores, plan.edge_pos, axis=0)


def _exact_rowmax(x_padded: jax.Array, plan: SpmmPlan):
    """Exact per-row (max, winning padded slot); empty rows -> (0, -1)."""
    from pyg_lib_tpu.ops.pallas.segment_minmax_kernel import (
        segment_max_planned_exact, )

    vals, pos = segment_max_planned_exact(x_padded.astype(jnp.float32),
                                          plan)
    return vals, pos


def _rows_nonempty(plan: SpmmPlan):
    # tile_ptr row t holds padded rowptr for rows [t*TR, (t+1)*TR); a row
    # is non-empty iff ptr[r+1] > ptr[r].
    bounds = plan.tile_ptr[:, 0, :]  # [T, TP]
    from pyg_lib_tpu.ops.pallas.spmm_chunked import TR

    lo = bounds[:, :TR].reshape(-1)[:plan.num_rows]
    hi = bounds[:, 1:TR + 1].reshape(-1)[:plan.num_rows]
    return hi > lo


@partial(jax.custom_vjp, nondiff_argnums=(2, ))
def _spmm_minmax(x, graph: 'SpmmGraph', is_min: bool):
    return _spmm_minmax_fwd(x, graph, is_min)[0]


def _spmm_minmax_impl(x, graph, is_min):
    """Returns ``(vals [N, F], pos [N, F])`` — winning position into the
    min/max plan's index array (``uniq_cols`` for dedup plans,
    ``col_padded`` otherwise), -1 for empty rows. Positions map to source
    columns lazily in the BACKWARD only — materialising the winning
    column ids here costs an [N, F] gather the forward never needs."""
    from pyg_lib_tpu.ops.pallas.segment_minmax_kernel import POS_NONE
    from pyg_lib_tpu.ops.pallas.spmm_dedup_minmax import (
        DedupMinmaxPlan, dedup_minmax_apply)

    plan = graph.mm if graph.mm is not None else graph.fwd
    if isinstance(plan, DedupMinmaxPlan):
        xi = -x if is_min else x
        vals, pos = dedup_minmax_apply(xi, plan)
    else:
        msgs = jnp.take(x, plan.col_padded, axis=0)
        vals, pos = _exact_rowmax(-msgs if is_min else msgs, plan)
    if is_min:
        vals = -vals
    deg = graph.deg
    if graph.perm is not None:
        # graph.deg is original-order; this impl runs in relabeled space.
        deg = jnp.take(deg, graph.perm, axis=0)
    empty = (deg < 0.5)[:, None]
    vals = jnp.where(empty, 0.0, vals)
    pos = jnp.where(empty | (pos >= POS_NONE), jnp.int32(-1), pos)
    return vals, pos


def _spmm_minmax_fwd(x, graph, is_min):
    vals, pos = _spmm_minmax_impl(x, graph, is_min)
    # Zero-width proto carries x's row count and dtype through the
    # residuals (shapes/dtypes themselves are not valid JAX types).
    return vals, (pos, jnp.zeros((x.shape[0], 0), x.dtype), graph)


def _spmm_minmax_bwd(is_min, res, g):
    # Winner-only gradient (reference contract,
    # csrc/ops/autograd/scatter_kernel.cpp:432-456): route each row's
    # cotangent to the single winning source node.
    from pyg_lib_tpu.ops.pallas.spmm_dedup_minmax import DedupMinmaxPlan

    pos, proto, graph = res
    plan = graph.mm if graph.mm is not None else graph.fwd
    idx = (plan.uniq_cols
           if isinstance(plan, DedupMinmaxPlan) else plan.col_padded)
    n_rows, f = pos.shape
    safe = jnp.clip(pos, 0, idx.shape[0] - 1)
    col_win = jnp.where(pos < 0, jnp.int32(proto.shape[0]),
                        jnp.take(idx, safe))  # [N, F]
    cols = jnp.broadcast_to(jnp.arange(f, dtype=jnp.int32)[None, :],
                            (n_rows, f))
    grad = jnp.zeros((proto.shape[0], f), g.dtype).at[col_win, cols].add(
        g, mode='drop')
    return (grad.astype(proto.dtype), _zero_cot(graph))


_spmm_minmax.defvjp(_spmm_minmax_fwd, _spmm_minmax_bwd)


@jax.custom_vjp
def segment_max_padded(x_padded: jax.Array, plan: SpmmPlan) -> jax.Array:
    """Per-row max in padded coordinates — EXACT values, winner-only
    gradient (round 1 shipped a bf16-selection approximation with a
    tie-splitting subgradient; the scan kernel now transports exact f32
    bits, see ``pallas/segment_minmax_kernel.py``)."""
    return _exact_rowmax(x_padded, plan)[0]


def _smx_fwd(x_padded, plan):
    vals, pos = _exact_rowmax(x_padded, plan)
    nonempty = _rows_nonempty(plan)
    vals = jnp.where(nonempty[:, None], vals, 0.0)
    return vals, (pos, nonempty,
                  jnp.zeros((x_padded.shape[0], 0), x_padded.dtype), plan)


def _smx_bwd(res, g):
    pos, nonempty, proto, plan = res
    n_rows, f = pos.shape
    safe = jnp.where(nonempty[:, None], pos, jnp.int32(proto.shape[0]))
    cols = jnp.broadcast_to(jnp.arange(f, dtype=jnp.int32)[None, :],
                            (n_rows, f))
    grad = jnp.zeros((proto.shape[0], f), g.dtype).at[safe, cols].add(
        g, mode='drop')
    return (grad.astype(proto.dtype), _zero_cot(plan))


segment_max_padded.defvjp(_smx_fwd, _smx_bwd)


def segment_min_padded(x_padded: jax.Array, plan: SpmmPlan) -> jax.Array:
    """Per-row min in padded coordinates (negated max)."""
    return -segment_max_padded(-x_padded, plan)


# Auto-cached convenience entry: plans keyed on (rowptr, col) identity with
# content validation (same contract as ops.softmax_csr's plan cache).
_GRAPH_CACHE: dict = {}


def spmm_csr(x: jax.Array, rowptr, col, reduce: str = 'sum') -> jax.Array:
    """``segment_csr(x[col], rowptr, reduce)`` with an auto-cached plan.

    Convenience wrapper over :func:`build_spmm_graph` + :func:`spmm` for
    callers who don't manage plans explicitly; ``rowptr``/``col`` must be
    concrete (host) arrays. Plans are cached per graph identity and
    validated against stored copies, so in-place buffer reuse is safe.
    """
    if isinstance(rowptr, jax.core.Tracer) or isinstance(
            col, jax.core.Tracer):
        raise ValueError('spmm_csr needs concrete rowptr/col; build a '
                         'plan with build_spmm_graph for traced use')
    rp = np.asarray(rowptr)
    cl = np.asarray(col)
    if isinstance(rowptr, np.ndarray) and isinstance(col, np.ndarray):
        # Stable host buffers: identity key (validated against copies).
        key = (rp.ctypes.data, rp.shape[0], cl.ctypes.data, cl.shape[0])
    else:
        # Device arrays / lists copy to a fresh buffer per call — key by
        # content so the cache still hits.
        import hashlib

        key = (hashlib.sha1(rp.tobytes()).hexdigest(),
               hashlib.sha1(cl.tobytes()).hexdigest())
    hit = _GRAPH_CACHE.get(key)
    if (hit is None or not np.array_equal(hit[1], rp)
            or not np.array_equal(hit[2], cl)):
        with jax.ensure_compile_time_eval():
            graph = build_spmm_graph(rp, cl)
        if key not in _GRAPH_CACHE and len(_GRAPH_CACHE) >= 8:
            _GRAPH_CACHE.pop(next(iter(_GRAPH_CACHE)))
        _GRAPH_CACHE[key] = (graph, rp.copy(), cl.copy())
        hit = _GRAPH_CACHE[key]
    return spmm(x, hit[0], reduce=reduce)


class ShardedSpmmGraph(NamedTuple):
    """Row-range-split plans bounding message memory for huge graphs.

    ``fwd`` / ``bwd`` are lists of per-split SpMM plans (forward splits
    partition destination rows; backward splits partition source rows of
    the transpose). Each split materialises only its own gathered
    messages, so graphs whose full message tensor would exceed HBM
    (measured: 32M edges x 128 f32 on a 16 GB chip) still run.
    """
    fwd: tuple
    bwd: tuple
    deg: jax.Array
    num_rows: int
    num_cols: int
    mm: Optional[tuple] = None  # per-split min/max plans (pair-deduped)


register_plan_pytree(ShardedSpmmGraph, ('num_rows', 'num_cols'))


def build_spmm_graph_sharded(rowptr, col, num_splits: int,
                             chunk: int = 512,
                             num_cols: int = None,
                             range_split: int = 1,
                             dedup='off',
                             minmax='off') -> ShardedSpmmGraph:
    """Host-side: build ``num_splits`` row-range SpMM plans (+transpose).

    ``range_split=S`` additionally column-range-partitions every split
    (see :class:`RangeSpmmPlan`): the gathers read S static table
    slices instead of the full table — the point of the sharded path is
    graphs whose tables are far past the ~150 MB small-operand
    transaction knee. All ``num_splits x S`` sub-plans pad to one chunk
    count, so they still share ONE compiled kernel.

    ``dedup`` in {'off', 'auto', 'on'} (incompatible with
    ``range_split``) switches every split to the dedup-gather schedule
    (``pallas.spmm_dedup``) — the papers100M-class win: real huge graphs
    are power-law, where each 128-row tile re-fetches hub columns many
    times. ``'auto'`` decides per side from the full graph's estimated
    tile-scope reuse (>= 1.3x crossover); splits pad to one chunk count
    so they share ONE compiled kernel.

    ``minmax`` in {'off', 'auto', 'on'} builds per-split
    ``reduce='max'/'min'`` schedules over PAIR-DEDUPED edges (see
    :func:`build_spmm_graph`); without it, sharded min/max needs plain
    (non-dedup) split plans.
    """
    rowptr = np.asarray(rowptr, dtype=np.int64)
    col = np.asarray(col, dtype=np.int64)
    num_rows = rowptr.shape[0] - 1
    if num_cols is None:
        num_cols = num_rows
    dedup = {'off': 'off', False: 'off', 'on': 'on', True: 'on',
             'auto': 'auto'}.get(dedup)
    if dedup is None:
        raise ValueError("dedup must be 'off', 'auto' or 'on'")
    if dedup != 'off' and range_split > 1:
        raise ValueError('dedup is incompatible with range_split')
    minmax = {'off': 'off', False: 'off', 'on': 'on', True: 'on',
              'auto': 'auto'}.get(minmax)
    if minmax is None:
        raise ValueError("minmax must be 'off', 'auto' or 'on'")
    if minmax != 'off' and range_split > 1:
        raise ValueError('minmax is incompatible with range_split')

    def split_csrs(rp, cl, n_rows):
        # Uniform split shapes (equal row count, padded equal chunk
        # count): every split shares ONE compiled kernel instead of
        # compiling per split (16+ compiles at 31M edges before this).
        npd = -(-n_rows // num_splits)
        subs = []
        for i in range(num_splits):
            lo, hi = i * npd, min((i + 1) * npd, n_rows)
            sub_rp = np.empty(npd + 1, np.int64)
            sub_rp[:hi - lo + 1] = rp[lo:hi + 1] - rp[lo]
            sub_rp[hi - lo + 1:] = sub_rp[hi - lo]  # trailing empty rows
            subs.append((sub_rp, cl[rp[lo]:rp[hi]]))
        return subs

    from pyg_lib_tpu.ops.pallas.spmm_chunked import auto_chunk

    def split_plans(rp, cl, n_rows, n_cols):
        subs = split_csrs(rp, cl, n_rows)
        if dedup != 'off':
            from pyg_lib_tpu.ops.pallas.spmm_dedup import (
                build_dedup_plan, estimate_dedup)
            # 'auto' fits ec to the degree distribution: low-degree
            # tiles with ec=512 store mostly-empty [8, EC] metadata
            # blocks (measured 236 B/edge at deg 10 — scale audit).
            ec = auto_chunk(rp) if chunk == 'auto' else int(chunk)
            _, gain = estimate_dedup(rp, cl, ec=ec)
            if dedup == 'on' or gain >= 1.3:
                from pyg_lib_tpu.ops.pallas.spmm_dedup import (pad_hot,
                                                               pad_plan)

                # One uc + one padded chunk count + one hot width across
                # splits: all splits share ONE compiled kernel (same
                # contract as the plain sharded path). uc='auto' lets
                # each split re-estimate on its COLD remainder (the hot
                # level removes hub edges first — a shared uc sized on
                # the full edge list inflates padded unique slots per
                # chunk); differing splits then rebuild at the max so
                # the kernel shape still unifies.
                # The default 1 GB hot-count-matrix budget is PER
                # PLAN; a sharded graph holds num_splits x 2 of them,
                # so divide it across splits (the fwd and bwd sides
                # stream in different passes, so per-side is the right
                # grain) to keep the graph's total hot footprint at
                # the single-plan level.
                hb = max((1 << 30) // num_splits, 32 << 20)
                plans = [
                    build_dedup_plan(s_rp, s_cl, ec=ec, uc='auto',
                                     hot_budget_bytes=hb)
                    for s_rp, s_cl in subs
                ]
                ucmax = max(p.uc for p in plans)
                plans = [
                    p if p.uc == ucmax else build_dedup_plan(
                        s_rp, s_cl, ec=ec, uc=ucmax,
                        hot_budget_bytes=hb)
                    for p, (s_rp, s_cl) in zip(plans, subs)
                ]
                cmax = max(p.num_chunks for p in plans)
                hmax = max(p.num_hot for p in plans)
                hdt = None
                if hmax:
                    # widest count storage across splits, so shapes AND
                    # dtypes really share one compiled kernel
                    rank = {jnp.dtype(jnp.int8): 0,
                            jnp.dtype(jnp.bfloat16): 1,
                            jnp.dtype(jnp.float32): 2}
                    hdt = max((p.hot_w.dtype for p in plans if p.num_hot),
                              key=lambda d: rank[jnp.dtype(d)])
                return tuple(
                    pad_hot(pad_plan(p, cmax), hmax, dtype=hdt)
                    for p in plans)
        if range_split > 1:
            range_rps = [
                rp_r for s_rp, s_cl in subs
                for rp_r, _ in _range_csrs(s_rp, s_cl, n_cols,
                                           range_split)[0]
            ]
            # ONE chunk size across all (split, range) sub-plans — they
            # must share a compiled kernel shape.
            ck = (max(auto_chunk(rp_r) for rp_r in range_rps)
                  if chunk == 'auto' and range_rps else
                  (512 if chunk == 'auto' else chunk))
            cmax = max((_plan_chunks(rp_r, ck) for rp_r in range_rps),
                       default=1)
            return tuple(
                _build_range_plan(s_rp, s_cl, n_cols, range_split, ck,
                                  pad_to_chunks=cmax)
                for s_rp, s_cl in subs)
        ck = (max(auto_chunk(s_rp) for s_rp, _ in subs)
              if chunk == 'auto' else chunk)
        cmax = max(_plan_chunks(s_rp, ck) for s_rp, _ in subs)
        return tuple(
            build_spmm_plan(s_rp, s_cl, chunk=ck, pad_to_chunks=cmax)
            for s_rp, s_cl in subs)

    fwd = split_plans(rowptr, col, num_rows, num_cols)
    t_ptr, t_col = _transpose_csr(rowptr, col, num_cols)
    bwd = split_plans(t_ptr, t_col, num_cols, num_rows)

    mm = None
    if minmax != 'off':
        # Per-split min/max plans over PAIR-DEDUPED edges, padded to one
        # (chunks, uc, scan_len) so every split shares ONE compiled
        # kernel — same contract as the sum plans above. 'auto' gates
        # once on the FULL deduped graph so all splits agree on the
        # schedule type.
        from pyg_lib_tpu.ops.pallas.spmm_dedup import estimate_dedup
        from pyg_lib_tpu.ops.pallas.spmm_dedup_minmax import (
            build_dedup_minmax_plan, dedup_pairs, estimate_minmax_config,
            pad_minmax_plan)
        rp_d, cl_d = dedup_pairs(rowptr, col)
        ec_mm, uc_mm = estimate_minmax_config(rp_d, cl_d)
        use_kernel = minmax == 'on'
        if not use_kernel:
            _, gain = estimate_dedup(rp_d, cl_d, ec=ec_mm)
            use_kernel = gain >= 1.3
        subs_d = split_csrs(rp_d, cl_d, num_rows)
        if use_kernel:
            plans = [
                build_dedup_minmax_plan(s_rp, s_cl, ec=ec_mm, uc=uc_mm,
                                        _pre_deduped=True)
                for s_rp, s_cl in subs_d
            ]
            cmax = max(p.num_chunks for p in plans)
            smax = max(p.scan_len for p in plans)
            mm = tuple(
                pad_minmax_plan(p, cmax, scan_len=smax) for p in plans)
        else:
            ck = (max(auto_chunk(s_rp) for s_rp, _ in subs_d)
                  if chunk == 'auto' else int(chunk))
            cmax = max(_plan_chunks(s_rp, ck) for s_rp, _ in subs_d)
            mm = tuple(
                build_spmm_plan(s_rp, s_cl, chunk=ck, pad_to_chunks=cmax)
                for s_rp, s_cl in subs_d)

    deg = jnp.asarray(np.diff(rowptr).astype(np.float32))
    return ShardedSpmmGraph(fwd=fwd, bwd=bwd, deg=deg, num_rows=num_rows,
                            num_cols=num_cols, mm=mm)


def _sharded_apply(x, plans, num_rows=None, precision=None):
    scale = None
    if precision == 'int8' and x.dtype != jnp.int8:
        # Quantise ONCE for all row splits (every split gathers from the
        # same full table, so the per-column scales are shared).
        from pyg_lib_tpu.ops.pallas.spmm_chunked import quantize_columns
        xq, scale = quantize_columns(x)
        dtype = x.dtype
        x = xq
    outs = []
    for p in plans:
        outs.append(_plan_apply_any(x, p, precision=precision))
    out = jnp.concatenate(outs, axis=0)
    if scale is not None:
        out = (out * scale[None, :]).astype(dtype)
    # Uniform splits pad the last split with empty rows; trim.
    return out if num_rows is None else out[:num_rows]


@partial(jax.custom_vjp, nondiff_argnums=(2, ))
def _spmm_sharded_sum(x, graph: ShardedSpmmGraph,
                      precision: Optional[str] = None):
    return _sharded_apply(x, graph.fwd, graph.num_rows, precision)


_spmm_sharded_sum.defvjp(
    lambda x, graph, precision:
    (_sharded_apply(x, graph.fwd, graph.num_rows, precision), graph),
    lambda precision, graph, g:
    (_sharded_apply(g, graph.bwd, graph.num_cols, precision),
     _zero_cot(graph)))


def _sharded_minmax_impl(x, graph, is_min):
    """Per-split min/max: returns (vals [N, F], per-split positions)."""
    from pyg_lib_tpu.ops.pallas.spmm_dedup_minmax import (
        DedupMinmaxPlan, dedup_minmax_apply)

    plans = graph.mm if graph.mm is not None else graph.fwd
    xi = -x if is_min else x
    vals_l, pos_l = [], []
    for p in plans:
        if isinstance(p, DedupMinmaxPlan):
            v, q = dedup_minmax_apply(xi, p)
        else:
            msgs = jnp.take(xi, p.col_padded, axis=0)
            v, q = _exact_rowmax(msgs, p)
        vals_l.append(v)
        pos_l.append(q)
    vals = jnp.concatenate(vals_l, axis=0)[:graph.num_rows]
    if is_min:
        vals = -vals
    empty = (graph.deg < 0.5)[:, None]
    vals = jnp.where(empty, 0.0, vals)
    return vals, tuple(pos_l)


@partial(jax.custom_vjp, nondiff_argnums=(2, ))
def _spmm_sharded_minmax(x, graph: ShardedSpmmGraph, is_min: bool):
    return _sharded_minmax_impl(x, graph, is_min)[0]


def _spmm_sharded_minmax_fwd(x, graph, is_min):
    vals, pos_l = _sharded_minmax_impl(x, graph, is_min)
    return vals, (pos_l, jnp.zeros((x.shape[0], 0), x.dtype), graph)


def _spmm_sharded_minmax_bwd(is_min, res, g):
    # Winner-only gradient per split (reference contract,
    # csrc/ops/autograd/scatter_kernel.cpp:432-456). Rows absent from a
    # split (pads, empty rows) carry POS_NONE and route to the dropped
    # sentinel row.
    from pyg_lib_tpu.ops.pallas.segment_minmax_kernel import POS_NONE
    from pyg_lib_tpu.ops.pallas.spmm_dedup_minmax import DedupMinmaxPlan

    pos_l, proto, graph = res
    plans = graph.mm if graph.mm is not None else graph.fwd
    f = g.shape[1]
    n_src = proto.shape[0]
    npd = pos_l[0].shape[0]
    gpad = jnp.pad(g, ((0, len(plans) * npd - g.shape[0]), (0, 0)))
    cols = jnp.arange(f, dtype=jnp.int32)[None, :]
    grad = jnp.zeros((n_src, f), g.dtype)
    for i, (p, q) in enumerate(zip(plans, pos_l)):
        idx = (p.uniq_cols
               if isinstance(p, DedupMinmaxPlan) else p.col_padded)
        safe = jnp.clip(q, 0, idx.shape[0] - 1)
        col_win = jnp.where((q < 0) | (q >= POS_NONE), jnp.int32(n_src),
                            jnp.take(idx, safe))
        gs = jax.lax.dynamic_slice_in_dim(gpad, i * npd, npd, axis=0)
        grad = grad.at[col_win,
                       jnp.broadcast_to(cols, col_win.shape)].add(
                           gs, mode='drop')
    return (grad.astype(proto.dtype), _zero_cot(graph))


_spmm_sharded_minmax.defvjp(_spmm_sharded_minmax_fwd,
                            _spmm_sharded_minmax_bwd)


def spmm_sharded(x: jax.Array, graph: ShardedSpmmGraph,
                 reduce: str = 'sum',
                 precision: Optional[str] = None) -> jax.Array:
    """:func:`spmm` over a :class:`ShardedSpmmGraph` (huge-graph variant).

    ``precision`` matches :func:`spmm` (None / 'highest' / 'bf16' /
    'int8'); with 'int8', each row split quantises against the same full
    table so per-column scales are identical across splits.
    ``reduce='max'/'min'`` needs plain split plans or a graph built with
    ``minmax='auto'/'on'`` (per-split pair-deduped schedules); exact
    values with the winner-only gradient, like :func:`spmm`.
    """
    if reduce in ('max', 'min'):
        from pyg_lib_tpu.ops.pallas.spmm_dedup_minmax import DedupMinmaxPlan
        plans = graph.mm if graph.mm is not None else graph.fwd
        if not all(isinstance(p, (SpmmPlan, DedupMinmaxPlan))
                   for p in plans):
            raise ValueError(
                "spmm_sharded reduce='max'/'min' needs plain split plans "
                "or a graph built with minmax='auto'/'on'")
        return _spmm_sharded_minmax(x, graph,
                                    reduce == 'min').astype(x.dtype)
    if reduce not in ('sum', 'add', 'mean'):
        raise ValueError(
            f"spmm reduce must be 'sum', 'add' or 'mean', got {reduce!r}")
    if precision not in (None, 'highest', 'bf16', 'int8'):
        raise ValueError(f"spmm precision must be None, 'highest', "
                         f"'bf16' or 'int8', got {precision!r}")
    if precision == 'highest':
        precision = None
    out = _spmm_sharded_sum(x, graph, precision)
    if reduce == 'mean':
        d = jnp.maximum(graph.deg, 1.0).astype(out.dtype)
        out = out / d[:, None]
    return out
