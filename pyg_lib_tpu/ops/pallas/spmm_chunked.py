"""Chunked segment-sum Pallas kernel + SpMM plan — the hot aggregation path.

TPU-native replacement for the reference's CSR reduction kernels
(reference ``pyg_lib/csrc/ops/cpu/segment_csr_kernel.cpp:31-155`` and the
CUDA warp-per-row kernels ``csrc/ops/cuda/segment_csr_kernel.cu:17-76``)
specialised for the message-passing hot loop (SURVEY.md §3.3).

Why a second kernel next to ``segment_csr_kernel``: the manual
double-buffered kernel drains its DMA pipeline at every output-tile
boundary (measured 26% of stream bandwidth on a mean-degree-16 graph).
This kernel instead uses Pallas's *automatic* grid pipelining, which
prefetches the next message block during compute with no per-tile drain:

* Host-side ``build_spmm_plan`` pads each output tile's edge list to a
  multiple of ``CHUNK`` (MEGABLOCKS-style chunked-ragged layout), so the
  grid is one step per fixed-size chunk and every input block is a plain
  ``(CHUNK, F)`` slab.
* Scalar-prefetched ``chunk_tile[c]`` drives the *output* block index —
  consecutive chunks of one tile revisit the same output block, which
  Pallas keeps resident in VMEM (matmul-k-loop accumulation pattern).
* The segment reduction itself is a 0/1-membership contraction on the
  MXU: ``acc += memberᵀ · chunk`` with ``member[j, r] = lo_r ≤ pos_j <
  hi_r``; bf16 hi/lo splitting reproduces f32 precision at one-third the
  MXU cost of a native f32 contraction.

Pad rows sit at positions ``≥ hi`` of their tile, so membership masks
them with no extra bookkeeping.
"""

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    'SpmmPlan', 'build_spmm_plan', 'spmm_plan_apply',
    'segment_sum_chunked', 'split_dot', 'auto_chunk', 'quantize_columns',
]

TR = 128  # output rows per tile
TP = 256  # lane-padded row-pointer row (TR+1 rounded up to lane multiple)
PTR_SUB = 8  # sublane replication for the per-tile pointer table


def split_dot(m, vals, dims):
    """bf16 hi/lo two-pass MXU contraction reproducing ~f32 precision.

    ``m`` must be exactly representable in bf16 (membership / one-hot
    selection matrices are). Shared by the chunked-sum, segment-CSR and
    segment-softmax kernels.
    """
    hi = vals.astype(jnp.bfloat16)
    lo = (vals - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return (jax.lax.dot_general(m, hi, dimension_numbers=dims,
                                preferred_element_type=jnp.float32) +
            jax.lax.dot_general(m, lo, dimension_numbers=dims,
                                preferred_element_type=jnp.float32))


class SpmmPlan(NamedTuple):
    """Static gather/reduce schedule for one CSR graph (host-built)."""
    col_padded: jax.Array  # [E_pad] int32 — col ids, pad slots point at 0
    chunk_tile: jax.Array  # [C] int32 — output tile of each chunk
    tile_ptr: jax.Array  # [T, PTR_SUB, TP] int32 — padded-coord rowptr/tile
    tile_shift: jax.Array  # [T] int32 — padded_start - orig_start per tile
    num_rows: int
    num_edges: int
    chunk: int
    # Optional (with_edge_maps=True): move per-edge VALUES between original
    # and padded coordinates (for planned softmax / weighted aggregation).
    edge_perm: Optional[jax.Array] = None  # [E_pad] orig edge per pad slot
    edge_pos: Optional[jax.Array] = None  # [E] pad slot per orig edge
    row_padded: Optional[jax.Array] = None  # [E_pad] dst row per pad slot
    valid_mask: Optional[jax.Array] = None  # [E_pad] True at real edges

    @property
    def num_chunks(self) -> int:
        return self.chunk_tile.shape[0]


# Pytree with static config: plans pass through jit boundaries as
# ARGUMENTS (parameters), not closure constants inlined into the module
# (utils/pytree.py — the remote-compile 413/990s fix).
from pyg_lib_tpu.utils.pytree import register_plan_pytree  # noqa: E402

register_plan_pytree(SpmmPlan, ('num_rows', 'num_edges', 'chunk'))


def _build_padded_layout(rowptr: np.ndarray, chunk: int,
                         allow_empty_tiles: bool = False):
    """Pad each TR-row tile's edge span to a multiple of ``chunk``.

    Returns (orig, valid, chunk_tile, tile_ptr, shift); ``shift[t]`` maps
    padded position -> original edge id (orig = padded_pos - shift).

    ``allow_empty_tiles=True`` gives edgeless tiles ZERO chunks instead
    of one all-pad chunk. Such a plan is NOT valid for the single-plan
    TPU kernel (a tile absent from ``chunk_tile`` never writes its
    output block) — it is for the fused multi-range kernel, where
    another range (or a forced masked step) covers the tile and skipping
    the pad chunk skips its gather + stream traffic entirely.
    """
    num_rows = rowptr.shape[0] - 1
    num_tiles = max(-(-num_rows // TR), 1)
    # Edge span of each tile in original coordinates.
    tb = np.minimum(np.arange(num_tiles + 1) * TR, num_rows)
    tile_lo = rowptr[tb[:-1]]
    tile_hi = rowptr[tb[1:]]
    counts = tile_hi - tile_lo
    nchunks = -(-counts // chunk)
    if not allow_empty_tiles:
        nchunks = np.maximum(nchunks, 1)  # >=1 so every tile writes
    padded_counts = nchunks * chunk
    padded_starts = np.zeros(num_tiles + 1, np.int64)
    np.cumsum(padded_counts, out=padded_starts[1:])
    e_pad = int(padded_starts[-1])

    # Map each padded slot to its original edge (or -1 for pad).
    tile_of_slot = np.repeat(np.arange(num_tiles), padded_counts)
    slot_in_tile = np.arange(e_pad) - padded_starts[tile_of_slot]
    orig = tile_lo[tile_of_slot] + slot_in_tile
    valid = slot_in_tile < counts[tile_of_slot]

    chunk_tile = np.repeat(np.arange(num_tiles), nchunks).astype(np.int32)
    # Per-tile pointer row of TP lanes in padded coordinates, using THIS
    # tile's shift throughout so the boundary lane lands exactly on the
    # tile's valid-edge end (pad slots excluded from every segment):
    #   tile_ptr[t, l] = rowptr[min(tb[t]+l, tb[t+1])] + shift[t].
    shift = padded_starts[:-1] - tile_lo
    lanes = np.minimum(np.arange(TP), TR)
    row_idx = np.minimum(tb[:-1, None] + lanes[None, :], tb[1:, None])
    tile_ptr = (rowptr[row_idx] + shift[:, None]).astype(np.int32)  # [T, TP]
    tile_ptr = np.broadcast_to(tile_ptr[:, None, :],
                               (num_tiles, PTR_SUB, TP)).copy()
    return orig, valid, chunk_tile, tile_ptr, shift


def quantize_columns(x, key=None):
    """Symmetric per-feature-column int8 quantisation.

    Returns ``(xq int8, scale f32[F])`` with
    ``x ≈ xq * scale[None, :]`` and ``scale[f] = maxabs(x[:, f]) / 127``
    (1.0 for all-zero columns). Column scales commute with segment sums,
    so reductions of ``xq`` dequantise with one multiply on the output.

    ``key`` (a ``jax.random`` key) switches round-to-nearest to
    STOCHASTIC rounding: ``floor(y + U[0,1))``, which is unbiased
    (``E[xq] = y``) — the right mode for quantising training *gradients*,
    where round-to-nearest's systematic bias accumulates across steps.
    Callers pre-quantise with a per-step key and feed the int8 result to
    the ``precision='int8'`` paths (which pass through caller-quantised
    input untouched).
    """
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=0) / 127.0
    scale = jnp.where(scale > 0, scale, 1.0)
    y = xf / scale[None, :]
    if key is None:
        r = jnp.round(y)
    else:
        r = jnp.floor(y + jax.random.uniform(key, y.shape, jnp.float32))
    xq = jnp.clip(r, -127, 127).astype(jnp.int8)
    return xq, scale


def auto_chunk(rowptr, candidates=(512, 256, 128),
               waste_budget: float = 0.15) -> int:
    """Pick the chunk size for a degree distribution.

    Larger chunks amortise grid-step overhead but pad each TR-row tile's
    edge span up to a chunk multiple (and at least one chunk), which low
    mean degree turns into streamed garbage. Returns the largest
    candidate whose padded-slot overhead stays within ``waste_budget``
    of the least-padding candidate's total (the bench-validated 512
    whenever it is not wasteful, 128 for sparse tiles).
    """
    rowptr = np.asarray(rowptr, dtype=np.int64)
    num_rows = rowptr.shape[0] - 1
    num_tiles = max(-(-num_rows // TR), 1)
    tb = np.minimum(np.arange(num_tiles + 1) * TR, num_rows)
    counts = rowptr[tb[1:]] - rowptr[tb[:-1]]

    def padded(c):
        return int((np.maximum(-(-counts // c), 1) * c).sum())

    floor = min(padded(c) for c in candidates)
    for c in sorted(candidates, reverse=True):
        if padded(c) <= (1.0 + waste_budget) * floor:
            return c
    return min(candidates)


def build_spmm_plan(rowptr, col, chunk=512,
                    with_edge_maps: bool = False,
                    pad_to_chunks: int = None,
                    allow_empty_tiles: bool = False,
                    _layout=None) -> SpmmPlan:
    """Build the chunked schedule for ``out[r] = Σ x[col[e]]`` over CSR rows.

    One-time host preprocessing per graph (analogous to the reference
    requiring CSR construction up front). ``chunk`` trades padding waste
    (≤ ``chunk`` extra gathered rows per 128-row tile) against grid-step
    overhead; ``chunk='auto'`` sizes it from the degree distribution
    (:func:`auto_chunk`). ``with_edge_maps`` additionally stores the
    orig↔padded edge permutations used by the planned softmax /
    weighted-aggregation paths.
    """
    rowptr = np.asarray(rowptr, dtype=np.int64)
    col = np.asarray(col)
    if chunk == 'auto':
        chunk = auto_chunk(rowptr)
    # _layout: a caller that already ran _build_padded_layout (e.g. the
    # weighted fused-range builder, which also maps per-edge weights
    # into padded coordinates) passes it in to avoid the second O(E_pad)
    # host pass; it must match (rowptr, chunk, allow_empty_tiles).
    orig, valid, chunk_tile, tile_ptr, shift = (
        _layout if _layout is not None else _build_padded_layout(
            rowptr, chunk, allow_empty_tiles))
    if len(col):
        col_padded = np.where(valid, col[np.minimum(orig, len(col) - 1)],
                              0).astype(np.int32)
    else:
        col_padded = np.zeros(orig.shape[0], np.int32)
    edge_perm = edge_pos = row_padded = valid_mask = None
    if with_edge_maps:
        perm = np.where(valid, orig, 0).astype(np.int32)
        pos = np.zeros(int(col.shape[0]), np.int32)
        pos[orig[valid]] = np.nonzero(valid)[0].astype(np.int32)
        edge_perm = jnp.asarray(perm)
        edge_pos = jnp.asarray(pos)
        num_rows = rowptr.shape[0] - 1
        row_of_edge = np.repeat(np.arange(num_rows, dtype=np.int32),
                                np.diff(rowptr).astype(np.int64))
        if len(row_of_edge):
            rp = np.where(valid, row_of_edge[np.minimum(
                orig, len(row_of_edge) - 1)], 0).astype(np.int32)
        else:
            rp = np.zeros(orig.shape[0], np.int32)
        row_padded = jnp.asarray(rp)
        valid_mask = jnp.asarray(valid)
    if pad_to_chunks is not None and pad_to_chunks > chunk_tile.shape[0]:
        extra = pad_to_chunks - chunk_tile.shape[0]
        last_tile = chunk_tile[-1] if len(chunk_tile) else 0
        chunk_tile = np.concatenate(
            [chunk_tile,
             np.full(extra, last_tile, np.int32)])
        col_padded = np.concatenate(
            [col_padded, np.zeros(extra * chunk, np.int32)])
        if with_edge_maps:
            pad1 = np.zeros(extra * chunk, np.int32)
            edge_perm = jnp.asarray(
                np.concatenate([np.asarray(jax.device_get(edge_perm)),
                                pad1]))
            row_padded = jnp.asarray(
                np.concatenate([np.asarray(jax.device_get(row_padded)),
                                pad1]))
            valid_mask = jnp.asarray(
                np.concatenate([np.asarray(jax.device_get(valid_mask)),
                                np.zeros(extra * chunk, bool)]))
    return SpmmPlan(
        col_padded=jnp.asarray(col_padded),
        chunk_tile=jnp.asarray(chunk_tile),
        tile_ptr=jnp.asarray(tile_ptr),
        tile_shift=jnp.asarray(shift.astype(np.int32)),
        num_rows=int(rowptr.shape[0] - 1),
        num_edges=int(col.shape[0]),
        chunk=chunk,
        edge_perm=edge_perm,
        edge_pos=edge_pos,
        row_padded=row_padded,
        valid_mask=valid_mask,
    )


def _chunked_kernel(chunk_tile, ptr_ref, msgs_ref, out_ref):
    """One grid step = one (CHUNK, F) message slab reduced into its tile.

    ``ptr_ref`` here is the materialised ``[PTR_SUB, TP]`` pointer row of
    this chunk's tile (all sublanes identical).
    """
    c = pl.program_id(0)
    chunk = msgs_ref.shape[0]

    tile = chunk_tile[c]
    prev_tile = chunk_tile[jnp.maximum(c, 1) - 1]
    is_first = jnp.logical_or(c == 0, tile != prev_tile)

    bounds = ptr_ref[0:1, :]  # [1, TP]
    lo = bounds[:, :TR]
    hi = bounds[:, 1:TR + 1]

    pos = c * chunk + jax.lax.broadcasted_iota(jnp.int32, (chunk, TR), 0)
    member = (pos >= lo) & (pos < hi)
    m = member.astype(jnp.bfloat16)

    data = msgs_ref[:]
    dims = (((0, ), (0, )), ((), ()))
    if data.dtype == jnp.bfloat16:
        contrib = jax.lax.dot_general(m, data, dimension_numbers=dims,
                                      preferred_element_type=jnp.float32)
    elif data.dtype == jnp.int8:
        # Quantised messages: int8 magnitudes (<=127) are exact in bf16,
        # and f32 accumulation is exact below 2^24, so the segment sum of
        # the quantised values is bit-exact; the caller applies the
        # per-column dequantisation scale to the reduced output.
        contrib = jax.lax.dot_general(m, data.astype(jnp.bfloat16),
                                      dimension_numbers=dims,
                                      preferred_element_type=jnp.float32)
    else:
        contrib = split_dot(m, data.astype(jnp.float32), dims)

    @pl.when(is_first)
    def _():
        out_ref[:] = contrib

    @pl.when(jnp.logical_not(is_first))
    def _():
        out_ref[:] = out_ref[:] + contrib


@partial(jax.jit, static_argnums=(3, 4, 5))
def _segment_sum_chunked(msgs_padded, chunk_tile, tile_ptr, num_rows: int,
                         chunk: int, interpret: bool = False):
    e_pad, f = msgs_padded.shape
    num_chunks = chunk_tile.shape[0]
    num_tiles = tile_ptr.shape[0]
    r_pad = num_tiles * TR

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_chunks, ),
        in_specs=[
            # This chunk's tile-pointer row, replicated over PTR_SUB
            # sublanes to satisfy (8, 128) block-shape tiling.
            pl.BlockSpec((1, PTR_SUB, TP),
                         lambda c, ct: (ct[c], 0, 0),
                         memory_space=pltpu.VMEM),
            # The message slab for this chunk; Pallas double-buffers the
            # HBM->VMEM stream across grid steps automatically.
            pl.BlockSpec((chunk, f), lambda c, ct: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TR, f), lambda c, ct: (ct[c], 0),
                               memory_space=pltpu.VMEM),
    )

    def kernel(ct_ref, ptr_ref, msgs_ref, out_ref):
        _chunked_kernel(ct_ref, ptr_ref[0], msgs_ref, out_ref)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r_pad, f), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * e_pad * TR * f,
            bytes_accessed=e_pad * f * 4 + r_pad * f * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(chunk_tile, tile_ptr, msgs_padded)
    return out[:num_rows]


@partial(jax.jit, static_argnums=(3, 4))
def _segment_sum_padded_xla(msgs_padded, chunk_tile, tile_ptr,
                            num_rows: int, chunk: int):
    """Pure-XLA equivalent of the chunked kernel (same plan layout).

    Non-TPU backends used to run the Pallas INTERPRETER, which re-executes
    its Python loop on every call (~12 s per 66K-edge call on CPU — it
    made the CPU examples unusable). This derives each padded slot's row
    from the per-tile pointer table with a vmapped searchsorted and does
    one sorted scatter-add; jitted, so CPU runs compile once.
    """
    e_pad, f = msgs_padded.shape
    s = jnp.arange(e_pad, dtype=jnp.int32)
    t = chunk_tile[s // chunk]  # owning tile per slot
    bounds = tile_ptr[:, 0, :TR + 1]  # [T, TR+1] padded-coord rowptr
    b = bounds[t]  # [E_pad, TR+1]
    row_local = jax.vmap(
        lambda bb, ss: jnp.searchsorted(bb, ss, side='right'))(b, s) - 1
    valid = (row_local >= 0) & (row_local < TR) & (s < b[:, TR]) & (
        s >= b[:, 0])
    row_global = jnp.where(valid, t * TR + row_local, tile_ptr.shape[0] * TR)
    out = jnp.zeros((tile_ptr.shape[0] * TR, f), jnp.float32)
    out = out.at[row_global].add(
        jnp.where(valid[:, None], msgs_padded.astype(jnp.float32), 0.0),
        mode='drop')
    return out[:num_rows]


def segment_sum_chunked(msgs_padded: jax.Array, plan: SpmmPlan,
                        interpret: Optional[bool] = None) -> jax.Array:
    """Reduce pre-gathered padded messages into ``[num_rows, F]`` sums.

    TPU: the Mosaic kernel. Elsewhere: a jitted pure-XLA equivalent
    (pass ``interpret=True`` explicitly to force the Pallas interpreter,
    as the kernel unit tests do)."""
    if interpret is None:
        if jax.default_backend() != 'tpu':
            return _segment_sum_padded_xla(msgs_padded, plan.chunk_tile,
                                           plan.tile_ptr, plan.num_rows,
                                           plan.chunk)
        interpret = False
    return _segment_sum_chunked(msgs_padded, plan.chunk_tile, plan.tile_ptr,
                                plan.num_rows, plan.chunk, interpret)


def spmm_plan_apply(x: jax.Array, plan: SpmmPlan,
                    interpret: Optional[bool] = None,
                    precision: Optional[str] = None) -> jax.Array:
    """``out[r] = Σ_{e in row r} x[col[e]]`` — gather + chunked reduce.

    The gather is XLA's row-gather (transaction-bound on TPU; measured
    ~11 ns/row at 512 B rows, saturating ~135 GB/s at 8 KB rows), the
    reduction is the chunked Pallas kernel above.

    ``precision='bf16'`` streams the gathered message slab in bfloat16
    while accumulating in float32 (the MXU-native matmul contract): the
    materialised round-trip — the dominant real traffic, measured 19.4 of
    29.6 GB at F=512 — halves, for ~8-bit-mantissa message precision.
    The output dtype is unchanged (``x.dtype``).

    ``precision='int8'`` additionally quantises the gathered table to
    int8 with one symmetric round-to-nearest scale per feature column
    (``scale[f] = maxabs(x[:, f]) / 127``). Per-column scales commute
    with the segment sum, so the reduction of the quantised values is
    bit-exact and dequantisation is one multiply on the reduced output —
    no per-edge scale bookkeeping. Quarters both the gather table and
    the message slab; resolution is 1/127 of each column's max, a lossy
    fast mode for bandwidth-bound wide-feature regimes (the gather is
    transaction-bound below ~2 KB rows, so expect wins at F >= 1024,
    not at F = 512 — see BENCHMARKS.md).
    """
    if precision == 'int8':
        if x.dtype == jnp.int8:
            # Already quantised by the caller (e.g. the sharded path,
            # which quantises once for all row splits): reduce the raw
            # int8 values; the caller owns dequantisation.
            xq, scale = x, None
        else:
            xq, scale = quantize_columns(x)
        msgs = jnp.take(xq, plan.col_padded, axis=0)
        if x.shape[1] > 2048:
            if plan.row_padded is None:
                raise ValueError('spmm with F > 2048 needs a plan built '
                                 'with_edge_maps=True (XLA fallback path)')
            out = jnp.zeros((plan.num_rows, x.shape[1]), jnp.float32).at[
                plan.row_padded].add(
                    jnp.where(plan.valid_mask[:, None],
                              msgs.astype(jnp.float32), 0.0), mode='drop')
        else:
            out = segment_sum_chunked(msgs, plan, interpret)
        if scale is None:
            return out  # raw f32 sums of int8 values
        return (out * scale[None, :]).astype(x.dtype)
    xm = x.astype(jnp.bfloat16) if (precision == 'bf16'
                                    and x.dtype != jnp.bfloat16) else x
    msgs = jnp.take(xm, plan.col_padded, axis=0)
    if x.shape[1] > 2048:
        # Double-buffered (chunk, F) slabs would exceed VMEM; fall back
        # to the XLA sorted scatter for very wide features (needs the
        # row_padded edge map).
        if plan.row_padded is None:
            raise ValueError('spmm with F > 2048 needs a plan built '
                             'with_edge_maps=True (XLA fallback path)')
        out = jnp.zeros((plan.num_rows, x.shape[1]), jnp.float32).at[
            plan.row_padded].add(
                jnp.where(plan.valid_mask[:, None],
                          msgs.astype(jnp.float32), 0.0), mode='drop')
        return out.astype(x.dtype)
    out = segment_sum_chunked(msgs, plan, interpret)
    return out.astype(x.dtype)
