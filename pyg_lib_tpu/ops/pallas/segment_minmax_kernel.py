"""Exact per-row max/min + argindex over the chunked plan layout.

TPU-native counterpart of the reference CSR min/max reductions with
argindices (reference ``pyg_lib/csrc/ops/cpu/segment_csr_kernel.cpp``
``segment_{min,max}_csr`` and the CUDA warp-shuffle kernels
``csrc/ops/cuda/segment_csr_kernel.cu``; winner-only gradient contract
``csrc/ops/autograd/scatter_kernel.cpp:432-456``). Until round 2 these
rode XLA's scatter at a measured 32-60 GB/s; this kernel streams the
chunked layout once like the sum kernel.

Exactness, despite every cross-lane move going through the bf16 MXU:

* The *segmented scan* along the chunk carries ``(value, padded position)``
  pairs with a lexicographic merge — pure elementwise f32/int32 ops, so
  the per-row winner within a chunk is bit-exact with first-occurrence
  tie-breaking.
* *Extraction* of each row's winner into the ``[TR, F]`` output tile is a
  one-hot matmul. A bf16 one-hot dot is exact only for ≤8-bit payloads,
  so the f32 value is bitcast to uint32 and shipped as two 16-bit integer
  channels (exact under ``split_dot``'s hi/lo bf16 scheme), and likewise
  the int32 position. Reassembly bitcasts back — no rounding anywhere.
* *Cross-chunk merge* compares reassembled exact values elementwise in
  the resident output tile.

Returns padded positions; the caller maps them to original edge ids with
the plan's per-tile shift (see ``ops.segment_csr``).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyg_lib_tpu.ops.pallas.spmm_chunked import (PTR_SUB, TP, TR, SpmmPlan,
                                                 split_dot)

__all__ = ['segment_max_planned_exact',
           'segment_max_sum_planned_exact']

NEG = -jnp.inf  # below every f32 value: -3e38 was NOT (finite f32 goes
# to ~-3.4e38, and masked logits legitimately carry -inf), which made
# the kernel report the mask value for such rows.
POS_NONE = 1 << 30  # argpos sentinel for chunks where a row is absent


def _extract16(sel, chan):
    """Exact one-hot extraction of a 16-bit integer channel.

    ``sel`` [chunk, TR] has at most one 1 per row-column; ``chan``
    [chunk, F] holds integers in [0, 65535] as f32. split_dot's bf16
    hi/lo covers 16 bits exactly for integer payloads.
    """
    dims = (((0, ), (0, )), ((), ()))
    return split_dot(sel, chan, dims)  # [TR, F] f32, exact


def _minmax_kernel(chunk_tile, ptr_ref, x_ref, val_ref, pos_ref,
                   sum_ref=None):
    """(max, argpos) per row; with ``sum_ref`` also the row sums in the
    SAME slab pass (fused multi-reduce — one HBM read serves both)."""
    c = pl.program_id(0)
    chunk = x_ref.shape[0]
    f = x_ref.shape[1]
    tile = chunk_tile[c]
    prev = chunk_tile[jnp.maximum(c, 1) - 1]
    is_first = jnp.logical_or(c == 0, tile != prev)

    bounds = ptr_ref[0][0:1, :]
    lo = bounds[:, :TR]
    hi = bounds[:, 1:TR + 1]
    pos1 = c * chunk + jax.lax.broadcasted_iota(jnp.int32, (chunk, TR), 0)
    member = (pos1 >= lo) & (pos1 < hi)
    in_row = jnp.any(member, axis=1, keepdims=True)  # [chunk, 1]

    x = jnp.where(in_row, x_ref[:].astype(jnp.float32), NEG)
    rowid1 = jnp.max(
        jnp.where(member,
                  jax.lax.broadcasted_iota(jnp.int32, member.shape, 1), -1),
        axis=1)  # [chunk]
    rowid = jnp.broadcast_to(rowid1[:, None], (chunk, f))
    pos = jnp.broadcast_to(
        (c * chunk +
         jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)), (chunk, f))

    def shift_down(a, k, fill):
        top = jnp.full((k, f), fill, a.dtype)
        return jnp.concatenate([top, a[:chunk - k]], axis=0)

    # Segmented inclusive scan with lexicographic (max value, min position)
    # merge — all elementwise, exact.
    val, pidx = x, pos
    k = 1
    while k < chunk:
        vs = shift_down(val, k, jnp.float32(NEG))
        ps = shift_down(pidx, k, jnp.int32(0))
        ids = shift_down(rowid, k, jnp.int32(-2))
        same = ids == rowid
        better = same & ((vs > val) | ((vs == val) & (ps < pidx)))
        val = jnp.where(better, vs, val)
        pidx = jnp.where(better, ps, pidx)
        k *= 2

    # Each row's last in-chunk slot carries its within-chunk winner.
    last = member & (pos1 == jnp.minimum(hi, (c + 1) * chunk) - 1)
    sel = last.astype(jnp.bfloat16)

    # int32 bit plumbing throughout: Mosaic has no uint32<->f32 casts.
    # shift_right_logical keeps the 16-bit halves non-negative, and the
    # reassembly left-shift wraps into the sign bit with the right BITS
    # (two's complement), which the bitcast then reinterprets as f32.
    vbits = jax.lax.bitcast_convert_type(val, jnp.int32)
    v_hi = _extract16(
        sel, jax.lax.shift_right_logical(vbits, jnp.int32(16)).astype(jnp.float32))
    v_lo = _extract16(sel, (vbits & 0xffff).astype(jnp.float32))
    p_hi = _extract16(
        sel, jax.lax.shift_right_logical(pidx, jnp.int32(16)).astype(jnp.float32))
    p_lo = _extract16(sel, (pidx & 0xffff).astype(jnp.float32))
    ones = jnp.ones((chunk, f), jnp.bfloat16)
    dims = (((0, ), (0, )), ((), ()))
    cnt = jax.lax.dot_general(sel, ones, dimension_numbers=dims,
                              preferred_element_type=jnp.float32)
    present = cnt > 0.5

    new_val = jax.lax.bitcast_convert_type(
        (v_hi.astype(jnp.int32) << 16) | v_lo.astype(jnp.int32),
        jnp.float32)
    new_val = jnp.where(present, new_val, NEG)
    new_pos = (p_hi.astype(jnp.int32) << 16) | p_lo.astype(jnp.int32)
    # Rows absent from this chunk must never win the cross-chunk merge:
    # their value ties at NEG with rows whose TRUE max is -inf, so the
    # tie-break below must see an infinitely-late position.
    new_pos = jnp.where(present, new_pos, jnp.int32(POS_NONE))

    if sum_ref is not None:
        member_b = member.astype(jnp.bfloat16)
        data = jnp.where(in_row, x_ref[:].astype(jnp.float32), 0.0)
        contrib = split_dot(member_b, data, dims)

    @pl.when(is_first)
    def _():
        val_ref[:] = new_val
        pos_ref[:] = new_pos
        if sum_ref is not None:
            sum_ref[:] = contrib

    @pl.when(jnp.logical_not(is_first))
    def _():
        old_val = val_ref[:]
        old_pos = pos_ref[:]
        # Later chunks sit at strictly larger padded positions, so on a
        # value tie the earlier (old) winner keeps first-occurrence
        # order; the position tie-break matters when the row's true max
        # is -inf (ties NEG from absent chunks, whose pos is POS_NONE).
        take = (new_val > old_val) | ((new_val == old_val) &
                                      (new_pos < old_pos))
        val_ref[:] = jnp.where(take, new_val, old_val)
        pos_ref[:] = jnp.where(take, new_pos, old_pos)
        if sum_ref is not None:
            sum_ref[:] = sum_ref[:] + contrib


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _minmax_padded(x_padded, chunk_tile, tile_ptr, num_rows: int, chunk: int,
                   interpret: bool = False, with_sum: bool = False):
    e_pad, f = x_padded.shape
    num_chunks = chunk_tile.shape[0]
    num_tiles = tile_ptr.shape[0]
    r_pad = num_tiles * TR

    def out_block():
        return pl.BlockSpec((TR, f), lambda c, ct: (ct[c], 0),
                            memory_space=pltpu.VMEM)

    n_out = 3 if with_sum else 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_chunks, ),
        in_specs=[
            pl.BlockSpec((1, PTR_SUB, TP), lambda c, ct: (ct[c], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, f), lambda c, ct: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_block() for _ in range(n_out)],
    )

    out_shape = [
        jax.ShapeDtypeStruct((r_pad, f), jnp.float32),
        jax.ShapeDtypeStruct((r_pad, f), jnp.int32),
    ]
    if with_sum:
        out_shape.append(jax.ShapeDtypeStruct((r_pad, f), jnp.float32))

    outs = pl.pallas_call(
        _minmax_kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=(14 if with_sum else 10) * e_pad * TR * f,
            bytes_accessed=e_pad * f * 4 + n_out * r_pad * f * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(chunk_tile, tile_ptr, x_padded)
    return tuple(o[:num_rows] for o in outs)


import functools as _functools


@_functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _minmax_padded_xla(x_padded, chunk_tile, tile_ptr, num_rows: int,
                       chunk: int, with_sum: bool = False):
    """Jitted pure-XLA equivalent of the Mosaic kernel (same plan layout,
    same (values, padded positions) contract) for non-TPU backends — the
    interpreter re-executes its Python loop per call (the failure mode
    the sum kernel's XLA fallback fixed; this is the min/max analog)."""
    e_pad = x_padded.shape[0]
    s = jnp.arange(e_pad, dtype=jnp.int32)
    t = chunk_tile[s // chunk]
    bounds = tile_ptr[:, 0, :TR + 1]
    b = bounds[t]
    row_local = jax.vmap(
        lambda bb, ss: jnp.searchsorted(bb, ss, side='right'))(b, s) - 1
    valid = (row_local >= 0) & (row_local < TR) & (s < b[:, TR]) & (
        s >= b[:, 0])
    r_pad = tile_ptr.shape[0] * TR
    row = jnp.where(valid, t * TR + row_local, r_pad)
    xf = x_padded.astype(jnp.float32)
    vals = jnp.full((r_pad + 1, ) + xf.shape[1:], NEG, jnp.float32)
    vals = vals.at[row].max(jnp.where(valid[:, None], xf, NEG),
                            mode='drop')
    picked = vals[jnp.minimum(row, r_pad)]
    cand = jnp.where(valid[:, None] & (xf == picked), s[:, None],
                     jnp.int32(POS_NONE))
    pos = jnp.full((r_pad + 1, ) + xf.shape[1:], jnp.int32(POS_NONE))
    pos = pos.at[row].min(cand, mode='drop')
    outs = [vals[:num_rows], pos[:num_rows]]
    if with_sum:
        sums = jnp.zeros((r_pad + 1, ) + xf.shape[1:], jnp.float32)
        sums = sums.at[row].add(jnp.where(valid[:, None], xf, 0.0),
                                mode='drop')
        outs.append(sums[:num_rows])
    return tuple(outs)


def segment_max_planned_exact(x_padded: jax.Array, plan: SpmmPlan,
                              interpret=None):
    """Bit-exact per-row maxima + first-winner padded positions.

    Returns ``(values [N, F] f32, padded_pos [N, F] int32)``. Rows with no
    valid slots get ``values = NEG`` and position ``POS_NONE`` — callers
    apply the reference empty-row contract (value 0 / sentinel argindex)
    using their row-degree mask. For min, negate the input and the
    returned values.

    TPU: the Mosaic kernel. Elsewhere: a jitted XLA equivalent (pass
    ``interpret=True`` to force the Pallas interpreter, as kernel unit
    tests do).
    """
    if interpret is None:
        if jax.default_backend() != 'tpu':
            return _minmax_padded_xla(x_padded, plan.chunk_tile,
                                      plan.tile_ptr, plan.num_rows,
                                      plan.chunk)
        interpret = False
    val, pos = _minmax_padded(x_padded, plan.chunk_tile, plan.tile_ptr,
                              plan.num_rows, plan.chunk, interpret)
    return val, pos


def segment_max_sum_planned_exact(x_padded: jax.Array, plan: SpmmPlan,
                                  interpret=None):
    """One slab pass emitting (max values, argpos, sums) per row — the
    fused multi-reduce (reference Triton ``fused_scatter_reduce`` role,
    ``pyg_lib/ops/scatter_reduce.py:15-181``): the HBM read is shared by
    the order statistic and the sum instead of one pass per reduction."""
    if interpret is None:
        if jax.default_backend() != 'tpu':
            return _minmax_padded_xla(x_padded, plan.chunk_tile,
                                      plan.tile_ptr, plan.num_rows,
                                      plan.chunk, with_sum=True)
        interpret = False
    return _minmax_padded(x_padded, plan.chunk_tile, plan.tile_ptr,
                          plan.num_rows, plan.chunk, interpret,
                          with_sum=True)
