"""Pallas TPU kernel: sorted segment-sum over a CSR indptr (SpMM reduce).

This is the perf-critical aggregation primitive (SURVEY.md §3.3: the
reference's ``segment_csr_kernel.cu`` warp-per-row kernels; BASELINE.json
targets speed-of-light HBM bandwidth).  XLA's scatter-add lowering on TPU
serialises updates (measured ~0.5% of roofline); this kernel instead
streams the CSR-contiguous rows once and reduces them on the MXU:

* grid over output row tiles of ``TR = 128`` rows,
* each tile's edges are contiguous ``[rowptr[t*TR], rowptr[(t+1)*TR])``;
  the kernel walks them in ``CHUNK``-row windows with double-buffered
  HBM->VMEM DMA (offsets come from a scalar-prefetched per-tile edge-start
  table),
* within a window, a 0/1 membership matrix
  ``M[j, r] = (lo_r <= pos_j < hi_r)`` turns the segment reduction into
  ``acc += Mᵀ·chunk`` — a [CHUNK, TR]ᵀ x [CHUNK, F] contraction on the MXU
  with no dynamic indexing and no atomics.

Extra FLOPs are 2*TR per element — far below the bandwidth-bound roofline
balance point, so the kernel stays memory-bound, which is the goal.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['segment_sum_csr_pallas', 'pallas_supported']

TR = 128  # output rows per tile
TP = 256  # lane-padded TR + 1
CHUNK = 512  # edge rows per DMA window
PTR_BLOCK = 8  # pointer-table rows per VMEM block


def pallas_supported(src_shape, num_rows: int) -> bool:
    """The kernel handles 2-D f32/bf16 src with lane-aligned feature dim."""
    if len(src_shape) != 2:
        return False
    e, f = src_shape
    return f % 128 == 0 and f <= 2048


def _kernel(tile_start, ptr_vmem, msgs_hbm, out_ref, acc, buf, sems):
    """One grid step = one output tile of TR rows.

    tile_start: [num_tiles_pad + 1] int32 scalar-prefetch (SMEM): edge
        offset of each tile's first row.
    ptr_vmem: [PTR_BLOCK, TP] int32 VMEM block holding PTR_BLOCK tiles'
        row pointers (this tile's row = t % PTR_BLOCK).
    msgs_hbm: [E, F] f32 in ANY/HBM (manual DMA).
    out_ref:  [TR, F] f32 VMEM.
    acc:      [TR, F] f32 scratch.
    buf:      [2, CHUNK, F] f32 scratch (double buffer).
    sems:     2 DMA semaphores.
    """
    t = pl.program_id(0)
    e_total = msgs_hbm.shape[0]

    start = tile_start[t].astype(jnp.int32)
    end = tile_start[t + 1].astype(jnp.int32)
    nchunks = pl.cdiv(end - start, jnp.int32(CHUNK))

    acc[:] = jnp.zeros_like(acc)

    row = jax.lax.rem(t, jnp.int32(PTR_BLOCK))
    bounds = ptr_vmem[pl.ds(row, 1), :]  # [1, TP] int32
    lo = bounds[:, :TR]  # [1, TR]
    hi = bounds[:, 1:TR + 1]  # [1, TR]

    def dma(slot, c):
        # Window start, clamped so the DMA stays in bounds; the membership
        # mask (pos >= pos_start) discards re-read rows.
        pos_start = start + jnp.int32(c) * jnp.int32(CHUNK)
        offset = jnp.clip(pos_start, jnp.int32(0),
                          jnp.int32(e_total - CHUNK))
        return pltpu.make_async_copy(
            msgs_hbm.at[pl.ds(offset, CHUNK), :],
            buf.at[slot],
            sems.at[slot],
        ), offset, pos_start

    @pl.when(nchunks > 0)
    def _():
        first, _, _ = dma(0, 0)
        first.start()

    def body(c, _):
        slot = jax.lax.rem(jnp.int32(c), jnp.int32(2))
        next_slot = jax.lax.rem(jnp.int32(c) + 1, jnp.int32(2))

        @pl.when(c + 1 < nchunks)
        def _():
            nxt, _, _ = dma(next_slot, c + 1)
            nxt.start()

        cur, offset, pos_start = dma(slot, c)
        cur.wait()

        pos = offset + jax.lax.broadcasted_iota(jnp.int32, (CHUNK, TR), 0)
        member = ((pos >= lo) & (pos < hi) & (pos >= pos_start))
        # bf16 hi/lo split: membership is exactly representable in bf16, so
        # two 1-pass bf16 MXU products reproduce ~f32 precision at 1/3 the
        # MXU cost of a 6-pass f32 matmul (the kernel's compute bound).
        m = member.astype(jnp.bfloat16)  # [CHUNK, TR]
        from pyg_lib_tpu.ops.pallas.spmm_chunked import split_dot
        dims = (((0, ), (0, )), ((), ()))
        acc[:] += split_dot(m, buf[slot], dims)  # [TR, F]
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)
    out_ref[:] = acc[:]


@functools.partial(jax.jit, static_argnums=(2, ))
def segment_sum_csr_pallas(src: jax.Array, indptr: jax.Array,
                           interpret: bool = False) -> jax.Array:
    """``out[r] = sum(src[indptr[r]:indptr[r+1]])`` for 2-D ``src``.

    Pure forward; the caller (``pyg_lib_tpu.ops.segment_csr``) wires the
    VJP (gather_csr).  Computes in f32.
    """
    e, f = src.shape
    num_rows = indptr.shape[0] - 1
    num_tiles = max(-(-num_rows // TR), 1)
    num_tiles = -(-num_tiles // PTR_BLOCK) * PTR_BLOCK  # pad to block
    r_pad = num_tiles * TR

    ptr32 = indptr.astype(jnp.int32)
    ptr_padded = jnp.concatenate([
        ptr32,
        jnp.full((r_pad + 1 - ptr32.shape[0], ), ptr32[-1], jnp.int32),
    ])
    # Per-tile pointer table [num_tiles, TP]: row t holds
    # rowptr[t*TR : t*TR+TR+1], lanes TR+1..TP-1 padded with the row end
    # (empty segments).
    idx = jnp.minimum(
        jnp.arange(num_tiles)[:, None] * TR +
        jnp.minimum(jnp.arange(TP)[None, :], TR),
        r_pad)
    tile_ptr = ptr_padded[idx]  # [num_tiles, TP]
    tile_start = ptr_padded[jnp.minimum(
        jnp.arange(num_tiles + 1) * TR, r_pad)]  # [num_tiles+1]

    src32 = src.astype(jnp.float32)
    if e < CHUNK:  # DMA window must fit; membership masks the pad rows
        src32 = jnp.pad(src32, ((0, CHUNK - e), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles, ),
        in_specs=[
            pl.BlockSpec((PTR_BLOCK, TP), lambda t, *_: (t // PTR_BLOCK, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((TR, f), lambda t, *_: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TR, f), jnp.float32),
            pltpu.VMEM((2, CHUNK, f), jnp.float32),
            pltpu.SemaphoreType.DMA((2, )),
        ],
    )

    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r_pad, f), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(2 * CHUNK + 4 * TR) * f * 4 + 2**21, ),
        cost_estimate=pl.CostEstimate(
            flops=2 * e * TR * f,
            bytes_accessed=e * f * 4 + r_pad * f * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(tile_start, tile_ptr, src32)

    return out[:num_rows].astype(src.dtype)
