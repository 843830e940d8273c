"""Deduplicated-gather min/max segment reduction — the hub-penalty fix.

Round-4 left ``spmm(reduce='max'/'min')`` on the per-edge gather path
(``segment_minmax_kernel``): every edge fetches its source row, so a hub
column spanning a 128-row output tile is re-fetched up to 128 times at
the ~12 ns/row gather-transaction floor (DESIGN.md §8) — the same
hub-serialisation cost the round-4 dedup-sum plan removed for sum/mean.

Min/max admits MORE dedup than sum: duplicate ``(row, col)`` edges are
*semantically* redundant (``max`` over a row's edges equals ``max`` over
its distinct columns), and at tile scope the gather needs each distinct
(tile, column) pair only once. This plan therefore:

* Host side (:func:`build_dedup_minmax_plan`): drops duplicate
  ``(row, col)`` pairs outright, then packs each 128-row tile's
  col-sorted edges into fixed ``(EC, UC)`` chunks exactly like the sum
  plan (``spmm_dedup._pack_tile``) — but stores each chunk's edge
  metadata ROW-sorted, with a last-edge-of-row flag, so the kernel can
  run a segmented scan.
* Device side, per chunk: ONE gather of the ``UC`` unique source rows
  (the transaction saving), then
  1. exact one-hot *expansion* ``msgs[e] = slab[lid[e]]`` on the MXU —
     f32 values ride two 16-bit integer channels through ``split_dot``
     (the ``segment_minmax_kernel`` bit-transport scheme), so no
     rounding anywhere;
  2. a segmented inclusive scan along the row-sorted edges carrying
     ``(value, unique-slot)`` with lexicographic merge — elementwise,
     exact, first-occurrence (lowest slot) tie-breaking;
  3. exact one-hot *extraction* of each row's last-edge slot into the
     resident ``[TR, F]`` (value, slot) output tiles, merged across a
     tile's chunks like the sum kernel.

The returned positions are global unique-slot indices (``chunk·UC +
lid``); ``plan.uniq_cols[pos]`` recovers the winning source column for
the reference winner-only gradient contract
(``/root/reference/pyg_lib/csrc/ops/autograd/scatter_kernel.cpp:432-456``).
Values are bit-exact vs the per-edge path: reference empty-row semantics
(value 0 / sentinel argindex,
``/root/reference/pyg_lib/csrc/ops/cpu/segment_csr_kernel.cpp:279-423``)
are applied by the caller via its row-degree mask, as elsewhere.

No hot level: a hub column inside a tile collapses to ONE unique slot
already — for an order statistic the dense per-row count matrix of the
sum plan's hot extension carries no extra information.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyg_lib_tpu.ops.pallas.segment_minmax_kernel import NEG, POS_NONE
from pyg_lib_tpu.ops.pallas.spmm_chunked import TR, split_dot
from pyg_lib_tpu.ops.pallas.spmm_dedup import (META_SUB, _pack_tile,
                                               _tile_slices, estimate_dedup)

__all__ = [
    'DedupMinmaxPlan', 'build_dedup_minmax_plan', 'dedup_minmax_apply',
    'dedup_pairs', 'estimate_minmax_config', 'pad_minmax_plan',
]


class DedupMinmaxPlan(NamedTuple):
    """Static dedup-gather order-statistic schedule (host-built).

    ``edge_meta`` sublanes: s0 local row (``TR`` marks pads), s1
    chunk-local unique id, s2 last-edge-of-its-row-in-chunk flag.
    """
    uniq_cols: jax.Array  # [C*UC] int32 — unique-col gather list (pads -> 0)
    edge_meta: jax.Array  # [C, META_SUB, EC] int32 (row-sorted per chunk)
    chunk_tile: jax.Array  # [C] int32
    num_rows: int
    num_edges: int  # ORIGINAL edge count (pre pair-dedup)
    ec: int
    uc: int
    # Static scan depth: the segmented scan only needs to span the
    # longest within-chunk row run, not EC — power-law rows are short, so
    # this drops the dominant VPU cost by ~1/3 (host-measured maximum).
    scan_len: int = 0  # 0 -> EC (full depth)

    @property
    def num_chunks(self) -> int:
        return self.chunk_tile.shape[0]


from pyg_lib_tpu.utils.pytree import register_plan_pytree  # noqa: E402

register_plan_pytree(DedupMinmaxPlan,
                     ('num_rows', 'num_edges', 'ec', 'uc', 'scan_len'))


def dedup_pairs(rowptr: np.ndarray, col: np.ndarray):
    """Drop duplicate ``(row, col)`` edges; returns a deduped CSR.

    Valid for order statistics only (sum/mean weight duplicates)."""
    rowptr = np.asarray(rowptr, dtype=np.int64)
    col = np.asarray(col, dtype=np.int64)
    num_rows = rowptr.shape[0] - 1
    row = np.repeat(np.arange(num_rows, dtype=np.int64),
                    np.diff(rowptr).astype(np.int64))
    order = np.lexsort((col, row))
    r, c = row[order], col[order]
    if r.shape[0]:
        keep = np.empty(r.shape[0], bool)
        keep[0] = True
        keep[1:] = (r[1:] != r[:-1]) | (c[1:] != c[:-1])
        r, c = r[keep], c[keep]
    rp = np.zeros(num_rows + 1, np.int64)
    np.cumsum(np.bincount(r, minlength=num_rows), out=rp[1:])
    return rp, c


def estimate_minmax_config(rowptr, col, sample_tiles: int = 64,
                           candidates=((512, 192), (256, 128), (512, 256),
                                       (384, 160), (256, 96), (128, 64))):
    """Pick ``(ec, uc)`` for the min/max kernel from the host layout.

    Unlike the sum kernel (whose expansion rides the MXU, so ec=512
    maximises reuse), the min/max kernel pays scan + extraction work per
    edge SLOT; the cost model is chip-calibrated on v5e (round-5 sweep
    of 6 configs at 262k/4.2M/F=128, BENCHMARKS.md): ~22 ns per gathered
    unique row (transaction-dominated), ~8 ns per padded edge slot,
    ~0.8 us per grid step. Expects a PAIR-DEDUPED CSR.
    """
    rowptr = np.asarray(rowptr, dtype=np.int64)
    col = np.asarray(col, dtype=np.int64)
    num_tiles, tb = _tile_slices(rowptr)
    if num_tiles > sample_tiles:
        pick = np.linspace(0, num_tiles - 1, sample_tiles).astype(np.int64)
    else:
        pick = np.arange(num_tiles)
    scale = num_tiles / max(len(pick), 1)
    best = None
    for ec, uc in candidates:
        uc = min(uc, ec)
        chunks = 0
        for t in pick:
            lo, hi = int(rowptr[tb[t]]), int(rowptr[tb[t + 1]])
            if hi == lo:
                chunks += 1
                continue
            c = np.sort(col[lo:hi])
            n = hi - lo
            new = np.empty(n, bool)
            new[0] = True
            np.not_equal(c[1:], c[:-1], out=new[1:])
            ucum = np.cumsum(new)
            start = 0
            while start < n:
                end = min(start + ec, n)
                if ucum[end - 1] - ucum[start] + 1 > uc:
                    end = start + int(
                        np.searchsorted(ucum[start:end],
                                        ucum[start] + uc - 1, side='right'))
                chunks += 1
                start = end
        cost = chunks * (22.0 * uc + 8.0 * ec + 800.0) * scale
        if best is None or cost < best[0]:
            best = (cost, ec, uc)
    return best[1], best[2]


def build_dedup_minmax_plan(rowptr, col, ec: int = 512, uc='auto',
                            _pre_deduped: bool = False) -> DedupMinmaxPlan:
    """One-time host build of the dedup min/max schedule.

    ``ec``/``uc`` bound edges / gathered unique columns per grid step
    (``uc='auto'`` picks from the PAIR-DEDUPED degree structure via
    :func:`spmm_dedup.estimate_dedup`). The total unique-slot count must
    stay below ``2**24 / uc`` chunks so (chunk·UC + lid) positions stay
    exact through the f32 extraction channel — asserted here.
    """
    rowptr = np.asarray(rowptr, dtype=np.int64)
    col = np.asarray(col, dtype=np.int64)
    num_rows = rowptr.shape[0] - 1
    num_edges_total = int(col.shape[0])
    if _pre_deduped:
        rowptr_d, col_d = rowptr, col
    else:
        rowptr_d, col_d = dedup_pairs(rowptr, col)
    if uc == 'auto':
        uc, _ = estimate_dedup(rowptr_d, col_d, ec=ec)
    uc = int(min(max(-(-uc // 8) * 8, 8), ec))
    num_tiles, tb = _tile_slices(rowptr_d)

    # Early size guard: chunk count is at least ceil(edges/ec) per tile
    # (and 1 for empty tiles); past 2^24 unique slots the (chunk*UC+lid)
    # positions would lose exactness through the f32 extraction channel.
    counts = rowptr_d[tb[1:]] - rowptr_d[tb[:-1]]
    min_chunks = int(np.maximum(-(-counts // ec), 1).sum())
    if min_chunks * uc >= (1 << 24):
        raise ValueError(
            f'dedup minmax plan too large (>= {min_chunks} chunks x '
            f'uc={uc}): unique-slot positions would exceed the exact-f32 '
            f'range; shard the graph or use the per-edge min/max path')

    uniqs, metas, tiles = [], [], []
    maxrun = 1
    for t in range(num_tiles):
        lo, hi = int(rowptr_d[tb[t]]), int(rowptr_d[tb[t + 1]])
        rloc = np.repeat(
            np.arange(tb[t + 1] - tb[t], dtype=np.int32),
            np.diff(rowptr_d[tb[t]:tb[t + 1] + 1]).astype(np.int64))
        ctile = col_d[lo:hi]
        order = np.argsort(ctile, kind='stable')
        packed = _pack_tile(ctile[order].astype(np.int64), rloc[order],
                            None, ec, uc)
        for uniq, rows_p, lid_p, _ in packed:
            # Row-sort the chunk (pads -> TR, after every real edge) and
            # flag each row's last in-chunk edge for the scan/extraction.
            rows2 = np.where(rows_p < 0, TR, rows_p).astype(np.int32)
            o = np.argsort(rows2, kind='stable')
            rows2, lid2 = rows2[o], lid_p[o]
            last = np.zeros(ec, np.int32)
            real = rows2 < TR
            if real.any():
                nreal = int(real.sum())
                last[:nreal - 1] = rows2[:nreal - 1] != rows2[1:nreal]
                last[nreal - 1] = 1
                maxrun = max(maxrun,
                             int(np.bincount(rows2[:nreal]).max()))
            m = np.zeros((META_SUB, ec), np.int32)
            m[0], m[1], m[2] = rows2, lid2, last
            uniqs.append(uniq)
            metas.append(m)
            tiles.append(t)
    # Static scan depth: next power of two >= the longest row run.
    scan_len = 1
    while scan_len < maxrun:
        scan_len *= 2

    c = len(tiles)
    if c * uc >= (1 << 24):
        raise ValueError(
            f'dedup minmax plan too large ({c} chunks x uc={uc}): '
            f'unique-slot positions would exceed the exact-f32 range; '
            f'shard the graph or use the per-edge min/max path')
    return DedupMinmaxPlan(
        uniq_cols=jnp.asarray(np.concatenate(uniqs).astype(np.int32)),
        edge_meta=jnp.asarray(np.stack(metas)),
        chunk_tile=jnp.asarray(np.asarray(tiles, np.int32)),
        num_rows=int(num_rows),
        num_edges=num_edges_total,
        ec=int(ec),
        uc=int(uc),
        scan_len=int(scan_len),
    )


def pad_minmax_plan(plan: DedupMinmaxPlan, num_chunks: int,
                    scan_len: int = None) -> DedupMinmaxPlan:
    """Append all-pad chunks (rows = TR, never extracted) and/or raise
    the static scan depth so several plans share one compiled kernel
    shape (the sharded path's contract)."""
    if scan_len is not None and scan_len > plan.scan_len:
        plan = plan._replace(scan_len=int(scan_len))
    extra = num_chunks - plan.num_chunks
    if extra <= 0:
        return plan
    uniq = np.concatenate([
        np.asarray(jax.device_get(plan.uniq_cols)),
        np.zeros(extra * plan.uc, np.int32)
    ])
    meta_pad = np.zeros((extra, META_SUB, plan.ec), np.int32)
    meta_pad[:, 0, :] = TR  # pad rows match no output row
    meta = np.concatenate(
        [np.asarray(jax.device_get(plan.edge_meta)), meta_pad])
    ct = np.asarray(jax.device_get(plan.chunk_tile))
    last = ct[-1] if len(ct) else 0
    ct = np.concatenate([ct, np.full(extra, last, np.int32)])
    return plan._replace(uniq_cols=jnp.asarray(uniq),
                         edge_meta=jnp.asarray(meta),
                         chunk_tile=jnp.asarray(ct))


def _meta_to_cols(meta, ec: int):
    """Transport the ``[META_SUB, EC]`` integer metadata block to
    ``[EC, META_SUB]`` columns via an exact identity MXU dot (Mosaic has
    no native int transpose; ``split_dot``'s hi/lo bf16 scheme is exact
    for the <= 16-bit payloads stored here)."""
    ident = (jax.lax.broadcasted_iota(jnp.int32, (ec, ec), 0) ==
             jax.lax.broadcasted_iota(jnp.int32, (ec, ec), 1))
    dims = (((1, ), (1, )), ((), ()))
    return split_dot(ident.astype(jnp.bfloat16),
                     meta.astype(jnp.float32), dims)  # [EC, META_SUB] f32


def _dedup_minmax_kernel(chunk_tile, meta_ref, slab_ref, val_ref, pos_ref,
                         *, scan_len: int):
    """One grid step: expand one chunk's unique slab, scan per-row maxima
    along its row-sorted edges, merge into the resident output tiles."""
    c = pl.program_id(0)
    tile = chunk_tile[c]
    prev = chunk_tile[jnp.maximum(c, 1) - 1]
    is_first = jnp.logical_or(c == 0, tile != prev)

    meta = meta_ref[0]  # [META_SUB, EC] int32
    ec = meta.shape[1]
    uc = slab_ref.shape[0]
    f = slab_ref.shape[1]

    mt = _meta_to_cols(meta, ec)  # [EC, META_SUB] f32
    last_c = mt[:, 2:3]
    rows_i = mt[:, 0:1].astype(jnp.int32)
    lids_i = mt[:, 1:2].astype(jnp.int32)

    # Exact one-hot expansion: msgs[e] = slab[lid[e]] — the f32 slab
    # rides four 8-bit integer channels, each exact in one bf16 dot.
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (ec, uc), 1) ==
              lids_i).astype(jnp.bfloat16)
    sbits = jax.lax.bitcast_convert_type(slab_ref[:], jnp.int32)
    dims_u = (((1, ), (0, )), ((), ()))

    def expand8(shift):
        chan = (jax.lax.shift_right_logical(sbits, jnp.int32(shift))
                & 0xff).astype(jnp.bfloat16)
        return jax.lax.dot_general(
            onehot, chan, dimension_numbers=dims_u,
            preferred_element_type=jnp.float32).astype(jnp.int32)

    msgs = jax.lax.bitcast_convert_type(
        (expand8(24) << 24) | (expand8(16) << 16) |
        (expand8(8) << 8) | expand8(0),
        jnp.float32)  # [EC, F], bit-exact slab values

    valid = rows_i < TR  # [EC, 1]
    val = jnp.where(valid, msgs, NEG)
    pidx = jnp.broadcast_to(lids_i, (ec, f))
    rowid = jnp.broadcast_to(jnp.where(valid, rows_i, -1), (ec, f))

    def shift_down(a, k, fill):
        top = jnp.full((k, f), fill, a.dtype)
        return jnp.concatenate([top, a[:ec - k]], axis=0)

    # Segmented inclusive scan, lexicographic (max value, min slot) —
    # elementwise and exact (same scheme as segment_minmax_kernel). The
    # depth only needs to span the longest within-chunk row run.
    limit = min(scan_len, ec) if scan_len else ec
    k = 1
    while k < limit:
        vs = shift_down(val, k, jnp.float32(NEG))
        ps = shift_down(pidx, k, jnp.int32(0))
        ids = shift_down(rowid, k, jnp.int32(-2))
        same = ids == rowid
        better = same & ((vs > val) | ((vs == val) & (ps < pidx)))
        val = jnp.where(better, vs, val)
        pidx = jnp.where(better, ps, pidx)
        k *= 2

    # Exact one-hot extraction of each row's last-edge slot: the f32
    # value rides four 8-bit integer channels (each exact in a SINGLE
    # bf16 dot — one-hot rows sum exactly one integer <= 255), and the
    # winner slot rides as lid+1 so a zero result doubles as the
    # row-absent flag (saves the separate count dot).
    sel = ((jax.lax.broadcasted_iota(jnp.int32, (ec, TR), 1) == rows_i) &
           (last_c > 0.5)).astype(jnp.bfloat16)  # [EC, TR]
    dims_e = (((0, ), (0, )), ((), ()))
    vbits = jax.lax.bitcast_convert_type(val, jnp.int32)

    def extract8(shift):
        chan = (jax.lax.shift_right_logical(vbits, jnp.int32(shift))
                & 0xff).astype(jnp.bfloat16)
        return jax.lax.dot_general(
            sel, chan, dimension_numbers=dims_e,
            preferred_element_type=jnp.float32).astype(jnp.int32)

    new_val = jax.lax.bitcast_convert_type(
        (extract8(24) << 24) | (extract8(16) << 16) |
        (extract8(8) << 8) | extract8(0), jnp.float32)
    pid1 = (pidx + 1).astype(jnp.float32)  # lid+1 <= UC
    if uc <= 256:
        p_sl = jax.lax.dot_general(sel, pid1.astype(jnp.bfloat16),
                                   dimension_numbers=dims_e,
                                   preferred_element_type=jnp.float32)
    else:
        p_sl = split_dot(sel, pid1, dims_e)
    present = p_sl > 0.5
    new_val = jnp.where(present, new_val, NEG)
    new_pos = jnp.where(present, c * uc + p_sl.astype(jnp.int32) - 1,
                        jnp.int32(POS_NONE))

    @pl.when(is_first)
    def _():
        val_ref[:] = new_val
        pos_ref[:] = new_pos

    @pl.when(jnp.logical_not(is_first))
    def _():
        old_val = val_ref[:]
        old_pos = pos_ref[:]
        # Later chunks hold strictly larger slots: min-pos tie-break
        # keeps the first occurrence, and absent rows (POS_NONE) lose
        # against any present NEG-valued row.
        take = (new_val > old_val) | ((new_val == old_val) &
                                     (new_pos < old_pos))
        val_ref[:] = jnp.where(take, new_val, old_val)
        pos_ref[:] = jnp.where(take, new_pos, old_pos)


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def _dedup_minmax_tpu(uniq_slab, edge_meta, chunk_tile, num_rows: int,
                      ec: int, uc: int, scan_len: int = 0,
                      interpret: bool = False):
    f = uniq_slab.shape[1]
    num_chunks = chunk_tile.shape[0]
    num_tiles = max(-(-num_rows // TR), 1)
    r_pad = num_tiles * TR

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_chunks, ),
        in_specs=[
            pl.BlockSpec((1, META_SUB, ec), lambda c, ct: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((uc, f), lambda c, ct: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TR, f), lambda c, ct: (ct[c], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, f), lambda c, ct: (ct[c], 0),
                         memory_space=pltpu.VMEM),
        ],
    )

    val, pos = pl.pallas_call(
        partial(_dedup_minmax_kernel, scan_len=scan_len),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((r_pad, f), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, f), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            # expansion (4 dots) + extraction (~6 dots incl. transport)
            flops=2 * num_chunks * (4 * ec * uc * f + 6 * ec * TR * f +
                                    3 * ec * ec),
            bytes_accessed=num_chunks * (uc * f * 4 + META_SUB * ec * 4) +
            2 * r_pad * f * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(chunk_tile, edge_meta, uniq_slab)
    return val[:num_rows], pos[:num_rows]


@partial(jax.jit, static_argnums=(3, 4, 5))
def _dedup_minmax_xla(uniq_slab, edge_meta, chunk_tile, num_rows: int,
                      ec: int, uc: int):
    """Pure-XLA equivalent (non-TPU backends; same plan layout and
    (values, global unique-slot positions) contract)."""
    c = chunk_tile.shape[0]
    f = uniq_slab.shape[1]
    num_tiles = max(-(-num_rows // TR), 1)
    r_pad = num_tiles * TR
    slab = uniq_slab.reshape(c, uc, f).astype(jnp.float32)
    rows = edge_meta[:, 0, :]  # [C, EC]
    lids = edge_meta[:, 1, :]
    msgs = jnp.take_along_axis(slab, lids[..., None], axis=1)  # [C, EC, F]
    valid = rows < TR
    rglobal = jnp.where(valid, chunk_tile[:, None] * TR + rows, r_pad)
    vals = jnp.full((r_pad + 1, f), NEG, jnp.float32)
    vals = vals.at[rglobal].max(jnp.where(valid[..., None], msgs, NEG),
                                mode='drop')
    picked = vals[jnp.minimum(rglobal, r_pad)]
    slot = (jnp.arange(c, dtype=jnp.int32) * uc)[:, None] + lids
    cand = jnp.where(valid[..., None] & (msgs == picked),
                     slot[..., None], jnp.int32(POS_NONE))
    pos = jnp.full((r_pad + 1, f), jnp.int32(POS_NONE))
    pos = pos.at[rglobal].min(cand, mode='drop')
    return vals[:num_rows], pos[:num_rows]


def dedup_minmax_apply(x: jax.Array, plan: DedupMinmaxPlan,
                       interpret=None):
    """Bit-exact per-row maxima + winning global unique slots.

    Returns ``(values [N, F] f32, pos [N, F] int32)``; rows with no edges
    get ``(NEG, POS_NONE)`` — callers apply the reference empty-row
    contract via their degree mask. ``plan.uniq_cols[pos]`` is the
    winning source column. For min, negate input and returned values.
    """
    slab = jnp.take(x.astype(jnp.float32), plan.uniq_cols, axis=0)
    if interpret is None:
        if jax.default_backend() != 'tpu':
            return _dedup_minmax_xla(slab, plan.edge_meta, plan.chunk_tile,
                                     plan.num_rows, plan.ec, plan.uc)
        interpret = False
    return _dedup_minmax_tpu(slab, plan.edge_meta, plan.chunk_tile,
                             plan.num_rows, plan.ec, plan.uc,
                             plan.scan_len, bool(interpret))
