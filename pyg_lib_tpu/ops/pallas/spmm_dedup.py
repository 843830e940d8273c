"""Deduplicated-gather SpMM plan + kernel — gather-reuse aggregation.

Attacks the measured SpMM wall (DESIGN.md §8: the XLA row-gather costs
~12 ns per fetched row regardless of locality, so ``gather(x, col)`` on a
mean-degree-16 graph re-fetches every source row ~16 times). On graphs
with *reuse inside an output tile* — power-law in-degree (hubs), or
cluster-reordered locality (``partition.cluster_reorder``) — most of those
fetches are duplicates at 128-row-tile scope.

This plan gathers each (tile, column) pair ONCE and re-expands the
duplicates on the MXU inside the kernel:

* Host side (``build_dedup_plan``): per output tile, sort the tile's
  edges by column and greedily pack fixed-shape chunks of at most ``EC``
  edges referencing at most ``UC`` distinct columns. Per chunk it stores
  the unique-column gather list (padded to ``UC``) and an ``[8, EC]``
  int32 edge-metadata block (local row id, chunk-local unique id, f32
  weight bits on three sublanes).
* Device side: one XLA row-gather of the *unique* slab (the transaction
  savings — ``num_padded_uniques`` instead of ``num_padded_edges`` rows),
  then a grid step per chunk: two iota-equality masks build the
  row-by-unique count/weight matrix ``W = memberᵀ·onehot`` with one small
  MXU contraction, and ``contrib = W @ uniq_slab`` reduces straight into
  the output tile — same accumulation pattern as ``spmm_chunked``.

The reduction result is identical to the chunked kernel's up to summation
order (counts ≤ 128 are exact in bf16, so the unweighted ``W``-contraction
precision matches ``split_dot``). There is no per-edge gather anywhere:
duplicate expansion costs MXU FLOPs (~100 MFLOP per 512-edge chunk),
which ride free under the HBM-bound stream.

When it wins: dedup ratio ρ = edges / padded-unique-slots > ~1.3
(measured crossover; ``estimate_dedup``). Uniform-random graphs have
ρ ≈ 1 at tile scope and should stay on the single-plan path —
``build_spmm_graph(dedup='auto')`` decides per side from the host layout.

Two-level extension (``hot='auto'``): chunk-local unique lists reset per
chunk, so a hub column spanning ``s`` tiles is still gathered ``s``
times. Columns whose tile span crosses a cost-model threshold are
promoted to a global HOT set: their rows are gathered ONCE into an
``[H, F]`` slab that stays VMEM-resident across the whole grid, and
their per-(row, column) edge counts (or weight sums) are baked into a
dense ``[num_tiles·TR, H]`` host-built matrix streamed one ``[TR, H]``
block per tile — the hot contribution is then a single MXU dot
``counts @ hot_slab`` added when the kernel first visits a tile. Cold
columns keep the per-chunk scheme (with hot edges removed, the cold
packing also shrinks). On a Zipf(1.2) graph at headline scale ~78% of
edges hit the top 512 columns, so the gather-transaction count drops
another ~2x past the single-level plan.

Reference anchor: this fuses the reference composition
``segment_csr(x[col], rowptr)`` (``pyg_lib/ops/__init__.py:816-835``,
kernels ``pyg_lib/csrc/ops/cpu/segment_csr_kernel.cpp:31-155``); the
dedup schedule itself has no reference counterpart (CUDA gathers are
cache-backed; TPU gathers are not, so reuse must be made explicit).
"""

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyg_lib_tpu.ops.pallas.spmm_chunked import (TR, quantize_columns,
                                                 split_dot)

__all__ = [
    'DedupSpmmPlan', 'build_dedup_plan', 'dedup_plan_apply',
    'estimate_dedup', 'pad_plan', 'pad_hot',
]

META_SUB = 8  # sublane count of the edge-metadata block (3 used)


class DedupSpmmPlan(NamedTuple):
    """Static dedup-gather schedule for one CSR graph (host-built)."""
    uniq_cols: jax.Array  # [C*UC] int32 — unique-col gather list (pads -> 0)
    edge_meta: jax.Array  # [C, META_SUB, EC] int32 — s0: local row (-1 pad),
    #                       s1: chunk-local unique id, s2: f32 weight bits
    chunk_tile: jax.Array  # [C] int32 — output tile of each chunk
    num_rows: int
    num_edges: int
    ec: int  # edges per chunk (static)
    uc: int  # unique slots per chunk (static, multiple of 8)
    weighted: bool
    # Two-level hot extension (None/None when disabled): hot column
    # gather list + dense per-(padded row, hot column) count/weight-sum
    # matrix. bf16 storage == entries exactly representable (integer
    # counts <= 256); f32 == general weights (kernel hi/lo-splits).
    hot_cols: Optional[jax.Array] = None  # [H] int32
    hot_w: Optional[jax.Array] = None  # [num_tiles*TR, H] bf16|f32

    @property
    def num_chunks(self) -> int:
        return self.chunk_tile.shape[0]

    @property
    def num_hot(self) -> int:
        return 0 if self.hot_cols is None else int(self.hot_cols.shape[0])


from pyg_lib_tpu.utils.pytree import register_plan_pytree  # noqa: E402

register_plan_pytree(DedupSpmmPlan,
                     ('num_rows', 'num_edges', 'ec', 'uc', 'weighted'))


def _tile_slices(rowptr: np.ndarray):
    num_rows = rowptr.shape[0] - 1
    num_tiles = max(-(-num_rows // TR), 1)
    tb = np.minimum(np.arange(num_tiles + 1) * TR, num_rows)
    return num_tiles, tb


def _pack_tile(cols_sorted, rows_sorted, w_sorted, ec: int, uc: int):
    """Greedy chunk packing of one tile's col-sorted edge list.

    Returns per-chunk (uniq_list, row_ids, lids, weights) numpy arrays,
    padded to (uc,) / (ec,) each.
    """
    n = cols_sorted.shape[0]
    out = []
    if n == 0:
        return [(np.zeros(uc, np.int32), np.full(ec, -1, np.int32),
                 np.zeros(ec, np.int32), np.zeros(ec, np.float32))]
    new = np.empty(n, bool)
    new[0] = True
    np.not_equal(cols_sorted[1:], cols_sorted[:-1], out=new[1:])
    ucum = np.cumsum(new)  # 1-based global unique index per edge
    start = 0
    while start < n:
        end = min(start + ec, n)
        # chunk-local unique count of edge j = ucum[j] - ucum[start] + 1
        if ucum[end - 1] - ucum[start] + 1 > uc:
            # cut before the (uc+1)-th chunk-local unique
            end = start + int(
                np.searchsorted(ucum[start:end], ucum[start] + uc - 1,
                                side='right'))
        lid = (ucum[start:end] - ucum[start]).astype(np.int32)
        cols_c = cols_sorted[start:end]
        first = np.empty(end - start, bool)
        first[0] = True
        np.not_equal(lid[1:], lid[:-1], out=first[1:])
        uniq = np.zeros(uc, np.int32)
        uniq[:int(lid[-1]) + 1] = cols_c[first]
        rows_p = np.full(ec, -1, np.int32)
        rows_p[:end - start] = rows_sorted[start:end]
        lid_p = np.zeros(ec, np.int32)
        lid_p[:end - start] = lid
        w_p = np.zeros(ec, np.float32)
        if w_sorted is not None:
            w_p[:end - start] = w_sorted[start:end]
        out.append((uniq, rows_p, lid_p, w_p))
        start = end
    return out


def _select_hot(rowptr, col, num_tiles: int, hot, hot_thresh,
                hot_max: int, hot_budget_bytes: int,
                bytes_per_entry: int):
    """Pick the global hot column set from per-column tile spans.

    A hot column trades its per-tile gather slots for one dense count
    column streamed per SpMM plus its share of the resident-slab MXU
    dot. The threshold is bench-calibrated (round-5 sweep at headline
    scale, BENCHMARKS.md): the measured optimum kept columns down to
    tile span ~``num_tiles/56`` (hot=4096 at 566 GB/s vs 329 at the
    round-4 ``num_tiles/24`` setting; spans below that flatline the
    gather saving while the per-column MXU cost keeps growing —
    hot=6144 measured WORSE). Wider storage entries (weighted plans)
    scale the threshold by the count-matrix stream cost. Returns a
    sorted int64 column array, or ``None`` (no hot level).
    """
    if hot == 'off' or num_tiles <= 1 or col.shape[0] == 0:
        return None
    explicit = not isinstance(hot, str)
    if explicit:
        hot_thresh = 1 if hot_thresh is None else hot_thresh
    elif hot_thresh is None:
        if num_tiles < 16:
            return None  # dense count stream can't pay off on tiny grids
        hot_thresh = max(num_tiles // 56, 4) * max(bytes_per_entry, 1)
    row = np.repeat(np.arange(rowptr.shape[0] - 1, dtype=np.int64),
                    np.diff(rowptr).astype(np.int64))
    key = col.astype(np.int64) * num_tiles + row // TR
    uniq_key = np.unique(key)
    span = np.bincount(uniq_key // num_tiles)
    cand = np.nonzero(span >= hot_thresh)[0]
    if cand.size == 0:
        return None
    cand = cand[np.argsort(span[cand], kind='stable')[::-1]]
    cap = int(hot) if explicit else hot_max
    cap = min(cap,
              hot_budget_bytes // max(num_tiles * TR * bytes_per_entry, 1))
    h = (min(cand.size, max(cap, 0)) // 8) * 8
    if h < 8:
        return None
    return np.sort(cand[:h])


def estimate_dedup(rowptr, col, ec: int = 512,
                   uc_candidates=(64, 128, 256, 512),
                   sample_tiles: int = 64):
    """Pick ``uc`` and predict the gather saving from the host layout.

    Returns ``(uc, gain)`` where ``gain`` = per-edge gather slots of the
    single plan divided by padded unique slots of the dedup plan
    (sampled over at most ``sample_tiles`` tiles). gain ≈ 1 on
    uniform-random graphs; > 1.3 is the measured on-chip crossover.
    """
    rowptr = np.asarray(rowptr, dtype=np.int64)
    col = np.asarray(col, dtype=np.int64)
    num_tiles, tb = _tile_slices(rowptr)
    if num_tiles > sample_tiles:
        pick = np.linspace(0, num_tiles - 1, sample_tiles).astype(np.int64)
    else:
        pick = np.arange(num_tiles)
    best = None
    edges_seen = 0
    base_slots = 0
    for t in pick:
        lo, hi = int(rowptr[tb[t]]), int(rowptr[tb[t + 1]])
        edges_seen += hi - lo
        base_slots += max(-(-(hi - lo) // ec), 1) * ec
    for uc in uc_candidates:
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
        # gather slots dominate; padded edge slots add stream + MXU cost
        cost = chunks * (uc + 0.25 * ec)
        if best is None or cost < best[0]:
            best = (cost, uc, chunks)
    _, uc, chunks = best
    gain = base_slots / max(chunks * uc, 1)
    return uc, float(gain)


def build_dedup_plan(rowptr, col, ec: int = 512, uc='auto',
                     edge_weight=None,
                     pad_to_chunks: int = None,
                     hot='auto',
                     hot_thresh: int = None,
                     hot_max: int = 4096,
                     hot_budget_bytes: int = 1 << 30) -> DedupSpmmPlan:
    """Build the dedup-gather schedule (one-time host preprocessing).

    ``ec`` bounds edges per grid step, ``uc`` bounds gathered unique
    columns per step (``'auto'`` picks from the degree structure via
    :func:`estimate_dedup`). ``edge_weight`` (optional ``[E]`` f32) bakes
    per-edge weights into the expansion matrix: the kernel then computes
    ``out[r] = Σ_e w_e · x[col_e]``. ``pad_to_chunks`` appends all-pad
    chunks (revisiting the last tile, contributing nothing) so several
    plans share one compiled kernel shape (the sharded path's contract).

    ``hot`` selects the two-level extension: ``'auto'`` promotes columns
    whose tile span crosses the cost-model threshold (see
    :func:`_select_hot`) to a global VMEM-resident slab with a dense
    per-tile count matrix, ``'off'`` disables it, an int forces the
    top-``hot`` spanning columns. ``hot_thresh`` overrides the span
    threshold; ``hot_budget_bytes`` caps the count matrix's device
    footprint (it is streamed once per SpMM, so it is also a bandwidth
    budget); ``hot_max`` caps the hot column count.
    """
    rowptr = np.asarray(rowptr, dtype=np.int64)
    col = np.asarray(col, dtype=np.int64)
    weighted = edge_weight is not None
    if weighted:
        edge_weight = np.asarray(edge_weight, dtype=np.float32)
    num_rows = rowptr.shape[0] - 1
    num_edges_total = int(col.shape[0])
    num_tiles, tb = _tile_slices(rowptr)

    hot_sel = _select_hot(rowptr, col, num_tiles, hot, hot_thresh,
                          hot_max, hot_budget_bytes,
                          4 if weighted else 1)
    hot_cols = hot_w = None
    while hot_sel is not None:
        hot_cols = np.sort(hot_sel)
        h = hot_cols.shape[0]
        hid_of = np.full(int(max(col.max(), hot_cols.max())) + 1, -1,
                         np.int64)
        hid_of[hot_cols] = np.arange(h)
        hid_e = hid_of[col]
        is_hot = hid_e >= 0
        row_e = np.repeat(np.arange(num_rows, dtype=np.int64),
                          np.diff(rowptr).astype(np.int64))
        hot_w = np.zeros((num_tiles * TR, h), np.float32)
        np.add.at(hot_w, (row_e[is_hot], hid_e[is_hot]),
                  edge_weight[is_hot] if weighted else 1.0)
        # Re-clamp against the byte budget with the ACTUAL storage width:
        # _select_hot capped assuming 1 byte/entry for unweighted plans,
        # but counts in 128..256 store as bf16 (2 bytes) and larger as
        # f32, so the streamed count matrix could exceed the budget 2-4x.
        mx = float(hot_w.max())
        item = 4 if (weighted or mx > 256) else (1 if mx <= 127 else 2)
        cap = hot_budget_bytes // max(num_tiles * TR * item, 1)
        if h <= cap:
            break
        h8 = (min(h, cap) // 8) * 8
        if h8 < 8:
            hot_sel = hot_cols = hot_w = None
            break
        hot_sel = hot_sel[:h8]  # span-ordered: keep the widest spans
    if hot_w is not None:
        # Cold remainder CSR (row order is preserved by the mask).
        keep = ~is_hot
        rowptr_c = np.zeros(num_rows + 1, np.int64)
        np.cumsum(np.bincount(row_e[keep], minlength=num_rows),
                  out=rowptr_c[1:])
        rowptr, col = rowptr_c, col[keep]
        if weighted:
            edge_weight = edge_weight[keep]
        del row_e, hid_e, is_hot, keep

    if uc == 'auto':
        uc, _ = estimate_dedup(rowptr, col, ec=ec)
    uc = int(min(max(-(-uc // 8) * 8, 8), ec))

    uniqs, rows, lids, ws, tiles = [], [], [], [], []
    for t in range(num_tiles):
        lo, hi = int(rowptr[tb[t]]), int(rowptr[tb[t + 1]])
        # local row of each edge within the tile
        rloc = np.repeat(
            np.arange(tb[t + 1] - tb[t], dtype=np.int32),
            np.diff(rowptr[tb[t]:tb[t + 1] + 1]).astype(np.int64))
        ctile = col[lo:hi]
        order = np.argsort(ctile, kind='stable')
        w_sorted = edge_weight[lo:hi][order] if weighted else None
        packed = _pack_tile(ctile[order].astype(np.int64), rloc[order],
                            w_sorted, ec, uc)
        for uniq, rp, lp, wp in packed:
            uniqs.append(uniq)
            rows.append(rp)
            lids.append(lp)
            ws.append(wp)
            tiles.append(t)

    if pad_to_chunks is not None:
        while len(tiles) < pad_to_chunks:
            uniqs.append(np.zeros(uc, np.int32))
            rows.append(np.full(ec, -1, np.int32))
            lids.append(np.zeros(ec, np.int32))
            ws.append(np.zeros(ec, np.float32))
            tiles.append(tiles[-1] if tiles else 0)

    c = len(tiles)
    meta = np.zeros((c, META_SUB, ec), np.int32)
    meta[:, 0, :] = np.stack(rows)
    meta[:, 1, :] = np.stack(lids)
    if weighted:
        meta[:, 2, :] = np.stack(ws).view(np.int32)
    if hot_w is not None:
        # Narrowest exact storage: int8 for counts <= 127 (the common
        # case — multiplicities are almost always 1), bf16 for integer
        # counts <= 256, f32 for weight sums / pathological counts. The
        # kernel derives its precision splits from the dtype (int8/bf16
        # entries are exact in bf16; f32 gets the hi/lo wl term).
        mx = float(hot_w.max())
        if not weighted and mx <= 127:
            hot_w = jnp.asarray(hot_w.astype(np.int8))
        elif not weighted and mx <= 256:
            hot_w = jnp.asarray(hot_w, dtype=jnp.bfloat16)
        else:
            hot_w = jnp.asarray(hot_w)
        hot_cols = jnp.asarray(hot_cols.astype(np.int32))
    return DedupSpmmPlan(
        uniq_cols=jnp.asarray(np.concatenate(uniqs).astype(np.int32)),
        edge_meta=jnp.asarray(meta),
        chunk_tile=jnp.asarray(np.asarray(tiles, np.int32)),
        num_rows=int(num_rows),
        num_edges=num_edges_total,
        ec=int(ec),
        uc=int(uc),
        weighted=weighted,
        hot_cols=hot_cols,
        hot_w=hot_w,
    )


def pad_plan(plan: DedupSpmmPlan, num_chunks: int) -> DedupSpmmPlan:
    """Append all-pad chunks (revisiting the last tile, contributing
    nothing) so ``plan`` matches another plan's compiled kernel shape."""
    extra = num_chunks - plan.num_chunks
    if extra <= 0:
        return plan
    uniq = np.concatenate([
        np.asarray(jax.device_get(plan.uniq_cols)),
        np.zeros(extra * plan.uc, np.int32)
    ])
    meta_pad = np.zeros((extra, META_SUB, plan.ec), np.int32)
    meta_pad[:, 0, :] = -1
    meta = np.concatenate(
        [np.asarray(jax.device_get(plan.edge_meta)), meta_pad])
    ct = np.asarray(jax.device_get(plan.chunk_tile))
    last = ct[-1] if len(ct) else 0
    ct = np.concatenate([ct, np.full(extra, last, np.int32)])
    return plan._replace(uniq_cols=jnp.asarray(uniq),
                         edge_meta=jnp.asarray(meta),
                         chunk_tile=jnp.asarray(ct))


def pad_hot(plan: DedupSpmmPlan, num_hot: int,
            dtype=None) -> DedupSpmmPlan:
    """Pad the hot level to ``num_hot`` columns (all-zero count columns
    pointing at col 0 — they contribute nothing) so several plans share
    one compiled kernel shape (the sharded path's contract). ``dtype``
    optionally casts the count matrix so sibling plans also agree on
    storage width."""
    h = plan.num_hot
    if dtype is not None and h and plan.hot_w.dtype != dtype:
        plan = plan._replace(hot_w=plan.hot_w.astype(jnp.float32)
                             .astype(dtype))
    if num_hot <= 0 or h == num_hot:
        return plan
    if num_hot < h:
        raise ValueError('cannot shrink the hot level')
    num_tiles = max(-(-plan.num_rows // TR), 1)
    if h == 0:
        return plan._replace(
            hot_cols=jnp.zeros(num_hot, jnp.int32),
            hot_w=jnp.zeros((num_tiles * TR, num_hot),
                            dtype or jnp.int8))
    hc = np.concatenate([
        np.asarray(jax.device_get(plan.hot_cols)),
        np.zeros(num_hot - h, np.int32)
    ])
    hw = jnp.concatenate([
        plan.hot_w,
        jnp.zeros((plan.hot_w.shape[0], num_hot - h), plan.hot_w.dtype)
    ], axis=1)
    return plan._replace(hot_cols=jnp.asarray(hc.astype(np.int32)),
                         hot_w=hw)


def _wmat_dot(wmat, data, exact_bf16: bool):
    """``wmat @ data`` with MXU precision splits.

    ``exact_bf16`` promises every ``wmat`` entry is exactly
    representable in bf16 (integer counts <= 256), skipping its lo term.
    bf16/int8 ``data`` rides a single bf16 dot (the declared reduced
    precision of those modes); f32 ``data`` is hi/lo split, dropping
    only the lo·lo term (below f32 ulp).
    """
    dims = (((1, ), (0, )), ((), ()))
    if data.dtype in (jnp.bfloat16, jnp.int8):
        # int8 magnitudes (<=127) are exact in bf16; counts <= 128 keep
        # every product below 2^24, so f32 accumulation stays exact.
        return jax.lax.dot_general(wmat.astype(jnp.bfloat16),
                                   data.astype(jnp.bfloat16),
                                   dimension_numbers=dims,
                                   preferred_element_type=jnp.float32)
    d32 = data.astype(jnp.float32)
    dh = d32.astype(jnp.bfloat16)
    dl = (d32 - dh.astype(jnp.float32)).astype(jnp.bfloat16)
    wh = wmat.astype(jnp.bfloat16)
    out = (jax.lax.dot_general(wh, dh, dimension_numbers=dims,
                               preferred_element_type=jnp.float32) +
           jax.lax.dot_general(wh, dl, dimension_numbers=dims,
                               preferred_element_type=jnp.float32))
    if not exact_bf16:
        wl = (wmat.astype(jnp.float32) -
              wh.astype(jnp.float32)).astype(jnp.bfloat16)
        out = out + jax.lax.dot_general(
            wl, dh, dimension_numbers=dims,
            preferred_element_type=jnp.float32)
    return out


def _chunk_contrib(chunk_tile, meta_ref, slab_ref, *, weighted: bool):
    """Shared body: expand one chunk's unique slab into a [TR, F] tile
    contribution; returns ``(is_first_visit_of_tile, contrib)``."""
    c = pl.program_id(0)
    tile = chunk_tile[c]
    prev_tile = chunk_tile[jnp.maximum(c, 1) - 1]
    is_first = jnp.logical_or(c == 0, tile != prev_tile)

    meta = meta_ref[0]  # [META_SUB, EC] int32
    ec = meta.shape[1]
    uc = slab_ref.shape[0]
    rows = meta[0:1, :]  # [1, EC]; pads are -1 (match nothing)
    lids = meta[1:2, :]  # [1, EC]

    member = (jax.lax.broadcasted_iota(jnp.int32,
                                       (TR, ec), 0) == rows)  # [TR, EC]
    onehot = (jax.lax.broadcasted_iota(jnp.int32,
                                       (uc, ec), 0) == lids)  # [UC, EC]
    dims_e = (((1, ), (1, )), ((), ()))  # contract the edge axis
    if weighted:
        w = jax.lax.bitcast_convert_type(meta[2:3, :], jnp.float32)
        ow = onehot.astype(jnp.float32) * w  # [UC, EC], pads carry w=0
        # TPU's default f32 dot truncates operands to bf16 — split the
        # weighted one-hot hi/lo (membership is exactly bf16) so W keeps
        # f32-accurate weights.
        wmat = split_dot(member.astype(jnp.bfloat16), ow, dims_e)
    else:
        # 0/1 operands: integer counts <= TR are exact in bf16.
        wmat = jax.lax.dot_general(member.astype(jnp.bfloat16),
                                   onehot.astype(jnp.bfloat16),
                                   dimension_numbers=dims_e,
                                   preferred_element_type=jnp.float32)

    return is_first, _wmat_dot(wmat, slab_ref[:], not weighted)


def _dedup_kernel(chunk_tile, meta_ref, slab_ref, out_ref, *,
                  weighted: bool):
    """One grid step: expand one chunk's unique slab into its output tile."""
    is_first, contrib = _chunk_contrib(chunk_tile, meta_ref, slab_ref,
                                       weighted=weighted)

    @pl.when(is_first)
    def _():
        out_ref[:] = contrib

    @pl.when(jnp.logical_not(is_first))
    def _():
        out_ref[:] = out_ref[:] + contrib


def _dedup_kernel_hot(chunk_tile, meta_ref, slab_ref, hotw_ref, hot_ref,
                      out_ref, *, weighted: bool):
    """Hot variant: on the first visit of a tile, fold in the dense
    count-matrix contraction against the VMEM-resident hot slab."""
    is_first, contrib = _chunk_contrib(chunk_tile, meta_ref, slab_ref,
                                       weighted=weighted)

    @pl.when(is_first)
    def _():
        out_ref[:] = contrib + _wmat_dot(
            hotw_ref[:], hot_ref[:], hotw_ref.dtype != jnp.float32)

    @pl.when(jnp.logical_not(is_first))
    def _():
        out_ref[:] = out_ref[:] + contrib


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def _dedup_sum_tpu(uniq_slab, edge_meta, chunk_tile, num_rows: int,
                   ec: int, uc: int, weighted: bool,
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
        out_specs=pl.BlockSpec((TR, f), lambda c, ct: (ct[c], 0),
                               memory_space=pltpu.VMEM),
    )

    kernel = partial(_dedup_kernel, weighted=weighted)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r_pad, f), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_chunks * (TR * ec * uc + TR * uc * f),
            bytes_accessed=num_chunks * (uc * f * 4 + META_SUB * ec * 4) +
            r_pad * f * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(chunk_tile, edge_meta, uniq_slab)
    return out[:num_rows]


@partial(jax.jit, static_argnums=(5, 6, 7, 8, 9))
def _dedup_sum_tpu_hot(uniq_slab, edge_meta, chunk_tile, hot_w, hot_slab,
                       num_rows: int, ec: int, uc: int, weighted: bool,
                       interpret: bool = False):
    f = uniq_slab.shape[1]
    h = hot_slab.shape[0]
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
            # one [TR, H] count block per tile (revisits don't reload)
            pl.BlockSpec((TR, h), lambda c, ct: (ct[c], 0),
                         memory_space=pltpu.VMEM),
            # the hot slab: constant index -> resident across the grid
            pl.BlockSpec((h, f), lambda c, ct: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TR, f), lambda c, ct: (ct[c], 0),
                               memory_space=pltpu.VMEM),
    )

    kernel = partial(_dedup_kernel_hot, weighted=weighted)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r_pad, f), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_chunks * (TR * ec * uc + TR * uc * f) +
            2 * num_tiles * TR * h * f,
            bytes_accessed=num_chunks * (uc * f * 4 + META_SUB * ec * 4) +
            num_tiles * TR * h * hot_w.dtype.itemsize + h * f * 4 +
            r_pad * f * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(chunk_tile, edge_meta, uniq_slab, hot_w, hot_slab)
    return out[:num_rows]


@partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _dedup_sum_xla(uniq_slab, edge_meta, chunk_tile, num_rows: int,
                   ec: int, uc: int, weighted: bool):
    """Pure-XLA equivalent (non-TPU backends; same plan layout)."""
    c = chunk_tile.shape[0]
    f = uniq_slab.shape[1]
    num_tiles = max(-(-num_rows // TR), 1)
    slab = uniq_slab.reshape(c, uc, f)
    rows = edge_meta[:, 0, :]  # [C, EC]
    lids = edge_meta[:, 1, :]
    msgs = jnp.take_along_axis(slab, lids[..., None], axis=1)  # [C, EC, F]
    msgs = msgs.astype(jnp.float32)
    if weighted:
        w = jax.lax.bitcast_convert_type(edge_meta[:, 2, :], jnp.float32)
        msgs = msgs * w[..., None]
    valid = rows >= 0
    rglobal = jnp.where(valid, chunk_tile[:, None] * TR + rows,
                        num_tiles * TR)
    out = jnp.zeros((num_tiles * TR, f), jnp.float32)
    out = out.at[rglobal.reshape(-1)].add(
        jnp.where(valid[..., None], msgs, 0.0).reshape(-1, f), mode='drop')
    return out[:num_rows]


@partial(jax.jit, static_argnums=(5, 6, 7, 8))
def _dedup_sum_xla_hot(uniq_slab, edge_meta, chunk_tile, hot_w, hot_slab,
                       num_rows: int, ec: int, uc: int, weighted: bool):
    num_tiles = max(-(-num_rows // TR), 1)
    out = _dedup_sum_xla(uniq_slab, edge_meta, chunk_tile,
                         num_tiles * TR, ec, uc, weighted)
    # HIGHEST: default-precision f32 dots truncate operands to bf16 on
    # backends with bf16-native MXUs, silently breaking the f32 contract
    # the Pallas kernel keeps via hi/lo splits (advisor round-4 finding).
    out = out + jnp.matmul(hot_w.astype(jnp.float32),
                           hot_slab.astype(jnp.float32),
                           precision=jax.lax.Precision.HIGHEST)
    return out[:num_rows]


def dedup_plan_apply(x: jax.Array, plan: DedupSpmmPlan,
                     interpret: Optional[bool] = None,
                     precision: Optional[str] = None) -> jax.Array:
    """``out[r] = Σ_{e in row r} w_e · x[col[e]]`` via the dedup schedule.

    One unique-slab gather + the expansion kernel (plus, for two-level
    plans, one hot-slab gather + the resident-slab contraction).
    ``precision`` matches ``spmm_plan_apply``: ``'bf16'`` streams the
    slabs in bfloat16, ``'int8'`` quantises them per feature column
    (dequantisation commutes with the weighted sum exactly as with the
    plain sum).
    """
    scale = None
    if precision == 'int8':
        if x.dtype == jnp.int8:
            xm = x
        else:
            xm, scale = quantize_columns(x)
    elif precision == 'bf16' and x.dtype != jnp.bfloat16:
        xm = x.astype(jnp.bfloat16)
    else:
        xm = x
    slab = jnp.take(xm, plan.uniq_cols, axis=0)
    use_xla = interpret is None and jax.default_backend() != 'tpu'
    if plan.num_hot:
        hot_slab = jnp.take(xm, plan.hot_cols, axis=0)
        if use_xla:
            out = _dedup_sum_xla_hot(slab, plan.edge_meta, plan.chunk_tile,
                                     plan.hot_w, hot_slab, plan.num_rows,
                                     plan.ec, plan.uc, plan.weighted)
        else:
            out = _dedup_sum_tpu_hot(slab, plan.edge_meta, plan.chunk_tile,
                                     plan.hot_w, hot_slab, plan.num_rows,
                                     plan.ec, plan.uc, plan.weighted,
                                     bool(interpret))
    elif use_xla:
        out = _dedup_sum_xla(slab, plan.edge_meta, plan.chunk_tile,
                             plan.num_rows, plan.ec, plan.uc, plan.weighted)
    else:
        out = _dedup_sum_tpu(slab, plan.edge_meta, plan.chunk_tile,
                             plan.num_rows, plan.ec, plan.uc, plan.weighted,
                             bool(interpret))
    if precision == 'int8':
        if scale is None:
            return out  # raw sums of caller-quantised values
        return (out * scale[None, :]).astype(x.dtype)
    return out.astype(x.dtype)
