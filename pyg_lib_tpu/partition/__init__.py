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
    'metis',
    'edge_cut', 'mesh_edge_partition', 'EdgePartition',
    'mesh_edge_partition_blocked', 'BlockedEdgePartition',
]


def edge_cut(rowptr, col, part, edge_weight=None) -> float:
    """Total weight of edges crossing partitions (each direction counted
    once as stored) — the quantity ``metis`` minimises."""
    rowptr = np.asarray(rowptr)
    col = np.asarray(col)
    part = np.asarray(part)
    row = np.repeat(np.arange(len(rowptr) - 1), np.diff(rowptr))
    crossing = part[row] != part[col]
    if edge_weight is None:
        return float(crossing.sum())
    return float(np.asarray(edge_weight)[crossing].sum())


def _grow(rowptr, col, nw, k, rng, nodes=None, targets=None):
    """Balanced multi-source BFS region growing over ``nodes`` (or all).

    ``targets`` optionally gives per-part weight targets (default equal
    shares) — recursive bisection needs PROPORTIONAL targets when the
    two sides must host unequal partition counts (odd k)."""
    from collections import deque

    n = len(rowptr) - 1
    sub = np.arange(n) if nodes is None else np.asarray(nodes)
    in_sub = np.zeros(n, bool)
    in_sub[sub] = True
    if targets is None:
        targets = np.full(k, nw[sub].sum() / k)
    part = np.full(n, -1, np.int64)
    load = np.zeros(k)
    seeds = rng.choice(sub, size=min(k, len(sub)), replace=False)
    queues = [deque([int(s)]) for s in seeds]
    for p, s in enumerate(seeds):
        part[s] = p
        load[p] = nw[s]
    active = True
    while active:
        active = False
        for p in range(k):
            if load[p] >= targets[p] or not queues[p]:
                continue
            v = queues[p].popleft()
            active = True
            for e in range(rowptr[v], rowptr[v + 1]):
                w = int(col[e])
                if in_sub[w] and part[w] < 0:
                    part[w] = p
                    load[p] += nw[w]
                    queues[p].append(w)
            if queues[p]:
                active = True
    for v in sub[part[sub] < 0]:
        p = int(np.argmin(load / np.maximum(targets, 1e-12)))
        part[v] = p
        load[p] += nw[v]
    return part[sub], load


def _refine(rowptr, col, nw, ew, part, k, passes=2, balance=1.05):
    """Greedy boundary refinement: move a node to the partition holding
    most of its (weighted) incident edges when balance permits — a
    single-sweep Kernighan–Lin flavour that also gives ``edge_weight``
    its METIS meaning (weighted cut minimisation)."""
    n = len(rowptr) - 1
    row = np.repeat(np.arange(n), np.diff(rowptr))
    load = np.bincount(part, weights=nw, minlength=k)
    cap = nw.sum() / k * balance
    for _ in range(passes):
        moved = 0
        # Per-node per-partition incident edge weight (vectorised).
        gain = np.zeros((n, k))
        np.add.at(gain, (row, part[col]), ew)
        best = gain.argmax(1)
        for v in np.nonzero(best != part)[0]:
            p_old, p_new = int(part[v]), int(best[v])
            if gain[v, p_new] <= gain[v, p_old]:
                continue
            if load[p_new] + nw[v] > cap:
                continue
            part[v] = p_new
            load[p_old] -= nw[v]
            load[p_new] += nw[v]
            moved += 1
        if not moved:
            break
    return part


def metis(rowptr, col, num_partitions: int, node_weight=None,
          edge_weight=None, recursive: bool = False,
          seed: int = 0) -> np.ndarray:
    """Partitions a graph into ``num_partitions`` parts, minimising
    (weighted) edge cut.  API parity: reference ``pyg_lib.partition.metis``
    (``pyg_lib/partition/__init__.py:7-39``).

    Implementation: balanced multi-source BFS region growing + greedy
    boundary refinement — not METIS itself (the reference's vendored
    METIS is explicitly replaced per BASELINE.json "north_star").
    ``recursive=True`` selects recursive bisection like METIS's
    ``PartGraphRecursive`` (repeated 2-way growth), ``False`` direct
    k-way. Cut quality is measured against a random-partition baseline in
    ``tests/test_classes_partition.py``; :func:`edge_cut` reports it.
    """
    rowptr = np.asarray(rowptr)
    col = np.asarray(col)
    n = len(rowptr) - 1
    nw = (np.ones(n) if node_weight is None else np.asarray(
        node_weight, np.float64))
    ew = (np.ones(len(col)) if edge_weight is None else np.asarray(
        edge_weight, np.float64))
    k = num_partitions
    if k <= 1:
        return np.zeros(n, np.int64)
    rng = np.random.default_rng(seed)

    if recursive and k > 2:
        # Recursive bisection: split k into halves with proportional
        # weight targets, recurse on each side's induced node set.
        part = np.zeros(n, np.int64)

        def bisect(nodes, k_lo, k_hi, offset):
            if k_hi - k_lo == 1:
                part[nodes] = offset
                return
            mid = (k_lo + k_hi) // 2
            # Proportional weight targets: odd k puts more partitions
            # (hence more weight) on one side; a 50/50 bisection would
            # leave that side's partitions ~2x overloaded.
            w = nw[nodes].sum()
            frac = (mid - k_lo) / (k_hi - k_lo)
            sub_part, _ = _grow(rowptr, col, nw, 2, rng, nodes,
                                targets=np.array([frac, 1.0 - frac]) * w)
            left = nodes[sub_part == 0]
            right = nodes[sub_part == 1]
            bisect(left, k_lo, mid, offset)
            bisect(right, mid, k_hi, offset + (mid - k_lo))

        bisect(np.arange(n), 0, k, 0)
    else:
        part, _ = _grow(rowptr, col, nw, k, rng)
    return _refine(rowptr, col, nw, ew, part, k)


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
