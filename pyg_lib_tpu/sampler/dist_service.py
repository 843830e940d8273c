"""Distributed neighbor-sampling service + partition-book feature fetch.

The reference ships only the protocol kernels (sample/merge/relabel —
``pyg_lib/csrc/sampler/neighbor.cpp:99-127``,
``csrc/sampler/cpu/dist_merge_outputs_kernel.cpp``,
``csrc/sampler/cpu/dist_relabel_kernel.cpp``); the orchestration lives in
PyG's ``torch_geometric.distributed`` with TensorPipe RPC. The TPU-native
equivalent (SURVEY.md §3.5): each host runs this sampler over its graph
partition as plain function calls (the per-partition call IS the service
body — swap in an RPC/queue transport for multi-host), and the feature
fetch is a DEVICE collective over the ICI mesh keyed by the partition
book, replacing RPC feature stores.

Single-process testing mirrors the reference strategy: the protocol is
pure functions, so the coordinator loop runs all partitions in-process
(reference ``test/csrc/sampler/test_dist_neighbor.cpp``), and the device
collective runs on a virtual CPU mesh (``tests/conftest.py``).
"""

from typing import List, NamedTuple, Optional, Tuple

import numpy as np

from pyg_lib_tpu.sampler.dist import (
    dist_neighbor_sample,
    merge_sampler_outputs,
    relabel_neighborhood,
)

__all__ = [
    'PartitionBook', 'DistGraph', 'partition_graph',
    'DistNeighborSampler', 'collective_feature_fetch',
]


class PartitionBook(NamedTuple):
    """Range partition book: node ``v`` belongs to partition
    ``searchsorted(bounds, v, 'right') - 1``. (The reference delegates
    partitioning to METIS + PyG's ``LocalGraphStore`` partition book;
    contiguous ranges keep the device-side owner computation a single
    subtract/compare — reorder with ``pyg_lib_tpu.partition.metis`` first
    for locality.)"""
    bounds: np.ndarray  # [P+1] int64

    @property
    def num_partitions(self) -> int:
        return len(self.bounds) - 1

    def owner(self, ids: np.ndarray) -> np.ndarray:
        return (np.searchsorted(self.bounds, np.asarray(ids), 'right') -
                1).astype(np.int64)


class DistGraph(NamedTuple):
    """Node-partitioned CSR: partition ``p`` owns rows
    ``[bounds[p], bounds[p+1])`` and stores their out-edges with GLOBAL
    column ids (the reference's per-partition ``LocalGraphStore`` holds
    the same local-rows/global-cols layout)."""
    book: PartitionBook
    rowptr_parts: Tuple[np.ndarray, ...]
    col_parts: Tuple[np.ndarray, ...]
    num_nodes: int


def partition_graph(rowptr, col, num_partitions: int) -> DistGraph:
    """Split a global CSR into ``num_partitions`` contiguous row ranges."""
    rowptr = np.asarray(rowptr, dtype=np.int64)
    col = np.asarray(col, dtype=np.int64)
    n = len(rowptr) - 1
    bounds = np.linspace(0, n, num_partitions + 1).astype(np.int64)
    rps, cls = [], []
    for p in range(num_partitions):
        lo, hi = int(bounds[p]), int(bounds[p + 1])
        rps.append(rowptr[lo:hi + 1] - rowptr[lo])
        cls.append(col[rowptr[lo]:rowptr[hi]])
    return DistGraph(book=PartitionBook(bounds=bounds),
                     rowptr_parts=tuple(rps), col_parts=tuple(cls),
                     num_nodes=n)


class DistNeighborSampler:
    """Coordinator for the sample -> merge -> relabel protocol loop.

    Each hop: frontier nodes are grouped by owning partition, every
    partition samples ONE hop without relabeling
    (:func:`dist_neighbor_sample` — its call boundary is where an RPC
    would sit on a multi-host deployment), outputs are stitched back into
    frontier order (:func:`merge_sampler_outputs`), and after the last
    hop one global->local relabel produces the final (row, col, node_id)
    exactly like the single-machine sampler (reference protocol,
    SURVEY.md §3.5).
    """

    def __init__(self, graph: DistGraph, rng: int = 0, replace: bool = False,
                 impl: str = 'auto'):
        self.graph = graph
        self.rng = rng
        self.replace = replace
        self.impl = impl
        self._step = 0

    def _sample_partition(self, p: int, seeds: np.ndarray,
                          num_neighbors: int, rng_seed: int):
        """One partition's service call (local seeds -> one hop)."""
        lo = int(self.graph.book.bounds[p])
        local = seeds - lo
        nodes, eids, cumsum = dist_neighbor_sample(
            self.graph.rowptr_parts[p], self.graph.col_parts[p], local,
            num_neighbors, replace=self.replace, rng=rng_seed,
            impl=self.impl)
        # Local seeds echo first in `nodes`; cols are already global.
        nodes = nodes.copy()
        nodes[:len(seeds)] += lo
        # Edge ids localize per partition; globalize with the edge offset.
        return nodes, eids, cumsum

    def sample(self, seeds: np.ndarray, fanouts: List[int]):
        """Multi-hop sampling; returns ``(row, col, node_id,
        num_sampled_nodes_per_hop)`` with local contiguous ids."""
        seeds = np.asarray(seeds, dtype=np.int64)
        frontier = seeds
        sampled_with_dupes: List[np.ndarray] = []
        counts_per_node: List[int] = []
        nodes_per_hop = [len(seeds)]
        for hop, fanout in enumerate(fanouts):
            owner = self.graph.book.owner(frontier)
            per_part_nodes, per_part_eids, per_part_cumsum = [], [], []
            partition_ids = owner
            partition_orders = np.zeros(len(frontier), np.int64)
            for p in range(self.graph.book.num_partitions):
                mask = owner == p
                partition_orders[mask] = np.arange(int(mask.sum()))
                if not mask.any():
                    per_part_nodes.append(np.zeros(0, np.int64))
                    per_part_eids.append(np.zeros(0, np.int64))
                    per_part_cumsum.append(np.zeros(1, np.int64))
                    continue
                rng_seed = (self.rng * 1_000_003 + self._step * 101 +
                            hop * 7919 + p)
                nodes, eids, cumsum = self._sample_partition(
                    p, frontier[mask], fanout, rng_seed)
                per_part_nodes.append(nodes)
                per_part_eids.append(eids)
                per_part_cumsum.append(cumsum)
            merged_nodes, _, _, counts = merge_sampler_outputs(
                per_part_nodes, per_part_eids, per_part_cumsum,
                partition_ids, partition_orders,
                self.graph.book.num_partitions, fanout)
            sampled_with_dupes.append(merged_nodes)
            counts_per_node.extend(counts)
            frontier = merged_nodes
            nodes_per_hop.append(len(merged_nodes))
        self._step += 1
        all_sampled = (np.concatenate(sampled_with_dupes)
                       if sampled_with_dupes else np.zeros(0, np.int64))
        row, col = relabel_neighborhood(seeds, all_sampled, counts_per_node,
                                        self.graph.num_nodes)
        # node_id = unique nodes in first-seen order (seed-first), exactly
        # the mapper order relabel used.
        seen = {}
        for v in np.concatenate([seeds, all_sampled]):
            if int(v) not in seen:
                seen[int(v)] = len(seen)
        node_id = np.fromiter(seen.keys(), np.int64, len(seen))
        return row, col, node_id, nodes_per_hop


def collective_feature_fetch(mesh, x_sharded, ids, axis: str = 'data'):
    """Device-side feature fetch keyed by the (range) partition book.

    ``x_sharded``: ``[P * n_local, F]`` node features row-sharded over
    ``axis`` (equal shards — pad the node count). ``ids``: ``[B]`` global
    node ids (replicated; pad slots may point anywhere). Every device
    computes its owned rows' contribution and a ``psum`` over ICI
    delivers the full ``[B, F]`` batch to all devices — the TPU-native
    replacement for the reference's RPC feature store (SURVEY.md §3.5).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    def local(x_shard, ids):
        p = jax.lax.axis_index(axis)
        n_local = x_shard.shape[0]
        lo = p * n_local
        loc = jnp.clip(ids - lo, 0, n_local - 1)
        rows = jnp.take(x_shard, loc, axis=0)
        mine = ((ids >= lo) & (ids < lo + n_local))[:, None]
        return jax.lax.psum(jnp.where(mine, rows, 0.0), axis)

    return shard_map(local, mesh=mesh, in_specs=(P(axis), P()),
                     out_specs=P())(x_sharded, ids)
