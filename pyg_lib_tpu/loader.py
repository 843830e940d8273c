"""Async mini-batch loader: host sampling pipeline feeding the device.

SURVEY.md §7 hard part 6 — the reference has no loader (PyG's lives in
torch_geometric); on TPU the host loop must sample at ~10⁶ nodes/s and
keep the chip fed.  Design:

* a thread pool runs ``neighbor_sample`` (the C++ engine releases the GIL
  during the ctypes call, so workers genuinely overlap) + padding + host
  feature slicing,
* a bounded in-flight window of futures gives pipelined lookahead,
* finished batches are shipped with ``jax.device_put`` (async) one step
  ahead of consumption, so the transfer of batch ``i+1`` overlaps the
  device step on batch ``i``.

Every batch has identical shapes (static padding budget), so the consumer's
jitted step function never retraces.
"""

from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional

import numpy as np

from pyg_lib_tpu import sampler
from pyg_lib_tpu.sampler.padding import (BudgetExceeded, bucket_ladder,
                                         budget_for, pad_sample_output)

__all__ = ['NeighborLoader', 'HeteroNeighborLoader',
           'DistNeighborLoader']


class NeighborLoader:
    """Iterable over fixed-shape device mini-batches.

    Args:
        rowptr, col: graph CSR (host numpy).
        x: ``[N, F]`` host features (numpy); sliced per batch.
        y: ``[N]`` host labels (numpy); sliced per batch.
        seeds: ``[S]`` seed node ids to iterate over (one epoch).
        batch_size: seeds per mini-batch.
        num_neighbors: per-hop fanouts (all >= 0 for a static budget).
        max_nodes / max_edges: explicit padding budget.  When given, they
            become the FIRST bucket; the worst-case budget is appended
            as the overflow bucket, so no edge is ever dropped.  When
            omitted, the base bucket is sized from measured statistics:
            a few probe batches are sampled at construction and the
            observed max (x ``probe_margin``) becomes the base — the
            worst case for [25,10]-style fanouts is ~26x a typical batch
            (SURVEY.md §7 hard part 1), so probing routinely saves >20x
            batch memory.  Each bucket is one compiled step shape;
            realistic runs stay in the base bucket (see
            ``bucket_counts``).
        buckets: explicit list of ``(max_nodes, max_edges)`` pairs
            (ascending) overriding the ladder entirely.
        num_workers: sampling threads.
        lookahead: batches in flight ahead of the consumer.
        rng: base seed; batch ``i`` of epoch ``e`` uses stream
            ``rng + e * num_batches + i`` (fully reproducible).
        device: optional JAX device / sharding passed to ``device_put``.
        drop_last: drop the final ragged batch (default True — keeps the
            batch dimension static).
        sample_kwargs: forwarded to ``neighbor_sample``.
    """

    def __init__(self, rowptr, col, x, y, seeds, batch_size: int,
                 num_neighbors: List[int],
                 max_nodes: Optional[int] = None,
                 max_edges: Optional[int] = None,
                 buckets: Optional[List] = None,
                 probe_margin: float = 1.25, num_workers: int = 2,
                 lookahead: int = 2, rng: int = 0, device=None,
                 drop_last: bool = True, **sample_kwargs):
        self.rowptr = np.ascontiguousarray(rowptr, np.int64)
        self.col = np.ascontiguousarray(col, np.int64)
        self.x = np.asarray(x)
        self.y = None if y is None else np.asarray(y)
        self.seeds = np.asarray(seeds, np.int64)
        self.batch_size = batch_size
        self.num_neighbors = list(num_neighbors)
        self.sample_kwargs = sample_kwargs
        if buckets is not None:
            # Explicit ladder: the caller owns the lossless-final-rung
            # guarantee (required for full-fanout loaders, whose worst
            # case is the whole graph).
            self.buckets = [tuple(b) for b in buckets]
        else:
            worst = budget_for(batch_size, self.num_neighbors, slack=1.0)
            if max_nodes is not None or max_edges is not None:
                self.buckets = bucket_ladder(max_nodes or worst[0],
                                             max_edges or worst[1], *worst)
            else:
                self.buckets = bucket_ladder(
                    *self._probe_budget(probe_margin), *worst)
        # Overflow observability: batches padded per bucket.
        self.bucket_counts = [0] * len(self.buckets)
        self.max_nodes, self.max_edges = self.buckets[-1]
        self.num_workers = num_workers
        self.lookahead = max(lookahead, 1)
        self.rng = rng
        self.device = device
        self.drop_last = drop_last
        self.sample_kwargs = sample_kwargs
        self._epoch = 0
        self._in_epoch = None

    def __len__(self) -> int:
        s = len(self.seeds)
        return s // self.batch_size if self.drop_last else -(
            -s // self.batch_size)

    def _probe_budget(self, margin: float):
        """Sample a few UNPADDED probe batches to size the base bucket
        (slack < 1.0 relative to the worst case, measured not guessed)."""
        rng = np.random.default_rng(0x9E3779B9)
        mn, me = 1, 1
        for _ in range(4):
            ids = rng.choice(len(self.seeds),
                             size=min(self.batch_size, len(self.seeds)),
                             replace=False)
            out = sampler.neighbor_sample(
                self.rowptr, self.col, self.seeds[ids], self.num_neighbors,
                rng=int(rng.integers(2**63)), **self.sample_kwargs)
            mn = max(mn, len(out[2]))
            me = max(me, len(out[0]))
        return int(mn * margin), int(me * margin)

    def _pad_to_bucket(self, out, num_seeds: int, disjoint: bool):
        """Pad into the smallest bucket that fits; overflow falls through
        to the next rung (last rung = worst case, so nothing is ever
        dropped). Returns the padded batch."""
        for bi, (bn, be) in enumerate(self.buckets):
            try:
                b = pad_sample_output(out, bn, be, num_seeds=num_seeds,
                                      disjoint=disjoint)
            except BudgetExceeded:
                continue
            self.bucket_counts[bi] += 1
            return b
        raise BudgetExceeded(  # unreachable: last bucket is worst-case
            f'sample exceeds even the worst-case bucket {self.buckets[-1]}')

    def _make_batch(self, seed_ids: np.ndarray, stream: int) -> Dict:
        out = sampler.neighbor_sample(self.rowptr, self.col, seed_ids,
                                      self.num_neighbors, rng=stream,
                                      **self.sample_kwargs)
        b = self._pad_to_bucket(out, len(seed_ids),
                                self.sample_kwargs.get('disjoint', False))
        nodes = b.node_id
        batch = {
            'x': self.x[nodes],
            'rowptr': b.rowptr,
            'row': b.row,
            'col': b.col,
            'node_mask': b.node_mask,
            'num_seeds': np.int32(len(seed_ids)),
        }
        if b.batch is not None:
            batch['batch'] = b.batch
        if self.y is not None:
            batch['y'] = self.y[nodes]  # consumer slices seeds / masks pads
        return batch

    def state_dict(self) -> Dict:
        """Loader position for checkpointing (epoch granularity: the next
        ``__iter__`` after :meth:`load_state_dict` replays the exact
        permutation and sample streams the pre-checkpoint run would have
        used — streams are pure functions of ``(rng, epoch, batch)``).

        A checkpoint taken MID-epoch records the epoch in progress, so
        resume REPLAYS that epoch from its start (its early batches run
        twice; none of its tail is silently dropped). Checkpoints at
        epoch boundaries resume at the next epoch exactly."""
        epoch = self._in_epoch if self._in_epoch is not None else \
            self._epoch
        return {'epoch': int(epoch), 'rng': int(self.rng)}

    def load_state_dict(self, state: Dict) -> None:
        if int(state.get('rng', self.rng)) != int(self.rng):
            raise ValueError(
                f"loader state has rng={state.get('rng')}, this loader "
                f'was built with rng={self.rng}; resume with the same '
                'base seed for reproducible streams')
        self._epoch = int(state['epoch'])
        self._in_epoch = None

    def __iter__(self) -> Iterator[Dict]:
        import jax

        epoch = self._epoch
        self._epoch += 1
        self._in_epoch = epoch
        order = np.random.default_rng(self.rng + 7919 * epoch).permutation(
            len(self.seeds))
        nb = len(self)
        batches = [
            self.seeds[order[i * self.batch_size:(i + 1) * self.batch_size]]
            for i in range(nb)
        ]

        def put(host_batch):
            if self.device is not None:
                return jax.device_put(host_batch, self.device)
            return jax.device_put(host_batch)

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            futures = []
            submitted = 0

            def submit_next():
                nonlocal submitted
                if submitted < nb:
                    stream = self.rng + epoch * nb + submitted
                    futures.append(
                        pool.submit(self._make_batch, batches[submitted],
                                    stream))
                    submitted += 1

            for _ in range(self.lookahead + 1):
                submit_next()

            staged = None  # device batch one step ahead
            while futures or staged is not None:
                if futures:
                    host = futures.pop(0).result()
                    submit_next()
                    nxt = put(host)  # async H2D transfer
                else:
                    nxt = None
                if staged is not None:
                    yield staged
                staged = nxt
        self._in_epoch = None  # epoch fully consumed


class HeteroNeighborLoader:
    """Async hetero mini-batch loader (R-GCN layout).

    Same pipeline as :class:`NeighborLoader` — thread-pool C++ hetero
    sampling, fixed-shape :class:`PaddedHeteroBatch` flattening, async
    ``device_put`` one step ahead — over per-edge-type CSR dicts.

    Args:
        rowptr_dict / col_dict: per-edge-type CSR (host numpy).
        x_dict: node-type -> [N_t, F] host features (a shared F).
        seed_type / seeds: seed node type and ids for one epoch.
        num_neighbors_dict: per-edge-type fanouts.
        node_budgets / max_edges: static padding budgets.
    """

    def __init__(self, rowptr_dict, col_dict, x_dict, y_dict, seed_type,
                 seeds, batch_size: int, num_neighbors_dict,
                 node_budgets: Dict[str, int], max_edges: int,
                 num_workers: int = 2, lookahead: int = 2, rng: int = 0,
                 device=None, drop_last: bool = True, **sample_kwargs):
        from pyg_lib_tpu.sampler.padding import pad_hetero_sample_output

        self._pad = pad_hetero_sample_output
        self.rowptr_dict = {k: np.ascontiguousarray(v, np.int64)
                            for k, v in rowptr_dict.items()}
        self.col_dict = {k: np.ascontiguousarray(v, np.int64)
                         for k, v in col_dict.items()}
        self.x_dict = {t: np.asarray(v) for t, v in x_dict.items()}
        self.y_dict = (None if y_dict is None else
                       {t: np.asarray(v) for t, v in y_dict.items()})
        self.seed_type = seed_type
        self.seeds = np.asarray(seeds, np.int64)
        self.batch_size = batch_size
        self.num_neighbors_dict = {k: list(v)
                                   for k, v in num_neighbors_dict.items()}
        self.node_budgets = dict(node_budgets)
        self.max_edges = max_edges
        self.num_workers = num_workers
        self.lookahead = max(lookahead, 1)
        self.rng = rng
        self.device = device
        self.drop_last = drop_last
        self.sample_kwargs = sample_kwargs
        self._epoch = 0
        self._in_epoch = None

    def __len__(self) -> int:
        s = len(self.seeds)
        return s // self.batch_size if self.drop_last else -(
            -s // self.batch_size)

    def _make_batch(self, seed_ids: np.ndarray, stream: int) -> Dict:
        from pyg_lib_tpu import sampler as S

        out = S.hetero_neighbor_sample(self.rowptr_dict, self.col_dict,
                                       {self.seed_type: seed_ids},
                                       self.num_neighbors_dict, rng=stream,
                                       **self.sample_kwargs)
        b = self._pad(out, self.node_budgets, self.max_edges,
                      csc=self.sample_kwargs.get('csc', False),
                      disjoint=self.sample_kwargs.get('disjoint', False))
        first = next(iter(self.x_dict.values()))
        feat_dim = first.shape[1]
        n_flat = b.num_flat_nodes
        x = np.zeros((n_flat, feat_dim), first.dtype)
        for t, off in b.type_offset.items():
            bt = self.node_budgets[t]
            x[off:off + bt] = self.x_dict[t][b.node_id[t]]
        batch = {
            'x': x,
            'row': b.row,
            'col': b.col,
            'rel_ptr': b.rel_ptr,
            'edge_mask': b.edge_mask,
            'node_mask': np.concatenate(
                [b.node_mask[t] for t in b.type_offset]),
            'num_seeds': np.int32(len(seed_ids)),
        }
        if b.batch and all(v is not None for v in b.batch.values()):
            batch['batch'] = np.concatenate(
                [b.batch[t] for t in b.type_offset])
        if self.y_dict is not None and self.seed_type in self.y_dict:
            off = b.type_offset[self.seed_type]
            batch['y'] = self.y_dict[self.seed_type][b.node_id[
                self.seed_type]]
            batch['seed_offset'] = np.int32(off)
        return batch

    # Reuse NeighborLoader's pipelined iteration/state verbatim.
    __iter__ = NeighborLoader.__iter__
    state_dict = NeighborLoader.state_dict
    load_state_dict = NeighborLoader.load_state_dict


class DistNeighborLoader(NeighborLoader):
    """:class:`NeighborLoader` over a PARTITIONED graph: every batch runs
    the distributed protocol (sample -> merge -> relabel through
    :class:`pyg_lib_tpu.sampler.dist_service.DistNeighborSampler`)
    instead of the local sampler — same padded-batch contract and the
    same async double-buffered host->device pipeline, so a training loop
    is oblivious to which sampler produced its batches (the multi-host
    story of SURVEY.md §3.5 behind the single-host loader interface).

    Batch ``i`` of epoch ``e`` uses an independent coordinator seeded
    with its stream id, so batches are reproducible regardless of worker
    scheduling.
    """

    def __init__(self, graph, x, y, seeds, batch_size: int,
                 num_neighbors: List[int], replace: bool = False,
                 impl: str = 'auto', **kw):
        from pyg_lib_tpu.sampler.dist_service import DistGraph

        if not isinstance(graph, DistGraph):
            raise TypeError('DistNeighborLoader needs a DistGraph '
                            '(see sampler.dist_service.partition_graph)')
        if ('max_nodes' not in kw and 'max_edges' not in kw
                and 'buckets' not in kw):
            # The base-class probe would sample the dummy local CSR below;
            # default to the worst-case single bucket instead (callers
            # wanting a ladder pass explicit budgets/buckets).
            kw['max_nodes'], kw['max_edges'] = budget_for(
                batch_size, list(num_neighbors), slack=1.0)
        super().__init__(np.zeros(1, np.int64), np.zeros(0, np.int64), x,
                         y, seeds, batch_size, num_neighbors, **kw)
        self._graph = graph
        self._replace = replace
        self._impl = impl

    def _make_batch(self, seed_ids: np.ndarray, stream: int) -> Dict:
        from pyg_lib_tpu.sampler.dist_service import DistNeighborSampler

        ds = DistNeighborSampler(self._graph, rng=stream,
                                 replace=self._replace, impl=self._impl)
        row, col, node_id, nph = ds.sample(seed_ids, self.num_neighbors)
        b = self._pad_to_bucket((row, col, node_id, None, nph, []),
                                len(seed_ids), disjoint=False)
        nodes = b.node_id
        batch = {
            'x': self.x[nodes],
            'rowptr': b.rowptr,
            'row': b.row,
            'col': b.col,
            'node_mask': b.node_mask,
            'num_seeds': np.int32(len(seed_ids)),
        }
        if self.y is not None:
            batch['y'] = self.y[nodes]
        return batch
