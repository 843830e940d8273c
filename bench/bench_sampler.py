"""Host-sampler benchmarks: sampled nodes/s and edges/s per host.

Counterpart of the reference sampler benchmarks
(reference ``benchmark/sampler/neighbor.py:15-120`` and
``benchmark/sampler/hetero_neighbor.py:16-60``) on a synthetic power-law
graph (no network access for DIMACS10/OGB — BASELINE.md).  Prints one JSON
line per configuration.

Run: ``python bench/bench_sampler.py``
"""

import json
import time

import numpy as np

from pyg_lib_tpu import sampler
from pyg_lib_tpu.datasets import powerlaw_graph


def bench_homo(rowptr, col, batch_size, fanouts, iters=20, **kw):
    rng = np.random.default_rng(0)
    n = len(rowptr) - 1
    # Warmup: first-touch page faults on this VM run at ~15 MB/s, so let
    # the allocator arenas fault in before timing.
    for i in range(2):
        sampler.neighbor_sample(rowptr, col,
                                rng.choice(n, size=batch_size,
                                           replace=False), fanouts,
                                rng=1000 + i, **kw)
    total_nodes = 0
    total_edges = 0
    start = time.perf_counter()
    for i in range(iters):
        seed = rng.choice(n, size=batch_size, replace=False)
        out = sampler.neighbor_sample(rowptr, col, seed, fanouts, rng=i,
                                      **kw)
        total_nodes += len(out[2])
        total_edges += len(out[0])
    elapsed = time.perf_counter() - start
    return total_nodes / elapsed, total_edges / elapsed


def main():
    rowptr, col = powerlaw_graph(num_nodes=1_000_000, avg_degree=15, seed=0)
    ew = np.random.default_rng(1).uniform(0.1, 1.0,
                                          size=len(col)).astype(np.float64)

    configs = [
        ('uniform', dict()),
        ('replace', dict(replace=True)),
        ('disjoint', dict(disjoint=True)),
        ('biased', dict(edge_weight=ew)),
    ]
    for name, kw in configs:
        nps, eps = bench_homo(rowptr, col, 1024, [15, 10, 5], **kw)
        print(json.dumps({
            'metric': f'neighbor_sample_{name}',
            'value': round(nps / 1e6, 3),
            'unit': 'Mnodes/s',
            'edges_per_s': round(eps / 1e6, 3),
        }))

    # Hetero: 3 edge types over 2 node types.
    rp1, c1 = powerlaw_graph(num_nodes=300_000, avg_degree=10, seed=1)
    rp2, c2 = powerlaw_graph(num_nodes=300_000, avg_degree=5, seed=2)
    rowptr_d = {
        ('paper', 'cites', 'paper'): rp1,
        ('paper', 'has', 'author'): rp2,
        ('author', 'writes', 'paper'): rp2,
    }
    col_d = {
        ('paper', 'cites', 'paper'): c1,
        ('paper', 'has', 'author'): np.minimum(c2, 299_999),
        ('author', 'writes', 'paper'): np.minimum(c2, 299_999),
    }
    rng = np.random.default_rng(3)
    for i in range(2):  # warmup: graph flatten cache + page faults
        sampler.hetero_neighbor_sample(
            rowptr_d, col_d,
            {'paper': rng.choice(300_000, size=1024, replace=False)},
            {k: [10, 5] for k in rowptr_d}, rng=1000 + i)
    total_nodes = 0
    iters = 10
    start = time.perf_counter()
    for i in range(iters):
        seed = {'paper': rng.choice(300_000, size=1024, replace=False)}
        out = sampler.hetero_neighbor_sample(
            rowptr_d, col_d, seed, {k: [10, 5] for k in rowptr_d}, rng=i)
        total_nodes += sum(len(v) for v in out[2].values())
    elapsed = time.perf_counter() - start
    print(json.dumps({
        'metric': 'hetero_neighbor_sample',
        'value': round(total_nodes / elapsed / 1e6, 3),
        'unit': 'Mnodes/s',
    }))





def bench_graph_ops():
    rowptr, col = powerlaw_graph(num_nodes=1_000_000, avg_degree=15, seed=4)
    rng = np.random.default_rng(5)

    # induced subgraph on 1% of nodes (reference benchmark/sampler/subgraph.py)
    nodes = np.sort(rng.choice(1_000_000, size=10_000, replace=False))
    sampler.subgraph(rowptr, col, nodes)  # warmup
    start = time.perf_counter()
    iters = 10
    for _ in range(iters):
        sampler.subgraph(rowptr, col, nodes)
    dt = (time.perf_counter() - start) / iters
    print(json.dumps({'metric': 'subgraph_1pct', 'value': round(dt * 1e3, 2),
                      'unit': 'ms'}))

    # random walks (reference sampler/random_walk benchmarks)
    seeds = rng.choice(1_000_000, size=10_000, replace=False)
    sampler.random_walk(rowptr, col, seeds, walk_length=20, rng=0)
    start = time.perf_counter()
    for i in range(iters):
        sampler.random_walk(rowptr, col, seeds, walk_length=20, rng=i)
    dt = (time.perf_counter() - start) / iters
    steps = 10_000 * 20
    print(json.dumps({'metric': 'random_walk', 'value':
                      round(steps / dt / 1e6, 2), 'unit': 'Msteps/s'}))


if __name__ == '__main__':
    main()
    bench_graph_ops()
