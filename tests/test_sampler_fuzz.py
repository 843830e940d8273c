"""Property fuzzing of the C++ sampler against structural invariants and
the numpy specification, across the full flag matrix on random graphs.

The reference enumerates its sampler feature matrix in C++ tests
(reference ``test/csrc/sampler/test_neighbor.cpp:8-330``); here random
graphs + invariants give broader coverage per line of test code.
"""

import numpy as np
import pytest

from pyg_lib_tpu import sampler
from pyg_lib_tpu.sampler import _cpp

pytestmark = pytest.mark.skipif(_cpp.get_lib() is None,
                                reason='C++ sampler not built')


def _graph(rng, n, avg_deg, time_sorted_by=None, node_time=None):
    deg = rng.integers(0, 2 * avg_deg, size=n)
    rowptr = np.zeros(n + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    col = rng.integers(0, n, size=int(rowptr[-1])).astype(np.int64)
    if time_sorted_by == 'node':
        for v in range(n):
            lo, hi = rowptr[v], rowptr[v + 1]
            col[lo:hi] = col[lo:hi][np.argsort(node_time[col[lo:hi]],
                                               kind='stable')]
    return rowptr, col


def _check_invariants(out, rowptr, col, fanouts, num_seed, disjoint,
                      replace):
    row, c, node_id, eid, nnph, neph = out
    nodes = node_id[:, 1] if disjoint else node_id
    batches = node_id[:, 0] if disjoint else None
    assert nnph[0] == num_seed
    assert len(nnph) == len(fanouts) + 1
    assert sum(neph) == len(row) == len(c) == len(eid)
    assert sum(nnph) == len(nodes)
    for r, cc, e in zip(row, c, eid):
        assert 0 <= r < len(nodes) and 0 <= cc < len(nodes)
        assert col[e] == nodes[cc]
        lo, hi = rowptr[nodes[r]], rowptr[nodes[r] + 1]
        assert lo <= e < hi
        if disjoint:
            assert batches[r] == batches[cc]  # edges stay inside a subgraph
    if not disjoint:
        assert len(set(nodes.tolist())) == len(nodes)
    else:
        assert len({(int(b), int(v))
                    for b, v in zip(batches, nodes)}) == len(nodes)
    if not replace:
        # per (frontier position, hop): sampled edges are distinct
        begin = 0
        for ell, cnt in enumerate(fanouts):
            seen = {}
            for j in range(begin, begin + neph[ell]):
                seen.setdefault(int(row[j]), []).append(int(eid[j]))
            for r, es in seen.items():
                assert len(set(es)) == len(es)
                if cnt >= 0:
                    assert len(es) <= cnt
            begin += neph[ell]


@pytest.mark.parametrize('seed', range(6))
@pytest.mark.parametrize('replace', [False, True])
@pytest.mark.parametrize('disjoint', [False, True])
def test_fuzz_uniform(seed, replace, disjoint):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(20, 400))
    rowptr, col = _graph(rng, n, int(rng.integers(1, 8)))
    num_seed = int(rng.integers(1, min(16, n)))
    seeds = rng.choice(n, size=num_seed, replace=False)
    fanouts = rng.integers(1, 6, size=int(rng.integers(1, 4))).tolist()
    out = sampler.neighbor_sample(rowptr, col, seeds, fanouts, rng=seed,
                                  replace=replace, disjoint=disjoint,
                                  impl='cpp')
    _check_invariants(out, rowptr, col, fanouts, num_seed, disjoint,
                      replace)


@pytest.mark.parametrize('seed', range(4))
def test_fuzz_biased(seed):
    rng = np.random.default_rng(100 + seed)
    n = 150
    rowptr, col = _graph(rng, n, 6)
    ew = rng.uniform(0.01, 1.0, size=int(rowptr[-1]))
    seeds = rng.choice(n, size=8, replace=False)
    out = sampler.neighbor_sample(rowptr, col, seeds, [4, 4], rng=seed,
                                  edge_weight=ew, impl='cpp')
    _check_invariants(out, rowptr, col, [4, 4], 8, False, False)

    # zero-weight edges must never be sampled (without replacement path)
    ew2 = np.zeros(int(rowptr[-1]))
    keep = rng.random(len(ew2)) < 0.5
    ew2[keep] = 1.0
    out2 = sampler.neighbor_sample(rowptr, col, seeds, [3], rng=seed,
                                   edge_weight=ew2, impl='cpp')
    # Zero-weight edges are only drawn when a row has fewer positive-
    # weight edges than the fanout (Efraimidis-Spirakis pads with the
    # -inf keys then — same as the reference's _biased_sample).
    row, c, node_id, eid, nnph, neph = out2
    nodes = node_id
    for r, e in zip(row, eid):
        lo, hi = rowptr[nodes[r]], rowptr[nodes[r] + 1]
        if hi - lo > 3 and (ew2[lo:hi] > 0).sum() >= 3:
            assert ew2[e] > 0


@pytest.mark.parametrize('seed', range(4))
def test_fuzz_node_temporal(seed):
    rng = np.random.default_rng(200 + seed)
    n = 120
    node_time = rng.integers(0, 40, size=n).astype(np.int64)
    rowptr, col = _graph(rng, n, 5, time_sorted_by='node',
                         node_time=node_time)
    seeds = rng.choice(n, size=6, replace=False)
    seed_time = node_time[seeds] + rng.integers(0, 5, size=6)
    out = sampler.neighbor_sample(rowptr, col, seeds, [4, 4], rng=seed,
                                  disjoint=True, node_time=node_time,
                                  seed_time=seed_time, impl='cpp')
    row, c, node_id, eid, nnph, neph = out
    nodes, batches = node_id[:, 1], node_id[:, 0]
    for cc, b in zip(c, (batches[r] for r in row)):
        assert node_time[nodes[cc]] <= seed_time[int(b)]
    _check_invariants(out, rowptr, col, [4, 4], 6, True, False)


@pytest.mark.parametrize('seed', range(4))
def test_fuzz_full_neighborhood_cpp_equals_numpy(seed):
    rng = np.random.default_rng(300 + seed)
    n = int(rng.integers(10, 200))
    rowptr, col = _graph(rng, n, int(rng.integers(1, 6)))
    seeds = rng.choice(n, size=min(5, n), replace=False)
    hops = [-1] * int(rng.integers(1, 3))
    a = sampler.neighbor_sample(rowptr, col, seeds, hops, impl='cpp')
    b = sampler.neighbor_sample(rowptr, col, seeds, hops, impl='numpy')
    for x, y in zip(a[:4], b[:4]):
        np.testing.assert_array_equal(x, y)
    assert a[4] == b[4] and a[5] == b[5]


@pytest.mark.parametrize('seed', range(3))
def test_fuzz_edge_temporal(seed):
    rng = np.random.default_rng(400 + seed)
    n = 100
    rowptr, col = _graph(rng, n, 5)
    edge_time = np.zeros(int(rowptr[-1]), np.int64)
    for v in range(n):  # time-sorted per neighborhood (precondition)
        lo, hi = rowptr[v], rowptr[v + 1]
        edge_time[lo:hi] = np.sort(rng.integers(0, 50, size=hi - lo))
    seeds = rng.choice(n, size=5, replace=False)
    seed_time = rng.integers(10, 60, size=5).astype(np.int64)

    out = sampler.neighbor_sample(rowptr, col, seeds, [4, 4], rng=seed,
                                  disjoint=True, edge_time=edge_time,
                                  seed_time=seed_time, impl='cpp')
    row, c, node_id, eid, nnph, neph = out
    batches = node_id[:, 0]
    for b, e in zip((batches[r] for r in row), eid):
        assert edge_time[e] <= seed_time[int(b)]
    _check_invariants(out, rowptr, col, [4, 4], 5, True, False)


def test_fuzz_subgraph_cpp_equals_numpy_random():
    rng = np.random.default_rng(500)
    for trial in range(4):
        n = int(rng.integers(20, 300))
        rowptr, col = _graph(rng, n, int(rng.integers(1, 8)))
        nodes = np.sort(rng.choice(n, size=max(1, n // 5), replace=False))
        a = sampler.subgraph(rowptr, col, nodes, impl='auto')
        b = sampler.subgraph(rowptr, col, nodes, impl='numpy')
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])
        np.testing.assert_array_equal(a[2], b[2])


@pytest.mark.parametrize('seed', range(4))
@pytest.mark.parametrize('disjoint', [False, True])
def test_fuzz_hetero(seed, disjoint):
    rng = np.random.default_rng(600 + seed)
    n_t = {'a': int(rng.integers(20, 150)), 'b': int(rng.integers(20, 150))}
    edge_types = [('a', 'r1', 'a'), ('a', 'r2', 'b'), ('b', 'r3', 'a')]
    rowptr_d, col_d = {}, {}
    for k in edge_types:
        src_t, _, dst_t = k
        deg = rng.integers(0, 6, size=n_t[src_t])
        rp = np.zeros(n_t[src_t] + 1, np.int64)
        rp[1:] = np.cumsum(deg)
        rowptr_d[k] = rp
        col_d[k] = rng.integers(0, n_t[dst_t],
                                size=int(rp[-1])).astype(np.int64)
    n_seed = int(rng.integers(1, 10))
    seeds = {'a': rng.choice(n_t['a'], size=n_seed, replace=False)}
    nn = {k: rng.integers(1, 5, size=2).tolist() for k in edge_types}

    row, col, node_id, eid, nph, eph = sampler.hetero_neighbor_sample(
        rowptr_d, col_d, seeds, nn, rng=seed, disjoint=disjoint,
        impl='cpp')

    assert nph['a'][0] == n_seed
    for k in edge_types:
        src_t, _, dst_t = k
        nodes_src = node_id[src_t][:, 1] if disjoint else node_id[src_t]
        nodes_dst = node_id[dst_t][:, 1] if disjoint else node_id[dst_t]
        assert len(row[k]) == len(col[k]) == len(eid[k]) == sum(eph[k])
        rp, cc = rowptr_d[k], col_d[k]
        for r, c, e in zip(row[k], col[k], eid[k]):
            assert rp[nodes_src[r]] <= e < rp[nodes_src[r] + 1]
            assert cc[e] == nodes_dst[c]
            if disjoint:
                assert node_id[src_t][r, 0] == node_id[dst_t][c, 0]
    for t, ni in node_id.items():
        if disjoint:
            pairs = {(int(b), int(v)) for b, v in ni}
            assert len(pairs) == len(ni)
        else:
            assert len(set((ni.tolist()))) == len(ni)


def test_uniform_sampler_is_statistically_uniform():
    """Chi-square-style check: each neighbor of a node is drawn equally
    often across many seeds (catches biased offset generation)."""
    rowptr = np.array([0, 8], np.int64)
    col = np.arange(8, dtype=np.int64)
    counts = np.zeros(8)
    trials = 3000
    for s in range(trials):
        out = sampler.neighbor_sample(rowptr, col, np.array([0]), [2],
                                      rng=s, impl='cpp')
        for e in out[3]:
            counts[e] += 1
    freq = counts / counts.sum()
    np.testing.assert_allclose(freq, 1 / 8, atol=0.02)


def test_replacement_sampler_is_statistically_uniform():
    rowptr = np.array([0, 5], np.int64)
    col = np.arange(5, dtype=np.int64)
    out = sampler.neighbor_sample(rowptr, col, np.array([0]), [20000],
                                  rng=0, replace=True, impl='cpp')
    freq = np.bincount(out[3], minlength=5) / 20000
    np.testing.assert_allclose(freq, 0.2, atol=0.02)
