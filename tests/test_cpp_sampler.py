"""C++ fast-path sampler: structural parity with the numpy specification."""

import numpy as np
import pytest

from pyg_lib_tpu import sampler
from pyg_lib_tpu.sampler import _cpp
from pyg_lib_tpu.testing import cycle_graph

pytestmark = pytest.mark.skipif(_cpp.get_lib() is None,
                                reason='C++ sampler not built')


def _structural_check(out, rowptr, col, num_neighbors, num_seed):
    row, c, node_id, eid, nnph, neph = out
    nodes = node_id[:, 1] if node_id.ndim == 2 else node_id
    assert nnph[0] == num_seed
    assert len(nnph) == len(num_neighbors) + 1
    assert len(neph) == len(num_neighbors)
    assert sum(neph) == len(row) == len(c)
    # every edge references valid locals and a real graph edge
    for r, cc, e in zip(row, c, eid):
        assert 0 <= r < len(nodes) and 0 <= cc < len(nodes)
        assert col[e] == nodes[cc]
        lo, hi = rowptr[nodes[r]], rowptr[nodes[r] + 1]
        assert lo <= e < hi
    # locals are deduped (non-disjoint)
    if node_id.ndim == 1:
        assert len(set(nodes.tolist())) == len(nodes)


@pytest.mark.parametrize('replace', [False, True])
@pytest.mark.parametrize('fanouts', [[2], [2, 3], [-1, -1]])
def test_cpp_uniform(replace, fanouts):
    rng = np.random.default_rng(0)
    n = 200
    deg = rng.integers(0, 10, size=n)
    rowptr = np.zeros(n + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    col = rng.integers(0, n, size=int(rowptr[-1]))
    seed = rng.choice(n, size=16, replace=False)
    out = sampler.neighbor_sample(rowptr, col, seed, fanouts, rng=7,
                                  replace=replace, impl='cpp')
    _structural_check(out, rowptr, col, fanouts, 16)


def test_cpp_matches_numpy_full_neighborhood():
    rowptr, col = cycle_graph(10)
    a = sampler.neighbor_sample(rowptr, col, np.array([3]), [-1, -1],
                                impl='cpp', rng=1)
    b = sampler.neighbor_sample(rowptr, col, np.array([3]), [-1, -1],
                                impl='numpy', rng=1)
    np.testing.assert_array_equal(a[2], b[2])
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
    np.testing.assert_array_equal(a[3], b[3])
    assert a[4] == b[4] and a[5] == b[5]


def test_cpp_disjoint():
    rowptr, col = cycle_graph(12)
    out = sampler.neighbor_sample(rowptr, col, np.array([0, 0, 5]), [-1],
                                  disjoint=True, impl='cpp', rng=2)
    node_id = out[2]
    assert node_id.shape[1] == 2
    assert set(node_id[:, 0].tolist()) == {0, 1, 2}
    # each batch gets its own copy of the neighborhood
    assert out[4] == [3, 6]


def test_cpp_temporal():
    rowptr, col = cycle_graph(6)
    node_time = np.arange(6, dtype=np.int64)
    out = sampler.neighbor_sample(rowptr, col, np.array([3]), [-1],
                                  node_time=node_time, disjoint=True,
                                  impl='cpp', rng=3)
    np.testing.assert_array_equal(out[2][:, 1], [3, 2])


def test_cpp_biased():
    rowptr, col = cycle_graph(6)
    weight = np.zeros(12)
    weight[1::2] = 1.0
    out = sampler.neighbor_sample(rowptr, col, np.array([0]), [1, 1],
                                  edge_weight=weight, impl='cpp', rng=4)
    np.testing.assert_array_equal(out[2], [0, 1, 2])


def test_cpp_deterministic():
    rowptr, col = cycle_graph(50)
    a = sampler.neighbor_sample(rowptr, col, np.arange(10), [2, 2],
                                impl='cpp', rng=99)
    b = sampler.neighbor_sample(rowptr, col, np.arange(10), [2, 2],
                                impl='cpp', rng=99)
    np.testing.assert_array_equal(a[2], b[2])
    np.testing.assert_array_equal(a[0], b[0])


def test_cpp_without_replacement_unique():
    rng = np.random.default_rng(1)
    n = 50
    deg = np.full(n, 20)
    rowptr = np.zeros(n + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    col = rng.integers(0, n, size=int(rowptr[-1]))
    out = sampler.neighbor_sample(rowptr, col, np.array([7]), [10],
                                  impl='cpp', rng=5)
    eids = out[3]
    assert len(eids) == 10
    assert len(set(eids.tolist())) == 10  # without replacement: unique edges


def _hetero_fixture(rng, n_paper=120, n_author=80):
    """Two-type bipartite-ish graph with three edge types."""
    def csr(n_src, n_dst, avg_deg):
        deg = rng.integers(0, 2 * avg_deg, size=n_src)
        rowptr = np.zeros(n_src + 1, np.int64)
        rowptr[1:] = np.cumsum(deg)
        col = rng.integers(0, n_dst, size=int(rowptr[-1])).astype(np.int64)
        return rowptr, col

    kinds = {
        ('paper', 'cites', 'paper'): csr(n_paper, n_paper, 5),
        ('paper', 'written_by', 'author'): csr(n_paper, n_author, 3),
        ('author', 'writes', 'paper'): csr(n_author, n_paper, 3),
    }
    rowptr_dict = {k: v[0] for k, v in kinds.items()}
    col_dict = {k: v[1] for k, v in kinds.items()}
    return rowptr_dict, col_dict


def test_cpp_hetero_matches_numpy_full_neighborhood():
    rng = np.random.default_rng(11)
    rowptr_dict, col_dict = _hetero_fixture(rng)
    seed_dict = {'paper': np.array([0, 5, 9])}
    nn = {k: [-1, -1] for k in rowptr_dict}

    a = sampler.hetero_neighbor_sample(rowptr_dict, col_dict, seed_dict, nn,
                                       impl='cpp', rng=3)
    b = sampler.hetero_neighbor_sample(rowptr_dict, col_dict, seed_dict, nn,
                                       impl='numpy', rng=3)
    for k in rowptr_dict:
        np.testing.assert_array_equal(a[0][k], b[0][k])
        np.testing.assert_array_equal(a[1][k], b[1][k])
        np.testing.assert_array_equal(a[3][k], b[3][k])
        assert a[5][k] == b[5][k]
    for t in a[2]:
        np.testing.assert_array_equal(a[2][t], b[2][t])
        assert a[4][t] == b[4][t]


@pytest.mark.parametrize('replace', [False, True])
@pytest.mark.parametrize('disjoint', [False, True])
def test_cpp_hetero_structural(replace, disjoint):
    rng = np.random.default_rng(4)
    rowptr_dict, col_dict = _hetero_fixture(rng)
    seed_dict = {'paper': np.array([1, 2, 3, 4]),
                 'author': np.array([0, 7])}
    nn = {k: [3, 2] for k in rowptr_dict}

    row, col, node_id, eid, nph, eph = sampler.hetero_neighbor_sample(
        rowptr_dict, col_dict, seed_dict, nn, impl='cpp', rng=5,
        replace=replace, disjoint=disjoint)

    assert nph['paper'][0] == 4 and nph['author'][0] == 2
    for k in rowptr_dict:
        src, _, dst = k
        assert len(row[k]) == len(col[k]) == len(eid[k]) == sum(eph[k])
        n_src = (node_id[src].shape[0])
        n_dst = (node_id[dst].shape[0])
        if len(row[k]):
            assert row[k].max() < n_src and col[k].max() < n_dst
        # edge ids reference real edges of the right type
        nodes_src = node_id[src][:, 1] if disjoint else node_id[src]
        nodes_dst = node_id[dst][:, 1] if disjoint else node_id[dst]
        rp, cc = rowptr_dict[k], col_dict[k]
        for r, c, e in zip(row[k], col[k], eid[k]):
            assert rp[nodes_src[r]] <= e < rp[nodes_src[r] + 1]
            assert cc[e] == nodes_dst[c]
    if disjoint:
        # batch ids: seeds get 0..5 in seed_dict order
        assert node_id['paper'][:4, 0].tolist() == [0, 1, 2, 3]
        assert node_id['author'][:2, 0].tolist() == [4, 5]


def test_cpp_hetero_temporal_node_time():
    rng = np.random.default_rng(9)
    rowptr_dict, col_dict = _hetero_fixture(rng)
    node_time = {'paper': rng.integers(0, 50, size=120),
                 'author': rng.integers(0, 50, size=80)}
    seed_dict = {'paper': np.array([0, 5, 9])}
    nn = {k: [-1] for k in rowptr_dict}

    # time-sort neighborhoods by dst node time (required precondition)
    for k in rowptr_dict:
        dst = k[2]
        rp, cc = rowptr_dict[k], col_dict[k]
        for v in range(len(rp) - 1):
            lo, hi = rp[v], rp[v + 1]
            order = np.argsort(node_time[dst][cc[lo:hi]], kind='stable')
            cc[lo:hi] = cc[lo:hi][order]

    row, col, node_id, eid, nph, eph = sampler.hetero_neighbor_sample(
        rowptr_dict, col_dict, seed_dict, nn, impl='cpp', rng=5,
        disjoint=True, node_time_dict=node_time)

    # every sampled edge respects the seed's timestamp
    seed_times = node_time['paper'][seed_dict['paper']]
    for k in rowptr_dict:
        dst = k[2]
        nodes_dst = node_id[dst]
        for c, b in zip(col[k], (node_id[k[0]][r, 0] for r in row[k])):
            w = nodes_dst[c, 1]
            assert node_time[dst][w] <= seed_times[int(b)]


def test_cpp_hetero_deterministic_across_calls():
    rng = np.random.default_rng(2)
    rowptr_dict, col_dict = _hetero_fixture(rng)
    seed_dict = {'paper': np.array([1, 2]), 'author': np.array([3])}
    nn = {k: [3, 3] for k in rowptr_dict}
    a = sampler.hetero_neighbor_sample(rowptr_dict, col_dict, seed_dict, nn,
                                       impl='cpp', rng=42)
    b = sampler.hetero_neighbor_sample(rowptr_dict, col_dict, seed_dict, nn,
                                       impl='cpp', rng=42)
    for k in rowptr_dict:
        np.testing.assert_array_equal(a[0][k], b[0][k])
        np.testing.assert_array_equal(a[1][k], b[1][k])


def test_cpp_subgraph_matches_numpy():
    rng = np.random.default_rng(6)
    n = 500
    deg = rng.integers(0, 8, size=n)
    rowptr = np.zeros(n + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    col = rng.integers(0, n, size=int(rowptr[-1])).astype(np.int64)
    nodes = np.sort(rng.choice(n, size=60, replace=False))

    a = sampler.subgraph(rowptr, col, nodes, impl='auto')
    b = sampler.subgraph(rowptr, col, nodes, impl='numpy')
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
    np.testing.assert_array_equal(a[2], b[2])


def test_cpp_random_walk_valid_and_deterministic():
    rng = np.random.default_rng(8)
    n = 100
    deg = rng.integers(0, 6, size=n)
    rowptr = np.zeros(n + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    col = rng.integers(0, n, size=int(rowptr[-1])).astype(np.int64)
    seed = np.arange(20)

    w1 = sampler.random_walk(rowptr, col, seed, walk_length=8, rng=5)
    w2 = sampler.random_walk(rowptr, col, seed, walk_length=8, rng=5)
    np.testing.assert_array_equal(w1, w2)
    assert w1.shape == (20, 9)
    assert (w1[:, 0] == seed).all()
    # each step is a real edge or a dead-end repeat
    for i in range(20):
        for s in range(1, 9):
            u, v = w1[i, s - 1], w1[i, s]
            lo, hi = rowptr[u], rowptr[u + 1]
            if hi > lo:
                assert v in col[lo:hi]
            else:
                assert v == u


def test_cpp_dist_neighbor_sample_contract():
    rng = np.random.default_rng(10)
    n = 80
    deg = rng.integers(0, 6, size=n)
    rowptr = np.zeros(n + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    col = rng.integers(0, n, size=int(rowptr[-1])).astype(np.int64)
    seed = np.array([3, 7, 11, 19])

    nodes, eids, cumsum = sampler.dist_neighbor_sample(
        rowptr, col, seed, num_neighbors=3, rng=2, impl='cpp')
    assert cumsum[0] == len(seed)
    assert cumsum[-1] == len(nodes)
    assert len(cumsum) == len(seed) + 1
    np.testing.assert_array_equal(nodes[:len(seed)], seed)
    assert len(eids) == len(nodes) - len(seed)
    # every expanded node matches its edge id, grouped per seed
    for i in range(len(seed)):
        for p in range(int(cumsum[i]), int(cumsum[i + 1])):
            e = eids[p - len(seed)]
            assert rowptr[seed[i]] <= e < rowptr[seed[i] + 1]
            assert col[e] == nodes[p]


def test_cpp_biased_alias_path_statistics():
    # Large fanout with replacement triggers the alias-table path; the
    # empirical distribution must track the weights.
    rowptr = np.array([0, 4], np.int64)
    col = np.array([0, 1, 2, 3], np.int64)
    ew = np.array([0.1, 0.2, 0.3, 0.4])
    out = sampler.neighbor_sample(rowptr, col, np.array([0]), [4000],
                                  rng=0, replace=True, edge_weight=ew,
                                  impl='cpp')
    counts = np.bincount(out[3], minlength=4) / 4000.0
    np.testing.assert_allclose(counts, ew, atol=0.04)


def test_cpp_hetero_seed_beyond_rowptr_is_safe():
    # Seed/source ids past an edge type's rowptr must be skipped (no
    # negative-population allocation / OOB reads).
    rowptr_d = {('u', 'r', 'v'): np.array([0, 2, 3], np.int64)}  # 2 u-nodes
    col_d = {('u', 'r', 'v'): np.array([0, 1, 2], np.int64)}
    out = sampler.hetero_neighbor_sample(
        rowptr_d, col_d, {'u': np.array([5])},  # u id beyond rowptr
        {('u', 'r', 'v'): [2]}, rng=0, impl='cpp')
    assert out[2]['u'].tolist() == [5]
    assert len(out[0][('u', 'r', 'v')]) == 0


def test_cpp_subgraph_out_of_range_nodes_safe():
    rowptr = np.array([0, 2, 3, 3], np.int64)
    col = np.array([1, 2, 0], np.int64)
    rp, cc, eid = sampler.subgraph(rowptr, col, np.array([0, 1, 99]),
                                   impl='auto')
    # node 99 contributes no edges; valid part matches numpy on {0, 1}
    rp2, cc2, eid2 = sampler.subgraph(rowptr, col, np.array([0, 1]),
                                      impl='numpy')
    np.testing.assert_array_equal(rp[:3], rp2)
    assert rp[3] == rp[2]


def test_cpp_hetero_short_node_time_raises():
    rowptr_d = {('a', 'r', 'a'): np.array([0, 1, 2, 3], np.int64)}
    col_d = {('a', 'r', 'a'): np.array([1, 2, 0], np.int64)}
    with pytest.raises(IndexError):
        sampler.hetero_neighbor_sample(
            rowptr_d, col_d, {'a': np.array([0])}, {('a', 'r', 'a'): [2]},
            node_time_dict={'a': np.array([1], np.int64)},  # too short
            disjoint=True, rng=0, impl='cpp')


def test_cpp_hetero_missing_seed_node_time_raises():
    rowptr_d = {('a', 'r', 'b'): np.array([0, 1], np.int64),
                ('b', 'r2', 'a'): np.array([0, 0], np.int64)}
    col_d = {('a', 'r', 'b'): np.array([0], np.int64),
             ('b', 'r2', 'a'): np.zeros(0, np.int64)}
    with pytest.raises(KeyError):
        sampler.hetero_neighbor_sample(
            rowptr_d, col_d, {'b': np.array([0])},
            {k: [1] for k in rowptr_d},
            node_time_dict={'a': np.array([3], np.int64)},
            disjoint=True, rng=0, impl='cpp')


def test_cpp_homogeneous_seed_out_of_range_raises():
    # The C ABI itself guards seeds (csrc/sampler.cpp run_sample returns
    # false -> NULL handle -> IndexError), not just the Python spec path.
    rowptr = np.array([0, 1, 2], np.int64)
    col = np.array([1, 0], np.int64)
    for bad in (7, -1):
        with pytest.raises(IndexError):
            sampler.neighbor_sample(rowptr, col, seed=np.array([bad]),
                                    num_neighbors=[1], impl='cpp')


def test_cpp_mapper_rare_path_distinct_high_ids():
    # Seeds far beyond the rowptr estimate exercise the Mapper's
    # exact-keyed rare path: distinct huge ids must stay distinct (the old
    # shifted-XOR packing aliased node ids >= 2^40).
    big = 1 << 41
    rowptr_d = {('u', 'r', 'v'): np.array([0, 1], np.int64)}
    col_d = {('u', 'r', 'v'): np.array([0], np.int64)}
    out = sampler.hetero_neighbor_sample(
        rowptr_d, col_d, {'u': np.array([big, big + (1 << 40), big])},
        {('u', 'r', 'v'): [1]}, rng=0, impl='cpp')
    assert out[2]['u'].tolist() == [big, big + (1 << 40)]  # deduped, distinct


def test_random_walk_pq_node2vec():
    """Full node2vec p/q walks (beyond the reference, which enforces
    p=q=1): structural validity, determinism, and the defining bias —
    low p backtracks far more often than high p."""
    rng = np.random.default_rng(0)
    n = 200
    deg = rng.integers(2, 6, size=n)
    rowptr = np.zeros(n + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    col = rng.integers(0, n, size=int(rowptr[-1])).astype(np.int64)
    seeds = rng.integers(0, n, size=64)

    for impl in ('cpp', 'numpy'):
        out = sampler.random_walk(rowptr, col, seeds, 10, p=0.25, q=2.0,
                                  rng=7, impl=impl)
        assert out.shape == (64, 11)
        # every step follows a real edge (or repeats on dead ends)
        for i in range(64):
            for s in range(10):
                u, v = out[i, s], out[i, s + 1]
                nbrs = col[rowptr[u]:rowptr[u + 1]]
                assert v in nbrs or (len(nbrs) == 0 and v == u)

    # determinism (C++ counter RNG)
    a = sampler.random_walk(rowptr, col, seeds, 10, p=0.25, q=2.0, rng=7,
                            impl='cpp')
    b = sampler.random_walk(rowptr, col, seeds, 10, p=0.25, q=2.0, rng=7,
                            impl='cpp')
    np.testing.assert_array_equal(a, b)

    def backtrack_rate(p):
        walks = sampler.random_walk(rowptr, col,
                                    rng.integers(0, n, size=512), 20, p=p,
                                    q=1.0, rng=3, impl='cpp')
        back = (walks[:, 2:] == walks[:, :-2]).mean()
        return back

    assert backtrack_rate(0.05) > backtrack_rate(20.0) + 0.1


def test_random_walk_edgeless_graph_repeats_seed():
    rowptr = np.zeros(5, np.int64)
    col = np.zeros(0, np.int64)
    for impl in ('numpy', 'auto'):
        out = sampler.random_walk(rowptr, col, np.array([0, 3]), 3,
                                  rng=0, impl=impl)
        np.testing.assert_array_equal(out, [[0, 0, 0, 0], [3, 3, 3, 3]])


def test_random_walk_cpp_unavailable_semantics():
    import pytest
    rowptr = np.array([0, 1, 2], np.int64)
    col = np.array([1, 0], np.int64)
    with pytest.raises(ValueError, match='Generator'):
        sampler.random_walk(rowptr, col, np.array([0]), 2, impl='cpp',
                            rng=np.random.default_rng(0))


def test_node2vec_extreme_q_stays_unbiased():
    """p=1, q=100 on a triangle-free star-of-paths shape: candidates are
    almost always distance-2 (weight 0.01), so naive rejection sampling
    exhausts its draw budget; the exact-CDF fallback must keep the
    return edge (weight 1/p = 1) dominant when q is huge."""
    # Path graph 0-1-2-...-9 (every interior step: return edge weight 1,
    # forward edge weight 1/q).
    n = 10
    edges = [(i, i + 1) for i in range(n - 1)]
    edges += [(j, i) for i, j in edges]
    edges.sort()
    rowptr = np.zeros(n + 1, np.int64)
    for u, _ in edges:
        rowptr[u + 1] += 1
    rowptr = np.cumsum(rowptr)
    col = np.array([v for _, v in edges], np.int64)
    q = 1000.0
    backtracks = total = 0
    for trial in range(200):
        out = sampler.random_walk(rowptr, col, np.array([5]), 4, p=1.0,
                                  q=q, rng=trial, impl='numpy')
        w = out[0]
        for s in range(2, len(w)):
            if rowptr[w[s - 1] + 1] - rowptr[w[s - 1]] == 2:
                total += 1
                backtracks += int(w[s] == w[s - 2])
    # exact distribution: P(backtrack) = 1/(1 + 1/q) ~ 0.999
    assert backtracks / max(total, 1) > 0.97, (backtracks, total)
