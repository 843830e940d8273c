"""Sampler tests on the cycle-graph fixture (port of the reference gtest
suite ``test/csrc/sampler/test_neighbor.cpp:8-330`` feature matrix:
basic / with- and without-replacement / disjoint / temporal / biased)."""

import numpy as np
import pytest

from pyg_lib_tpu import sampler
from pyg_lib_tpu.testing import cycle_graph


@pytest.fixture
def graph():
    return cycle_graph(6)


def test_full_neighborhood(graph):
    rowptr, col = graph
    row, c, node_id, edge_id, nnph, neph = sampler.neighbor_sample(
        rowptr, col, np.array([2]), [-1, -1], rng=0)
    # hop 1: neighbors of 2 are {1, 3}; hop 2: neighbors of {1,3} = {0,2,4}
    np.testing.assert_array_equal(node_id, [2, 1, 3, 0, 4])
    assert nnph == [1, 2, 2]
    assert neph == [2, 4]
    # every sampled edge exists in the original graph
    for r, cc, e in zip(row, c, edge_id):
        assert col[e] == node_id[cc]
    assert len(row) == 6


def test_fanout_without_replacement(graph):
    rowptr, col = graph
    row, c, node_id, edge_id, nnph, neph = sampler.neighbor_sample(
        rowptr, col, np.array([0, 3]), [1], rng=1)
    assert nnph[0] == 2
    assert neph == [2]
    assert len(row) == 2
    # sampled neighbors must be actual neighbors
    for r, cc in zip(row, c):
        src = node_id[r]
        dst = node_id[cc]
        assert dst in ((src - 1) % 6, (src + 1) % 6)


def test_replace_true(graph):
    rowptr, col = graph
    row, c, node_id, edge_id, nnph, neph = sampler.neighbor_sample(
        rowptr, col, np.array([1]), [10], replace=True, rng=2)
    assert len(row) == 10  # 10 draws with replacement
    assert neph == [10]
    # nodes deduped: at most 1 + 2 unique
    assert len(node_id) <= 3


def test_disjoint(graph):
    rowptr, col = graph
    row, c, node_id, edge_id, nnph, neph = sampler.neighbor_sample(
        rowptr, col, np.array([0, 0]), [-1], disjoint=True, rng=3)
    # two identical seeds -> separate subgraphs
    assert node_id.shape[1] == 2
    batches = node_id[:, 0]
    assert set(batches.tolist()) == {0, 1}
    assert nnph == [2, 4]  # each seed samples its own copy of {1, 5}


def test_node_temporal(graph):
    rowptr, col = graph
    # Times increase with node id; neighborhoods (v-1, v+1) sorted by time
    # already since col[2v]=(v-1), col[2v+1]=(v+1) -> times v-1 < v+1, OK
    # except at the wrap-around rows (node 0 and node 5); use interior seeds.
    node_time = np.arange(6, dtype=np.int64)
    row, c, node_id, edge_id, nnph, neph = sampler.neighbor_sample(
        rowptr, col, np.array([3]), [-1], node_time=node_time,
        disjoint=True, rng=4)
    # Only neighbors with time <= time[3]=3 survive: node 2 (t=2) yes,
    # node 4 (t=4) no.
    np.testing.assert_array_equal(node_id[:, 1], [3, 2])
    assert neph == [1]


def test_temporal_requires_disjoint(graph):
    rowptr, col = graph
    with pytest.raises(ValueError, match='disjoint'):
        sampler.neighbor_sample(rowptr, col, np.array([0]), [1],
                                node_time=np.arange(6))


def test_biased(graph):
    rowptr, col = graph
    # Put all weight on the (v+1) edge: walks must go clockwise.
    weight = np.zeros(12)
    weight[1::2] = 1.0
    row, c, node_id, edge_id, nnph, neph = sampler.neighbor_sample(
        rowptr, col, np.array([0]), [1, 1], edge_weight=weight, rng=5)
    np.testing.assert_array_equal(node_id, [0, 1, 2])


def test_csc_flag(graph):
    rowptr, col = graph
    r1, c1, n1, e1, _, _ = sampler.neighbor_sample(
        rowptr, col, np.array([2]), [-1], csc=False, rng=6)
    r2, c2, n2, e2, _, _ = sampler.neighbor_sample(
        rowptr, col, np.array([2]), [-1], csc=True, rng=6)
    np.testing.assert_array_equal(r1, c2)
    np.testing.assert_array_equal(c1, r2)


def test_seed_determinism(graph):
    rowptr, col = graph
    a = sampler.neighbor_sample(rowptr, col, np.array([0, 2, 4]), [2, 2],
                                rng=42)
    b = sampler.neighbor_sample(rowptr, col, np.array([0, 2, 4]), [2, 2],
                                rng=42)
    np.testing.assert_array_equal(a[2], b[2])
    np.testing.assert_array_equal(a[0], b[0])


def test_subgraph(graph):
    rowptr, col = graph
    out_rowptr, out_col, out_eid = sampler.subgraph(
        rowptr, col, np.array([0, 1, 2]))
    # induced edges: 0-1, 1-0, 1-2, 2-1 (0-5 and 2-3 dropped)
    np.testing.assert_array_equal(out_rowptr, [0, 1, 3, 4])
    np.testing.assert_array_equal(out_col, [1, 0, 2, 1])
    for i, e in enumerate(out_eid):
        assert col[e] in (0, 1, 2)


def test_random_walk(graph):
    rowptr, col = graph
    walks = sampler.random_walk(rowptr, col, np.array([0, 3]), 5, rng=7)
    assert walks.shape == (2, 6)
    for w in walks:
        for a, b in zip(w[:-1], w[1:]):
            assert b in ((a - 1) % 6, (a + 1) % 6)


def test_hetero_basic():
    # Bipartite: paper -cites- paper, author -writes- paper
    rowptr_p = np.array([0, 2, 4, 6])
    col_p = np.array([1, 2, 0, 2, 0, 1])
    rowptr_a = np.array([0, 1, 2])  # 2 authors each writing 1 paper
    col_a = np.array([0, 2])
    out = sampler.hetero_neighbor_sample(
        rowptr_dict={('paper', 'cites', 'paper'): rowptr_p,
                     ('author', 'writes', 'paper'): rowptr_a},
        col_dict={('paper', 'cites', 'paper'): col_p,
                  ('author', 'writes', 'paper'): col_a},
        seed_dict={'paper': np.array([0]), 'author': np.array([1])},
        num_neighbors_dict={('paper', 'cites', 'paper'): [-1],
                            ('author', 'writes', 'paper'): [-1]},
        rng=8)
    row_d, col_d, node_d, eid_d, nnph_d, neph_d = out
    np.testing.assert_array_equal(node_d['author'], [1])
    # paper seeds: [0]; hop1: cites(0)={1,2}, writes(1)={2}
    assert set(node_d['paper'].tolist()) == {0, 1, 2}
    assert neph_d[('paper', 'cites', 'paper')] == [2]
    assert neph_d[('author', 'writes', 'paper')] == [1]
    assert nnph_d['paper'] == [1, 2]
    assert nnph_d['author'] == [1, 0]


def test_hetero_disjoint_batches():
    rowptr_p = np.array([0, 2, 4, 6])
    col_p = np.array([1, 2, 0, 2, 0, 1])
    out = sampler.hetero_neighbor_sample(
        rowptr_dict={('paper', 'cites', 'paper'): rowptr_p},
        col_dict={('paper', 'cites', 'paper'): col_p},
        seed_dict={'paper': np.array([0, 0])},
        num_neighbors_dict={('paper', 'cites', 'paper'): [-1]},
        disjoint=True, rng=9)
    node_d = out[2]
    assert node_d['paper'].shape == (6, 2)
    assert set(node_d['paper'][:, 0].tolist()) == {0, 1}


def test_dist_protocol_roundtrip(graph):
    """Single-process test of the sample -> merge -> relabel protocol
    (mirrors reference test/csrc/sampler/test_dist_*.cpp)."""
    rowptr, col = graph
    # Partition: nodes 0-2 on partition 0, nodes 3-5 on partition 1.
    # Coordinator seeds: [1, 4] -> p0 samples seed 1, p1 samples seed 4.
    n0, e0, c0 = sampler.dist_neighbor_sample(rowptr, col, np.array([1]),
                                              -1, rng=0)
    n1, e1, c1 = sampler.dist_neighbor_sample(rowptr, col, np.array([4]),
                                              -1, rng=0)
    np.testing.assert_array_equal(n0, [1, 0, 2])
    np.testing.assert_array_equal(c0, [1, 3])
    merged_nodes, merged_edges, _, counts = sampler.merge_sampler_outputs(
        node_ids=[n0, n1], edge_ids=[e0, e1],
        cumsum_neighbors_per_node=[c0, c1],
        partition_ids=np.array([0, 1]), partition_orders=np.array([0, 0]),
        num_partitions=2, num_neighbors=-1)
    np.testing.assert_array_equal(merged_nodes, [0, 2, 3, 5])
    assert counts == [2, 2]
    row, col_out = sampler.relabel_neighborhood(
        seed=np.array([1, 4]), sampled_nodes_with_duplicates=merged_nodes,
        num_sampled_neighbors_per_node=counts, num_nodes=6)
    np.testing.assert_array_equal(row, [0, 0, 1, 1])
    # locals: seed 1->0, seed 4->1, then 0->2, 2->3, 3->4, 5->5
    np.testing.assert_array_equal(col_out, [2, 3, 4, 5])


def test_padding(graph):
    rowptr, col = graph
    out = sampler.neighbor_sample(rowptr, col, np.array([0, 3]), [2, 2],
                                  rng=10)
    batch = sampler.padding.pad_sample_output(out, max_nodes=16,
                                              max_edges=32, num_seeds=2)
    assert batch.node_id.shape == (16, )
    assert batch.rowptr.shape == (17, )
    assert batch.row.shape == (32, )
    assert batch.num_edges == len(out[0])
    assert batch.rowptr[-1] == batch.num_edges
    # CSR consistency: edges grouped by destination
    for r in range(16):
        for e in range(batch.rowptr[r], batch.rowptr[r + 1]):
            assert batch.col[e] == r
    # budget exceeded raises
    with pytest.raises(sampler.padding.BudgetExceeded):
        sampler.padding.pad_sample_output(out, max_nodes=2, max_edges=32,
                                          num_seeds=2)


def test_budget_for():
    mn, me = sampler.padding.budget_for(2, [2, 2])
    assert mn == 2 + 4 + 8 and me == 4 + 8


def test_hetero_duplicate_seeds_non_disjoint():
    """Duplicate seeds collapse in the mapper; the hop-0 frontier window
    must cover only the deduped nodes (a seed-count-wide window walked
    into freshly-sampled hop-1 nodes / crashed on tiny graphs)."""
    rowptr_d = {('a', 'r', 'a'): np.array([0, 1, 2], np.int64)}
    col_d = {('a', 'r', 'a'): np.array([1, 0], np.int64)}
    nn = {('a', 'r', 'a'): [1]}
    out = sampler.hetero_neighbor_sample(
        rowptr_d, col_d, {'a': np.array([0, 0], np.int64)}, nn,
        rng=0, impl='numpy')
    rows, cols, node_id = out[0], out[1], out[2]
    # One deduped seed expands once: exactly one edge 0->1.
    assert len(rows[('a', 'r', 'a')]) == 1
    np.testing.assert_array_equal(node_id['a'], [0, 1])


def test_biased_all_zero_weights_uniform_fallback():
    """All-zero neighborhood weights with replace=True fall back to
    uniform like the C++ engine instead of crashing on NaN p."""
    rowptr = np.array([0, 3], np.int64)
    col = np.array([0, 0, 0], np.int64)
    w = np.zeros(3, np.float64)
    out = sampler.neighbor_sample(rowptr, col, np.array([0]), [2],
                                  edge_weight=w, replace=True, rng=0,
                                  impl='numpy')
    assert len(out[0]) == 2  # two (uniform) draws happened
