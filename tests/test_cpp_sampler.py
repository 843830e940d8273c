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
