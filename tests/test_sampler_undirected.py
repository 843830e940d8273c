"""Undirected (induced-subgraph) neighbor sampling: ``directed=False``.

The reference DOCUMENTS these semantics ("include all edges between all
sampled nodes", reference ``pyg_lib/sampler/__init__.py:69``) but its
kernel rejects the flag (``csrc/sampler/cpu/neighbor_kernel.cpp:501,822``
TORCH_CHECKs).  This implementation honors the documented contract, so
the tests verify it against first principles:

* node discovery is identical to ``directed=True`` under the same rng
* the edge set is EXACTLY the induced subgraph on the sampled nodes
* numpy specification == C++ fast path on deterministic (full-fanout)
  configs, and both satisfy the invariants on random configs
"""

import numpy as np
import pytest

from pyg_lib_tpu import sampler
from pyg_lib_tpu.sampler import _cpp

HAS_CPP = _cpp.get_lib() is not None
IMPLS = ['numpy'] + (['cpp'] if HAS_CPP else [])


def _graph(rng, n, avg_deg):
    deg = rng.integers(0, 2 * avg_deg, size=n)
    rowptr = np.zeros(n + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    col = rng.integers(0, n, size=int(rowptr[-1])).astype(np.int64)
    return rowptr, col


def _induced_edges(rowptr, col, nodes):
    """(row, col, eid) triples of the induced subgraph, local ids."""
    loc = {int(v): i for i, v in enumerate(nodes)}
    out = []
    for i, v in enumerate(np.asarray(nodes).tolist()):
        if v >= len(rowptr) - 1:
            continue
        for e in range(int(rowptr[v]), int(rowptr[v + 1])):
            j = loc.get(int(col[e]))
            if j is not None:
                out.append((i, j, e))
    return out


@pytest.mark.parametrize('impl', IMPLS)
@pytest.mark.parametrize('seed', range(4))
@pytest.mark.parametrize('replace', [False, True])
def test_homo_undirected_induced(impl, seed, replace):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(30, 300))
    rowptr, col = _graph(rng, n, int(rng.integers(1, 8)))
    seeds = rng.choice(n, size=int(rng.integers(1, 8)), replace=False)
    fanouts = rng.integers(1, 6, size=int(rng.integers(1, 4))).tolist()

    row, c, nid, eid, nph, eph = sampler.neighbor_sample(
        rowptr, col, seeds, fanouts, directed=False, replace=replace,
        rng=seed, impl=impl)

    # Node discovery matches the directed run bit-for-bit.
    nid_dir = sampler.neighbor_sample(rowptr, col, seeds, fanouts,
                                      directed=True, replace=replace,
                                      rng=seed, impl=impl)[2]
    assert np.array_equal(nid, nid_dir)
    assert nph == sampler.neighbor_sample(
        rowptr, col, seeds, fanouts, directed=True, replace=replace,
        rng=seed, impl=impl)[4]

    # Edge set == exact induced subgraph, emitted in local-row order.
    expect = _induced_edges(rowptr, col, nid)
    got = list(zip(row.tolist(), c.tolist(), eid.tolist()))
    assert got == expect
    assert eph == [len(got)]


@pytest.mark.parametrize('impl', IMPLS)
def test_homo_undirected_full_fanout_numpy_equals_cpp(impl):
    if not HAS_CPP:
        pytest.skip('C++ sampler not built')
    rng = np.random.default_rng(11)
    rowptr, col = _graph(rng, 120, 4)
    seeds = np.array([0, 7, 33], np.int64)
    a = sampler.neighbor_sample(rowptr, col, seeds, [-1, -1],
                                directed=False, rng=1, impl='numpy')
    b = sampler.neighbor_sample(rowptr, col, seeds, [-1, -1],
                                directed=False, rng=1, impl='cpp')
    for x, y in zip(a, b):
        if isinstance(x, list):
            assert x == y
        elif x is None:
            assert y is None
        else:
            assert np.array_equal(x, y)


@pytest.mark.parametrize('impl', IMPLS)
def test_homo_undirected_csc_swaps(impl):
    rng = np.random.default_rng(5)
    rowptr, col = _graph(rng, 80, 3)
    seeds = np.array([2, 9], np.int64)
    r0, c0, *_ = sampler.neighbor_sample(rowptr, col, seeds, [3],
                                         directed=False, rng=2, impl=impl)
    r1, c1, *_ = sampler.neighbor_sample(rowptr, col, seeds, [3],
                                         directed=False, csc=True, rng=2,
                                         impl=impl)
    assert np.array_equal(r0, c1) and np.array_equal(c0, r1)


def test_homo_undirected_rejects_disjoint():
    rowptr = np.array([0, 1, 2], np.int64)
    col = np.array([1, 0], np.int64)
    with pytest.raises(ValueError, match='disjoint'):
        sampler.neighbor_sample(rowptr, col, np.array([0]), [1],
                                directed=False, disjoint=True)
    with pytest.raises(ValueError, match='disjoint'):
        sampler.hetero_neighbor_sample(
            {('a', 'r', 'a'): rowptr}, {('a', 'r', 'a'): col},
            {'a': np.array([0])}, {('a', 'r', 'a'): [1]},
            directed=False, disjoint=True)


def _hetero_graph(rng):
    N = {'a': 90, 'b': 60}
    ets = [('a', 'r1', 'b'), ('b', 'r2', 'a'), ('a', 'r3', 'a')]
    rowptr_d, col_d = {}, {}
    for (s, _, d) in ets:
        deg = rng.integers(0, 8, N[s])
        rp = np.zeros(N[s] + 1, np.int64)
        rp[1:] = np.cumsum(deg)
        rowptr_d[(s, _, d)] = rp
        col_d[(s, _, d)] = rng.integers(0, N[d],
                                        int(rp[-1])).astype(np.int64)
    return ets, rowptr_d, col_d


@pytest.mark.parametrize('impl', IMPLS)
@pytest.mark.parametrize('seed', range(3))
def test_hetero_undirected_induced(impl, seed):
    rng = np.random.default_rng(seed)
    ets, rowptr_d, col_d = _hetero_graph(rng)
    seed_d = {'a': rng.choice(90, size=4, replace=False)}
    nn = {k: [3, 2] for k in ets}

    row, c, nid, eid, nph, eph = sampler.hetero_neighbor_sample(
        rowptr_d, col_d, seed_d, nn, directed=False, rng=seed, impl=impl)
    nid_dir = sampler.hetero_neighbor_sample(
        rowptr_d, col_d, seed_d, nn, directed=True, rng=seed, impl=impl)[2]
    for t in nid:
        assert np.array_equal(nid[t], nid_dir[t])

    for k in ets:
        s, _, d = k
        expect = _induced_edges(
            rowptr_d[k], col_d[k], nid[s]) if len(nid[s]) else []
        # _induced_edges maps dst through nid[s]; redo with dst map:
        dmap = {int(v): i for i, v in enumerate(nid[d])}
        expect = []
        for i, v in enumerate(nid[s].tolist()):
            if v >= len(rowptr_d[k]) - 1:
                continue
            for e in range(int(rowptr_d[k][v]), int(rowptr_d[k][v + 1])):
                j = dmap.get(int(col_d[k][e]))
                if j is not None:
                    expect.append((i, j, e))
        got = sorted(zip(row[k].tolist(), c[k].tolist(), eid[k].tolist()))
        assert got == sorted(expect)
        assert eph[k] == [len(got)]


@pytest.mark.parametrize('impl', IMPLS)
def test_hetero_undirected_full_fanout_numpy_equals_cpp(impl):
    if not HAS_CPP:
        pytest.skip('C++ sampler not built')
    rng = np.random.default_rng(2)
    ets, rowptr_d, col_d = _hetero_graph(rng)
    seed_d = {'a': np.array([0, 5, 9], np.int64)}
    nn = {k: [-1, -1] for k in ets}
    a = sampler.hetero_neighbor_sample(rowptr_d, col_d, seed_d, nn,
                                       directed=False, rng=3, impl='numpy')
    b = sampler.hetero_neighbor_sample(rowptr_d, col_d, seed_d, nn,
                                       directed=False, rng=3, impl='cpp')
    for x, y in zip(a, b):
        if x is None:
            assert y is None
            continue
        assert set(x) == set(y)
        for k in x:
            if isinstance(x[k], list):
                assert x[k] == y[k]
            else:
                assert np.array_equal(x[k], y[k])
