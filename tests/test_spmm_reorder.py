"""build_spmm_graph(reorder=...): cluster relabeling is invisible to
callers — outputs and gradients stay in the original id space."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyg_lib_tpu import ops


def _clustered_graph(seed=0, n=768, clusters=6, e=9000, p_intra=0.85):
    """Planted-partition graph with SHUFFLED node ids (so the reorder
    has something to recover)."""
    rng = np.random.default_rng(seed)
    labels = rng.permutation(np.repeat(np.arange(clusters), n // clusters))
    row = rng.integers(0, n, e)
    same = rng.random(e) < p_intra
    col = np.empty(e, np.int64)
    for i in range(e):
        if same[i]:
            cands = np.nonzero(labels == labels[row[i]])[0]
            col[i] = cands[rng.integers(0, len(cands))]
        else:
            col[i] = rng.integers(0, n)
    order = np.argsort(row, kind='stable')
    rowptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(row, minlength=n), out=rowptr[1:])
    return rowptr, col[order]


@pytest.fixture(scope='module')
def graphs():
    rowptr, col = _clustered_graph()
    base = ops.build_spmm_graph(rowptr, col)
    reordered = ops.build_spmm_graph(rowptr, col, dedup='auto',
                                     minmax='auto', reorder='on')
    return rowptr, col, base, reordered


def test_reorder_applied(graphs):
    _, _, _, g = graphs
    assert g.perm is not None and g.rank is not None
    # perm and rank are inverse permutations
    perm = np.asarray(g.perm)
    rank = np.asarray(g.rank)
    assert np.array_equal(perm[rank], np.arange(perm.shape[0]))


@pytest.mark.parametrize('reduce', ['sum', 'mean', 'max', 'min'])
def test_outputs_match_original_space(graphs, reduce):
    rowptr, col, base, g = graphs
    n = rowptr.shape[0] - 1
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(n, 32)).astype(np.float32))
    a = np.asarray(ops.spmm(x, base, reduce=reduce))
    b = np.asarray(ops.spmm(x, g, reduce=reduce))
    if reduce in ('max', 'min'):
        assert np.array_equal(a, b)
    else:
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize('reduce', ['sum', 'max'])
def test_grads_match_original_space(graphs, reduce):
    rowptr, col, base, g = graphs
    n = rowptr.shape[0] - 1
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(n, 16)).astype(np.float32))

    def loss(gph):
        return lambda xx: (ops.spmm(xx, gph, reduce=reduce)**2).sum()

    ga = np.asarray(jax.grad(loss(base))(x))
    gb = np.asarray(jax.grad(loss(g))(x))
    if reduce == 'max':
        assert np.array_equal(ga, gb)
    else:
        np.testing.assert_allclose(ga, gb, rtol=2e-4, atol=2e-4)


def test_auto_declines_on_uniform():
    rng = np.random.default_rng(3)
    n, e = 20_000, 320_000
    row = np.sort(rng.integers(0, n, e))
    col = rng.integers(0, n, e).astype(np.int64)
    rowptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(row, minlength=n), out=rowptr[1:])
    g = ops.build_spmm_graph(rowptr, col, reorder='auto')
    assert g.perm is None  # nothing to recover on uniform-random


def test_reorder_rejects_rectangular_and_edge_maps():
    rowptr = np.array([0, 2, 3], np.int64)
    col = np.array([0, 4, 2], np.int64)
    with pytest.raises(ValueError, match='square'):
        ops.build_spmm_graph(rowptr, col, num_cols=5, reorder='on')
    rowptr2 = np.array([0, 1, 2], np.int64)
    col2 = np.array([1, 0], np.int64)
    with pytest.raises(ValueError, match='edge_maps'):
        ops.build_spmm_graph(rowptr2, col2, with_edge_maps=True,
                             reorder='on')


def test_weighted_reorder_carries_edge_weights():
    rowptr, col = _clustered_graph(seed=5, n=384, clusters=4, e=4000)
    n = rowptr.shape[0] - 1
    rng = np.random.default_rng(6)
    w = rng.normal(size=col.shape[0]).astype(np.float32)
    g0 = ops.build_spmm_graph(rowptr, col, dedup='on', edge_weight=w)
    g1 = ops.build_spmm_graph(rowptr, col, dedup='on', edge_weight=w,
                              reorder='on')
    x = jnp.asarray(rng.normal(size=(n, 24)).astype(np.float32))
    a = np.asarray(ops.spmm(x, g0))
    b = np.asarray(ops.spmm(x, g1))
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)
