"""cluster_reorder: CSR permutation invariants + SpMM equivalence.

The locality lever (BENCHMARKS.md, bench/bench_locality.py) relies on
reordering being a pure relabeling: aggregation results must be the
original results permuted, exactly.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pyg_lib_tpu import ops, partition
from pyg_lib_tpu.datasets import clustered_graph


def _random_csr(n, e, seed=0):
    rng = np.random.default_rng(seed)
    deg = rng.multinomial(e, np.ones(n) / n)
    rowptr = np.zeros(n + 1, np.int64)
    np.cumsum(deg, out=rowptr[1:])
    col = rng.integers(0, n, size=e).astype(np.int64)
    return rowptr, col


def test_reorder_is_permutation():
    rowptr, col = _random_csr(64, 512, seed=1)
    part = np.random.default_rng(2).integers(0, 4, size=64)
    nrp, ncl, nperm, eperm = partition.cluster_reorder(rowptr, col, part)
    assert sorted(nperm) == list(range(64))
    assert sorted(eperm) == list(range(512))
    # Partition-contiguous: part[new order] is non-decreasing.
    assert (np.diff(part[nperm]) >= 0).all()
    # Stable within partitions.
    for p in range(4):
        ids = nperm[part[nperm] == p]
        assert (np.diff(ids) > 0).all()
    # Degrees follow their node.
    assert np.array_equal(np.diff(nrp), np.diff(rowptr)[nperm])
    # Edge set is preserved under the relabeling.
    rank = np.argsort(nperm)
    row_old = np.repeat(np.arange(64), np.diff(rowptr))
    row_new = np.repeat(np.arange(64), np.diff(nrp))
    old_edges = set(zip(row_old.tolist(), col.tolist()))
    new_edges = set(zip(nperm[row_new].tolist(), nperm[ncl].tolist()))
    assert old_edges == new_edges


@pytest.mark.parametrize('reduce', ['sum', 'mean', 'max'])
def test_spmm_equivalent_under_reorder(reduce):
    rowptr, col = _random_csr(96, 700, seed=3)
    part = np.random.default_rng(4).integers(0, 3, size=96)
    nrp, ncl, nperm, _ = partition.cluster_reorder(rowptr, col, part)
    x = np.random.default_rng(5).normal(size=(96, 8)).astype(np.float32)

    g_old = ops.build_spmm_graph(rowptr, col)
    g_new = ops.build_spmm_graph(nrp, ncl)
    out_old = np.asarray(ops.spmm(jnp.asarray(x), g_old, reduce=reduce))
    out_new = np.asarray(
        ops.spmm(jnp.asarray(x[nperm]), g_new, reduce=reduce))
    np.testing.assert_allclose(out_new, out_old[nperm], rtol=1e-5,
                               atol=1e-5)


def test_edge_perm_carries_weights():
    rowptr, col = _random_csr(48, 300, seed=6)
    w = np.random.default_rng(7).normal(size=300).astype(np.float64)
    part = np.random.default_rng(8).integers(0, 4, size=48)
    nrp, ncl, nperm, eperm = partition.cluster_reorder(rowptr, col, part)
    # Weighted degree per node is invariant under the reorder.
    row_old = np.repeat(np.arange(48), np.diff(rowptr))
    row_new = np.repeat(np.arange(48), np.diff(nrp))
    wd_old = np.bincount(row_old, weights=w, minlength=48)
    wd_new = np.bincount(row_new, weights=w[eperm], minlength=48)
    np.testing.assert_allclose(wd_new, wd_old[nperm])


def test_clustered_graph_shape_and_locality():
    rowptr, col, cluster = clustered_graph(4096, 16, avg_degree=8,
                                           p_intra=0.9, seed=0)
    n, e = 4096, int(rowptr[-1])
    assert rowptr.shape == (n + 1, ) and col.shape == (e, )
    assert col.min() >= 0 and col.max() < n
    assert cluster.max() == 15
    # Intra-cluster edge fraction tracks p_intra (plus the uniform tail's
    # 1/16 chance of landing home).
    row = np.repeat(np.arange(n), np.diff(rowptr))
    frac = (cluster[row] == cluster[col]).mean()
    assert 0.85 < frac < 0.97
    # Mean degree near requested.
    assert 6.0 < e / n < 10.0


def test_part_length_validation():
    rowptr, col = _random_csr(10, 30)
    with pytest.raises(ValueError):
        partition.cluster_reorder(rowptr, col, np.zeros(9, np.int64))
