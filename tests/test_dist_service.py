"""Distributed sampling service + collective feature fetch.

Protocol-step testing mirrors the reference strategy (pure functions, one
process — ``test/csrc/sampler/test_dist_neighbor.cpp``); the device
collective runs on the 8-virtual-device CPU mesh from conftest.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyg_lib_tpu import sampler
from pyg_lib_tpu.parallel import make_mesh
from pyg_lib_tpu.sampler.dist_service import (
    DistNeighborSampler,
    collective_feature_fetch,
    partition_graph,
)


def _random_csr(rng, n, max_deg):
    deg = rng.integers(0, max_deg + 1, size=n)
    rowptr = np.zeros(n + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    col = rng.integers(0, n, size=int(rowptr[-1]))
    return rowptr, col.astype(np.int64)


def test_partition_book_owner_roundtrip():
    rng = np.random.default_rng(0)
    rowptr, col = _random_csr(rng, 100, 5)
    g = partition_graph(rowptr, col, 4)
    ids = rng.integers(0, 100, size=50)
    owner = g.book.owner(ids)
    for v, p in zip(ids, owner):
        assert g.book.bounds[p] <= v < g.book.bounds[p + 1]
    # partition CSRs tile the global CSR exactly
    recon_col = np.concatenate(g.col_parts)
    np.testing.assert_array_equal(recon_col, col)


def test_dist_sampler_full_fanout_matches_local_sampler():
    """With full fanout the protocol must enumerate exactly what the
    single-machine sampler enumerates (same relabel contract)."""
    rng = np.random.default_rng(1)
    rowptr, col = _random_csr(rng, 60, 4)
    g = partition_graph(rowptr, col, 3)
    seeds = np.array([5, 41, 17], np.int64)

    ds = DistNeighborSampler(g, rng=7)
    row, col_out, node_id, nph = ds.sample(seeds, [-1, -1])

    ref = sampler.neighbor_sample(rowptr, col, seeds, [-1, -1], rng=7)
    np.testing.assert_array_equal(row, np.asarray(ref[0]))
    np.testing.assert_array_equal(col_out, np.asarray(ref[1]))
    np.testing.assert_array_equal(node_id, np.asarray(ref[2]))
    # Frontier dedup makes per-hop counts the local sampler's new-unique
    # counts exactly.
    assert nph == list(ref[4])


def test_dist_sampler_finite_fanout_structure():
    rng = np.random.default_rng(2)
    rowptr, col = _random_csr(rng, 200, 8)
    g = partition_graph(rowptr, col, 4)
    seeds = np.array([0, 100, 150], np.int64)
    row, col_out, node_id, nph = DistNeighborSampler(g, rng=3).sample(
        seeds, [3, 2])
    assert nph[0] == 3
    assert len(row) == len(col_out)
    # every edge references valid local ids; every local id maps to a
    # real global node whose adjacency contains the edge target
    assert (np.asarray(col_out) < len(node_id)).all()
    for r, c in zip(row, col_out):
        src_g = node_id[r]
        dst_g = node_id[c]
        nbrs = col[rowptr[src_g]:rowptr[src_g + 1]]
        assert dst_g in nbrs


def test_collective_feature_fetch_8dev():
    n_dev = 8
    if len(jax.devices()) < n_dev:
        pytest.skip('needs 8 virtual devices')
    mesh = make_mesh((n_dev, ), ('data', ), devices=jax.devices()[:n_dev])
    rng = np.random.default_rng(4)
    n, f = 64, 16  # 8 rows per device
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, n, size=24).astype(np.int32))
    out = collective_feature_fetch(mesh, x, ids, axis='data')
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(x)[np.asarray(ids)], rtol=1e-6)


def test_hetero_dist_sampler_full_fanout_matches_local():
    """Hetero protocol loop: with full fanout, per-edge-type (row, col)
    and per-type node_id must match the single-machine hetero sampler
    exactly (same mapper order via hetero_relabel_neighborhood)."""
    from pyg_lib_tpu.sampler.dist_service import (
        HeteroDistNeighborSampler,
        partition_hetero_graph,
    )

    rng = np.random.default_rng(5)
    num_nodes = {'u': 40, 'v': 30}
    rels = [('u', 'r1', 'v'), ('v', 'r2', 'u')]
    rowptr_d, col_d = {}, {}
    for (s, r, d) in rels:  # src-major CSRs (library convention)
        deg = rng.integers(0, 4, size=num_nodes[s])
        rp = np.zeros(num_nodes[s] + 1, np.int64)
        rp[1:] = np.cumsum(deg)
        rowptr_d[(s, r, d)] = rp
        col_d[(s, r, d)] = rng.integers(0, num_nodes[d], size=int(rp[-1]))

    seeds = {'v': np.array([3, 17], np.int64)}
    nn = {k: [-1, -1] for k in rels}

    hg = partition_hetero_graph(rowptr_d, col_d, num_nodes, 3)
    row_d, col_out_d, node_id = HeteroDistNeighborSampler(hg, rng=2).sample(
        seeds, nn)

    ref = sampler.hetero_neighbor_sample(rowptr_d, col_d, seeds, nn)
    for k in rels:
        np.testing.assert_array_equal(row_d[k], np.asarray(ref[0][k]))
        np.testing.assert_array_equal(col_out_d[k], np.asarray(ref[1][k]))
    for t in num_nodes:
        np.testing.assert_array_equal(node_id[t], np.asarray(ref[2][t]))


def test_hetero_collective_fetch_8dev():
    from pyg_lib_tpu.sampler.dist_service import (
        hetero_collective_feature_fetch, )

    n_dev = 8
    if len(jax.devices()) < n_dev:
        pytest.skip('needs 8 virtual devices')
    mesh = make_mesh((n_dev, ), ('data', ), devices=jax.devices()[:n_dev])
    rng = np.random.default_rng(9)
    xs = {'a': jnp.asarray(rng.normal(size=(64, 8)).astype(np.float32)),
          'b': jnp.asarray(rng.normal(size=(32, 8)).astype(np.float32))}
    ids = {'a': jnp.asarray(rng.integers(0, 64, size=16).astype(np.int32)),
           'b': jnp.asarray(rng.integers(0, 32, size=8).astype(np.int32))}
    out = hetero_collective_feature_fetch(mesh, xs, ids)
    for t in ids:
        np.testing.assert_allclose(
            np.asarray(out[t]), np.asarray(xs[t])[np.asarray(ids[t])],
            rtol=1e-6)


# ------------------------------------------------- process transport -------


@pytest.mark.slow
def test_sampling_service_matches_inprocess():
    """Transported runs must be bit-identical to in-process runs (the
    rng seeds are computed coordinator-side; sampling is counter-based)."""
    from pyg_lib_tpu.sampler.dist_service import (DistNeighborSampler,
                                                  partition_graph)
    from pyg_lib_tpu.sampler.transport import SamplingService

    rng = np.random.default_rng(3)
    n, e = 200, 1600
    deg = rng.multinomial(e, np.ones(n) / n)
    rowptr = np.zeros(n + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    col = rng.integers(0, n, size=e).astype(np.int64)
    graph = partition_graph(rowptr, col, 3)

    seeds = rng.choice(n, size=32, replace=False).astype(np.int64)
    local = DistNeighborSampler(graph, rng=5)
    row_l, col_l, nid_l, nph_l = local.sample(seeds, [4, 3])

    with SamplingService.spawn(graph) as svc:
        remote = DistNeighborSampler(graph, rng=5, service=svc)
        row_r, col_r, nid_r, nph_r = remote.sample(seeds, [4, 3])
        np.testing.assert_array_equal(row_r, row_l)
        np.testing.assert_array_equal(col_r, col_l)
        np.testing.assert_array_equal(nid_r, nid_l)
        assert nph_r == nph_l
        # second batch advances the coordinator step identically
        r2l = DistNeighborSampler(graph, rng=5)
        r2l.sample(seeds, [4, 3])
        row2_l, *_ = r2l.sample(seeds[:8], [2])
        row2_r, *_ = remote.sample(seeds[:8], [2])
        np.testing.assert_array_equal(row2_r, row2_l)


@pytest.mark.slow
def test_sampling_service_hetero_matches_inprocess():
    from pyg_lib_tpu.sampler.dist_service import (
        HeteroDistNeighborSampler, partition_hetero_graph)
    from pyg_lib_tpu.sampler.transport import SamplingService

    rng = np.random.default_rng(4)
    n_a, n_b, e = 60, 90, 700
    deg = rng.multinomial(e, np.ones(n_a) / n_a)
    rowptr = np.zeros(n_a + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    col = rng.integers(0, n_b, size=e).astype(np.int64)
    k = ('a', 'to', 'b')
    graph = partition_hetero_graph({k: rowptr}, {k: col},
                                   {'a': n_a, 'b': n_b}, 2)
    seeds = {'a': rng.choice(n_a, size=10, replace=False).astype(np.int64)}

    local = HeteroDistNeighborSampler(graph, rng=1)
    row_l, col_l, nid_l = local.sample(seeds, {k: [3, 2]})
    with SamplingService.spawn(graph) as svc:
        remote = HeteroDistNeighborSampler(graph, rng=1, service=svc)
        row_r, col_r, nid_r = remote.sample(seeds, {k: [3, 2]})
    for d_l, d_r in ((row_l, row_r), (col_l, col_r), (nid_l, nid_r)):
        assert d_l.keys() == d_r.keys()
        for key in d_l:
            np.testing.assert_array_equal(d_r[key], d_l[key])


@pytest.mark.slow
def test_sampling_service_error_propagates_and_survives():
    from pyg_lib_tpu.sampler.dist_service import partition_graph
    from pyg_lib_tpu.sampler.transport import SamplingService

    rowptr = np.array([0, 1, 2], np.int64)
    col = np.array([1, 0], np.int64)
    graph = partition_graph(rowptr, col, 2)
    with SamplingService.spawn(graph) as svc:
        with pytest.raises(RuntimeError, match='partition 0 failed'):
            svc.scatter({0: ('bogus_op', )})
        # server keeps serving after a failed request
        out = svc.scatter(
            {0: ('sample', np.array([0], np.int64), 1, 7, False, 'auto')})
        nodes, eids, cumsum = out[0]
        assert nodes[0] == 0 and len(cumsum) == 2


@pytest.mark.slow
def test_sampling_service_drains_replies_on_partial_error():
    """A failed partition must not desynchronise the OTHER partitions'
    reply FIFOs: the next scatter still pairs requests with their own
    replies."""
    from pyg_lib_tpu.sampler.dist_service import partition_graph
    from pyg_lib_tpu.sampler.transport import SamplingService

    rowptr = np.array([0, 1, 2, 3, 4], np.int64)
    col = np.array([1, 0, 3, 2], np.int64)
    graph = partition_graph(rowptr, col, 2)
    good = ('sample', np.array([0], np.int64), 1, 7, False, 'auto')
    with SamplingService.spawn(graph) as svc:
        with pytest.raises(RuntimeError, match='partition 0 failed'):
            svc.scatter({0: ('bogus_op', ), 1: good})
        # Both connections are drained: a fresh scatter returns fresh,
        # correctly-attributed results from both partitions.
        out = svc.scatter({
            0: good,
            1: ('sample', np.array([0], np.int64), 1, 9, False, 'auto'),
        })
        n0 = out[0][0]
        n1 = out[1][0]
        assert n0[0] == 0 and n1[0] == 0


def test_transport_requires_authkey_for_connect():
    from pyg_lib_tpu.sampler.transport import SamplingService, serve_partition

    with pytest.raises(ValueError, match='authkey'):
        SamplingService.connect([('127.0.0.1', 1)])
    with pytest.raises(ValueError, match='authkey'):
        serve_partition(('127.0.0.1', 1), {})


def test_dist_sampler_duplicate_frontier_rows():
    """Duplicate sampled nodes must not shift relabel row ids: the next
    hop expands NEW unique nodes only (mapper order), like the
    single-machine sampler's sliding window."""
    from pyg_lib_tpu.sampler.dist_service import (DistNeighborSampler,
                                                  partition_graph)

    # 0 -> 5, 5 -> 7 on 8 nodes.
    rowptr = np.array([0, 1, 1, 1, 1, 1, 2, 2, 2], np.int64)
    col = np.array([5, 7], np.int64)
    graph = partition_graph(rowptr, col, 2)
    s = DistNeighborSampler(graph, rng=0, replace=True)
    row, c, node_id, per_hop = s.sample(np.array([0], np.int64), [2, 1])
    # hop 0: node 0 draws [5, 5]; hop 1 expands the UNIQUE node 5 once.
    np.testing.assert_array_equal(node_id, [0, 5, 7])
    np.testing.assert_array_equal(row, [0, 0, 1])
    np.testing.assert_array_equal(c, [1, 1, 2])
    # per-hop counts are NEW unique nodes (single-machine semantics):
    # hop 0 discovers {5} once despite drawing it twice.
    assert per_hop == [1, 1, 1]


def test_hetero_relabel_shared_dst_cursor():
    """Two edge types ending at the same dst type read disjoint regions
    of the shared per-type node stream (one cursor per dst type)."""
    from pyg_lib_tpu.sampler.dist import hetero_relabel_neighborhood

    node_types = ['A', 'B', 'T']
    edge_types = [('A', 'r1', 'T'), ('B', 'r2', 'T')]
    seed = {'A': np.array([0]), 'B': np.array([0]),
            'T': np.zeros(0, np.int64)}
    # Coordinator appends r1's merged output then r2's into T's stream.
    sampled = {'A': np.zeros(0, np.int64), 'B': np.zeros(0, np.int64),
               'T': np.array([3, 4, 7, 8], np.int64)}
    counts = {('A', 'r1', 'T'): [[2]], ('B', 'r2', 'T'): [[2]]}
    rows, cols = hetero_relabel_neighborhood(
        node_types, edge_types, seed, sampled, counts,
        {'A': 1, 'B': 1, 'T': 10})
    np.testing.assert_array_equal(cols[('A', 'r1', 'T')], [0, 1])  # 3, 4
    np.testing.assert_array_equal(cols[('B', 'r2', 'T')], [2, 3])  # 7, 8


def test_hetero_dist_sampler_shared_dst_type():
    """End-to-end: two relations into one dst type produce the correct
    per-relation cols (ogbn-mag's cites/writes shape)."""
    from pyg_lib_tpu.sampler.dist_service import (
        HeteroDistNeighborSampler, partition_hetero_graph)

    rowptr_d = {('A', 'r1', 'T'): np.array([0, 2], np.int64),
                ('B', 'r2', 'T'): np.array([0, 2], np.int64)}
    col_d = {('A', 'r1', 'T'): np.array([3, 4], np.int64),
             ('B', 'r2', 'T'): np.array([7, 8], np.int64)}
    nn = {'A': 1, 'B': 1, 'T': 10}
    g = partition_hetero_graph(rowptr_d, col_d, nn, 1)
    s = HeteroDistNeighborSampler(g, rng=0)
    rows, cols, node_id = s.sample(
        {'A': np.array([0]), 'B': np.array([0])},
        {('A', 'r1', 'T'): [2], ('B', 'r2', 'T'): [2]})
    np.testing.assert_array_equal(np.sort(node_id['T']), [3, 4, 7, 8])
    got_r1 = node_id['T'][cols[('A', 'r1', 'T')]]
    got_r2 = node_id['T'][cols[('B', 'r2', 'T')]]
    np.testing.assert_array_equal(np.sort(got_r1), [3, 4])
    np.testing.assert_array_equal(np.sort(got_r2), [7, 8])


def test_dist_sampler_full_fanout_fuzz_matches_local():
    """Across random denser graphs (duplicate discoveries guaranteed),
    the dist protocol must reproduce the single-machine sampler
    EXACTLY — rows, cols, node ids and per-hop unique counts."""
    for trial in range(5):
        rng = np.random.default_rng(100 + trial)
        n = int(rng.integers(40, 200))
        e = int(rng.integers(n, 6 * n))
        rowptr, col = _random_csr(rng, n, e)
        parts = int(rng.integers(2, 5))
        g = partition_graph(rowptr, col, parts)
        seeds = np.unique(rng.integers(0, n, size=4)).astype(np.int64)
        hops = [[-1, -1], [-1, -1, -1]][trial % 2]

        ds = DistNeighborSampler(g, rng=7)
        row, col_out, node_id, nph = ds.sample(seeds, hops)
        ref = sampler.neighbor_sample(rowptr, col, seeds, hops, rng=7)
        msg = f'trial {trial}: n={n} e={e} parts={parts}'
        np.testing.assert_array_equal(row, np.asarray(ref[0]), err_msg=msg)
        np.testing.assert_array_equal(col_out, np.asarray(ref[1]),
                                      err_msg=msg)
        np.testing.assert_array_equal(node_id, np.asarray(ref[2]),
                                      err_msg=msg)
        # Frontier dedup makes per-hop counts the local sampler's
        # new-unique counts exactly.
        assert nph == list(ref[4]), msg
