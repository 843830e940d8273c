"""End-to-end model + multi-device tests (8 virtual CPU devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyg_lib_tpu import sampler
from pyg_lib_tpu.models import (
    gat_forward,
    gcn_forward,
    init_gat,
    init_gcn,
    init_rgcn,
    init_sage,
    rgcn_forward,
    sage_forward,
)
from pyg_lib_tpu.testing import cycle_graph


@pytest.fixture
def batch():
    rowptr, col = cycle_graph(32)
    out = sampler.neighbor_sample(rowptr, col, np.arange(0, 32, 4), [4, 4],
                                  rng=0)
    b = sampler.padding.pad_sample_output(out, max_nodes=64, max_edges=128,
                                          num_seeds=8)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(64, 16)).astype(np.float32))
    return b, x


@pytest.mark.slow
def test_gcn_forward_grad(batch):
    b, x = batch
    params = init_gcn(jax.random.key(0), [16, 32, 7])
    rp, rw = jnp.asarray(b.rowptr), jnp.asarray(b.row)
    out = jax.jit(gcn_forward)(params, x, rp, rw)
    assert out.shape == (64, 7)
    assert bool(jnp.isfinite(out).all())
    g = jax.grad(lambda p: (gcn_forward(p, x, rp, rw)**2).sum())(params)
    assert bool(jnp.isfinite(g['layers'][0]['w']).all())


def test_sage_forward(batch):
    b, x = batch
    params = init_sage(jax.random.key(0), [16, 32, 7])
    rp, rw = jnp.asarray(b.rowptr), jnp.asarray(b.row)
    for aggr in ['mean', 'max']:
        out = sage_forward(params, x, rp, rw, aggr=aggr)
        assert out.shape == (64, 7)
        assert bool(jnp.isfinite(out).all())


def test_gat_forward(batch):
    b, x = batch
    params = init_gat(jax.random.key(0), [16, 8, 7], heads=2)
    rp = jnp.asarray(b.rowptr)
    out = gat_forward(params, x, rp, jnp.asarray(b.row),
                      jnp.asarray(b.col))
    assert out.shape == (64, 7)
    assert bool(jnp.isfinite(out).all())


def test_rgcn_forward():
    # Edges sorted by relation: 2 relations over 8 nodes.
    n, f = 8, 16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    row = jnp.asarray(np.array([0, 1, 2, 3, 4, 5], np.int32))
    col = jnp.asarray(np.array([1, 2, 3, 4, 5, 6], np.int32))
    rel_ptr = jnp.asarray(np.array([0, 3, 6], np.int32))
    params = init_rgcn(jax.random.key(0), [f, 4], num_relations=2)
    out = rgcn_forward(params, x, row, col, rel_ptr)
    assert out.shape == (n, 4)
    assert bool(jnp.isfinite(out).all())


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[1] == 7


def test_ring_halo_aggregate_matches_dense():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pyg_lib_tpu import parallel, partition

    rng = np.random.default_rng(0)
    d = 8
    n, e, f = 64, 600, 16
    deg = rng.multinomial(e, np.ones(n) / n)
    rowptr = np.zeros(n + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    col = rng.integers(0, n, size=e).astype(np.int64)
    x = rng.normal(size=(n, f)).astype(np.float32)

    part = partition.mesh_edge_partition_blocked(rowptr, col, d)
    mesh = parallel.make_mesh((d,), axis_names=('data',))
    out = parallel.ring_halo_aggregate(mesh, jnp.asarray(x),
                                       jnp.asarray(part.rowptr_blk),
                                       jnp.asarray(part.src_blk))
    ref = np.zeros((n, f), np.float32)
    np.add.at(ref, np.repeat(np.arange(n), deg), x[col])
    np.testing.assert_allclose(np.asarray(out)[:n], ref, atol=1e-4,
                               rtol=1e-4)


@pytest.mark.slow
def test_ring_halo_aggregate_grad():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pyg_lib_tpu import parallel, partition

    rng = np.random.default_rng(1)
    d = 4
    n, e, f = 32, 200, 8
    deg = rng.multinomial(e, np.ones(n) / n)
    rowptr = np.zeros(n + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    col = rng.integers(0, n, size=e).astype(np.int64)
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))

    part = partition.mesh_edge_partition_blocked(rowptr, col, d)
    mesh = parallel.make_mesh((d,), axis_names=('data',),
                              devices=jax.devices()[:d])
    rb, sb = jnp.asarray(part.rowptr_blk), jnp.asarray(part.src_blk)

    def loss(x):
        return jnp.sum(parallel.ring_halo_aggregate(mesh, x, rb, sb)**2)

    g = jax.grad(loss)(x)
    # numeric check at one coordinate
    eps = 1e-2
    idx = (3, 2)
    num = (loss(x.at[idx].add(eps)) - loss(x.at[idx].add(-eps))) / (2 * eps)
    assert np.isclose(float(g[idx]), float(num), rtol=1e-2, atol=1e-1)


@pytest.mark.slow
def test_rgcn_planned_matches_per_relation_spmm():
    """The fused hetero plan (one grouped GEMM + one weighted reduce per
    dst type) must reproduce rgcn_forward_spmm exactly."""
    import numpy as np
    from pyg_lib_tpu.models import gnn

    rng = np.random.default_rng(0)
    num_nodes = {'a': 40, 'b': 25, 'c': 10}
    rels = [('a', 'r1', 'b'), ('b', 'r2', 'a'), ('c', 'r3', 'b'),
            ('a', 'r4', 'a')]
    rowptr_d, col_d = {}, {}
    for (s, r, d) in rels:
        deg = rng.integers(0, 5, size=num_nodes[d])
        rp = np.zeros(num_nodes[d] + 1, np.int64)
        rp[1:] = np.cumsum(deg)
        rowptr_d[(s, r, d)] = rp
        col_d[(s, r, d)] = rng.integers(0, num_nodes[s], size=int(rp[-1]))

    params = gnn.init_rgcn_spmm(jax.random.PRNGKey(0), [16, 32, 8],
                                num_relations=len(rels))
    # planned kernels compute in f32 (kernel contract)
    params = jax.tree.map(lambda a: a.astype(jnp.float32), params)
    x_dict = {t: jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
              for t, n in num_nodes.items()}

    graphs = gnn.build_rgcn_graphs(rowptr_d, col_d, num_nodes)
    ref = gnn.rgcn_forward_spmm(params, x_dict, graphs)

    hplan = gnn.build_rgcn_planned(rowptr_d, col_d, num_nodes)
    out = gnn.rgcn_forward_planned(params, x_dict, hplan)

    for t in num_nodes:
        np.testing.assert_allclose(np.asarray(out[t]),
                                   np.asarray(ref[t]), rtol=2e-4,
                                   atol=2e-4)

    # differentiable end to end
    g = jax.grad(lambda p: sum(
        (v ** 2).sum()
        for v in gnn.rgcn_forward_planned(p, x_dict, hplan).values()))(
            params)
    flat, _ = jax.tree.flatten(g)
    assert all(bool(jnp.isfinite(x).all()) for x in flat)


def test_train_step_accum_matches_big_batch():
    """accum_steps=K over K microbatches == one mean-loss step over the
    concatenated batch (same update, same loss)."""
    import optax
    from jax.sharding import Mesh, PartitionSpec as P

    from pyg_lib_tpu.parallel import make_train_step

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ('data', ))
    rng = np.random.default_rng(0)
    w = {'w': jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))}
    xs = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32))
    ys = jnp.asarray(rng.normal(size=(32, 4)).astype(np.float32))

    def loss_fn(params, batch):
        x, y = batch
        return jnp.mean((x @ params['w'] - y)**2)

    opt = optax.sgd(0.1)

    big = make_train_step(loss_fn, opt, mesh, batch_spec=P('data'),
                          donate=False)
    acc = make_train_step(loss_fn, opt, mesh,
                          batch_spec=P(None, 'data'), accum_steps=4,
                          remat=True, donate=False)

    st = opt.init(w)
    p1, _, l1 = big(w, st, (xs, ys))
    p2, _, l2 = acc(w, st, (xs.reshape(4, 8, 16), ys.reshape(4, 8, 4)))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p1['w']), np.asarray(p2['w']),
                               rtol=1e-5, atol=1e-6)


def test_train_step_param_spec_and_donate():
    import optax
    from jax.sharding import Mesh, PartitionSpec as P

    from pyg_lib_tpu.parallel import make_train_step

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ('model', ))
    rng = np.random.default_rng(1)
    w = {'w': jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))}

    def loss_fn(params, batch):
        return jnp.mean((batch @ params['w'])**2)

    opt = optax.adam(1e-2)
    step = make_train_step(loss_fn, opt, mesh, param_spec=P(None, 'model'),
                           donate=True)
    st = opt.init(w)
    x = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    p, st, loss = step(w, st, x)
    assert np.isfinite(float(loss))
    # Donated + param_spec: updated params keep the requested sharding.
    assert p['w'].sharding.spec == P(None, 'model')
    with pytest.raises(ValueError, match='accum_steps'):
        make_train_step(loss_fn, opt, mesh, accum_steps=0)


def test_rgcn_range_sliced_matches_per_relation_spmm():
    """The range-sliced fused plan (per-relation slice gathers + one
    weighted fused reduce) must also reproduce rgcn_forward_spmm."""
    import numpy as np
    from pyg_lib_tpu.models import gnn

    rng = np.random.default_rng(5)
    num_nodes = {'a': 40, 'b': 25, 'c': 10}
    rels = [('a', 'r1', 'b'), ('b', 'r2', 'a'), ('c', 'r3', 'b'),
            ('a', 'r4', 'a')]
    rowptr_d, col_d = {}, {}
    for (s, r, d) in rels:
        deg = rng.integers(0, 5, size=num_nodes[d])
        rp = np.zeros(num_nodes[d] + 1, np.int64)
        rp[1:] = np.cumsum(deg)
        rowptr_d[(s, r, d)] = rp
        col_d[(s, r, d)] = rng.integers(0, num_nodes[s], size=int(rp[-1]))

    params = gnn.init_rgcn_spmm(jax.random.PRNGKey(0), [16, 32, 8],
                                num_relations=len(rels))
    params = jax.tree.map(lambda a: a.astype(jnp.float32), params)
    x_dict = {t: jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
              for t, n in num_nodes.items()}

    graphs = gnn.build_rgcn_graphs(rowptr_d, col_d, num_nodes)
    ref = gnn.rgcn_forward_spmm(params, x_dict, graphs)
    hplan = gnn.build_rgcn_planned(rowptr_d, col_d, num_nodes, chunk=128,
                                   range_sliced=True)
    out = gnn.rgcn_forward_planned(params, x_dict, hplan)
    for t in num_nodes:
        np.testing.assert_allclose(np.asarray(out[t]),
                                   np.asarray(ref[t]), rtol=2e-4,
                                   atol=2e-4)

    def loss(p, fwd, plan):
        o = fwd(p, x_dict, plan)
        return sum(jnp.sum(v**2) for v in o.values())

    g1 = jax.grad(loss)(params, gnn.rgcn_forward_spmm, graphs)
    g2 = jax.grad(loss)(params, gnn.rgcn_forward_planned, hplan)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4), g1, g2)
