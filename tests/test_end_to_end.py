"""End-to-end training tests: the milestone-config shapes actually learn
(BASELINE.json configs 1-2 at synthetic scale)."""

import sys
import os

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def test_full_batch_gcn_learns():
    from examples.train_gcn import main
    acc = main(num_nodes=200, epochs=60, verbose=False)
    assert acc > 0.85, acc


def test_minibatch_sage_learns():
    from examples.train_sage_minibatch import main
    acc = main(num_nodes=400, steps=40, batch_size=32, verbose=False)
    assert acc > 0.8, acc


@pytest.mark.slow
def test_hetero_rgcn_learns():
    from examples.train_rgcn_hetero import main
    acc = main(num_papers=200, num_authors=100, steps=40, batch_size=24,
               verbose=False)
    assert acc > 0.8, acc


def test_gcn_spmm_matches_padded_csr_path():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pyg_lib_tpu import ops
    from pyg_lib_tpu.datasets import sbm_graph
    from pyg_lib_tpu.models import gcn_forward, gcn_forward_spmm, init_gcn

    d = sbm_graph(num_nodes=300, num_classes=3, seed=1)
    rowptr, col = d['rowptr'], d['col']
    graph = ops.build_spmm_graph(rowptr, col)
    params = init_gcn(jax.random.key(1), [d['x'].shape[1], 16, 3])
    x = jnp.asarray(d['x'])

    a = gcn_forward_spmm(params, x, graph)
    # padded path: full graph as one "batch", row = col ids per CSR slot
    b = gcn_forward(params, x, jnp.asarray(rowptr), jnp.asarray(col))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                               rtol=2e-4)


@pytest.mark.slow
def test_gat_spmm_trains_on_sbm():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from pyg_lib_tpu import ops
    from pyg_lib_tpu.datasets import sbm_graph
    from pyg_lib_tpu.models import gat_forward_spmm, init_gat_spmm

    d = sbm_graph(num_nodes=300, num_classes=3, seed=2)
    graph = ops.build_spmm_graph(d['rowptr'], d['col'], chunk=256,
                                 with_edge_maps=True)
    x = jnp.asarray(d['x'])
    y = jnp.asarray(d['y'].astype(np.int32))
    train = jnp.asarray(d['train_mask'])

    params = init_gat_spmm(jax.random.key(0), [d['x'].shape[1], 16, 3],
                           heads=1)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = gat_forward_spmm(p, x, graph)
            logp = jax.nn.log_softmax(logits)
            nll = -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
            return jnp.where(train, nll, 0).sum() / train.sum()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(20):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, losses


def test_padded_softmax_sum_grads_numeric():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pyg_lib_tpu import ops

    rng = np.random.default_rng(0)
    n, e = 40, 300
    deg = rng.multinomial(e, np.ones(n) / n)
    rowptr = np.zeros(n + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    col = rng.integers(0, n, size=e).astype(np.int32)
    graph = ops.build_spmm_graph(rowptr, col, chunk=256,
                                 with_edge_maps=True)
    plan = graph.fwd
    xp = jnp.asarray(rng.normal(size=(plan.col_padded.shape[0],
                                      128)).astype(np.float32))

    def f(a):
        sm = ops.segment_softmax_padded(a, plan)
        return jnp.sum(ops.segment_sum_padded(sm * a, plan)**2)

    g = jax.grad(f)(xp)
    eps = 1e-2
    # pick a real (non-pad) slot
    slot = int(np.asarray(plan.edge_pos)[5])
    idx = (slot, 3)
    num = (f(xp.at[idx].add(eps)) - f(xp.at[idx].add(-eps))) / (2 * eps)
    assert np.isclose(float(g[idx]), float(num), rtol=2e-2, atol=2e-2)


def test_sage_maxpool_spmm_trains():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from pyg_lib_tpu import ops
    from pyg_lib_tpu.datasets import sbm_graph
    from pyg_lib_tpu.models import init_sage, sage_maxpool_forward_spmm

    d = sbm_graph(num_nodes=300, num_classes=3, seed=4)
    graph = ops.build_spmm_graph(d['rowptr'], d['col'], chunk=256,
                                 with_edge_maps=True)
    x = jnp.asarray(d['x'])
    y = jnp.asarray(d['y'].astype(np.int32))
    train = jnp.asarray(d['train_mask'])
    params = init_sage(jax.random.key(0), [d['x'].shape[1], 16, 3])
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = sage_maxpool_forward_spmm(p, x, graph)
            logp = jax.nn.log_softmax(logits)
            nll = -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
            return jnp.where(train, nll, 0).sum() / train.sum()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(25):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, losses


def test_rgcn_spmm_hetero_trains():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from pyg_lib_tpu.models import (build_rgcn_graphs, init_rgcn_spmm,
                                    rgcn_forward_spmm)

    rng = np.random.default_rng(3)
    n_a, n_b = 200, 120

    def csr(nd, ns, d):  # dst-major CSR: rowptr over dst, col = src ids
        deg = rng.integers(0, 2 * d, size=nd)
        rp = np.zeros(nd + 1, np.int64)
        rp[1:] = np.cumsum(deg)
        return rp, rng.integers(0, ns, size=int(rp[-1])).astype(np.int64)

    rowptr_d, col_d = {}, {}
    rowptr_d[('a', 'to', 'a')], col_d[('a', 'to', 'a')] = csr(n_a, n_a, 4)
    rowptr_d[('b', 'to', 'a')], col_d[('b', 'to', 'a')] = csr(n_a, n_b, 2)
    rowptr_d[('a', 'to', 'b')], col_d[('a', 'to', 'b')] = csr(n_b, n_a, 2)

    graphs = build_rgcn_graphs(rowptr_d, col_d, {'a': n_a, 'b': n_b},
                               chunk=256)
    x_dict = {'a': jnp.asarray(rng.normal(size=(n_a, 16)).astype(
        np.float32)),
              'b': jnp.asarray(rng.normal(size=(n_b, 16)).astype(
                  np.float32))}
    # labels on 'a' correlated with features through a fixed projection
    proj = rng.normal(size=(16, 3)).astype(np.float32)
    y = jnp.asarray((np.asarray(x_dict['a']) @ proj).argmax(-1).astype(
        np.int32))

    params = init_rgcn_spmm(jax.random.key(0), [16, 16, 3],
                            num_relations=3)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = rgcn_forward_spmm(p, x_dict, graphs)
            logp = jax.nn.log_softmax(out['a'])
            return -jnp.take_along_axis(logp, y[:, None], axis=1).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, losses


def test_spmm_bf16_inputs():
    import jax.numpy as jnp
    import numpy as np

    from pyg_lib_tpu import ops

    rng = np.random.default_rng(11)
    rowptr = np.zeros(65, np.int64)
    rowptr[1:] = np.cumsum(rng.multinomial(800, np.ones(64) / 64))
    col = rng.integers(0, 64, size=800).astype(np.int64)
    x = rng.normal(size=(64, 128)).astype(np.float32)
    graph = ops.build_spmm_graph(rowptr, col, chunk=256)

    out = np.asarray(ops.spmm(jnp.asarray(x).astype(jnp.bfloat16),
                              graph)).astype(np.float32)
    ref = np.zeros((64, 128), np.float32)
    np.add.at(ref, np.repeat(np.arange(64), np.diff(rowptr)),
              x[col].astype(np.float32))
    # bf16 inputs: ~2 decimal digits relative
    np.testing.assert_allclose(out, ref, rtol=0.05, atol=0.3)


def test_node2vec_example_learns_communities():
    from examples.train_node2vec import main
    agree = main(num_nodes=300, steps=120, dim=16, batch=128,
                 walk_length=8, verbose=False)
    # SBM has 4 communities; random 1-NN agreement would be ~0.25
    assert agree > 0.5


def test_pointcloud_example_learns_shapes():
    from examples.train_pointcloud import main
    acc = main(steps=120, k=10, n_pts=96, verbose=False)
    assert acc > 0.5  # 3 classes, random = 0.33
