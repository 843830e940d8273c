"""Plans/graphs as registered pytrees: pass through jit as ARGUMENTS.

The remote-compile fix (utils/pytree.py): closed-over plan arrays are
inlined into the compiled module as dense constants (~260 MB at headline
scale — measured HTTP 413 on the tunnel compile and ~990 s compiles);
as arguments they lower to parameters. These tests pin the contract:
static config rides aux_data (jit cache key), arrays are children, and
every spmm entry point accepts traced graphs for forward AND grad.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyg_lib_tpu import ops
from pyg_lib_tpu.ops.pallas.spmm_chunked import SpmmPlan
from pyg_lib_tpu.ops.pallas.spmm_dedup import DedupSpmmPlan, build_dedup_plan


def _graph(rng, n=300, e=4000, hub=False):
    row = rng.integers(0, n, e)
    if hub:
        p = 1.0 / np.arange(1, n + 1)**1.4
        p /= p.sum()
        col = rng.choice(n, e, p=p)
    else:
        col = rng.integers(0, n, e)
    order = np.argsort(row, kind='stable')
    rowptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(row, minlength=n), out=rowptr[1:])
    return rowptr, col[order].astype(np.int64)


def _ref(x, rowptr, col):
    n = len(rowptr) - 1
    rows = np.repeat(np.arange(n), np.diff(rowptr))
    out = np.zeros((n, x.shape[1]), np.float64)
    np.add.at(out, rows, x[col].astype(np.float64))
    return out.astype(np.float32)


def test_flatten_keeps_config_static():
    rng = np.random.default_rng(1)
    rowptr, col = _graph(rng)
    graph = ops.build_spmm_graph(rowptr, col)
    leaves, treedef = jax.tree_util.tree_flatten(graph)
    # every leaf is an array — no stray Python ints to be traced
    assert all(hasattr(leaf, 'shape') for leaf in leaves)
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(rebuilt.fwd, SpmmPlan)
    assert rebuilt.fwd.num_rows == graph.fwd.num_rows
    assert rebuilt.fwd.chunk == graph.fwd.chunk


def test_spmm_graph_as_jit_argument():
    rng = np.random.default_rng(2)
    rowptr, col = _graph(rng)
    graph = ops.build_spmm_graph(rowptr, col)
    x = jnp.asarray(rng.normal(size=(300, 32)).astype(np.float32))

    @jax.jit
    def f(x, g):
        return ops.spmm(x, g, reduce='mean')

    out = f(x, graph)
    closed = jax.jit(lambda x: ops.spmm(x, graph, reduce='mean'))(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(closed),
                               atol=1e-6)


def test_grad_through_jit_argument_graph():
    rng = np.random.default_rng(3)
    rowptr, col = _graph(rng, hub=True)
    x = rng.normal(size=(300, 32)).astype(np.float32)
    gv = rng.normal(size=(300, 32)).astype(np.float32)
    for graph in [
            ops.build_spmm_graph(rowptr, col),
            ops.build_spmm_graph(rowptr, col, dedup='on'),
    ]:

        @jax.jit
        def loss(x, g):
            return jnp.vdot(ops.spmm(x, g), jnp.asarray(gv))

        grad = jax.grad(loss)(jnp.asarray(x), graph)
        rows = np.repeat(np.arange(300), np.diff(rowptr))
        ref_grad = np.zeros_like(x)
        np.add.at(ref_grad, col, gv[rows])
        np.testing.assert_allclose(np.asarray(grad), ref_grad, atol=2e-3,
                                   rtol=2e-3)


def test_minmax_and_padded_ops_accept_traced_plans():
    rng = np.random.default_rng(4)
    rowptr, col = _graph(rng)
    graph = ops.build_spmm_graph(rowptr, col, with_edge_maps=True)
    x = jnp.asarray(rng.normal(size=(300, 16)).astype(np.float32))

    @jax.jit
    def f(x, g):
        return ops.spmm(x, g, reduce='max')

    out = f(x, graph)
    ref = jax.jit(lambda x: ops.spmm(x, graph, reduce='max'))(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    # winner-only grad with the graph passed as an argument
    g1 = jax.grad(lambda xx, gg: ops.spmm(xx, gg, reduce='max').sum(),
                  argnums=0)(x, graph)
    g2 = jax.grad(lambda xx: ops.spmm(xx, graph, reduce='max').sum())(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)

    # padded-space primitives
    msgs = jnp.take(x, graph.fwd.col_padded, axis=0)

    @jax.jit
    def s(m, g):
        return ops.segment_sum_padded(m, g.fwd)

    np.testing.assert_allclose(
        np.asarray(s(msgs, graph)),
        np.asarray(ops.segment_sum_padded(msgs, graph.fwd)), atol=1e-6)
    gm1 = jax.grad(lambda m: ops.segment_softmax_padded(m, graph.fwd).sum()
                   )(msgs)
    gm2 = jax.grad(
        lambda m, g: ops.segment_softmax_padded(m, g.fwd).sum())(msgs,
                                                                 graph)
    np.testing.assert_allclose(np.asarray(gm1), np.asarray(gm2), atol=1e-6)


def test_sharded_graph_as_jit_argument():
    rng = np.random.default_rng(5)
    rowptr, col = _graph(rng, n=700, e=9000, hub=True)
    x = rng.normal(size=(700, 32)).astype(np.float32)
    g = ops.build_spmm_graph_sharded(rowptr, col, num_splits=3, dedup='on')

    @jax.jit
    def f(x, g):
        return ops.spmm_sharded(x, g)

    out = f(jnp.asarray(x), g)
    np.testing.assert_allclose(np.asarray(out), _ref(x, rowptr, col),
                               atol=2e-3, rtol=2e-3)
    grad = jax.grad(lambda xx, gg: ops.spmm_sharded(xx, gg).sum())(
        jnp.asarray(x), g)
    assert grad.shape == x.shape


def test_same_structure_graphs_share_one_compile():
    rng = np.random.default_rng(6)
    rowptr1, col1 = _graph(rng)
    # second graph: same shapes (same n/e), different edges
    rowptr2, col2 = _graph(rng)
    g1 = ops.build_spmm_graph(rowptr1, col1, chunk=128)
    g2 = ops.build_spmm_graph(rowptr2, col2, chunk=128)
    x = jnp.asarray(rng.normal(size=(300, 16)).astype(np.float32))

    calls = {'n': 0}

    @jax.jit
    def f(x, g):
        calls['n'] += 1
        return ops.spmm(x, g)

    o1 = f(x, g1)
    if g1.fwd.chunk_tile.shape == g2.fwd.chunk_tile.shape:
        o2 = f(x, g2)
        assert calls['n'] == 1  # no retrace: plans are data, not consts
        np.testing.assert_allclose(np.asarray(o2), _ref(
            np.asarray(x), rowptr2, col2), atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(o1), _ref(
        np.asarray(x), rowptr1, col1), atol=2e-3, rtol=2e-3)


def test_dedup_hot_plan_roundtrip():
    rng = np.random.default_rng(7)
    rowptr, col = _graph(rng, hub=True)
    plan = build_dedup_plan(rowptr, col, ec=128, hot=16, hot_thresh=2)
    leaves, treedef = jax.tree_util.tree_flatten(plan)
    back = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(back, DedupSpmmPlan)
    assert back.uc == plan.uc and back.weighted == plan.weighted
    assert back.num_hot == 16


def test_aux_encoding_of_numpy_and_dicts():
    from pyg_lib_tpu.utils.pytree import _decode_aux, _encode_aux
    arr = np.array([0, 3, 7], np.int64)
    enc = _encode_aux(arr)
    hash(enc)  # must be hashable
    np.testing.assert_array_equal(_decode_aux(enc), arr)
    d = {'b': 2, 'a': arr}
    enc = _encode_aux(d)
    hash(enc)
    dec = _decode_aux(enc)
    assert dec['b'] == 2
    np.testing.assert_array_equal(dec['a'], arr)
