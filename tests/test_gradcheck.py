"""Numerical (finite-difference) gradient checks.

The reference verifies every differentiable op with
``torch.autograd.gradcheck`` in double precision
(``test/ops/test_scatter.py:190-203``, ``test/ops/test_composite.py``).
Round 1 compared against hand-derived gradients only — a shared bug
between oracle and VJP would pass. ``jax.test_util.check_grads`` closes
that hole (float64 on the CPU test backend; x64 from conftest).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.test_util import check_grads

from pyg_lib_tpu import ops

_KW = dict(order=1, modes=('rev', ), atol=1e-4, rtol=1e-4)


@pytest.fixture(scope='module')
def data():
    rng = np.random.default_rng(0)
    n, e, f = 9, 40, 3
    idx = np.sort(rng.integers(0, n, size=e))
    deg = np.bincount(idx, minlength=n)
    rowptr = np.zeros(n + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    src = rng.normal(size=(e, f))
    return dict(n=n, e=e, f=f, idx=jnp.asarray(idx),
                rowptr=jnp.asarray(rowptr), src=jnp.asarray(src), rng=rng)


@pytest.mark.parametrize('red', ['sum', 'mean', 'mul'])
def test_scatter_value_grads(data, red):
    fn = getattr(ops, f'scatter_{red}')
    check_grads(lambda s: fn(s, data['idx'], dim=0, dim_size=data['n']),
                (data['src'], ), **_KW)


@pytest.mark.parametrize('red', ['min', 'max'])
def test_scatter_minmax_grads(data, red):
    # perturbations must not flip the winner: make entries well-separated
    src = data['src'] * 100.0
    fn = getattr(ops, f'scatter_{red}')
    check_grads(
        lambda s: fn(s, data['idx'], dim=0, dim_size=data['n'])[0],
        (src, ), **_KW)


@pytest.mark.parametrize('red', ['sum', 'mean', 'min', 'max'])
def test_segment_csr_grads(data, red):
    fn = getattr(ops, f'segment_{red}_csr')
    src = data['src'] * (100.0 if red in ('min', 'max') else 1.0)
    if red in ('min', 'max'):
        check_grads(lambda s: fn(s, data['rowptr'])[0], (src, ), **_KW)
    else:
        check_grads(lambda s: fn(s, data['rowptr']), (src, ), **_KW)


@pytest.mark.parametrize('red', ['sum', 'mean', 'min', 'max'])
def test_segment_coo_batched_grads(data, red):
    rng = np.random.default_rng(1)
    idx = np.sort(rng.integers(0, 5, size=(2, 12)), axis=1)
    src = jnp.asarray(rng.normal(size=(2, 12, 3)) * 100.0)
    fn = getattr(ops, f'segment_{red}_coo')

    def f(s):
        out = fn(s, jnp.asarray(idx), dim_size=5)
        return out[0] if isinstance(out, tuple) else out

    check_grads(f, (src, ), **_KW)


def test_gather_csr_grad(data):
    x = jnp.asarray(np.random.default_rng(2).normal(size=(data['n'],
                                                          data['f'])))
    check_grads(
        lambda s: ops.gather_csr(s, data['rowptr'], out_size=data['e']),
        (x, ), **_KW)


def test_softmax_csr_grad(data):
    check_grads(lambda s: ops.softmax_csr(s, data['rowptr'], dim=0),
                (data['src'], ), **_KW)


def test_segment_matmul_grads():
    rng = np.random.default_rng(3)
    ptr = jnp.asarray(np.array([0, 4, 4, 10], np.int64))
    a = jnp.asarray(rng.normal(size=(10, 5)))
    b = jnp.asarray(rng.normal(size=(3, 5, 6)))
    check_grads(lambda a, b: ops.segment_matmul(a, ptr, b), (a, b), **_KW)


def test_grouped_matmul_grads():
    rng = np.random.default_rng(4)
    a = [jnp.asarray(rng.normal(size=(4, 3))),
         jnp.asarray(rng.normal(size=(2, 5)))]
    b = [jnp.asarray(rng.normal(size=(3, 6))),
         jnp.asarray(rng.normal(size=(5, 2)))]
    check_grads(
        lambda a0, a1, b0, b1: sum(
            o.sum() for o in ops.grouped_matmul([a0, a1], [b0, b1])),
        (a[0], a[1], b[0], b[1]), **_KW)


@pytest.mark.parametrize('op', ['add', 'sub', 'mul', 'div'])
def test_sampled_op_grads(op):
    rng = np.random.default_rng(5)
    li = jnp.asarray(rng.integers(0, 8, size=12))
    ri = jnp.asarray(rng.integers(0, 6, size=12))
    left = jnp.asarray(rng.normal(size=(8, 4)))
    right = jnp.asarray(rng.normal(size=(6, 4)) + 3.0)
    fn = getattr(ops, f'sampled_{op}')
    check_grads(lambda l, r: fn(l, r, li, ri), (left, right), **_KW)


@pytest.mark.parametrize('degree', [1, 2, 3])
def test_spline_grads(degree):
    rng = np.random.default_rng(6)
    e, d = 10, 2
    ks = jnp.asarray(np.array([4, 3], np.int64))
    is_open = jnp.asarray(np.array([1, 0], np.uint8))
    pseudo = jnp.asarray(rng.uniform(0.1, 0.9, size=(e, d)))
    K = 12
    x = jnp.asarray(rng.normal(size=(e, 5)))
    w = jnp.asarray(rng.normal(size=(K, 5, 4)))

    def f(pseudo, x, w):
        basis, wi = ops.spline_basis(pseudo, ks, is_open, degree)
        return ops.spline_weighting(x, w, basis, wi)

    check_grads(f, (pseudo, x, w), **_KW)


@pytest.mark.parametrize('name', ['scatter_softmax', 'scatter_log_softmax',
                                  'scatter_logsumexp', 'scatter_std'])
def test_composite_grads(name, data):
    fn = getattr(ops, name)
    src = data['src']
    if name == 'scatter_std':
        fn_ = lambda s: fn(s, data['idx'], dim=0, dim_size=data['n'],
                           unbiased=False)
    else:
        fn_ = lambda s: fn(s, data['idx'], dim=0, dim_size=data['n'])
    check_grads(fn_, (src, ), **_KW)


def test_spmm_grads():
    rng = np.random.default_rng(7)
    n, f = 24, 4
    deg = rng.integers(0, 4, size=n)
    rowptr = np.zeros(n + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    col = rng.integers(0, n, size=int(rowptr[-1]))
    g = ops.build_spmm_graph(rowptr, col, with_edge_maps=True)
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    # f32 op: loosen tolerances accordingly
    kw = dict(order=1, modes=('rev', ), atol=5e-2, rtol=5e-2)
    for red in ('sum', 'mean'):
        check_grads(lambda x: ops.spmm(x, g, reduce=red), (x, ), **kw)
    check_grads(lambda x: ops.spmm(x * 100, g, reduce='max'), (x, ), **kw)


def test_segment_softmax_padded_grad():
    rng = np.random.default_rng(8)
    n = 12
    deg = rng.integers(0, 4, size=n)
    rowptr = np.zeros(n + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    col = rng.integers(0, n, size=int(rowptr[-1]))
    g = ops.build_spmm_graph(rowptr, col, chunk=512, with_edge_maps=True)
    plan = g.fwd
    xp = jnp.asarray(
        rng.normal(size=(plan.col_padded.shape[0], 128)).astype(
            np.float32))
    ct = jnp.asarray(
        rng.normal(size=xp.shape).astype(np.float32))

    # The op computes in f32 (kernel contract), so a full check_grads
    # inner product accumulates fd noise over 65k coordinates past any
    # tolerance; spot-check coordinates instead.
    def f(a):
        return (ops.segment_softmax_padded(a, plan) * ct).sum()

    grad = jax.grad(f)(xp)
    eps = 1e-3
    valid = np.nonzero(np.asarray(plan.valid_mask))[0]
    for i in valid[:8]:
        j = int(rng.integers(0, 128))
        num = (f(xp.at[i, j].add(eps)) - f(xp.at[i, j].add(-eps))) / (2 *
                                                                      eps)
        assert abs(float(grad[i, j]) - float(num)) < 5e-2, (i, j)
    # pad slots carry exactly zero gradient
    padm = ~np.asarray(plan.valid_mask)
    assert np.abs(np.asarray(grad)[padm]).max() == 0.0


def test_weighted_fused_range_grad(data):
    # The planned pipeline computes in f32 by kernel contract (weights
    # and membership dots), so f64 FD sees f32 rounding: wider tols.
    kw = dict(_KW, atol=2e-3, rtol=2e-3)
    rng = np.random.default_rng(4)
    n, e = 12, 50
    deg = rng.multinomial(e, np.ones(n) / n)
    rowptr = np.zeros(n + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    col = rng.integers(0, n, size=e)
    w = rng.uniform(0.2, 1.5, size=e).astype(np.float32)
    graph = ops.build_weighted_fused_graph(rowptr, col, n,
                                           [(0, 5), (5, n)], w, chunk=128)
    x = jnp.asarray(rng.normal(size=(n, 3)))
    check_grads(lambda v: ops.spmm(v, graph), (x, ), **kw)


def test_range_split_grads(data):
    kw = dict(_KW, atol=2e-3, rtol=2e-3)  # f32 kernel contract, as above
    rng = np.random.default_rng(5)
    n, e = 12, 50
    deg = rng.multinomial(e, np.ones(n) / n)
    rowptr = np.zeros(n + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    col = rng.integers(0, n, size=e)
    x = jnp.asarray(rng.normal(size=(n, 3)))
    for fused in (False, True):
        graph = ops.build_spmm_graph(rowptr, col, chunk=128,
                                     range_split=3, range_fused=fused)
        check_grads(lambda v: ops.spmm(v, graph), (x, ), **kw)
