"""Golden-reference tests for scatter_* (mirrors reference
``test/ops/test_scatter.py`` strategy: numpy reference impls + grad checks).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyg_lib_tpu import ops
from pyg_lib_tpu.testing import assert_allclose


def _scatter_sum_ref(src, index, dim_size):
    out = np.zeros((dim_size, ) + src.shape[1:], dtype=src.dtype)
    for i, j in enumerate(index):
        out[j] += src[i]
    return out


def _scatter_minmax_ref(src, index, dim_size, is_min):
    n = src.shape[0]
    fill = np.inf if is_min else -np.inf
    vals = np.full((dim_size, ) + src.shape[1:], fill, dtype=src.dtype)
    arg = np.full((dim_size, ) + src.shape[1:], n, dtype=np.int64)
    for i, j in enumerate(index):
        better = src[i] < vals[j] if is_min else src[i] > vals[j]
        arg[j] = np.where(better, i, arg[j])
        vals[j] = np.minimum(vals[j], src[i]) if is_min else np.maximum(
            vals[j], src[i])
    empty = arg == n
    vals[empty] = 0
    return vals, arg


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(10, 4)).astype(np.float32)
    index = rng.integers(0, 5, size=10).astype(np.int32)
    index[0] = 4  # ensure bucket 3 may be empty sometimes
    return src, index


def test_scatter_sum(data):
    src, index = data
    out = ops.scatter_sum(jnp.asarray(src), jnp.asarray(index), dim=0,
                          dim_size=6)
    assert_allclose(out, _scatter_sum_ref(src, index, 6), rtol=1e-5)


def test_scatter_sum_out(data):
    src, index = data
    base = np.ones((6, 4), np.float32)
    out = ops.scatter_sum(jnp.asarray(src), jnp.asarray(index), dim=0,
                          out=jnp.asarray(base))
    assert_allclose(out, base + _scatter_sum_ref(src, index, 6), rtol=1e-5)


def test_scatter_mul():
    src = np.array([[2.0, 3.0], [4.0, 5.0], [0.5, 2.0]], np.float32)
    index = np.array([0, 0, 2], np.int32)
    out = ops.scatter_mul(jnp.asarray(src), jnp.asarray(index), dim=0,
                          dim_size=3)
    expected = np.array([[8.0, 15.0], [1.0, 1.0], [0.5, 2.0]], np.float32)
    assert_allclose(out, expected)


def test_scatter_mean(data):
    src, index = data
    out = ops.scatter_mean(jnp.asarray(src), jnp.asarray(index), dim=0,
                           dim_size=6)
    sums = _scatter_sum_ref(src, index, 6)
    counts = np.maximum(np.bincount(index, minlength=6), 1)[:, None]
    assert_allclose(out, sums / counts, rtol=1e-5)


def test_scatter_mean_int():
    src = np.array([[5], [2], [9]], np.int64)
    index = np.array([0, 0, 1], np.int32)
    out = ops.scatter_mean(jnp.asarray(src), jnp.asarray(index), dim=0,
                           dim_size=2)
    np.testing.assert_array_equal(np.asarray(out), [[3], [9]])


@pytest.mark.parametrize('is_min', [True, False])
def test_scatter_minmax(data, is_min):
    src, index = data
    fn = ops.scatter_min if is_min else ops.scatter_max
    vals, arg = fn(jnp.asarray(src), jnp.asarray(index), dim=0, dim_size=7)
    evals, earg = _scatter_minmax_ref(src, index, 7, is_min)
    assert_allclose(vals, evals)
    # arg: any position attaining the extremum is acceptable; check
    # self-consistency + sentinel.
    arg = np.asarray(arg)
    valid = arg < src.shape[0]
    np.testing.assert_array_equal(valid, earg < src.shape[0])
    for j in range(7):
        for f in range(4):
            if valid[j, f]:
                assert src[arg[j, f], f] == evals[j, f]


def test_scatter_minmax_grad(data):
    src, index = data
    srcj, idxj = jnp.asarray(src, jnp.float64), jnp.asarray(index)

    def loss(s):
        return ops.scatter_max(s, idxj, dim=0, dim_size=6)[0].sum()

    g = jax.grad(loss)(srcj)
    # Each non-empty bucket contributes exactly one winner per feature.
    evals, earg = _scatter_minmax_ref(src.astype(np.float64), index, 6, False)
    expected = np.zeros_like(src, dtype=np.float64)
    for j in range(6):
        for f in range(4):
            if earg[j, f] < src.shape[0]:
                expected[earg[j, f], f] += 1.0
    assert_allclose(g, expected)


def test_scatter_sum_grad(data):
    src, index = data
    srcj, idxj = jnp.asarray(src, jnp.float64), jnp.asarray(index)
    w = jnp.asarray(np.arange(24, dtype=np.float64).reshape(6, 4))

    def loss(s):
        return (ops.scatter_sum(s, idxj, dim=0, dim_size=6) * w).sum()

    g = np.asarray(jax.grad(loss)(srcj))
    expected = np.asarray(w)[index]
    assert_allclose(g, expected)


def test_scatter_dim1():
    rng = np.random.default_rng(1)
    src = rng.normal(size=(3, 8)).astype(np.float32)
    index = rng.integers(0, 4, size=8).astype(np.int32)
    out = ops.scatter_sum(jnp.asarray(src), jnp.asarray(index), dim=1,
                          dim_size=4)
    expected = np.zeros((3, 4), np.float32)
    for i, j in enumerate(index):
        expected[:, j] += src[:, i]
    assert_allclose(out, expected, rtol=1e-5)


def test_scatter_polymorphic(data):
    src, index = data
    s, i = jnp.asarray(src), jnp.asarray(index)
    for reduce in ['sum', 'mul', 'mean', 'min', 'max']:
        out = ops.scatter(s, i, dim=0, dim_size=6, reduce=reduce)
        assert out.shape == (6, 4)


def test_scatter_jit(data):
    src, index = data

    @jax.jit
    def f(s, i):
        return ops.scatter_sum(s, i, dim=0, dim_size=6)

    out = f(jnp.asarray(src), jnp.asarray(index))
    assert_allclose(out, _scatter_sum_ref(src, index, 6), rtol=1e-5)


def test_fused_scatter_reduce(data):
    src, index = data
    out = ops.fused_scatter_reduce(jnp.asarray(src), jnp.asarray(index),
                                   dim_size=6,
                                   reduce_list=['sum', 'mean', 'min', 'max'])
    assert out.shape == (6, 16)
    sums = _scatter_sum_ref(src, index, 6)
    assert_allclose(out[:, :4], sums, rtol=1e-5)
    mins, _ = _scatter_minmax_ref(src, index, 6, True)
    assert_allclose(out[:, 8:12], mins, rtol=1e-5)


def test_scatter_mean_elementwise_index_per_column_counts():
    # Regression: counts must be per (bucket, column), not flattened.
    src = jnp.asarray(np.array([[1.0, 1.0], [1.0, 1.0]], np.float32))
    index = jnp.asarray(np.array([[0, 0], [0, 1]]))
    out = np.asarray(ops.scatter_mean(src, index, dim=0, dim_size=2))
    np.testing.assert_allclose(out, [[1.0, 1.0], [0.0, 1.0]])


def test_scatter_min_out_wins_sentinel_and_grad():
    # Regression: when `out` beats every src element, arg must be the
    # sentinel and no cotangent may flow to src.
    src = jnp.asarray(np.array([5.0, 7.0], np.float32))
    index = jnp.asarray(np.array([0, 0]))
    out0 = jnp.asarray(np.array([1.0], np.float32))
    vals, arg = ops.scatter_min(src, index, dim=0, out=out0)
    assert float(vals[0]) == 1.0
    assert int(arg[0]) == 2  # sentinel == src.shape[dim]

    g = jax.grad(lambda s: ops.scatter_min(s, index, dim=0,
                                           out=out0)[0].sum())(src)
    np.testing.assert_allclose(np.asarray(g), [0.0, 0.0])

    # and when src wins, the winner still gets the cotangent
    out1 = jnp.asarray(np.array([9.0], np.float32))
    vals, arg = ops.scatter_min(src, index, dim=0, out=out1)
    assert float(vals[0]) == 5.0 and int(arg[0]) == 0
    g = jax.grad(lambda s: ops.scatter_min(s, index, dim=0,
                                           out=out1)[0].sum())(src)
    np.testing.assert_allclose(np.asarray(g), [1.0, 0.0])


def test_gather_csr_preserves_out_tail():
    src = jnp.asarray(np.array([[1.0], [2.0]], np.float32))
    indptr = jnp.asarray(np.array([0, 1, 2]))
    out = jnp.full((4, 1), 9.0)
    res = np.asarray(ops.gather_csr(src, indptr, out=out))
    np.testing.assert_allclose(res[:, 0], [1.0, 2.0, 9.0, 9.0])


def test_scatter_mean_integer_with_out_floor_divides():
    """Probed against libpyg: integer mean with out keeps the integer
    dtype and FLOOR-divides ((-4-7-4)/2 -> -8), same as the out=None
    path."""
    src = jnp.asarray(np.array([-4, -7], np.int32))
    idx = jnp.asarray(np.array([0, 0], np.int64))
    out = jnp.asarray(np.array([-4], np.int32))
    r = ops.scatter_mean(src, idx, 0, out=out)
    assert r.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(r), [-8])
    r0 = ops.scatter_mean(src, idx, 0, dim_size=1)
    np.testing.assert_array_equal(np.asarray(r0), [-6])  # floor(-5.5)
