"""Golden-reference tests for segment_{*}_csr / _coo and gathers (mirrors
reference ``test/ops/test_segment_csr.py`` / ``test_segment_coo.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyg_lib_tpu import ops
from pyg_lib_tpu.testing import assert_allclose


def _segment_ref(src, indptr, reduce):
    R = len(indptr) - 1
    out = np.zeros((R, ) + src.shape[1:], dtype=src.dtype)
    arg = np.full((R, ) + src.shape[1:], src.shape[0], dtype=np.int64)
    for r in range(R):
        seg = src[indptr[r]:indptr[r + 1]]
        if len(seg) == 0:
            continue
        if reduce == 'sum':
            out[r] = seg.sum(0)
        elif reduce == 'mean':
            out[r] = seg.mean(0)
        elif reduce == 'min':
            out[r] = seg.min(0)
            arg[r] = indptr[r] + seg.argmin(0)
        elif reduce == 'max':
            out[r] = seg.max(0)
            arg[r] = indptr[r] + seg.argmax(0)
    return out, arg


@pytest.fixture
def csr_data():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(12, 4)).astype(np.float32)
    indptr = np.array([0, 3, 3, 7, 12], dtype=np.int64)  # includes empty row
    return src, indptr


@pytest.mark.parametrize('reduce', ['sum', 'mean', 'min', 'max'])
def test_segment_csr(csr_data, reduce):
    src, indptr = csr_data
    expected, earg = _segment_ref(src, indptr, reduce)
    out = ops.segment_csr(jnp.asarray(src), jnp.asarray(indptr),
                          reduce=reduce)
    assert_allclose(out, expected, rtol=1e-5)


def test_segment_minmax_csr_arg(csr_data):
    src, indptr = csr_data
    vals, arg = ops.segment_max_csr(jnp.asarray(src), jnp.asarray(indptr))
    expected, earg = _segment_ref(src, indptr, 'max')
    assert_allclose(vals, expected)
    np.testing.assert_array_equal(np.asarray(arg), earg)


def test_segment_sum_csr_grad(csr_data):
    src, indptr = csr_data
    w = jnp.asarray(np.arange(16, dtype=np.float64).reshape(4, 4))

    def loss(s):
        return (ops.segment_sum_csr(s, jnp.asarray(indptr)) * w).sum()

    g = np.asarray(jax.grad(loss)(jnp.asarray(src, jnp.float64)))
    expected = np.zeros((12, 4))
    for r in range(4):
        expected[indptr[r]:indptr[r + 1]] = np.asarray(w)[r]
    assert_allclose(g, expected)


def test_segment_csr_out_accumulate(csr_data):
    src, indptr = csr_data
    base = np.ones((4, 4), np.float32)
    out = ops.segment_sum_csr(jnp.asarray(src), jnp.asarray(indptr),
                              out=jnp.asarray(base))
    expected, _ = _segment_ref(src, indptr, 'sum')
    assert_allclose(out, base + expected, rtol=1e-5)


def test_gather_csr(csr_data):
    src, indptr = csr_data
    vals = np.arange(16, dtype=np.float32).reshape(4, 4)
    out = ops.gather_csr(jnp.asarray(vals), jnp.asarray(indptr))
    assert out.shape == (12, 4)
    for r in range(4):
        for i in range(indptr[r], indptr[r + 1]):
            np.testing.assert_array_equal(np.asarray(out[i]), vals[r])


def test_gather_csr_jit(csr_data):
    src, indptr = csr_data
    vals = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4))

    @jax.jit
    def f(v, p):
        return ops.gather_csr(v, p, out_size=12)

    out = f(vals, jnp.asarray(indptr))
    assert out.shape == (12, 4)


@pytest.mark.parametrize('reduce', ['sum', 'mean', 'min', 'max'])
def test_segment_coo(reduce):
    rng = np.random.default_rng(1)
    src = rng.normal(size=(10, 3)).astype(np.float32)
    index = np.sort(rng.integers(0, 5, size=10)).astype(np.int32)
    indptr = np.zeros(6, np.int64)
    for i in index:
        indptr[i + 1] += 1
    indptr = np.cumsum(indptr)
    expected, _ = _segment_ref(src, indptr, reduce)
    out = ops.segment_coo(jnp.asarray(src), jnp.asarray(index), dim_size=5,
                          reduce=reduce)
    assert_allclose(out, expected, rtol=1e-5)


def test_gather_coo():
    src = jnp.asarray(np.arange(12, dtype=np.float32).reshape(4, 3))
    index = jnp.asarray(np.array([0, 0, 1, 3], np.int32))
    out = ops.gather_coo(src, index)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(src)[[0, 0, 1, 3]])


def test_segment_csr_1d():
    src = jnp.asarray(np.array([1.0, 2.0, 3.0, 4.0], np.float32))
    indptr = jnp.asarray(np.array([0, 2, 4], np.int64))
    out = ops.segment_sum_csr(src, indptr)
    np.testing.assert_allclose(np.asarray(out), [3.0, 7.0])


def test_segment_csr_3d():
    rng = np.random.default_rng(2)
    src = rng.normal(size=(8, 2, 3)).astype(np.float32)
    indptr = np.array([0, 5, 8], np.int64)
    out = ops.segment_sum_csr(jnp.asarray(src), jnp.asarray(indptr))
    expected = np.stack([src[0:5].sum(0), src[5:8].sum(0)])
    assert_allclose(out, expected, rtol=1e-5)


def test_segment_mean_coo_csr_routing():
    import jax.numpy as jnp
    import numpy as np

    from pyg_lib_tpu import ops

    rng = np.random.default_rng(41)
    n, e, f = 50, 400, 128
    idx = np.sort(rng.integers(0, n, size=e)).astype(np.int32)
    src = rng.normal(size=(e, f)).astype(np.float32)
    out = np.asarray(ops.segment_mean_coo(jnp.asarray(src),
                                          jnp.asarray(idx), dim_size=n))
    ref = np.zeros((n, f), np.float32)
    np.add.at(ref, idx, src)
    cnt = np.maximum(np.bincount(idx, minlength=n), 1)
    ref = ref / cnt[:, None]
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)

    # with out=: reference contract (probed against libpyg, see
    # test_reference_parity) — non-empty buckets OVERWRITTEN with the
    # plain mean, empty buckets keep out.
    base = rng.normal(size=(n, f)).astype(np.float32)
    out2 = np.asarray(ops.segment_mean_coo(jnp.asarray(src),
                                           jnp.asarray(idx),
                                           out=jnp.asarray(base)))
    expect = np.where(np.bincount(idx, minlength=n)[:, None] > 0, ref,
                      base)
    np.testing.assert_allclose(out2, expect, atol=1e-4, rtol=1e-4)
