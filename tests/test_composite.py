"""Tests for scatter composites + softmax_csr + sampled ops (mirrors
reference ``test/ops/test_composite.py``, ``test_softmax.py``,
``test_sampled.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyg_lib_tpu import ops
from pyg_lib_tpu.testing import assert_allclose


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(10, 4)).astype(np.float64)
    index = rng.integers(0, 5, size=10).astype(np.int32)
    return src, index


def test_scatter_softmax(data):
    src, index = data
    out = np.asarray(
        ops.scatter_softmax(jnp.asarray(src), jnp.asarray(index), dim=0,
                            dim_size=6))
    for j in range(5):
        mask = index == j
        if mask.sum() == 0:
            continue
        e = np.exp(src[mask] - src[mask].max(0))
        assert_allclose(out[mask], e / e.sum(0), rtol=1e-6)


def test_scatter_log_softmax(data):
    src, index = data
    out = np.asarray(
        ops.scatter_log_softmax(jnp.asarray(src), jnp.asarray(index), dim=0,
                                dim_size=6))
    soft = np.asarray(
        ops.scatter_softmax(jnp.asarray(src), jnp.asarray(index), dim=0,
                            dim_size=6))
    assert_allclose(out, np.log(soft), rtol=1e-5)


def test_scatter_std(data):
    src, index = data
    out = np.asarray(
        ops.scatter_std(jnp.asarray(src), jnp.asarray(index), dim=0,
                        dim_size=6))
    for j in range(6):
        mask = index == j
        if mask.sum() >= 2:
            assert_allclose(out[j], src[mask].std(0, ddof=1), rtol=1e-6)


def test_scatter_logsumexp(data):
    src, index = data
    out = np.asarray(
        ops.scatter_logsumexp(jnp.asarray(src), jnp.asarray(index), dim=0,
                              dim_size=6))
    for j in range(6):
        mask = index == j
        if mask.sum() > 0:
            expected = np.log(np.exp(src[mask]).sum(0))
            assert_allclose(out[j], expected, rtol=1e-5, atol=1e-5)
        else:
            np.testing.assert_array_equal(out[j], 0.0)


def test_softmax_csr():
    rng = np.random.default_rng(1)
    src = rng.normal(size=(8, 4))
    ptr = np.array([0, 3, 3, 8], np.int64)
    out = np.asarray(ops.softmax_csr(jnp.asarray(src), jnp.asarray(ptr)))
    for r in range(3):
        seg = src[ptr[r]:ptr[r + 1]]
        if len(seg) == 0:
            continue
        e = np.exp(seg - seg.max(0))
        assert_allclose(out[ptr[r]:ptr[r + 1]], e / e.sum(0), rtol=1e-6)


def test_softmax_csr_grad():
    rng = np.random.default_rng(2)
    src = jnp.asarray(rng.normal(size=(6, 3)))
    ptr = jnp.asarray(np.array([0, 2, 6], np.int64))
    w = jnp.asarray(rng.normal(size=(6, 3)))

    def loss(s):
        return (ops.softmax_csr(s, ptr) * w).sum()

    g = jax.grad(loss)(src)
    # numerical check
    eps = 1e-6
    g_num = np.zeros_like(np.asarray(src))
    s_np = np.asarray(src)
    for i in range(6):
        for f in range(3):
            sp = s_np.copy()
            sp[i, f] += eps
            sm = s_np.copy()
            sm[i, f] -= eps
            lp = float(loss(jnp.asarray(sp)))
            lm = float(loss(jnp.asarray(sm)))
            g_num[i, f] = (lp - lm) / (2 * eps)
    assert_allclose(g, g_num, rtol=1e-4, atol=1e-6)


def test_sampled_ops():
    rng = np.random.default_rng(3)
    left = rng.normal(size=(6, 4))
    right = rng.normal(size=(5, 4)) + 2.0
    li = np.array([0, 2, 4], np.int32)
    ri = np.array([1, 1, 3], np.int32)
    lj, rj = jnp.asarray(left), jnp.asarray(right)
    lij, rij = jnp.asarray(li), jnp.asarray(ri)
    assert_allclose(ops.sampled_add(lj, rj, lij, rij), left[li] + right[ri])
    assert_allclose(ops.sampled_sub(lj, rj, lij, rij), left[li] - right[ri])
    assert_allclose(ops.sampled_mul(lj, rj, lij, rij), left[li] * right[ri])
    assert_allclose(ops.sampled_div(lj, rj, lij, rij), left[li] / right[ri])
    # None index = identity
    assert_allclose(ops.sampled_add(lj, rj[:6] if False else lj, None, None),
                    left + left)


def test_index_sort():
    rng = np.random.default_rng(4)
    x = rng.integers(0, 100, size=50)
    vals, perm = ops.index_sort(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(vals), np.sort(x))
    np.testing.assert_array_equal(x[np.asarray(perm)], np.sort(x))
