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


# --------------------------------------------- batched (multi-dim) indptr ---


def _batched_oracle(src, indptr, reduce):
    """Loop the per-slice numpy oracle over broadcast leading dims."""
    b = indptr.ndim - 1
    lead = src.shape[:b]
    indptr_b = np.broadcast_to(indptr, lead + indptr.shape[-1:])
    R = indptr.shape[-1] - 1
    out = np.zeros(lead + (R, ) + src.shape[b + 1:], dtype=src.dtype)
    arg = np.full(lead + (R, ) + src.shape[b + 1:], src.shape[b], np.int64)
    for li in np.ndindex(*lead) if lead else [()]:
        o, a = _segment_ref(src[li], indptr_b[li], reduce)
        out[li] = o
        # per-slice argindices are LOCAL to the slice (sentinel E)
        arg[li] = np.where(a < src.shape[b], a, src.shape[b])
    return out, arg


@pytest.mark.parametrize('reduce', ['sum', 'mean', 'min', 'max'])
def test_segment_csr_batched(reduce):
    rng = np.random.default_rng(7)
    L, E, F, R = 3, 10, 4, 4
    src = rng.normal(size=(L, E, F)).astype(np.float32)
    indptr = np.stack([
        np.array([0, 3, 3, 7, 10]),
        np.array([0, 0, 5, 9, 10]),
        np.array([2, 4, 6, 8, 10]),  # leading gap: src[2,:2] in no row
    ]).astype(np.int64)
    expected, earg = _batched_oracle(src, indptr, reduce)
    res = getattr(ops, f'segment_{reduce}_csr')(jnp.asarray(src),
                                                jnp.asarray(indptr))
    if reduce in ('min', 'max'):
        vals, arg = res
        assert vals.shape == (L, R, F)
        assert_allclose(vals, expected, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(arg), earg)
    else:
        assert res.shape == (L, R, F)
        assert_allclose(res, expected, rtol=1e-5)


@pytest.mark.parametrize('reduce', ['sum', 'mean', 'min', 'max'])
def test_segment_csr_batched_broadcast_indptr(reduce):
    """indptr with a size-1 leading dim broadcasts over src's slices."""
    rng = np.random.default_rng(8)
    L, E, F = 4, 9, 3
    src = rng.normal(size=(L, E, F)).astype(np.float32)
    indptr = np.array([[0, 4, 4, 9]], dtype=np.int64)  # shape (1, 4)
    expected, _ = _batched_oracle(src, indptr, reduce)
    res = getattr(ops, f'segment_{reduce}_csr')(jnp.asarray(src),
                                                jnp.asarray(indptr))
    vals = res[0] if reduce in ('min', 'max') else res
    assert vals.shape == (L, 3, F)
    assert_allclose(vals, expected, rtol=1e-5)


def test_segment_csr_batched_3lead(reduce='sum'):
    rng = np.random.default_rng(9)
    src = rng.normal(size=(2, 3, 8, 2)).astype(np.float32)
    indptr = np.broadcast_to(
        np.array([0, 2, 8], np.int64), (2, 3, 3)).copy()
    expected, _ = _batched_oracle(src, indptr, 'sum')
    out = ops.segment_sum_csr(jnp.asarray(src), jnp.asarray(indptr))
    assert out.shape == (2, 3, 2, 2)
    assert_allclose(out, expected, rtol=1e-5)


def test_segment_csr_batched_sum_out_accumulates():
    rng = np.random.default_rng(10)
    src = rng.normal(size=(2, 6, 3)).astype(np.float32)
    indptr = np.array([[0, 2, 6], [0, 5, 6]], np.int64)
    base = rng.normal(size=(2, 2, 3)).astype(np.float32)
    expected, _ = _batched_oracle(src, indptr, 'sum')
    out = ops.segment_sum_csr(jnp.asarray(src), jnp.asarray(indptr),
                              out=jnp.asarray(base))
    assert_allclose(out, expected + base, rtol=1e-5)


def test_segment_csr_batched_grads():
    rng = np.random.default_rng(11)
    src = rng.normal(size=(2, 7, 3)).astype(np.float32)
    indptr = jnp.asarray(np.array([[0, 3, 3, 7], [1, 2, 6, 7]], np.int64))
    s = jnp.asarray(src)

    g = jax.grad(lambda x: ops.segment_sum_csr(x, indptr).sum())(s)
    # d/dsrc of sum = 1 where the element lands in some row
    expect = np.ones_like(src)
    expect[1, 0] = 0.0  # slice 1 leading gap: position 0 < indptr[0]=1
    np.testing.assert_allclose(np.asarray(g), expect)

    # max: winner-only gradient, in-slice coordinates
    gv = jax.grad(lambda x: ops.segment_max_csr(x, indptr)[0].sum())(s)
    vals, arg = ops.segment_max_csr(s, indptr)
    arg_np = np.asarray(arg)
    expect = np.zeros_like(src)
    for l in range(2):
        for r in range(3):
            for f in range(3):
                a = arg_np[l, r, f]
                if a < 7:
                    expect[l, a, f] += 1.0
    np.testing.assert_allclose(np.asarray(gv), expect)


def test_gather_csr_batched():
    rng = np.random.default_rng(12)
    src = rng.normal(size=(2, 3, 4)).astype(np.float32)  # (L, R, F)
    indptr = np.array([[0, 2, 2, 6], [0, 1, 4, 6]], np.int64)
    out = np.asarray(ops.gather_csr(jnp.asarray(src), jnp.asarray(indptr)))
    assert out.shape == (2, 6, 4)
    for l in range(2):
        for r in range(3):
            for p in range(indptr[l, r], indptr[l, r + 1]):
                np.testing.assert_allclose(out[l, p], src[l, r])


def test_gather_csr_batched_unequal_totals_zero_fill():
    """Slices whose indptr[-1] is short of out_size leave zeros."""
    rng = np.random.default_rng(13)
    src = rng.normal(size=(2, 2, 3)).astype(np.float32)
    indptr = np.array([[0, 3, 6], [0, 2, 4]], np.int64)
    out = np.asarray(
        ops.gather_csr(jnp.asarray(src), jnp.asarray(indptr), out_size=6))
    np.testing.assert_allclose(out[1, 4:], np.zeros((2, 3), np.float32))
    np.testing.assert_allclose(out[0, 5], src[0, 1])


def test_segment_csr_batched_minmax_out_merge():
    """out= merge keeps reference sentinel semantics per slice."""
    rng = np.random.default_rng(14)
    src = rng.normal(size=(2, 5, 2)).astype(np.float32)
    indptr = np.array([[0, 2, 2, 5], [0, 4, 5, 5]], np.int64)
    base = np.full((2, 3, 2), 100.0, np.float32)  # out always wins for min
    vals, arg = ops.segment_min_csr(jnp.asarray(src), jnp.asarray(indptr),
                                    out=jnp.asarray(-base))
    # -100 always wins min -> arg sentinel everywhere
    np.testing.assert_array_equal(np.asarray(arg), np.full((2, 3, 2), 5))
    np.testing.assert_allclose(np.asarray(vals), -base)


def test_indptr_to_index_sorted_with_leading_gap():
    """Leading-gap ids must be -1 (OOB-dropped) so the id sequence stays
    non-decreasing: scatters pass indices_are_sorted=True, and a
    violated sortedness promise is undefined behavior in XLA scatter on
    TPU (invisible on the CPU test backend, which ignores the hint)."""
    from pyg_lib_tpu.utils import indptr_to_index

    ids = np.asarray(indptr_to_index(jnp.asarray([2, 4, 4, 7]), 9))
    np.testing.assert_array_equal(ids, [-1, -1, 0, 0, 2, 2, 2, 3, 3])
    assert (np.diff(ids) >= 0).all()
    # Gap + pad elements contribute to no row; gather returns 0 there.
    src = jnp.arange(9.0)[:, None]
    out = np.asarray(ops.segment_sum_csr(src, jnp.asarray([2, 4, 4, 7])))
    np.testing.assert_array_equal(out[:, 0], [2 + 3, 0, 4 + 5 + 6])
    g = np.asarray(ops.gather_csr(jnp.asarray([[1.], [2.], [3.]]),
                                  jnp.asarray([2, 4, 4, 7]), out_size=9))
    np.testing.assert_array_equal(g[:, 0], [0, 0, 1, 1, 3, 3, 3, 0, 0])
