"""Dtype × config matrices for the reduction family, in the style of the
reference's big suites (reference ``test/ops/test_scatter.py`` /
``test_segment_coo.py`` / ``test_segment_csr.py`` parametrisation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyg_lib_tpu import ops

DTYPES = [np.float32, np.float64, np.int32, np.int64]
REDUCES = ['sum', 'mean', 'min', 'max']


def _data(dtype, shape, rng):
    if np.issubdtype(dtype, np.floating):
        return rng.normal(size=shape).astype(dtype)
    return rng.integers(-20, 20, size=shape).astype(dtype)


def _np_scatter(src, index, dim_size, reduce):
    out = np.zeros((dim_size, ) + src.shape[1:], src.dtype)
    cnt = np.zeros(dim_size, np.int64)
    if reduce in ('min', 'max'):
        ident = (np.finfo(src.dtype).max if np.issubdtype(
            src.dtype, np.floating) else np.iinfo(src.dtype).max)
        if reduce == 'max':
            ident = -ident if np.issubdtype(src.dtype,
                                            np.floating) else np.iinfo(
                                                src.dtype).min
        out[:] = ident
    for j, i in enumerate(index):
        if reduce in ('sum', 'mean'):
            out[i] += src[j]
        elif reduce == 'min':
            out[i] = np.minimum(out[i], src[j])
        else:
            out[i] = np.maximum(out[i], src[j])
        cnt[i] += 1
    empty = cnt == 0
    if reduce == 'mean':
        div = np.maximum(cnt, 1).astype(src.dtype)
        out = (out / div[:, None] if np.issubdtype(src.dtype, np.floating)
               else out // div[:, None])
    if reduce in ('min', 'max'):
        out[empty] = 0
    else:
        out[empty] = 0
    return out


@pytest.mark.parametrize('dtype', DTYPES)
@pytest.mark.parametrize('reduce', REDUCES)
def test_scatter_matrix(dtype, reduce):
    rng = np.random.default_rng(0)
    src = _data(dtype, (60, 5), rng)
    index = rng.integers(0, 20, size=60)
    got = ops.scatter(jnp.asarray(src), jnp.asarray(index), dim=0,
                      dim_size=20, reduce=reduce)
    ref = _np_scatter(src, index, 20, reduce)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('dtype', [np.float32, np.float64])
@pytest.mark.parametrize('reduce', REDUCES)
def test_segment_csr_matrix_with_out(dtype, reduce):
    rng = np.random.default_rng(1)
    rowptr = np.array([0, 0, 4, 4, 9, 9, 9, 12])
    src = _data(dtype, (12, 3), rng)
    out0 = _data(dtype, (7, 3), rng)

    got = ops.segment_csr(jnp.asarray(src), jnp.asarray(rowptr),
                          out=jnp.asarray(out0), reduce=reduce)
    # reference 'out' semantics (probed against libpyg, see
    # test_reference_parity): sum accumulates, mean OVERWRITES (empty
    # rows -> 0), min/max merge elementwise.
    base = _np_scatter(src, np.repeat(np.arange(7), np.diff(rowptr)), 7,
                       reduce)
    cnt = np.diff(rowptr)
    if reduce == 'sum':
        ref = out0 + base
    elif reduce == 'mean':
        ref = base
    else:
        op = np.minimum if reduce == 'min' else np.maximum
        ref = np.where(cnt[:, None] > 0, op(out0, base), out0)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('dtype', [np.float32, np.int64])
def test_gather_roundtrips(dtype):
    rng = np.random.default_rng(2)
    rowptr = np.array([0, 2, 2, 7, 10])
    src = _data(dtype, (4, 6), rng)
    g = ops.gather_csr(jnp.asarray(src), jnp.asarray(rowptr), out_size=10)
    ref = np.repeat(src, np.diff(rowptr), axis=0)
    np.testing.assert_array_equal(np.asarray(g), ref)

    idx = np.repeat(np.arange(4), np.diff(rowptr))
    g2 = ops.gather_coo(jnp.asarray(src), jnp.asarray(idx))
    np.testing.assert_array_equal(np.asarray(g2), ref)


@pytest.mark.parametrize('op,npop', [(ops.sampled_add, np.add),
                                     (ops.sampled_sub, np.subtract),
                                     (ops.sampled_mul, np.multiply),
                                     (ops.sampled_div, np.divide)])
def test_sampled_ops_matrix(op, npop):
    rng = np.random.default_rng(3)
    left = rng.normal(size=(30, 4)).astype(np.float32)
    right = rng.normal(size=(25, 4)).astype(np.float32) + 2.0
    li = rng.integers(0, 30, size=40)
    ri = rng.integers(0, 25, size=40)
    got = op(jnp.asarray(left), jnp.asarray(right), jnp.asarray(li),
             jnp.asarray(ri))
    np.testing.assert_allclose(np.asarray(got), npop(left[li], right[ri]),
                               rtol=1e-5, atol=1e-5)
    # index-less variants operate elementwise on equal-length inputs
    got2 = op(jnp.asarray(left[:25]), jnp.asarray(right))
    np.testing.assert_allclose(np.asarray(got2), npop(left[:25], right),
                               rtol=1e-5, atol=1e-5)


def test_index_sort_matrix():
    rng = np.random.default_rng(4)
    x = rng.integers(0, 1000, size=500)
    vals, perm = ops.index_sort(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(vals), np.sort(x))
    np.testing.assert_array_equal(x[np.asarray(perm)], np.sort(x))
    # stability: equal keys keep original order
    x2 = np.array([5, 3, 5, 3, 5])
    _, perm2 = ops.index_sort(jnp.asarray(x2), max_value=10)
    np.testing.assert_array_equal(np.asarray(perm2), [1, 3, 0, 2, 4])


def test_budget_exceeded_raises():
    from pyg_lib_tpu import sampler
    from pyg_lib_tpu.sampler.padding import BudgetExceeded, pad_sample_output
    from pyg_lib_tpu.testing import cycle_graph

    rowptr, col = cycle_graph(32)
    out = sampler.neighbor_sample(rowptr, col, np.arange(8), [2, 2], rng=0)
    with pytest.raises(BudgetExceeded):
        pad_sample_output(out, max_nodes=4, max_edges=1024, num_seeds=8)
    with pytest.raises(BudgetExceeded):
        pad_sample_output(out, max_nodes=1024, max_edges=2, num_seeds=8)


def test_csc_mode_swaps_row_col():
    from pyg_lib_tpu import sampler
    from pyg_lib_tpu.testing import cycle_graph

    rowptr, col = cycle_graph(16)
    a = sampler.neighbor_sample(rowptr, col, np.array([0, 5]), [-1], rng=1)
    b = sampler.neighbor_sample(rowptr, col, np.array([0, 5]), [-1], rng=1,
                                csc=True)
    np.testing.assert_array_equal(a[0], b[1])
    np.testing.assert_array_equal(a[1], b[0])


def test_fused_scatter_reduce_planned_path_matches_composite():
    """The fused Pallas path (one slab pass for sum+max, negated pass for
    min) must match the composite path exactly, gradients included."""
    import pyg_lib_tpu.ops.scatter_reduce as srm

    rng = np.random.default_rng(0)
    n_rows, f, dim_size = 600, 128, 40
    idx = np.sort(rng.integers(0, dim_size, size=n_rows))
    x = jnp.asarray(rng.normal(size=(n_rows, f)).astype(np.float32))

    for reduces in (['sum', 'max'], ['mean', 'min'],
                    ['sum', 'mean', 'min', 'max']):
        fused = srm._fused(idx, dim_size, tuple(reduces))
        out = np.asarray(fused(x))
        ref = np.asarray(
            srm.fused_scatter_reduce(x, jnp.asarray(idx), dim_size,
                                     reduces))
        # sums ride the bf16 hi/lo split contraction (~1e-5 absolute at
        # unit scale); min/max are bit-exact
        np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)

        g1 = jax.grad(lambda a: (fused(a) ** 2).sum())(x)
        g2 = jax.grad(lambda a: (srm.fused_scatter_reduce(
            a, jnp.asarray(idx), dim_size, reduces) ** 2).sum())(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-4, atol=1e-4)


def test_argument_validation_walls():
    """Reference TORCH_CHECK role: malformed args raise informative
    errors instead of silently computing garbage."""
    src = jnp.ones((10, 4))
    with pytest.raises(ValueError, match='non-decreasing'):
        ops.segment_sum_csr(src, jnp.array([0, 7, 3, 10]))
    with pytest.raises(ValueError, match='k >= 1'):
        ops.knn(jnp.ones((5, 2)), jnp.ones((3, 2)), k=0)
    with pytest.raises(ValueError, match='non-negative'):
        ops.radius(jnp.ones((5, 2)), jnp.ones((3, 2)), r=-1.0)
    with pytest.raises(ValueError):
        ops.scatter_sum(src, jnp.arange(10), dim=5, dim_size=5)
    with pytest.raises(ValueError):
        ops.fused_scatter_reduce(src, jnp.arange(10), 5, ['sum', 'bogus'])
