"""Cross-implementation parity: JAX ops vs plain-torch golden references.

The reference's test strategy is golden-reference testing against an
independent implementation (reference ``test/ops/test_scatter.py:26-53``).
numpy references live in the other test files; this file uses TORCH
(``scatter_reduce``/``index_add``, baked into the image) as a second,
fully independent oracle for the reduction family, mirroring the
reference's dtype matrix.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from pyg_lib_tpu import ops


def _csr(rng, n, e):
    deg = rng.multinomial(e, np.ones(n) / n)
    rowptr = np.zeros(n + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    return rowptr, np.repeat(np.arange(n), deg)


@pytest.mark.parametrize('dtype', [np.float32, np.float64, np.int32])
@pytest.mark.parametrize('reduce', ['sum', 'mean', 'amin', 'amax'])
def test_scatter_vs_torch(dtype, reduce):
    rng = np.random.default_rng(0)
    n, e, f = 50, 400, 8
    idx = rng.integers(0, n, size=e)
    if np.issubdtype(dtype, np.floating):
        src = rng.normal(size=(e, f)).astype(dtype)
    else:
        src = rng.integers(-10, 10, size=(e, f)).astype(dtype)

    t = torch.zeros((n, f), dtype=torch.from_numpy(src[:1]).dtype)
    t = t.scatter_reduce(0,
                         torch.from_numpy(idx)[:, None].expand(e, f),
                         torch.from_numpy(src), reduce=reduce,
                         include_self=False)
    ref = t.numpy()
    # torch include_self=False leaves untouched rows at 0 (sum/mean) or
    # init value; our empty-bucket contract: sum/mean -> 0, min/max -> 0.
    counts = np.bincount(idx, minlength=n)

    name = {'sum': 'sum', 'mean': 'mean', 'amin': 'min',
            'amax': 'max'}[reduce]
    if name in ('min', 'max'):
        if dtype == np.int32 and reduce == 'amin':
            pass  # covered below identically
        out, arg = getattr(ops, f'scatter_{name}')(jnp.asarray(src),
                                                   jnp.asarray(idx), dim=0,
                                                   dim_size=n)
        out = np.asarray(out)
        ref = np.where(counts[:, None] > 0, ref, 0)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
        # argindex points at a row achieving the optimum (or sentinel e)
        arg = np.asarray(arg)
        sent = arg == e
        assert (sent == (counts[:, None] == 0)).all()
        picked = np.where(sent, 0, arg)
        vals = src[picked, np.arange(f)[None, :]]
        np.testing.assert_allclose(np.where(sent, 0, vals), out, rtol=1e-5,
                                   atol=1e-5)
    else:
        if name == 'mean' and not np.issubdtype(dtype, np.floating):
            return  # integer mean: reference floors; torch errors — skip
        out = np.asarray(
            getattr(ops, f'scatter_{name}')(jnp.asarray(src),
                                            jnp.asarray(idx), dim=0,
                                            dim_size=n))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('reduce', ['sum', 'mean', 'amin', 'amax'])
def test_segment_csr_vs_torch(reduce):
    rng = np.random.default_rng(1)
    n, e, f = 64, 700, 16
    rowptr, rows = _csr(rng, n, e)
    src = rng.normal(size=(e, f)).astype(np.float32)

    t = torch.zeros((n, f))
    t = t.scatter_reduce(0,
                         torch.from_numpy(rows)[:, None].expand(e, f),
                         torch.from_numpy(src), reduce=reduce,
                         include_self=False)
    ref = t.numpy()
    counts = np.diff(rowptr)
    ref = np.where(counts[:, None] > 0, ref, 0)

    name = {'sum': 'sum', 'mean': 'mean', 'amin': 'min',
            'amax': 'max'}[reduce]
    got = getattr(ops, f'segment_{name}_csr')(jnp.asarray(src),
                                              jnp.asarray(rowptr))
    if isinstance(got, tuple):
        got = got[0]
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


def test_segment_coo_vs_torch():
    rng = np.random.default_rng(2)
    n, e = 40, 300
    idx = np.sort(rng.integers(0, n, size=e))
    src = rng.normal(size=(e, )).astype(np.float32)
    ref = torch.zeros(n).index_add(0, torch.from_numpy(idx),
                                   torch.from_numpy(src)).numpy()
    got = np.asarray(
        ops.segment_sum_coo(jnp.asarray(src), jnp.asarray(idx), dim_size=n))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_softmax_csr_vs_torch():
    rng = np.random.default_rng(3)
    n, e, f = 30, 200, 4
    rowptr, rows = _csr(rng, n, e)
    src = rng.normal(size=(e, f)).astype(np.float32)

    ref = np.zeros_like(src)
    for r in range(n):
        lo, hi = rowptr[r], rowptr[r + 1]
        if hi > lo:
            ref[lo:hi] = torch.softmax(torch.from_numpy(src[lo:hi]),
                                       dim=0).numpy()
    got = np.asarray(ops.softmax_csr(jnp.asarray(src), jnp.asarray(rowptr)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_scatter_softmax_vs_torch():
    rng = np.random.default_rng(4)
    n, e = 20, 150
    idx = rng.integers(0, n, size=e)
    src = rng.normal(size=(e, )).astype(np.float32)
    ref = np.zeros_like(src)
    for r in range(n):
        sel = idx == r
        if sel.any():
            ref[sel] = torch.softmax(torch.from_numpy(src[sel]),
                                     dim=0).numpy()
    got = np.asarray(
        ops.scatter_softmax(jnp.asarray(src), jnp.asarray(idx), dim=0,
                            dim_size=n))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_grouped_matmul_vs_torch():
    rng = np.random.default_rng(5)
    xs = [rng.normal(size=(m, 12)).astype(np.float32) for m in (7, 0, 33)]
    ws = [rng.normal(size=(12, 9)).astype(np.float32) for _ in range(3)]
    outs = ops.grouped_matmul([jnp.asarray(x) for x in xs],
                              [jnp.asarray(w) for w in ws])
    for x, w, o in zip(xs, ws, outs):
        ref = (torch.from_numpy(x) @ torch.from_numpy(w)).numpy()
        np.testing.assert_allclose(np.asarray(o), ref, rtol=1e-4, atol=1e-4)
