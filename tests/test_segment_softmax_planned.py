"""Planned fused segment softmax vs numpy reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyg_lib_tpu.ops.pallas.segment_softmax_kernel import (
    segment_softmax_planned, )
from pyg_lib_tpu.ops.pallas.spmm_chunked import build_spmm_plan


def _ref(src, rowptr):
    ref = np.zeros_like(src)
    for r in range(len(rowptr) - 1):
        lo, hi = rowptr[r], rowptr[r + 1]
        if hi > lo:
            v = src[lo:hi] - src[lo:hi].max(0)
            ex = np.exp(v)
            ref[lo:hi] = ex / ex.sum(0)
    return ref


@pytest.mark.parametrize('n,e,f', [(300, 5000, 128), (64, 300, 128),
                                   (1, 7, 128), (100, 0, 128)])
def test_planned_softmax_matches_numpy(n, e, f):
    rng = np.random.default_rng(0)
    deg = rng.multinomial(e, np.ones(n) / n)
    rowptr = np.zeros(n + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    col = (rng.integers(0, n, size=e).astype(np.int32)
           if e else np.zeros(0, np.int32))
    src = (rng.normal(size=(e, f)) * 5).astype(np.float32)

    plan = build_spmm_plan(rowptr, col, chunk=256, with_edge_maps=True)
    xp = jnp.asarray(src)[plan.edge_perm] if e else jnp.zeros(
        (plan.col_padded.shape[0], f), jnp.float32)
    outp = segment_softmax_planned(xp, plan, interpret=True)
    if e:
        out = np.asarray(outp)[np.asarray(plan.edge_pos)]
        np.testing.assert_allclose(out, _ref(src, rowptr), atol=2e-3,
                                   rtol=2e-3)


def test_planned_softmax_extreme_values():
    # Per-row stability: rows far below the chunk max must not underflow.
    rng = np.random.default_rng(1)
    n, e, f = 16, 256, 128
    deg = np.full(n, e // n)
    rowptr = np.zeros(n + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    src = rng.normal(size=(e, f)).astype(np.float32)
    src[:16] += 200.0   # one row hugely above the rest
    src[16:32] -= 200.0  # one row hugely below

    plan = build_spmm_plan(rowptr, np.zeros(e, np.int32), chunk=256,
                           with_edge_maps=True)
    xp = jnp.asarray(src)[plan.edge_perm]
    out = np.asarray(segment_softmax_planned(xp, plan, interpret=True))[
        np.asarray(plan.edge_pos)]
    np.testing.assert_allclose(out, _ref(src, rowptr), atol=2e-3, rtol=2e-3)
    # every row sums to 1
    for r in range(n):
        np.testing.assert_allclose(out[rowptr[r]:rowptr[r + 1]].sum(0), 1.0,
                                   atol=1e-3)


def test_softmax_csr_public_grad_path():
    # The public op (XLA path on CPU) still differentiates correctly.
    from pyg_lib_tpu import ops

    rng = np.random.default_rng(2)
    rowptr = np.array([0, 3, 3, 7])
    src = jnp.asarray(rng.normal(size=(7, 4)).astype(np.float32))

    def f(s):
        return jnp.sum(ops.softmax_csr(s, jnp.asarray(rowptr))**2)

    g = jax.grad(f)(src)
    eps = 1e-3
    num = (f(src.at[(1, 2)].add(eps)) - f(src.at[(1, 2)].add(-eps))) / (
        2 * eps)
    assert np.isclose(float(g[1, 2]), float(num), rtol=1e-2, atol=1e-3)


def test_segment_max_min_padded():
    import numpy as np
    from pyg_lib_tpu import ops

    rng = np.random.default_rng(5)
    n, e, f = 80, 600, 128
    deg = rng.multinomial(e, np.ones(n) / n)
    rowptr = np.zeros(n + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    col = rng.integers(0, n, size=e).astype(np.int32)
    src = rng.normal(size=(e, f)).astype(np.float32)
    graph = ops.build_spmm_graph(rowptr, col, chunk=256,
                                 with_edge_maps=True)
    plan = graph.fwd
    xp = jnp.asarray(src)[plan.edge_perm]

    out = np.asarray(ops.segment_max_padded(xp, plan))
    ref = np.zeros((n, f), np.float32)
    for r in range(n):
        lo, hi = rowptr[r], rowptr[r + 1]
        if hi > lo:
            ref[r] = src[lo:hi].max(0)
    # bf16-selection precision: relative tolerance ~1e-2
    np.testing.assert_allclose(out, ref, rtol=1.5e-2, atol=1.5e-2)

    out_min = np.asarray(ops.segment_min_padded(xp, plan))
    ref_min = np.zeros((n, f), np.float32)
    for r in range(n):
        lo, hi = rowptr[r], rowptr[r + 1]
        if hi > lo:
            ref_min[r] = src[lo:hi].min(0)
    np.testing.assert_allclose(out_min, ref_min, rtol=1.5e-2, atol=1.5e-2)


def test_segment_max_padded_grad_subgradient():
    import numpy as np
    from pyg_lib_tpu import ops

    rng = np.random.default_rng(6)
    n, e = 16, 100
    deg = rng.multinomial(e, np.ones(n) / n)
    rowptr = np.zeros(n + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    col = rng.integers(0, n, size=e).astype(np.int32)
    graph = ops.build_spmm_graph(rowptr, col, chunk=256,
                                 with_edge_maps=True)
    plan = graph.fwd
    xp = jnp.asarray(rng.normal(size=(plan.col_padded.shape[0],
                                      128)).astype(np.float32))

    g = jax.grad(lambda a: jnp.sum(ops.segment_max_padded(a, plan)))(xp)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    # cotangent mass per (row, feature) sums to ~1 for non-empty rows
    sums = np.asarray(ops.segment_sum_padded(jnp.asarray(g), plan))
    nonempty = np.diff(rowptr) > 0
    np.testing.assert_allclose(sums[nonempty], 1.0, atol=1e-4)


def test_pad_slots_leak_no_gradient_to_node0():
    """Regression: pad slots alias index 0 via row/col_padded; their
    cotangent must be exactly zero (was 511x corruption on node 0)."""
    import numpy as np
    from pyg_lib_tpu import ops

    # 2 nodes, 2 edges -> E_pad = 512 with chunk 512 (510 pad slots).
    rowptr = np.array([0, 1, 2], np.int64)
    col = np.array([1, 0], np.int64)
    graph = ops.build_spmm_graph(rowptr, col, chunk=512,
                                 with_edge_maps=True)
    plan = graph.fwd
    x = jnp.ones((2, 128), jnp.float32)

    # sum path: d/dx sum(segment_sum_padded(take(x, col_padded))) must be
    # exactly 1 per node (each node feeds exactly one edge).
    def f_sum(x):
        msgs = jnp.take(x, plan.col_padded, axis=0)
        return jnp.sum(ops.segment_sum_padded(msgs, plan))

    g = np.asarray(jax.grad(f_sum)(x))
    np.testing.assert_allclose(g, 1.0, atol=1e-5)

    # max path: same property for segment_max_padded.
    def f_max(x):
        msgs = jnp.take(x, plan.col_padded, axis=0)
        return jnp.sum(ops.segment_max_padded(msgs, plan))

    g2 = np.asarray(jax.grad(f_max)(x))
    np.testing.assert_allclose(g2, 1.0, atol=1e-4)


def test_softmax_csr_planned_requires_matching_length(monkeypatch):
    """Padded src (rows past ptr[-1]) must keep the XLA composite."""
    import numpy as np
    import pyg_lib_tpu.ops.softmax as sm

    monkeypatch.setattr(sm, '_PLANNED_MIN_EDGES', 8)
    monkeypatch.setattr(jax, 'default_backend', lambda: 'tpu')
    rowptr = np.array([0, 5, 10], np.int64)
    src = jnp.ones((16, 128), jnp.float32)  # 6 trailing pad rows
    assert not sm._use_planned(src, rowptr, 0)
    src2 = jnp.ones((10, 128), jnp.float32)
    assert sm._use_planned(src2, rowptr, 0)
