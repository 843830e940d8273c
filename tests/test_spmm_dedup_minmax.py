"""Dedup min/max plan: parity vs the per-edge path and numpy reference.

Reference contracts covered: exact values, winner-only gradient
(``/root/reference/pyg_lib/csrc/ops/autograd/scatter_kernel.cpp:432-456``)
and empty-row semantics (value 0 / sentinel,
``/root/reference/pyg_lib/csrc/ops/cpu/segment_csr_kernel.cpp:279-423``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyg_lib_tpu import ops
from pyg_lib_tpu.ops.pallas.spmm_dedup_minmax import (
    DedupMinmaxPlan, build_dedup_minmax_plan, dedup_minmax_apply,
    dedup_pairs)


def _graph(seed=7, n=400, e=5000, zipf=1.2, empty_mod=13):
    rng = np.random.default_rng(seed)
    row = rng.integers(0, n, e)
    if empty_mod:
        row = row[row % empty_mod != 0]
    p = 1.0 / np.arange(1, n + 1)**zipf
    p /= p.sum()
    col = rng.choice(n, row.shape[0], p=p)
    order = np.argsort(row, kind='stable')
    rowptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(row, minlength=n), out=rowptr[1:])
    return rowptr, col[order].astype(np.int64)


def _ref_minmax(rowptr, col, x, is_min):
    n = rowptr.shape[0] - 1
    out = np.zeros((n, x.shape[1]), np.float32)
    for r in range(n):
        s = col[rowptr[r]:rowptr[r + 1]]
        if len(s):
            out[r] = x[s].min(0) if is_min else x[s].max(0)
    return out


def test_dedup_pairs_idempotent():
    rowptr, col = _graph()
    rp, cl = dedup_pairs(rowptr, col)
    assert cl.shape[0] < col.shape[0]  # power-law graph has dup pairs
    rp2, cl2 = dedup_pairs(rp, cl)
    assert np.array_equal(rp, rp2) and np.array_equal(cl, cl2)
    # cols sorted within each row and unique
    for r in range(0, rp.shape[0] - 1, 37):
        s = cl[rp[r]:rp[r + 1]]
        assert np.array_equal(np.unique(s), s)


@pytest.mark.parametrize('reduce', ['max', 'min'])
def test_values_match_plain_and_numpy(reduce):
    rowptr, col = _graph()
    n = rowptr.shape[0] - 1
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, 48)).astype(np.float32)
    x[5] = x[17]  # exact ties across source rows
    g_plain = ops.build_spmm_graph(rowptr, col)
    g_mm = ops.build_spmm_graph(rowptr, col, minmax='on')
    assert isinstance(g_mm.mm, DedupMinmaxPlan)
    a = np.asarray(ops.spmm(jnp.asarray(x), g_plain, reduce=reduce))
    b = np.asarray(ops.spmm(jnp.asarray(x), g_mm, reduce=reduce))
    ref = _ref_minmax(rowptr, col, x, reduce == 'min')
    assert np.array_equal(a, ref)
    assert np.array_equal(b, ref)


def test_minmax_auto_picks_kernel_on_powerlaw():
    rowptr, col = _graph(zipf=1.4)
    g = ops.build_spmm_graph(rowptr, col, minmax='auto')
    assert isinstance(g.mm, DedupMinmaxPlan)


def test_minmax_auto_falls_back_on_uniform():
    # Uniform-random columns over a LARGE column space (far more columns
    # than edges per 128-row tile): no tile-scope reuse -> plain
    # (pair-deduped) plan, still a working min/max path.
    rng = np.random.default_rng(2)
    # deg ~16 keeps tiles chunk-dense (so the estimated gain measures
    # tile-scope REUSE, not padding) and n >> edges-per-tile kills reuse.
    n, e = 20_000, 320_000
    row = np.sort(rng.integers(0, n, e))
    col = rng.integers(0, n, e).astype(np.int64)
    rowptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(row, minlength=n), out=rowptr[1:])
    g = ops.build_spmm_graph(rowptr, col, minmax='auto')
    # Plain fwd plan already serves min/max: no extra plan is built (a
    # rebuilt pair-dedup plan measured SLOWER on uniform graphs).
    assert g.mm is None
    x = rng.normal(size=(n, 16)).astype(np.float32)
    out = np.asarray(ops.spmm(jnp.asarray(x), g, reduce='max'))
    assert np.array_equal(out, _ref_minmax(rowptr, col, x, False))
    # ...but a dedup-sum graph still gets its fallback min/max plan.
    g2 = ops.build_spmm_graph(rowptr, col, dedup='on', minmax='auto')
    from pyg_lib_tpu.ops.pallas.spmm_chunked import SpmmPlan
    assert isinstance(g2.mm, SpmmPlan)
    out2 = np.asarray(ops.spmm(jnp.asarray(x), g2, reduce='max'))
    assert np.array_equal(out2, _ref_minmax(rowptr, col, x, False))


def test_minmax_with_dedup_sum_graph():
    # dedup sum plans get a min/max schedule via minmax=... (round-4 gap:
    # they used to reject reduce='max' outright).
    rowptr, col = _graph(zipf=1.3)
    n = rowptr.shape[0] - 1
    g = ops.build_spmm_graph(rowptr, col, dedup='on', minmax='on')
    x = np.random.default_rng(1).normal(size=(n, 32)).astype(np.float32)
    out = np.asarray(ops.spmm(jnp.asarray(x), g, reduce='min'))
    assert np.array_equal(out, _ref_minmax(rowptr, col, x, True))


def test_dedup_graph_without_minmax_still_raises():
    rowptr, col = _graph()
    g = ops.build_spmm_graph(rowptr, col, dedup='on')
    with pytest.raises(ValueError, match='minmax'):
        ops.spmm(jnp.ones((rowptr.shape[0] - 1, 8)), g, reduce='max')


@pytest.mark.parametrize('reduce', ['max', 'min'])
def test_winner_gradient_matches_plain(reduce):
    rowptr, col = _graph(seed=9)
    n = rowptr.shape[0] - 1
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(n, 24)).astype(np.float32))
    g_plain = ops.build_spmm_graph(rowptr, col)
    g_mm = ops.build_spmm_graph(rowptr, col, minmax='on')

    def loss(gph):
        return lambda xx: (ops.spmm(xx, gph, reduce=reduce)**2).sum()

    ga = jax.grad(loss(g_plain))(x)
    gb = jax.grad(loss(g_mm))(x)
    # No ties in continuous random input -> winners agree exactly.
    assert np.array_equal(np.asarray(ga), np.asarray(gb))


def test_winner_gradient_fd():
    # Finite-difference check of the winner-only gradient (f64 CPU).
    rowptr, col = _graph(seed=11, n=60, e=400, empty_mod=7)
    n = rowptr.shape[0] - 1
    g = ops.build_spmm_graph(rowptr, col, minmax='on')
    x = jnp.asarray(
        np.random.default_rng(5).normal(size=(n, 6)).astype(np.float32))
    w = jnp.asarray(
        np.random.default_rng(6).normal(size=(n, 6)).astype(np.float32))

    def loss(xx):
        return (ops.spmm(xx, g, reduce='max') * w).sum()

    grad = jax.grad(loss)(x)
    eps = 1e-3
    rng = np.random.default_rng(8)
    for _ in range(5):
        i, j = rng.integers(0, n), rng.integers(0, 6)
        d = jnp.zeros_like(x).at[i, j].set(eps)
        fd = (loss(x + d) - loss(x - d)) / (2 * eps)
        assert abs(float(fd) - float(grad[i, j])) < 1e-2


def test_kernel_interpret_matches_xla_smoke():
    # One small interpret-mode run of the Mosaic kernel per suite (the
    # slow large-shape configs live in the slow tier).
    rowptr, col = _graph(seed=4, n=260, e=2000, zipf=1.3)
    n = rowptr.shape[0] - 1
    rp_d, cl_d = dedup_pairs(rowptr, col)
    plan = build_dedup_minmax_plan(rp_d, cl_d, ec=128, uc=32,
                                   _pre_deduped=True)
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(n, 128)).astype(np.float32))
    v_x, p_x = dedup_minmax_apply(x, plan)
    v_k, p_k = dedup_minmax_apply(x, plan, interpret=True)
    assert np.array_equal(np.asarray(v_x), np.asarray(v_k))
    assert np.array_equal(np.asarray(p_x), np.asarray(p_k))


def test_empty_rows_and_empty_tiles():
    # rows 128..255 all empty -> a whole empty tile
    n = 384
    rowptr = np.zeros(n + 1, np.int64)
    deg = np.zeros(n, np.int64)
    deg[:100] = 3
    deg[300:] = 2
    np.cumsum(deg, out=rowptr[1:])
    rng = np.random.default_rng(0)
    col = rng.integers(0, n, int(rowptr[-1])).astype(np.int64)
    g = ops.build_spmm_graph(rowptr, col, minmax='on')
    x = rng.normal(size=(n, 8)).astype(np.float32)
    out = np.asarray(ops.spmm(jnp.asarray(x), g, reduce='max'))
    ref = _ref_minmax(rowptr, col, x, False)
    assert np.array_equal(out, ref)
    assert np.all(out[100:300] == 0.0)  # reference empty-bucket value


def test_plan_too_large_raises():
    rowptr = np.array([0, 1], np.int64)
    col = np.array([0], np.int64)
    plan = build_dedup_minmax_plan(rowptr, col, ec=8, uc=8)
    assert plan.num_chunks == 1
    # 2^21 rows of 8 DISTINCT cols each (pair-dedup keeps all): chunk
    # lower bound x uc reaches 2^24 slots -> the early guard fires
    # before the (expensive) packing loop.
    with pytest.raises(ValueError, match='exact-f32'):
        big_rp = np.arange(0, (1 << 21) + 1, dtype=np.int64) * 8
        n_big = 1 << 21
        big_cl = (np.repeat(np.arange(n_big, dtype=np.int64), 8) +
                  np.tile(np.arange(8, dtype=np.int64), n_big)) % n_big
        build_dedup_minmax_plan(big_rp, big_cl, ec=8, uc=8,
                                _pre_deduped=True)


@pytest.mark.slow
def test_fuzz_kernel_vs_xla_interpret():
    """Randomized configs (shape grid, ties, extreme scales): the
    interpret-mode kernel must match the XLA oracle bit for bit — the
    CI version of the on-chip fuzz that passed 10/10 in round 5."""
    from pyg_lib_tpu.ops.pallas.spmm_dedup_minmax import _dedup_minmax_xla

    rng = np.random.default_rng(123)
    for trial in range(6):
        n = int(rng.integers(130, 1200))
        e = int(rng.integers(n, n * 12))
        f = int(rng.choice([8, 32, 128]))
        zipf = float(rng.uniform(1.0, 1.6))
        ec = int(rng.choice([64, 128, 256]))
        uc = min(int(rng.choice([16, 32, 64, 128])), ec)
        row = rng.integers(0, n, e)
        km = int(rng.choice([0, 7, 13]))
        if km:
            row = row[row % km != 0]
        p = 1.0 / np.arange(1, n + 1)**zipf
        p /= p.sum()
        col = rng.choice(n, row.shape[0], p=p)
        order = np.argsort(row, kind='stable')
        rowptr = np.zeros(n + 1, np.int64)
        np.cumsum(np.bincount(row, minlength=n), out=rowptr[1:])
        col = col[order].astype(np.int64)
        rp_d, cl_d = dedup_pairs(rowptr, col)
        plan = build_dedup_minmax_plan(rp_d, cl_d, ec=ec, uc=uc,
                                       _pre_deduped=True)
        xv = rng.normal(size=(n, f)).astype(np.float32) * rng.choice(
            [1.0, 1e4, 1e-4])
        if trial % 3 == 0:
            xv[rng.integers(0, n, 5)] = xv[rng.integers(0, n)]  # ties
        x = jnp.asarray(xv)
        v_k, p_k = dedup_minmax_apply(x, plan, interpret=True)
        slab = jnp.take(x, plan.uniq_cols, axis=0)
        v_x, p_x = _dedup_minmax_xla(slab, plan.edge_meta,
                                     plan.chunk_tile, plan.num_rows,
                                     plan.ec, plan.uc)
        cfg = f'trial {trial}: n={n} f={f} ec={ec} uc={uc}'
        assert np.array_equal(np.asarray(v_k), np.asarray(v_x)), cfg
        assert np.array_equal(np.asarray(p_k), np.asarray(p_x)), cfg


@pytest.mark.parametrize('minmax_mode', ['auto', 'on'])
def test_sharded_minmax_matches_single_graph(minmax_mode):
    rowptr, col = _graph(seed=21, n=700, e=9000, zipf=1.3, empty_mod=11)
    n = rowptr.shape[0] - 1
    g0 = ops.build_spmm_graph(rowptr, col)
    gs = ops.build_spmm_graph_sharded(rowptr, col, num_splits=3,
                                      dedup='auto', minmax=minmax_mode)
    assert gs.mm is not None
    x = jnp.asarray(
        np.random.default_rng(6).normal(size=(n, 24)).astype(np.float32))
    for red in ('max', 'min'):
        a = np.asarray(ops.spmm(x, g0, reduce=red))
        b = np.asarray(ops.spmm_sharded(x, gs, reduce=red))
        assert np.array_equal(a, b)
    ga = jax.grad(lambda xx: (ops.spmm(xx, g0, reduce='max')**2).sum())(x)
    gb = jax.grad(
        lambda xx: (ops.spmm_sharded(xx, gs, reduce='max')**2).sum())(x)
    assert np.array_equal(np.asarray(ga), np.asarray(gb))


def test_sharded_minmax_plain_plans_and_guard():
    rowptr, col = _graph(seed=22, n=500, e=4000)
    n = rowptr.shape[0] - 1
    x = jnp.asarray(
        np.random.default_rng(7).normal(size=(n, 8)).astype(np.float32))
    # plain split plans serve min/max directly
    gp = ops.build_spmm_graph_sharded(rowptr, col, num_splits=2)
    out = np.asarray(ops.spmm_sharded(x, gp, reduce='max'))
    ref = np.asarray(
        ops.spmm(x, ops.build_spmm_graph(rowptr, col), reduce='max'))
    assert np.array_equal(out, ref)
    # dedup split plans without minmax= still raise
    gd = ops.build_spmm_graph_sharded(rowptr, col, num_splits=2,
                                      dedup='on')
    with pytest.raises(ValueError, match='minmax'):
        ops.spmm_sharded(x, gd, reduce='max')
