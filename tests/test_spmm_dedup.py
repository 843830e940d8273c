"""Dedup-gather SpMM plan (``pallas.spmm_dedup``) vs numpy reference.

Golden-reference style (SURVEY.md §4): every configuration is checked
against an inline numpy scatter-add, on graph families where dedup
matters (power-law hubs, clustered) and where it does not (uniform).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyg_lib_tpu import ops
from pyg_lib_tpu.ops.pallas.spmm_dedup import (build_dedup_plan,
                                               dedup_plan_apply,
                                               estimate_dedup)


def _csr_from_edges(row, col, n):
    order = np.argsort(row, kind='stable')
    row, col = row[order], col[order]
    rowptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(row, minlength=n), out=rowptr[1:])
    return rowptr, col.astype(np.int64)


def _uniform_graph(rng, n, e):
    return _csr_from_edges(rng.integers(0, n, e), rng.integers(0, n, e), n)


def _powerlaw_graph(rng, n, e, alpha=1.2):
    # hub-heavy in-degree: cols drawn from a Zipf-ish distribution
    p = (1.0 / np.arange(1, n + 1)**alpha)
    p /= p.sum()
    col = rng.choice(n, size=e, p=p)
    return _csr_from_edges(rng.integers(0, n, e), col, n)


def _ref(x, rowptr, col, w=None):
    n = len(rowptr) - 1
    rows = np.repeat(np.arange(n), np.diff(rowptr))
    msgs = x[col].astype(np.float64)
    if w is not None:
        msgs = msgs * w[:, None]
    out = np.zeros((n, x.shape[1]), np.float64)
    np.add.at(out, rows, msgs)
    return out.astype(np.float32)


@pytest.mark.parametrize('family', ['uniform', 'powerlaw'])
@pytest.mark.parametrize('n,e,f', [(300, 4000, 128), (520, 9013, 128)])
def test_dedup_plan_matches_reference(family, n, e, f):
    rng = np.random.default_rng(3)
    make = _uniform_graph if family == 'uniform' else _powerlaw_graph
    rowptr, col = make(rng, n, e)
    x = rng.normal(size=(n, f)).astype(np.float32)
    plan = build_dedup_plan(rowptr, col, ec=256)
    out = dedup_plan_apply(jnp.asarray(x), plan)
    np.testing.assert_allclose(np.asarray(out), _ref(x, rowptr, col),
                               atol=2e-3, rtol=2e-3)


def test_dedup_interpret_kernel_matches_xla():
    # The Pallas kernel itself (interpret mode) against the XLA fallback.
    rng = np.random.default_rng(5)
    rowptr, col = _powerlaw_graph(rng, 260, 3000, alpha=1.4)
    x = rng.normal(size=(260, 128)).astype(np.float32)
    plan = build_dedup_plan(rowptr, col, ec=128, uc=64)
    ker = dedup_plan_apply(jnp.asarray(x), plan, interpret=True)
    xla = dedup_plan_apply(jnp.asarray(x), plan)
    np.testing.assert_allclose(np.asarray(ker), np.asarray(xla), atol=2e-3,
                               rtol=2e-3)


def test_dedup_weighted_and_interpret():
    rng = np.random.default_rng(11)
    rowptr, col = _powerlaw_graph(rng, 200, 2500)
    w = rng.normal(size=2500).astype(np.float32)
    x = rng.normal(size=(200, 128)).astype(np.float32)
    plan = build_dedup_plan(rowptr, col, ec=128, uc=64, edge_weight=w)
    ref = _ref(x, rowptr, col, w)
    out = dedup_plan_apply(jnp.asarray(x), plan)
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-3, rtol=3e-3)
    ker = dedup_plan_apply(jnp.asarray(x), plan, interpret=True)
    np.testing.assert_allclose(np.asarray(ker), ref, atol=3e-3, rtol=3e-3)


@pytest.mark.parametrize('precision', ['bf16', 'int8'])
def test_dedup_precision_modes(precision):
    rng = np.random.default_rng(7)
    rowptr, col = _powerlaw_graph(rng, 300, 4000)
    x = rng.normal(size=(300, 128)).astype(np.float32)
    plan = build_dedup_plan(rowptr, col, ec=256)
    out = dedup_plan_apply(jnp.asarray(x), plan, precision=precision)
    ref = _ref(x, rowptr, col)
    tol = 0.15 if precision == 'bf16' else 0.6
    err = np.abs(np.asarray(out) - ref)
    scale = np.maximum(np.abs(ref), 1.0)
    assert np.quantile(err / scale, 0.999) < tol


def test_build_spmm_graph_dedup_end_to_end_grad():
    rng = np.random.default_rng(9)
    rowptr, col = _powerlaw_graph(rng, 250, 3000)
    x = rng.normal(size=(250, 64)).astype(np.float32)
    g = rng.normal(size=(250, 64)).astype(np.float32)
    graph = ops.build_spmm_graph(rowptr, col, dedup='on')
    out = ops.spmm(jnp.asarray(x), graph)
    np.testing.assert_allclose(np.asarray(out), _ref(x, rowptr, col),
                               atol=2e-3, rtol=2e-3)
    grad = jax.grad(lambda xx: jnp.vdot(ops.spmm(xx, graph),
                                        jnp.asarray(g)))(jnp.asarray(x))
    # d/dx = A^T g: scatter g rows onto cols
    n = 250
    rows = np.repeat(np.arange(n), np.diff(rowptr))
    ref_grad = np.zeros_like(x)
    np.add.at(ref_grad, col, g[rows])
    np.testing.assert_allclose(np.asarray(grad), ref_grad, atol=2e-3,
                               rtol=2e-3)


def test_build_spmm_graph_dedup_weighted_grad():
    rng = np.random.default_rng(13)
    rowptr, col = _powerlaw_graph(rng, 220, 2600)
    w = rng.normal(size=2600).astype(np.float32)
    x = rng.normal(size=(220, 64)).astype(np.float32)
    g = rng.normal(size=(220, 64)).astype(np.float32)
    graph = ops.build_spmm_graph(rowptr, col, dedup='on', edge_weight=w)
    out = ops.spmm(jnp.asarray(x), graph)
    np.testing.assert_allclose(np.asarray(out), _ref(x, rowptr, col, w),
                               atol=3e-3, rtol=3e-3)
    grad = jax.grad(lambda xx: jnp.vdot(ops.spmm(xx, graph),
                                        jnp.asarray(g)))(jnp.asarray(x))
    n = 220
    rows = np.repeat(np.arange(n), np.diff(rowptr))
    ref_grad = np.zeros_like(x)
    np.add.at(ref_grad, col, g[rows] * w[:, None])
    np.testing.assert_allclose(np.asarray(grad), ref_grad, atol=3e-3,
                               rtol=3e-3)


def test_dedup_auto_picks_by_gain():
    rng = np.random.default_rng(21)
    # Dense uniform graph (mean degree 16, the headline shape): tile-scope
    # reuse ~1 and negligible chunk padding -> auto stays single-plan.
    rowptr_u, col_u = _uniform_graph(rng, 4000, 64000)
    _, gain_u = estimate_dedup(rowptr_u, col_u)
    # Hub graph: most edges point at a handful of columns -> big gain.
    rowptr_h, col_h = _powerlaw_graph(rng, 4000, 16000, alpha=2.0)
    _, gain_h = estimate_dedup(rowptr_h, col_h)
    assert gain_h > gain_u
    assert gain_h > 1.3
    from pyg_lib_tpu.ops.pallas.spmm_chunked import SpmmPlan
    from pyg_lib_tpu.ops.pallas.spmm_dedup import DedupSpmmPlan
    gu = ops.build_spmm_graph(rowptr_u, col_u, dedup='auto')
    gh = ops.build_spmm_graph(rowptr_h, col_h, dedup='auto')
    assert isinstance(gu.fwd, SpmmPlan)
    assert isinstance(gh.fwd, DedupSpmmPlan)
    # Both must still be numerically right.
    x = rng.normal(size=(4000, 32)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(ops.spmm(jnp.asarray(x), gh)),
                               _ref(x, rowptr_h, col_h), atol=2e-3,
                               rtol=2e-3)


def test_dedup_edge_cases():
    rng = np.random.default_rng(17)
    # empty graph
    rowptr = np.zeros(65, np.int64)
    col = np.zeros(0, np.int64)
    plan = build_dedup_plan(rowptr, col, ec=128)
    x = rng.normal(size=(64, 128)).astype(np.float32)
    out = dedup_plan_apply(jnp.asarray(x), plan)
    assert out.shape == (64, 128)
    np.testing.assert_allclose(np.asarray(out), 0.0)
    # single hub column: every edge dedups to one gather per chunk
    n, e = 200, 2000
    row = rng.integers(0, n, e)
    colh = np.zeros(e, np.int64)
    rowptr, colh = _csr_from_edges(row, colh, n)
    plan = build_dedup_plan(rowptr, colh, ec=128, uc=8)
    assert plan.uniq_cols.shape[0] <= plan.num_chunks * 8
    x = rng.normal(size=(n, 128)).astype(np.float32)
    out = dedup_plan_apply(jnp.asarray(x), plan)
    np.testing.assert_allclose(np.asarray(out), _ref(x, rowptr, colh),
                               atol=2e-3, rtol=2e-3)
    # rows not multiple of TR, trailing empty rows
    rowptr2, col2 = _powerlaw_graph(rng, 131, 900)
    rowptr2[100:] = rowptr2[100]  # rows 100.. empty
    col2 = col2[:rowptr2[-1]]
    plan2 = build_dedup_plan(rowptr2, col2, ec=128)
    x2 = rng.normal(size=(131, 64)).astype(np.float32)
    out2 = dedup_plan_apply(jnp.asarray(x2), plan2)
    np.testing.assert_allclose(np.asarray(out2), _ref(x2, rowptr2, col2),
                               atol=2e-3, rtol=2e-3)


def test_dedup_validation_errors():
    rowptr = np.array([0, 1, 2], np.int64)
    col = np.array([1, 0], np.int64)
    with pytest.raises(ValueError, match='dedup'):
        ops.build_spmm_graph(rowptr, col, dedup='on', with_edge_maps=True)
    with pytest.raises(ValueError, match='dedup'):
        ops.build_spmm_graph(rowptr, col, dedup='bogus')
    with pytest.raises(ValueError, match='edge_weight'):
        ops.build_spmm_graph(rowptr, col,
                             edge_weight=np.ones(2, np.float32))
    g = ops.build_spmm_graph(rowptr, col, dedup='on')
    with pytest.raises(ValueError, match='single-plan'):
        ops.spmm(jnp.ones((2, 8)), g, reduce='max')


def test_sharded_dedup_matches_reference_and_shares_shapes():
    rng = np.random.default_rng(23)
    n, e, f = 700, 9000, 64
    rowptr, col = _powerlaw_graph(rng, n, e, alpha=1.4)
    x = rng.normal(size=(n, f)).astype(np.float32)
    g = ops.build_spmm_graph_sharded(rowptr, col, num_splits=3,
                                     dedup='on')
    from pyg_lib_tpu.ops.pallas.spmm_dedup import DedupSpmmPlan
    assert all(isinstance(p, DedupSpmmPlan) for p in g.fwd)
    # one compiled kernel: identical (chunks, ec, uc) across splits
    shapes = {(p.num_chunks, p.ec, p.uc) for p in g.fwd}
    assert len(shapes) == 1
    out = ops.spmm_sharded(jnp.asarray(x), g)
    np.testing.assert_allclose(np.asarray(out), _ref(x, rowptr, col),
                               atol=2e-3, rtol=2e-3)
    gv = rng.normal(size=(n, f)).astype(np.float32)
    grad = jax.grad(lambda xx: jnp.vdot(
        ops.spmm_sharded(xx, g), jnp.asarray(gv)))(jnp.asarray(x))
    rows = np.repeat(np.arange(n), np.diff(rowptr))
    ref_grad = np.zeros_like(x)
    np.add.at(ref_grad, col, gv[rows])
    np.testing.assert_allclose(np.asarray(grad), ref_grad, atol=2e-3,
                               rtol=2e-3)
    with pytest.raises(ValueError, match='range_split'):
        ops.build_spmm_graph_sharded(rowptr, col, 2, dedup='on',
                                     range_split=2)


def test_hot_plan_matches_reference():
    # Two-level plan: hub columns leave the chunks for the dense
    # count-matrix level; result must be identical.
    rng = np.random.default_rng(31)
    rowptr, col = _powerlaw_graph(rng, 600, 9000, alpha=1.3)
    x = rng.normal(size=(600, 128)).astype(np.float32)
    plan = build_dedup_plan(rowptr, col, ec=256, hot=64, hot_thresh=2)
    assert plan.num_hot == 64
    # counts here are tiny multiplicities -> narrowest exact storage
    assert plan.hot_w.dtype == jnp.int8
    # hub edges actually left the cold chunks
    plain = build_dedup_plan(rowptr, col, ec=256, hot='off')
    assert plan.uniq_cols.shape[0] < plain.uniq_cols.shape[0]
    ref = _ref(x, rowptr, col)
    out = dedup_plan_apply(jnp.asarray(x), plan)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3, rtol=2e-3)
    ker = dedup_plan_apply(jnp.asarray(x), plan, interpret=True)
    np.testing.assert_allclose(np.asarray(ker), ref, atol=2e-3, rtol=2e-3)


def test_hot_plan_count_storage_tiers():
    # Multiplicity > 127 forces bf16 count storage (still exact: integer
    # counts <= 256 are representable); the result must stay identical.
    rng = np.random.default_rng(41)
    n = 300  # 3 tiles
    # cols 0..7 span all 3 tiles (edges from rows 0/128/256) -> the ONLY
    # hot candidates at hot_thresh=2; everything else spans one tile.
    row = np.tile(np.array([0, 128, 256], np.int64), 8)
    col = np.repeat(np.arange(8, dtype=np.int64), 3)
    # plant a multigraph hub: row 0 gets 150 parallel edges to column 0
    # cold edges confined to tile 0 so their cols all have span 1
    row = np.concatenate([row, np.zeros(150, np.int64),
                          rng.integers(0, 128, 1500)])
    col = np.concatenate([col, np.zeros(150, np.int64),
                          rng.integers(8, n, 1500)])
    rowptr, col = _csr_from_edges(row, col, n)
    plan = build_dedup_plan(rowptr, col, ec=256, hot=8, hot_thresh=2)
    assert plan.num_hot == 8
    assert plan.hot_w.dtype == jnp.bfloat16
    assert float(jnp.max(plan.hot_w.astype(jnp.float32))) == 151.0
    x = rng.normal(size=(n, 64)).astype(np.float32)
    out = dedup_plan_apply(jnp.asarray(x), plan)
    np.testing.assert_allclose(np.asarray(out), _ref(x, rowptr, col),
                               atol=2e-3, rtol=2e-3)


def test_hot_budget_reclamps_for_wide_storage():
    # The byte budget is enforced against the ACTUAL storage width: with
    # counts > 127 (bf16, 2 B/entry) a budget sized for 1 B/entry must
    # halve the hot set rather than exceed the stream budget (advisor
    # round-4 finding).
    from pyg_lib_tpu.ops.pallas.spmm_dedup import TR, _tile_slices

    rng = np.random.default_rng(43)
    nt = 33  # >= 16 tiles -> auto hot level is live
    n = nt * 128
    # col 0 spans all 33 tiles (widest, survives any truncation);
    # cols 1..15 span 20 tiles each. Nothing else is a candidate.
    row = [np.arange(nt, dtype=np.int64) * 128]
    col = [np.zeros(nt, np.int64)]
    for c in range(1, 16):
        row.append(np.arange(20, dtype=np.int64) * 128 + c)
        col.append(np.full(20, c, np.int64))
    # plant one >127 multiplicity on col 0 so storage is bf16
    row.append(np.zeros(130, np.int64))
    col.append(np.zeros(130, np.int64))
    # cold edges confined to tile 0 so their cols all have span 1
    row.append(rng.integers(0, 128, 8000))
    col.append(rng.integers(16, n, 8000))
    rowptr, col = _csr_from_edges(np.concatenate(row),
                                  np.concatenate(col), n)
    num_tiles = _tile_slices(rowptr)[0]
    budget = num_tiles * TR * 16  # 1-B cap = 16 cols; 2-B cap = 8
    plan = build_dedup_plan(rowptr, col, ec=256, hot_thresh=2,
                            hot_budget_bytes=budget)
    assert plan.hot_w.dtype == jnp.bfloat16
    assert plan.num_hot == 8
    assert 0 in np.asarray(plan.hot_cols)  # widest span survived
    assert plan.hot_w.shape[1] * 2 * num_tiles * TR <= budget
    x = rng.normal(size=(n, 32)).astype(np.float32)
    out = dedup_plan_apply(jnp.asarray(x), plan)
    np.testing.assert_allclose(np.asarray(out), _ref(x, rowptr, col),
                               atol=2e-3, rtol=2e-3)


def test_hot_plan_weighted_and_precision():
    rng = np.random.default_rng(33)
    rowptr, col = _powerlaw_graph(rng, 500, 7000, alpha=1.3)
    w = rng.normal(size=7000).astype(np.float32)
    x = rng.normal(size=(500, 128)).astype(np.float32)
    plan = build_dedup_plan(rowptr, col, ec=256, edge_weight=w, hot=32,
                            hot_thresh=2)
    assert plan.num_hot == 32
    assert plan.hot_w.dtype == jnp.float32  # general weight sums
    ref = _ref(x, rowptr, col, w)
    out = dedup_plan_apply(jnp.asarray(x), plan)
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-3, rtol=3e-3)
    ker = dedup_plan_apply(jnp.asarray(x), plan, interpret=True)
    np.testing.assert_allclose(np.asarray(ker), ref, atol=3e-3, rtol=3e-3)
    # reduced-precision modes on the unweighted hot plan
    plan_u = build_dedup_plan(rowptr, col, ec=256, hot=32, hot_thresh=2)
    ref_u = _ref(x, rowptr, col)
    for prec, tol in [('bf16', 0.15), ('int8', 0.6)]:
        o = dedup_plan_apply(jnp.asarray(x), plan_u, precision=prec)
        err = np.abs(np.asarray(o) - ref_u) / np.maximum(np.abs(ref_u), 1.0)
        assert np.quantile(err, 0.999) < tol


def test_hot_auto_gates_small_grids():
    # auto never enables the dense count level on tiny grids (< 16 tiles)
    rng = np.random.default_rng(35)
    rowptr, col = _powerlaw_graph(rng, 600, 9000, alpha=1.5)
    plan = build_dedup_plan(rowptr, col, ec=256)
    assert plan.num_hot == 0
    # but a threshold override can force it
    plan2 = build_dedup_plan(rowptr, col, ec=256, hot_thresh=2)
    assert plan2.num_hot > 0
    x = rng.normal(size=(600, 32)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(dedup_plan_apply(jnp.asarray(x), plan2)),
        _ref(x, rowptr, col), atol=2e-3, rtol=2e-3)


def test_hot_grad_end_to_end():
    rng = np.random.default_rng(37)
    rowptr, col = _powerlaw_graph(rng, 400, 6000, alpha=1.4)
    x = rng.normal(size=(400, 64)).astype(np.float32)
    gv = rng.normal(size=(400, 64)).astype(np.float32)
    from pyg_lib_tpu.ops.pallas.spmm_dedup import DedupSpmmPlan
    from pyg_lib_tpu.ops.spmm import SpmmGraph, _transpose_csr

    # build an SpmmGraph with hot plans on both sides by hand (the auto
    # threshold needs >= 16 tiles; tests run far smaller)
    t_ptr, t_col = _transpose_csr(rowptr, col, 400)
    fwd = build_dedup_plan(rowptr, col, ec=256, hot=32, hot_thresh=2)
    bwd = build_dedup_plan(t_ptr, t_col, ec=256, hot=32, hot_thresh=2)
    deg = jnp.asarray(np.diff(rowptr).astype(np.float32))
    graph = SpmmGraph(fwd=fwd, bwd=bwd, deg=deg)
    assert fwd.num_hot == 32
    out = ops.spmm(jnp.asarray(x), graph)
    np.testing.assert_allclose(np.asarray(out), _ref(x, rowptr, col),
                               atol=2e-3, rtol=2e-3)
    grad = jax.grad(lambda xx: jnp.vdot(ops.spmm(xx, graph),
                                        jnp.asarray(gv)))(jnp.asarray(x))
    rows = np.repeat(np.arange(400), np.diff(rowptr))
    ref_grad = np.zeros_like(x)
    np.add.at(ref_grad, col, gv[rows])
    np.testing.assert_allclose(np.asarray(grad), ref_grad, atol=2e-3,
                               rtol=2e-3)


def test_pad_hot_is_noop_numerically():
    from pyg_lib_tpu.ops.pallas.spmm_dedup import pad_hot, pad_plan

    rng = np.random.default_rng(39)
    rowptr, col = _powerlaw_graph(rng, 300, 4000, alpha=1.3)
    x = rng.normal(size=(300, 32)).astype(np.float32)
    plan = build_dedup_plan(rowptr, col, ec=128, hot=16, hot_thresh=2)
    padded = pad_hot(pad_plan(plan, plan.num_chunks + 3), 40)
    assert padded.num_hot == 40 and padded.num_chunks == plan.num_chunks + 3
    a = dedup_plan_apply(jnp.asarray(x), plan)
    b = dedup_plan_apply(jnp.asarray(x), padded)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    bi = dedup_plan_apply(jnp.asarray(x), padded, interpret=True)
    np.testing.assert_allclose(np.asarray(bi), np.asarray(a), atol=2e-3,
                               rtol=2e-3)
    # padding a hot-less plan up creates an all-zero hot level
    plain = build_dedup_plan(rowptr, col, ec=128, hot='off')
    lifted = pad_hot(plain, 16)
    assert lifted.num_hot == 16
    c = dedup_plan_apply(jnp.asarray(x), lifted)
    np.testing.assert_allclose(np.asarray(c), np.asarray(a), atol=2e-3,
                               rtol=2e-3)
    with pytest.raises(ValueError, match='shrink'):
        pad_hot(padded, 8)


def test_pad_plan_is_noop_numerically():
    from pyg_lib_tpu.ops.pallas.spmm_dedup import pad_plan

    rng = np.random.default_rng(27)
    rowptr, col = _powerlaw_graph(rng, 300, 3000)
    x = rng.normal(size=(300, 32)).astype(np.float32)
    plan = build_dedup_plan(rowptr, col, ec=128, uc=64)
    padded = pad_plan(plan, plan.num_chunks + 7)
    assert padded.num_chunks == plan.num_chunks + 7
    a = dedup_plan_apply(jnp.asarray(x), plan)
    b = dedup_plan_apply(jnp.asarray(x), padded)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # interpret kernel too (pad chunks revisit the last tile, adding 0)
    bi = dedup_plan_apply(jnp.asarray(x), padded, interpret=True)
    np.testing.assert_allclose(np.asarray(bi), np.asarray(a), atol=2e-3,
                               rtol=2e-3)
