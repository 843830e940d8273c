"""Planned SpMM (``ops.spmm``) vs pure-numpy reference.

Mirrors the reference's golden-reference test style
(reference ``test/ops/test_scatter.py:26-53`` inline references) for the
fused gather+segment aggregation, including the custom VJP.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyg_lib_tpu import ops


def _random_csr(rng, n, e):
    deg = rng.multinomial(e, np.ones(n) / n)
    rowptr = np.zeros(n + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    col = rng.integers(0, n, size=e).astype(np.int64)
    return rowptr, col


def _spmm_ref(x, rowptr, col, reduce='sum'):
    n = len(rowptr) - 1
    out = np.zeros((n, x.shape[1]), np.float32)
    rows = np.repeat(np.arange(n), np.diff(rowptr))
    np.add.at(out, rows, x[col])
    if reduce == 'mean':
        d = np.maximum(np.diff(rowptr), 1).astype(np.float32)
        out = out / d[:, None]
    return out


@pytest.mark.parametrize('n,e,f', [(300, 4000, 128), (64, 0, 128),
                                   (257, 9001, 256)])
@pytest.mark.parametrize('reduce', ['sum', 'mean'])
def test_spmm_matches_reference(n, e, f, reduce):
    rng = np.random.default_rng(42)
    rowptr, col = _random_csr(rng, n, e)
    x = rng.normal(size=(n, f)).astype(np.float32)

    graph = ops.build_spmm_graph(rowptr, col, chunk=256)
    out = ops.spmm(jnp.asarray(x), graph, reduce=reduce)
    ref = _spmm_ref(x, rowptr, col, reduce)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-3, rtol=1e-3)


def test_spmm_grad_is_transpose_spmm():
    rng = np.random.default_rng(7)
    rowptr, col = _random_csr(rng, 150, 2000)
    x = rng.normal(size=(150, 128)).astype(np.float32)
    graph = ops.build_spmm_graph(rowptr, col, chunk=256)

    g = rng.normal(size=(150, 128)).astype(np.float32)
    grad = jax.grad(
        lambda xx: jnp.vdot(ops.spmm(xx, graph), jnp.asarray(g)))(
            jnp.asarray(x))

    # d/dx sum_e g[row[e]] . x[col[e]]  ==  scatter of g rows onto cols.
    ref = np.zeros_like(x)
    rows = np.repeat(np.arange(150), np.diff(rowptr))
    np.add.at(ref, col, g[rows])
    np.testing.assert_allclose(np.asarray(grad), ref, atol=1e-3, rtol=1e-3)


def test_spmm_mean_grad():
    rng = np.random.default_rng(3)
    rowptr, col = _random_csr(rng, 96, 700)
    x = jnp.asarray(rng.normal(size=(96, 128)).astype(np.float32))
    graph = ops.build_spmm_graph(rowptr, col, chunk=256)

    # Numeric gradient check on a scalar objective.
    def f(xx):
        return jnp.sum(ops.spmm(xx, graph, reduce='mean')**2)

    g = jax.grad(f)(x)
    eps = 1e-3
    idx = (5, 7)
    xp = x.at[idx].add(eps)
    xm = x.at[idx].add(-eps)
    num = (f(xp) - f(xm)) / (2 * eps)
    assert np.isclose(float(g[idx]), float(num), rtol=1e-2, atol=1e-2)


def test_spmm_jit_stability():
    rng = np.random.default_rng(1)
    rowptr, col = _random_csr(rng, 128, 1000)
    graph = ops.build_spmm_graph(rowptr, col, chunk=256)
    x = jnp.asarray(rng.normal(size=(128, 128)).astype(np.float32))

    fn = jax.jit(lambda xx: ops.spmm(xx, graph))
    a = fn(x)
    b = fn(x * 2.0)
    np.testing.assert_allclose(np.asarray(b), 2 * np.asarray(a), rtol=1e-5)


def test_sddmm_matches_reference_and_grads():
    rng = np.random.default_rng(9)
    rowptr, col = _random_csr(rng, 120, 1500)
    x = rng.normal(size=(120, 64)).astype(np.float32)
    y = rng.normal(size=(120, 64)).astype(np.float32)
    graph = ops.build_spmm_graph(rowptr, col, chunk=256,
                                 with_edge_maps=True)

    out = np.asarray(ops.sddmm(jnp.asarray(x), jnp.asarray(y), graph))
    rows = np.repeat(np.arange(120), np.diff(rowptr))
    ref = np.sum(x[rows] * y[col], axis=-1)
    np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-3)

    g = jax.grad(lambda a, b: jnp.sum(ops.sddmm(a, b, graph)**2),
                 argnums=(0, 1))(jnp.asarray(x), jnp.asarray(y))
    assert all(bool(jnp.isfinite(t).all()) for t in g)


def test_spmm_csr_convenience_and_cache():
    rng = np.random.default_rng(13)
    rowptr, col = _random_csr(rng, 100, 900)
    x = jnp.asarray(rng.normal(size=(100, 128)).astype(np.float32))

    a = ops.spmm_csr(x, rowptr, col)
    b = ops.spmm_csr(x * 2, rowptr, col)  # cache hit
    np.testing.assert_allclose(np.asarray(b), 2 * np.asarray(a), rtol=1e-5)
    ref = _spmm_ref(np.asarray(x), rowptr, col)
    np.testing.assert_allclose(np.asarray(a), ref, atol=1e-3, rtol=1e-3)

    # in-place mutation of the SAME buffers must be detected
    col2 = col.copy()
    col[:] = (col + 1) % 100
    c = ops.spmm_csr(x, rowptr, col)
    ref2 = _spmm_ref(np.asarray(x), rowptr, col)
    np.testing.assert_allclose(np.asarray(c), ref2, atol=1e-3, rtol=1e-3)
    col[:] = col2  # restore


def test_spmm_wide_features_fallback():
    rng = np.random.default_rng(14)
    rowptr, col = _random_csr(rng, 32, 200)
    graph = ops.build_spmm_graph(rowptr, col, chunk=256,
                                 with_edge_maps=True)
    x = jnp.asarray(rng.normal(size=(32, 4096)).astype(np.float32))
    out = np.asarray(ops.spmm(x, graph))
    ref = _spmm_ref(np.asarray(x), rowptr, col)
    np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-3)


def test_spmm_wide_features_grad():
    rng = np.random.default_rng(15)
    rowptr, col = _random_csr(rng, 24, 150)
    graph = ops.build_spmm_graph(rowptr, col, chunk=256,
                                 with_edge_maps=True)
    x = jnp.asarray(rng.normal(size=(24, 4096)).astype(np.float32))
    g = jax.grad(lambda a: jnp.sum(ops.spmm(a, graph)**2))(x)
    assert bool(jnp.isfinite(g).all())


@pytest.mark.parametrize('num_splits', [1, 3, 4])
def test_spmm_sharded_matches_reference(num_splits):
    rng = np.random.default_rng(21)
    rowptr, col = _random_csr(rng, 300, 4000)
    x = rng.normal(size=(300, 128)).astype(np.float32)
    graph = ops.build_spmm_graph_sharded(rowptr, col, num_splits,
                                         chunk=256)
    out = np.asarray(ops.spmm_sharded(jnp.asarray(x), graph))
    ref = _spmm_ref(x, rowptr, col)
    np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-3)


def test_spmm_sharded_grad():
    rng = np.random.default_rng(22)
    rowptr, col = _random_csr(rng, 150, 1500)
    x = rng.normal(size=(150, 128)).astype(np.float32)
    graph = ops.build_spmm_graph_sharded(rowptr, col, 3, chunk=256)
    g = np.asarray(jax.grad(
        lambda a: jnp.vdot(ops.spmm_sharded(a, graph),
                           jnp.ones((150, 128))))(jnp.asarray(x)))
    # d/dx sum of A@x = in-degree of each source node (count per col id)
    ref = np.bincount(col, minlength=150).astype(np.float32)
    np.testing.assert_allclose(g[:, 0], ref, atol=1e-3, rtol=1e-3)


def test_spmm_reduce_max_min():
    rng = np.random.default_rng(31)
    rowptr, col = _random_csr(rng, 90, 700)
    x = rng.normal(size=(90, 128)).astype(np.float32)
    graph = ops.build_spmm_graph(rowptr, col, chunk=256,
                                 with_edge_maps=True)
    out = np.asarray(ops.spmm(jnp.asarray(x), graph, reduce='max'))
    ref = np.zeros((90, 128), np.float32)
    for r in range(90):
        lo, hi = rowptr[r], rowptr[r + 1]
        if hi > lo:
            ref[r] = x[col[lo:hi]].max(0)
    np.testing.assert_allclose(out, ref, rtol=1.5e-2, atol=1.5e-2)
    out_min = np.asarray(ops.spmm(jnp.asarray(x), graph, reduce='min'))
    ref_min = np.zeros((90, 128), np.float32)
    for r in range(90):
        lo, hi = rowptr[r], rowptr[r + 1]
        if hi > lo:
            ref_min[r] = x[col[lo:hi]].min(0)
    np.testing.assert_allclose(out_min, ref_min, rtol=1.5e-2, atol=1.5e-2)


def test_spmm_bf16_precision_mode():
    # bf16 message streaming, f32 accumulation: values within bf16 message
    # tolerance of the exact result; gradients flow through the same mode.
    rng = np.random.default_rng(11)
    n, f = 96, 64
    deg = rng.integers(0, 7, size=n)
    rowptr = np.zeros(n + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    col = rng.integers(0, n, size=int(rowptr[-1]))
    g = ops.build_spmm_graph(rowptr, col)
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))

    exact = np.asarray(ops.spmm(x, g))
    fast = np.asarray(ops.spmm(x, g, precision='bf16'))
    assert fast.dtype == np.float32
    scale = np.abs(exact).max()
    assert np.abs(fast - exact).max() < 2e-2 * scale

    ge = jax.grad(lambda x: (ops.spmm(x, g) ** 2).sum())(x)
    gf = jax.grad(
        lambda x: (ops.spmm(x, g, precision='bf16') ** 2).sum())(x)
    assert np.abs(np.asarray(gf) - np.asarray(ge)).max() < 5e-2 * float(
        jnp.abs(ge).max())

    with pytest.raises(ValueError):
        ops.spmm(x, g, precision='fp8')


def test_spmm_wide_features_fallback():
    # F > 2048 exceeds the double-buffered VMEM budget; spmm routes
    # through the XLA sorted scatter (needs edge maps).
    rng = np.random.default_rng(13)
    n, f = 40, 2304
    deg = rng.integers(0, 4, size=n)
    rowptr = np.zeros(n + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    col = rng.integers(0, n, size=int(rowptr[-1]))
    g = ops.build_spmm_graph(rowptr, col, with_edge_maps=True)
    x = rng.normal(size=(n, f)).astype(np.float32)
    out = np.asarray(ops.spmm(jnp.asarray(x), g))
    ref = np.zeros((n, f), np.float32)
    for r in range(n):
        ref[r] = x[col[rowptr[r]:rowptr[r + 1]]].sum(0)
    np.testing.assert_allclose(out, ref, atol=1e-4)

    g2 = ops.build_spmm_graph(rowptr, col)  # no edge maps -> clear error
    with pytest.raises(ValueError, match='with_edge_maps'):
        ops.spmm(jnp.asarray(x), g2)


# ---------------------------------------------- range-partitioned plans ----


@pytest.mark.parametrize('n,e,f,s', [(300, 4000, 64, 4), (257, 9001, 32, 3),
                                     (64, 0, 16, 2)])
@pytest.mark.parametrize('reduce', ['sum', 'mean'])
def test_spmm_range_split_matches_reference(n, e, f, s, reduce):
    rng = np.random.default_rng(7)
    rowptr, col = _random_csr(rng, n, e)
    x = rng.normal(size=(n, f)).astype(np.float32)

    graph = ops.build_spmm_graph(rowptr, col, chunk=128, range_split=s)
    out = ops.spmm(jnp.asarray(x), graph, reduce=reduce)
    ref = _spmm_ref(x, rowptr, col, reduce)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)


def test_spmm_range_split_grad_matches_single_plan():
    rng = np.random.default_rng(8)
    rowptr, col = _random_csr(rng, 200, 3000)
    x = jnp.asarray(rng.normal(size=(200, 32)).astype(np.float32))
    g1 = ops.build_spmm_graph(rowptr, col, chunk=128)
    g4 = ops.build_spmm_graph(rowptr, col, chunk=128, range_split=4)

    def loss(graph):
        return lambda v: (ops.spmm(v, graph) ** 2).sum()

    grad1 = jax.grad(loss(g1))(x)
    grad4 = jax.grad(loss(g4))(x)
    np.testing.assert_allclose(np.asarray(grad4), np.asarray(grad1),
                               atol=1e-3, rtol=1e-3)


def test_spmm_range_split_jit_and_bf16():
    rng = np.random.default_rng(9)
    rowptr, col = _random_csr(rng, 150, 2000)
    x = jnp.asarray(rng.normal(size=(150, 64)).astype(np.float32))
    graph = ops.build_spmm_graph(rowptr, col, chunk=128, range_split=4)

    @jax.jit
    def step(v):
        return ops.spmm(v, graph, precision='bf16')

    out = step(x)
    ref = _spmm_ref(np.asarray(x), rowptr, col, 'sum')
    np.testing.assert_allclose(np.asarray(out), ref, atol=0.15, rtol=0.05)


def test_spmm_range_split_rectangular():
    """Bipartite adjacency: num_cols != num_rows, grads sized by cols."""
    rng = np.random.default_rng(10)
    n_dst, n_src, e = 90, 310, 2500
    deg = rng.multinomial(e, np.ones(n_dst) / n_dst)
    rowptr = np.zeros(n_dst + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    col = rng.integers(0, n_src, size=e).astype(np.int64)
    x = jnp.asarray(rng.normal(size=(n_src, 16)).astype(np.float32))
    graph = ops.build_spmm_graph(rowptr, col, chunk=128, num_cols=n_src,
                                 range_split=3)
    out = ops.spmm(x, graph)
    assert out.shape == (n_dst, 16)
    n = n_dst
    ref = np.zeros((n, 16), np.float32)
    rows = np.repeat(np.arange(n), np.diff(rowptr))
    np.add.at(ref, rows, np.asarray(x)[col])
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)
    grad = jax.grad(lambda v: ops.spmm(v, graph).sum())(x)
    assert grad.shape == (n_src, 16)


def test_spmm_range_split_rejects_minmax_and_edge_maps():
    rng = np.random.default_rng(11)
    rowptr, col = _random_csr(rng, 100, 1000)
    graph = ops.build_spmm_graph(rowptr, col, chunk=128, range_split=2)
    x = jnp.zeros((100, 8))
    with pytest.raises(ValueError, match='single-plan'):
        ops.spmm(x, graph, reduce='max')
    with pytest.raises(ValueError, match='incompatible'):
        ops.build_spmm_graph(rowptr, col, range_split=2,
                             with_edge_maps=True)
    with pytest.raises(ValueError, match='edge_maps'):
        ops.sddmm(x, x, graph)


def test_spmm_int8_exact_on_integer_features():
    """Integer features with maxabs 127 per column quantise losslessly:
    scale = 1, so the int8 path must reproduce the exact sum."""
    rng = np.random.default_rng(12)
    rowptr, col = _random_csr(rng, 200, 3000)
    x = rng.integers(-127, 128, size=(200, 64)).astype(np.float32)
    x[0, :] = 127  # pin every column's maxabs to exactly 127
    graph = ops.build_spmm_graph(rowptr, col, chunk=128)
    out = ops.spmm(jnp.asarray(x), graph, precision='int8')
    ref = _spmm_ref(x, rowptr, col, 'sum')
    np.testing.assert_array_equal(np.asarray(out), ref)


@pytest.mark.parametrize('reduce', ['sum', 'mean'])
def test_spmm_int8_error_bounded_by_column_scale(reduce):
    rng = np.random.default_rng(13)
    rowptr, col = _random_csr(rng, 200, 3000)
    x = rng.normal(size=(200, 32)).astype(np.float32)
    graph = ops.build_spmm_graph(rowptr, col, chunk=128)
    out = np.asarray(ops.spmm(jnp.asarray(x), graph, reduce=reduce,
                              precision='int8'))
    ref = _spmm_ref(x, rowptr, col, reduce)
    # Each message's rounding error is <= scale/2 per column; a row sums
    # at most deg_max of them (mean divides both sides by deg).
    scale = np.abs(x).max(axis=0) / 127.0
    deg_max = np.diff(rowptr).max()
    bound = (scale * (deg_max if reduce == 'sum' else 1.0) / 2.0)[None, :]
    assert np.all(np.abs(out - ref) <= bound + 1e-6)


def test_spmm_int8_grad_and_range_split():
    rng = np.random.default_rng(14)
    rowptr, col = _random_csr(rng, 150, 2000)
    x = jnp.asarray(rng.normal(size=(150, 16)).astype(np.float32))
    g1 = ops.build_spmm_graph(rowptr, col, chunk=128)
    g4 = ops.build_spmm_graph(rowptr, col, chunk=128, range_split=4)

    @jax.jit
    def step(v, graph=g4):
        return ops.spmm(v, graph, precision='int8')

    ref = _spmm_ref(np.asarray(x), rowptr, col, 'sum')
    scale = np.abs(np.asarray(x)).max(axis=0) / 127.0
    bound = scale[None, :] * np.diff(rowptr).max()
    assert np.all(np.abs(np.asarray(step(x)) - ref) <= bound + 1e-6)
    # Backward streams the cotangent through the same quantised mode;
    # with an exactly-quantisable cotangent it matches the f32 gradient.
    gexact = jax.grad(lambda v: ops.spmm(v, g1).sum())(x)
    gq = jax.grad(lambda v: ops.spmm(v, g1, precision='int8').sum())(x)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(gexact),
                               atol=1e-5, rtol=1e-5)


def test_spmm_rejects_unknown_precision():
    rng = np.random.default_rng(15)
    rowptr, col = _random_csr(rng, 50, 400)
    graph = ops.build_spmm_graph(rowptr, col, chunk=128)
    with pytest.raises(ValueError, match='precision'):
        ops.spmm(jnp.zeros((50, 8)), graph, precision='fp8')


def test_auto_chunk_tracks_degree_distribution():
    from pyg_lib_tpu.ops.pallas.spmm_chunked import auto_chunk

    # Mean degree 16 -> ~2048 edges per 128-row tile: 512-chunks waste
    # nothing, so the large candidate wins (the bench-validated choice).
    n = 2048
    rowptr = np.arange(n + 1, dtype=np.int64) * 16
    assert auto_chunk(rowptr) == 512
    # Mean degree 1 -> ~128 edges per tile: a 512-chunk pads 4x, the
    # smallest candidate must win.
    rowptr = np.arange(n + 1, dtype=np.int64)
    assert auto_chunk(rowptr) == 128


@pytest.mark.parametrize('split', [1, 4])
def test_spmm_auto_chunk_end_to_end(split):
    rng = np.random.default_rng(16)
    rowptr, col = _random_csr(rng, 300, 900)  # sparse: auto picks small
    x = rng.normal(size=(300, 32)).astype(np.float32)
    graph = ops.build_spmm_graph(rowptr, col, chunk='auto',
                                 range_split=split)
    out = ops.spmm(jnp.asarray(x), graph)
    ref = _spmm_ref(x, rowptr, col, 'sum')
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize('precision', ['bf16', 'int8'])
def test_spmm_sharded_precision_modes(precision):
    rng = np.random.default_rng(17)
    rowptr, col = _random_csr(rng, 300, 4000)
    x = rng.integers(-127, 128, size=(300, 32)).astype(np.float32)
    x[0, :] = 127  # int8 quantises losslessly (scale == 1)
    graph = ops.build_spmm_graph_sharded(rowptr, col, 3, chunk=128)
    out = np.asarray(
        ops.spmm_sharded(jnp.asarray(x), graph, precision=precision))
    ref = _spmm_ref(x, rowptr, col, 'sum')
    if precision == 'int8':
        np.testing.assert_array_equal(out, ref)
    else:
        # bf16 messages: |x| <= 127 rounds within 0.5, rows sum few terms.
        np.testing.assert_allclose(out, ref, atol=32.0, rtol=0.01)
    grad = jax.grad(lambda a: ops.spmm_sharded(
        a, graph, precision=precision).sum())(jnp.asarray(x))
    assert grad.shape == x.shape


@pytest.mark.parametrize('s', [2, 4])
@pytest.mark.parametrize('reduce', ['sum', 'mean'])
def test_spmm_range_fused_matches_reference(s, reduce):
    rng = np.random.default_rng(18)
    rowptr, col = _random_csr(rng, 300, 4000)
    x = rng.normal(size=(300, 32)).astype(np.float32)
    graph = ops.build_spmm_graph(rowptr, col, chunk=128, range_split=s,
                                 range_fused=True)
    out = ops.spmm(jnp.asarray(x), graph, reduce=reduce)
    ref = _spmm_ref(x, rowptr, col, reduce)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-3, rtol=1e-3)
    grad = jax.grad(lambda v: ops.spmm(v, graph, reduce=reduce).sum())(
        jnp.asarray(x))
    gref = jax.grad(lambda v: ops.spmm(
        v, ops.build_spmm_graph(rowptr, col, chunk=128),
        reduce=reduce).sum())(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(grad), np.asarray(gref),
                               atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize('precision', [None, 'bf16', 'int8'])
def test_fused_range_kernel_interpret(precision):
    """The Mosaic kernel itself (interpret mode) vs the numpy oracle."""
    from pyg_lib_tpu.ops.pallas.spmm_range_fused import (
        build_fused_range_plan, fused_range_apply)

    rng = np.random.default_rng(19)
    rowptr, col = _random_csr(rng, 260, 3000)
    x = rng.integers(-127, 128, size=(260, 128)).astype(np.float32)
    x[0, :] = 127  # every precision mode transports these exactly
    plan = build_fused_range_plan(rowptr, col, 260, 3, chunk=128)
    out = fused_range_apply(jnp.asarray(x), plan, precision=precision,
                            interpret=True)
    ref = _spmm_ref(x, rowptr, col, 'sum')
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_fused_range_kernel_interpret_skewed_tiles():
    """Tiles where ranges have very different chunk counts exercise the
    inactive-step masking (sentinel position base + block revisits)."""
    from pyg_lib_tpu.ops.pallas.spmm_range_fused import (
        build_fused_range_plan, fused_range_apply)

    rng = np.random.default_rng(20)
    n = 300
    # All edges point into the first third of the node space: range 0
    # is dense, ranges 1-2 are empty in every tile.
    deg = rng.multinomial(2500, np.ones(n) / n)
    rowptr = np.zeros(n + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    col = rng.integers(0, n // 3, size=2500).astype(np.int64)
    x = rng.normal(size=(n, 32)).astype(np.float32)
    plan = build_fused_range_plan(rowptr, col, n, 3, chunk=128)
    out = fused_range_apply(jnp.asarray(x), plan, interpret=True)
    ref = _spmm_ref(x, rowptr, col, 'sum')
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-3, rtol=1e-3)


def test_fused_range_compact_layout_and_empty_graph():
    """Compact per-range layouts: empty (tile, range) pairs get zero
    chunks; edgeless ranges are dropped; an edgeless graph still works."""
    from pyg_lib_tpu.ops.pallas.spmm_range_fused import (
        build_fused_range_plan, fused_range_apply)

    rng = np.random.default_rng(21)
    n = 300
    # Rows 0..149 draw only from range 0, rows 150..299 only from the
    # top of the node space: each range is empty in half the tiles.
    deg = rng.multinomial(2000, np.ones(n) / n)
    rowptr = np.zeros(n + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    col = np.where(
        np.repeat(np.arange(n), deg) < 150,
        rng.integers(0, 100, size=2000),
        rng.integers(200, 300, size=2000)).astype(np.int64)
    x = rng.normal(size=(n, 32)).astype(np.float32)
    plan = build_fused_range_plan(rowptr, col, n, 3, chunk=128)
    assert len(plan.plans) == 2  # middle range has no edges -> dropped
    # Compact: a range absent from a tile contributes ZERO chunks there
    # (range 0 feeds only rows < 150 -> no tile-2 chunks; the top range
    # feeds only rows >= 150 -> no tile-0 chunks).
    assert 2 not in np.asarray(plan.plans[0].chunk_tile)
    assert 0 not in np.asarray(plan.plans[1].chunk_tile)
    out = fused_range_apply(jnp.asarray(x), plan, interpret=True)
    ref = _spmm_ref(x, rowptr, col, 'sum')
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-3, rtol=1e-3)

    # Edgeless graph
    plan0 = build_fused_range_plan(np.zeros(n + 1, np.int64),
                                   np.zeros(0, np.int64), n, 4, chunk=128)
    out0 = fused_range_apply(jnp.asarray(x), plan0, interpret=True)
    np.testing.assert_array_equal(np.asarray(out0), np.zeros((n, 32)))


def test_fused_range_vmem_guard():
    from pyg_lib_tpu.ops.pallas.spmm_range_fused import (
        build_fused_range_plan, fused_range_apply)

    rng = np.random.default_rng(22)
    rowptr, col = _random_csr(rng, 128, 1000)
    plan = build_fused_range_plan(rowptr, col, 128, 2, chunk=512)
    x = jnp.zeros((128, 4096), jnp.float32)
    with pytest.raises(ValueError, match='VMEM'):
        fused_range_apply(x, plan, interpret=True)


def test_fused_range_fuzz_interpret():
    """Random (density, skew, S, chunk) sweeps through the fused kernel
    in interpret mode vs the numpy oracle — exercises block-carry,
    masking and per-tile K() across irregular shapes."""
    from pyg_lib_tpu.ops.pallas.spmm_range_fused import (
        build_fused_range_plan, fused_range_apply)

    rng = np.random.default_rng(23)
    for case in range(8):
        n = int(rng.integers(40, 520))
        e = int(rng.integers(0, 6 * n))
        s = int(rng.integers(2, 6))
        chunk = int(rng.choice([128, 256]))
        # Skewed rows AND skewed columns half the time.
        if case % 2:
            p = rng.pareto(1.5, size=n) + 1e-3
            deg = rng.multinomial(e, p / p.sum())
            cols_pool = rng.integers(0, max(n // 4, 1), size=max(e, 1))
        else:
            deg = rng.multinomial(e, np.ones(n) / n)
            cols_pool = rng.integers(0, n, size=max(e, 1))
        rowptr = np.zeros(n + 1, np.int64)
        rowptr[1:] = np.cumsum(deg)
        col = cols_pool[:e].astype(np.int64)
        x = rng.normal(size=(n, 32)).astype(np.float32)

        plan = build_fused_range_plan(rowptr, col, n, s, chunk=chunk)
        out = fused_range_apply(jnp.asarray(x), plan, interpret=True)
        ref = _spmm_ref(x, rowptr, col, 'sum')
        np.testing.assert_allclose(
            np.asarray(out), ref, atol=2e-3, rtol=2e-3,
            err_msg=f'case {case}: n={n} e={e} s={s} chunk={chunk}')


@pytest.mark.parametrize('precision', [None, 'int8'])
def test_spmm_sharded_range_split(precision):
    """Row splits x column ranges: plans compose; int8 quantises once."""
    rng = np.random.default_rng(24)
    rowptr, col = _random_csr(rng, 300, 4000)
    x = rng.integers(-127, 128, size=(300, 32)).astype(np.float32)
    x[0, :] = 127
    graph = ops.build_spmm_graph_sharded(rowptr, col, 3, chunk=128,
                                         range_split=4)
    # All (split, range) sub-plans share one padded chunk count.
    chunks = {
        p.chunk_tile.shape[0]
        for rp in graph.fwd for p in rp.plans
    }
    assert len(chunks) == 1
    out = np.asarray(
        ops.spmm_sharded(jnp.asarray(x), graph, precision=precision))
    ref = _spmm_ref(x, rowptr, col, 'sum')
    np.testing.assert_array_equal(out, ref)
    g = jax.grad(lambda a: ops.spmm_sharded(
        a, graph, precision=precision).sum())(jnp.asarray(x))
    assert g.shape == x.shape and bool(jnp.isfinite(g).all())


def test_weighted_fused_graph_matches_oracle_and_grad():
    """Explicit bounds + per-edge weights: out[r] = sum w_e x[col_e];
    grad carries the same weights through the transpose plan."""
    rng = np.random.default_rng(25)
    rowptr, col = _random_csr(rng, 200, 2500)
    w = rng.uniform(0.1, 2.0, size=2500).astype(np.float32)
    bounds = [(0, 64), (64, 150), (150, 200)]
    graph = ops.build_weighted_fused_graph(rowptr, col, 200, bounds, w,
                                           chunk=128)
    x = jnp.asarray(rng.normal(size=(200, 32)).astype(np.float32))

    out = np.asarray(ops.spmm(x, graph))
    ref = np.zeros((200, 32), np.float32)
    rows = np.repeat(np.arange(200), np.diff(rowptr))
    np.add.at(ref, rows, np.asarray(x)[col] * w[:, None])
    np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-3)

    gv = rng.normal(size=(200, 32)).astype(np.float32)
    grad = np.asarray(
        jax.grad(lambda v: jnp.vdot(ops.spmm(v, graph),
                                    jnp.asarray(gv)))(x))
    gref = np.zeros((200, 32), np.float32)
    np.add.at(gref, col, gv[rows] * w[:, None])
    np.testing.assert_allclose(grad, gref, atol=1e-3, rtol=1e-3)

    # int8 is rejected on weighted plans; bad bounds are rejected.
    with pytest.raises(ValueError, match='int8'):
        ops.spmm(x, graph, precision='int8')
    from pyg_lib_tpu.ops.pallas.spmm_range_fused import (
        build_fused_range_plan, )
    with pytest.raises(ValueError, match='cover'):
        build_fused_range_plan(rowptr, col, 200, 1, chunk=128,
                               bounds=[(0, 100)])
    with pytest.raises(ValueError, match='disjoint'):
        build_fused_range_plan(rowptr, col, 200, 1, chunk=128,
                               bounds=[(0, 120), (100, 200)])


def test_weighted_fused_interpret_kernel():
    from pyg_lib_tpu.ops.pallas.spmm_range_fused import (
        build_fused_range_plan, fused_range_apply)

    rng = np.random.default_rng(26)
    rowptr, col = _random_csr(rng, 260, 3000)
    w = rng.uniform(0.0, 1.0, size=3000).astype(np.float32)
    plan = build_fused_range_plan(rowptr, col, 260, 3, chunk=128,
                                  edge_weight=w)
    x = rng.normal(size=(260, 64)).astype(np.float32)
    out = fused_range_apply(jnp.asarray(x), plan, interpret=True)
    ref = np.zeros((260, 64), np.float32)
    rows = np.repeat(np.arange(260), np.diff(rowptr))
    np.add.at(ref, rows, x[col] * w[:, None])
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-3, rtol=1e-3)


def test_fused_range_bounds_gap_rejected():
    from pyg_lib_tpu.ops.pallas.spmm_range_fused import (
        build_fused_range_plan, )

    rng = np.random.default_rng(27)
    rowptr, col = _random_csr(rng, 100, 800)
    with pytest.raises(ValueError, match='uncovered'):
        build_fused_range_plan(rowptr, col, 100, 1, chunk=128,
                               bounds=[(0, 30), (70, 100)])


def test_sharded_auto_chunk():
    rng = np.random.default_rng(28)
    rowptr, col = _random_csr(rng, 300, 1200)
    x = rng.normal(size=(300, 16)).astype(np.float32)
    for rs in (1, 3):
        graph = ops.build_spmm_graph_sharded(rowptr, col, 2, chunk='auto',
                                             range_split=rs)
        out = np.asarray(ops.spmm_sharded(jnp.asarray(x), graph))
        np.testing.assert_allclose(out, _spmm_ref(x, rowptr, col),
                                   atol=1e-3, rtol=1e-3)


def test_weighted_fused_graph_bounds_t_grad():
    """bounds_t range-partitions the TRANSPOSE gathers; gradients must be
    identical to the unpartitioned transpose plan."""
    rng = np.random.default_rng(29)
    rowptr, col = _random_csr(rng, 200, 2500)
    w = rng.uniform(0.1, 2.0, size=2500).astype(np.float32)
    bounds = [(0, 64), (64, 150), (150, 200)]
    bounds_t = [(0, 100), (100, 200)]
    g_plain = ops.build_weighted_fused_graph(rowptr, col, 200, bounds, w,
                                             chunk=128)
    g_split = ops.build_weighted_fused_graph(rowptr, col, 200, bounds, w,
                                             chunk=128, bounds_t=bounds_t)
    x = jnp.asarray(rng.normal(size=(200, 32)).astype(np.float32))
    gv = jnp.asarray(rng.normal(size=(200, 32)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(ops.spmm(x, g_split)),
                               np.asarray(ops.spmm(x, g_plain)),
                               atol=1e-4, rtol=1e-4)
    grad_p = jax.grad(lambda v: jnp.vdot(ops.spmm(v, g_plain), gv))(x)
    grad_s = jax.grad(lambda v: jnp.vdot(ops.spmm(v, g_split), gv))(x)
    np.testing.assert_allclose(np.asarray(grad_s), np.asarray(grad_p),
                               atol=1e-4, rtol=1e-4)


def test_quantize_columns_stochastic_rounding_unbiased():
    """With a key, quantisation is stochastic: floor(y + U) — unbiased
    (E[xq * scale] == x), unlike round-to-nearest's systematic bias."""
    from pyg_lib_tpu.ops.pallas.spmm_chunked import quantize_columns

    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
    # deterministic mode unchanged
    xq0, s0 = quantize_columns(x)
    np.testing.assert_allclose(np.asarray(xq0) * np.asarray(s0)[None, :],
                               np.asarray(x), atol=np.asarray(s0).max())
    # stochastic mode: mean over many keys converges to x
    acc = np.zeros(x.shape, np.float64)
    n_keys = 400
    for i in range(n_keys):
        xq, s = quantize_columns(x, key=jax.random.key(i))
        acc += np.asarray(xq, np.float64) * np.asarray(s)[None, :]
    mean = acc / n_keys
    resid = np.abs(mean - np.asarray(x))
    # SR noise is +-scale/2 per draw; the mean must shrink ~1/sqrt(n)
    tol = 4.0 * np.asarray(s0)[None, :] / np.sqrt(n_keys)
    assert (resid < np.maximum(tol, 1e-4)).mean() > 0.99
    # int8 range respected even at the clip boundary
    assert int(jnp.max(jnp.abs(xq.astype(jnp.int32)))) <= 127
