"""Async NeighborLoader: shapes static, coverage, reproducibility."""

import numpy as np

from pyg_lib_tpu.loader import NeighborLoader


def _graph(n=200, e=1500, seed=0):
    rng = np.random.default_rng(seed)
    deg = rng.multinomial(e, np.ones(n) / n)
    rowptr = np.zeros(n + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    col = rng.integers(0, n, size=e).astype(np.int64)
    return rowptr, col


def test_loader_shapes_and_masks():
    rowptr, col = _graph()
    n = 200
    x = np.random.default_rng(1).normal(size=(n, 16)).astype(np.float32)
    y = np.arange(n, dtype=np.int32)
    loader = NeighborLoader(rowptr, col, x, y, seeds=np.arange(64),
                            batch_size=16, num_neighbors=[3, 2],
                            num_workers=2, rng=5)
    batches = list(loader)
    assert len(batches) == 4
    shapes = {k: np.asarray(v).shape for k, v in batches[0].items()}
    for b in batches[1:]:
        assert {k: np.asarray(v).shape for k, v in b.items()} == shapes
    for b in batches:
        mask = np.asarray(b['node_mask'])
        # the seed rows are real nodes and labels line up with features
        assert mask[:16].all()
        ids = np.asarray(b['y'])[:16]
        assert (ids >= 0).all() and (ids < n).all()


def test_loader_epoch_reproducible():
    rowptr, col = _graph(seed=2)
    x = np.zeros((200, 4), np.float32)
    mk = lambda: NeighborLoader(rowptr, col, x, None, seeds=np.arange(48),
                                batch_size=16, num_neighbors=[2],
                                num_workers=3, rng=9)
    a = [np.asarray(b['row']) for b in mk()]
    b = [np.asarray(b['row']) for b in mk()]
    for u, v in zip(a, b):
        np.testing.assert_array_equal(u, v)


def test_loader_feeds_jitted_step():
    import jax
    import jax.numpy as jnp
    from pyg_lib_tpu import ops

    rowptr, col = _graph(seed=3)
    x = np.random.default_rng(0).normal(size=(200, 8)).astype(np.float32)
    loader = NeighborLoader(rowptr, col, x, None, seeds=np.arange(32),
                            batch_size=8, num_neighbors=[3, 3], rng=1)

    traces = 0

    @jax.jit
    def step(x, rowptr, row):
        nonlocal_marker()
        msgs = jnp.take(x, row, axis=0)
        return ops.segment_sum_csr(msgs, rowptr).sum()

    def nonlocal_marker():
        nonlocal traces
        traces += 1

    vals = [float(step(b['x'], b['rowptr'], b['row'])) for b in loader]
    assert len(vals) == 4 and all(np.isfinite(v) for v in vals)
    assert traces == 1  # static shapes -> single trace
