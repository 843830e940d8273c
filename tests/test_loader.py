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


def test_hetero_loader_shapes_and_step():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pyg_lib_tpu import ops
    from pyg_lib_tpu.loader import HeteroNeighborLoader

    rng = np.random.default_rng(0)

    def csr(ns, nd, d):
        deg = rng.integers(0, 2 * d, size=ns)
        rp = np.zeros(ns + 1, np.int64)
        rp[1:] = np.cumsum(deg)
        return rp, rng.integers(0, nd, size=int(rp[-1])).astype(np.int64)

    rowptr_d, col_d = {}, {}
    for k, (ns, nd, d) in {
            ('paper', 'cites', 'paper'): (100, 100, 3),
            ('paper', 'has', 'author'): (100, 50, 2),
            ('author', 'writes', 'paper'): (50, 100, 2),
    }.items():
        rowptr_d[k], col_d[k] = csr(ns, nd, d)

    x_dict = {'paper': rng.normal(size=(100, 8)).astype(np.float32),
              'author': rng.normal(size=(50, 8)).astype(np.float32)}
    y_dict = {'paper': rng.integers(0, 3, size=100).astype(np.int32)}

    loader = HeteroNeighborLoader(
        rowptr_d, col_d, x_dict, y_dict, seed_type='paper',
        seeds=np.arange(32), batch_size=8,
        num_neighbors_dict={k: [2, 2] for k in rowptr_d},
        node_budgets={'paper': 128, 'author': 64}, max_edges=256,
        num_workers=2, rng=3)

    batches = list(loader)
    assert len(batches) == 4
    shapes = {k: np.asarray(v).shape for k, v in batches[0].items()}
    for b in batches[1:]:
        assert {k: np.asarray(v).shape for k, v in b.items()} == shapes

    weights = jnp.asarray(rng.normal(size=(3, 8, 4)).astype(np.float32))

    @jax.jit
    def step(b):
        h = ops.segment_matmul(
            jnp.take(b['x'], jnp.minimum(b['row'], b['x'].shape[0] - 1),
                     axis=0) * b['edge_mask'][:, None],
            b['rel_ptr'], weights)
        return h.sum()

    vals = [float(step(b)) for b in batches]
    assert all(np.isfinite(v) for v in vals)


def test_loader_disjoint_and_weighted():
    import numpy as np
    rowptr, col = _graph(seed=7)
    n = 200
    x = np.zeros((n, 4), np.float32)
    ew = np.random.default_rng(0).uniform(0.1, 1.0, size=int(rowptr[-1]))

    loader = NeighborLoader(rowptr, col, x, None, seeds=np.arange(32),
                            batch_size=8, num_neighbors=[3, 2],
                            rng=2, disjoint=True, edge_weight=ew)
    batches = list(loader)
    assert len(batches) == 4
    for b in batches:
        bb = np.asarray(b['batch'])
        mask = np.asarray(b['node_mask'])
        # seeds own batches 0..7 in order; every real node has a valid batch
        assert bb[:8].tolist() == list(range(8))
        assert (bb[mask] >= 0).all() and (bb[mask] < 8).all()
        assert b['x'].ndim == 2  # features indexed by plain node ids


def test_hetero_loader_disjoint_batch_vector():
    import numpy as np
    from pyg_lib_tpu.loader import HeteroNeighborLoader

    rng = np.random.default_rng(4)

    def csr(ns, nd, d):
        deg = rng.integers(0, 2 * d, size=ns)
        rp = np.zeros(ns + 1, np.int64)
        rp[1:] = np.cumsum(deg)
        return rp, rng.integers(0, nd, size=int(rp[-1])).astype(np.int64)

    rowptr_d, col_d = {}, {}
    rowptr_d[('a', 'r', 'a')], col_d[('a', 'r', 'a')] = csr(60, 60, 3)
    x_dict = {'a': rng.normal(size=(60, 4)).astype(np.float32)}
    loader = HeteroNeighborLoader(
        rowptr_d, col_d, x_dict, None, seed_type='a', seeds=np.arange(16),
        batch_size=8, num_neighbors_dict={('a', 'r', 'a'): [2]},
        node_budgets={'a': 64}, max_edges=64, rng=1, disjoint=True)
    for b in loader:
        bb = np.asarray(b['batch'])
        assert bb.shape == (64, )
        assert bb[:8].tolist() == list(range(8))


def test_dist_neighbor_loader_pipeline():
    """DistNeighborLoader: same padded-batch contract as NeighborLoader,
    batches reproducible across iterations, shapes static."""
    from pyg_lib_tpu.loader import DistNeighborLoader
    from pyg_lib_tpu.sampler.dist_service import partition_graph

    rng = np.random.default_rng(0)
    n, f = 300, 8
    deg = rng.integers(1, 5, size=n)
    rowptr = np.zeros(n + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    col = rng.integers(0, n, size=int(rowptr[-1]))
    x = rng.normal(size=(n, f)).astype(np.float32)
    y = rng.integers(0, 4, size=n)
    g = partition_graph(rowptr, col, 4)

    loader = DistNeighborLoader(g, x, y, np.arange(n), batch_size=32,
                                num_neighbors=[3, 2], rng=5,
                                num_workers=2)
    shapes = None
    seen = 0
    for batch in loader:
        bs = {k: np.asarray(v).shape for k, v in batch.items()}
        if shapes is None:
            shapes = bs
        assert bs == shapes  # static shapes across batches
        assert np.asarray(batch['node_mask']).sum() >= 32
        seen += 1
    assert seen == len(loader)

    # Reproducibility: a fresh loader with the same rng yields the same
    # first batch (epoch counters start equal).
    l2 = DistNeighborLoader(g, x, y, np.arange(n), batch_size=32,
                            num_neighbors=[3, 2], rng=5, num_workers=2)
    b1 = next(iter(DistNeighborLoader(g, x, y, np.arange(n), batch_size=32,
                                      num_neighbors=[3, 2], rng=5)))
    b2 = next(iter(l2))
    np.testing.assert_array_equal(np.asarray(b1['row']),
                                  np.asarray(b2['row']))
    np.testing.assert_array_equal(np.asarray(b1['x']),
                                  np.asarray(b2['x']))


def test_loader_state_dict_resume():
    """A resumed loader replays the epochs the original would have run."""
    rowptr, col = _graph()
    x = np.zeros((200, 4), np.float32)

    def make():
        return NeighborLoader(rowptr, col, x, None, seeds=np.arange(48),
                              batch_size=16, num_neighbors=[2],
                              num_workers=1, rng=9)

    a = make()
    list(a)  # epoch 0
    state = a.state_dict()
    want = [np.asarray(b['rowptr']) for b in a]  # epoch 1

    b = make()
    b.load_state_dict(state)
    got = [np.asarray(bb['rowptr']) for bb in b]
    for w, g in zip(want, got):
        np.testing.assert_array_equal(g, w)

    import pytest
    c = NeighborLoader(rowptr, col, x, None, seeds=np.arange(48),
                       batch_size=16, num_neighbors=[2], rng=10)
    with pytest.raises(ValueError, match='rng'):
        c.load_state_dict(state)


def test_checkpoint_saves_loader_state(tmp_path):
    from pyg_lib_tpu.checkpoint import restore_checkpoint, save_checkpoint

    rowptr, col = _graph()
    x = np.zeros((200, 4), np.float32)
    loader = NeighborLoader(rowptr, col, x, None, seeds=np.arange(32),
                            batch_size=16, num_neighbors=[2], rng=3)
    list(loader)
    list(loader)
    import jax.numpy as jnp
    params = {'w': jnp.ones((2, 2))}
    save_checkpoint(str(tmp_path / 'c'), params, step=2, loader=loader)

    fresh = NeighborLoader(rowptr, col, x, None, seeds=np.arange(32),
                           batch_size=16, num_neighbors=[2], rng=3)
    _, meta = restore_checkpoint(str(tmp_path / 'c'), params, loader=fresh)
    assert meta['step'] == 2
    assert fresh.state_dict() == loader.state_dict()


def test_loader_mid_epoch_state_replays_epoch():
    """A checkpoint taken mid-epoch resumes by REPLAYING the in-progress
    epoch (none of its tail is silently dropped)."""
    rowptr, col = _graph()
    x = np.zeros((200, 4), np.float32)

    def make():
        return NeighborLoader(rowptr, col, x, None, seeds=np.arange(48),
                              batch_size=16, num_neighbors=[2],
                              num_workers=1, rng=9)

    a = make()
    list(a)  # epoch 0 fully consumed
    it = iter(a)  # epoch 1 in progress...
    first = np.asarray(next(it)['rowptr'])
    state = a.state_dict()
    assert state['epoch'] == 1  # NOT 2: epoch 1 was never finished

    b = make()
    b.load_state_dict(state)
    replayed = [np.asarray(bb['rowptr']) for bb in b]
    np.testing.assert_array_equal(replayed[0], first)
    # and a boundary checkpoint still resumes at the NEXT epoch
    list(it)
    assert a.state_dict()['epoch'] == 2


def test_bucket_ladder_overflow_recovery():
    """A skew graph overflows the base bucket; the loader re-buckets to
    the next rung with ZERO dropped edges (VERDICT r2 #6 contract)."""
    # Hub graph: one node with degree 150, everyone else degree ~2.
    n = 200
    deg = np.full(n, 2, np.int64)
    deg[7] = 150
    rowptr = np.zeros(n + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    rng = np.random.default_rng(0)
    col = rng.integers(0, n, size=int(rowptr[-1])).astype(np.int64)
    x = rng.normal(size=(n, 4)).astype(np.float32)

    # Full-fanout loader: batches containing hub 7 pull ~150 extra
    # edges and overflow the base bucket; the rest fit it.
    loader = NeighborLoader(rowptr, col, x, None, seeds=np.arange(64),
                            batch_size=8, num_neighbors=[-1],
                            buckets=[(48, 64), (256, 384)],
                            num_workers=1, rng=3)
    total_real_edges = 0
    shapes = set()
    for b in loader:
        mask = np.asarray(b['node_mask'])
        shapes.add(len(mask))
        total_real_edges += int(
            (np.asarray(b['col']) < len(mask)).sum())
    assert len(shapes) >= 2, 'expected at least one overflow re-bucket'
    assert sum(loader.bucket_counts) == len(loader)
    assert loader.bucket_counts[0] > 0  # most batches in the base bucket

    # Zero dropped edges: replay the exact sample streams unpadded.
    from pyg_lib_tpu import sampler
    order = np.random.default_rng(3 + 7919 * 0).permutation(64)
    expect = 0
    for i in range(len(loader)):
        ids = np.arange(64)[order[i * 8:(i + 1) * 8]]
        out = sampler.neighbor_sample(rowptr, col, ids, [-1],
                                      rng=3 + 0 * len(loader) + i)
        expect += len(out[0])
    assert total_real_edges == expect


def test_probe_sizes_base_bucket_under_worst_case():
    """Probing sizes the base bucket well below the worst case and a
    realistic run stays within <=2 compiled shapes."""
    rowptr, col = _graph(400, 2400, seed=1)
    x = np.zeros((400, 4), np.float32)
    loader = NeighborLoader(rowptr, col, x, None, seeds=np.arange(128),
                            batch_size=16, num_neighbors=[5, 5],
                            num_workers=1, rng=1)
    from pyg_lib_tpu.sampler.padding import budget_for
    worst = budget_for(16, [5, 5], slack=1.0)
    assert loader.buckets[0][0] < worst[0]  # measured < worst case
    assert loader.buckets[-1] == worst  # lossless final rung
    shapes = set()
    for b in loader:
        shapes.add(len(np.asarray(b['node_mask'])))
    assert len(shapes) <= 2
    assert loader.bucket_counts[0] >= len(loader) - 1
