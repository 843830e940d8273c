"""GIN / EdgeConv / PointNet++ SA / node2vec model compositions.

Each test proves (a) jittable static-shape forward, (b) finite grads,
(c) a few SGD steps reduce the loss — the op surface composes into the
model family end to end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyg_lib_tpu import models, ops, sampler


def _csr(rng, n, e):
    row = np.sort(rng.integers(0, n, e))
    col = rng.integers(0, n, e)
    rowptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(row, minlength=n), out=rowptr[1:])
    return rowptr, row, col


def _steps(loss_fn, params, n_steps=12, lr=0.05):
    @jax.jit
    def step(p):
        l, g = jax.value_and_grad(loss_fn)(p)
        return l, jax.tree.map(lambda a, b: a - lr * b, p, g)

    first = None
    for _ in range(n_steps):
        l, params = step(params)
        if first is None:
            first = float(l)
    return first, float(l)


def test_gin_forward_and_training_step():
    rng = np.random.default_rng(0)
    n, e = 120, 900
    rowptr, row, col = _csr(rng, n, e)
    x = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 3, n))
    params = models.init_gin(jax.random.key(0), [16, 32, 3])

    fwd = jax.jit(lambda p, xx: models.gin_forward(
        p, xx, jnp.asarray(rowptr), jnp.asarray(col)))
    out = fwd(params, x)
    assert out.shape == (n, 3)
    assert bool(jnp.isfinite(out).all())

    def loss(p):
        logits = models.gin_forward(p, x, jnp.asarray(rowptr),
                                    jnp.asarray(col))
        return -jnp.mean(
            jax.nn.log_softmax(logits)[jnp.arange(n), y])

    first, last = _steps(loss, params)
    assert last < first


def test_gin_eps_matters():
    # eps shifts the self-contribution: output must change with eps.
    rng = np.random.default_rng(1)
    rowptr, row, col = _csr(rng, 40, 200)
    x = jnp.asarray(rng.normal(size=(40, 8)).astype(np.float32))
    p = models.init_gin(jax.random.key(1), [8, 8])
    out0 = models.gin_forward(p, x, jnp.asarray(rowptr), jnp.asarray(col))
    p2 = jax.tree.map(lambda a: a, p)
    p2['layers'][0]['eps'] = jnp.asarray(1.0)
    out1 = models.gin_forward(p2, x, jnp.asarray(rowptr), jnp.asarray(col))
    assert float(jnp.max(jnp.abs(out1 - out0))) > 1e-3


def test_edgeconv_knn_pipeline():
    rng = np.random.default_rng(2)
    n, k = 64, 8
    pts = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    idx = ops.knn(pts, pts, k=k)
    assert idx.shape == (2, n * k)
    params = models.init_edgeconv(jax.random.key(2), [3, 16, 32])
    fwd = jax.jit(lambda p, xx: models.edgeconv_forward(p, xx, idx, k))
    out = fwd(params, pts)
    assert out.shape == (n, 32)
    g = jax.grad(lambda p: models.edgeconv_forward(
        p, pts, idx, k).sum())(params)
    assert all(
        bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(g))


def test_pointnet_sa_level():
    rng = np.random.default_rng(3)
    n = 128
    pos_np = rng.normal(size=(n, 3)).astype(np.float32)
    pos = jnp.asarray(pos_np)
    ptr = np.array([0, n], np.int64)
    cidx = ops.fps(pos, jnp.asarray(ptr), ratio=0.25, random_start=False)
    m = int(cidx.shape[0])
    pairs = ops.radius(pos, jnp.take(pos, cidx, axis=0), r=1.5,
                       max_num_neighbors=16)
    q, ref = np.asarray(pairs)
    # CSR over centroids (queries), pads dropped
    order = np.argsort(q, kind='stable')
    q, ref = q[order], ref[order]
    keep = q >= 0
    q, ref = q[keep], ref[keep]
    rowptr = np.zeros(m + 1, np.int64)
    np.cumsum(np.bincount(q, minlength=m), out=rowptr[1:])
    params = models.init_pointnet_sa(jax.random.key(3), 0, [16, 32])
    new_pos, new_feat = models.pointnet_sa_forward(
        params, pos, None, cidx, jnp.asarray(rowptr), jnp.asarray(ref))
    assert new_pos.shape == (m, 3)
    assert new_feat.shape == (m, 32)
    assert bool(jnp.isfinite(new_feat).all())
    # empty groups (if any) produce the segment_max empty value, not NaN
    g = jax.grad(lambda p: models.pointnet_sa_forward(
        p, pos, None, cidx, jnp.asarray(rowptr),
        jnp.asarray(ref))[1].sum())(params)
    assert all(
        bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(g))


def test_node2vec_walk_training():
    # ring graph: adjacent nodes should embed closer than distant ones
    from pyg_lib_tpu.testing import cycle_graph

    n = 60
    rowptr, col = cycle_graph(n)
    rng = np.random.default_rng(4)
    params = models.init_node2vec(jax.random.key(4), n, 16)

    def batch(i):
        seeds = rng.integers(0, n, 64)
        walks = sampler.random_walk(rowptr, col, seeds, walk_length=6,
                                    rng=int(i))
        neg = rng.integers(0, n, (64, 5))
        return jnp.asarray(np.asarray(walks)), jnp.asarray(neg)

    @jax.jit
    def step(p, walks, neg):
        l, g = jax.value_and_grad(models.node2vec_loss)(p, walks, neg)
        return l, jax.tree.map(lambda a, b: a - 0.3 * b, p, g)

    first = None
    for i in range(200):
        walks, neg = batch(i)
        l, params = step(params, walks, neg)
        if first is None:
            first = float(l)
    assert float(l) < first
    emb = np.asarray(params['emb'])
    emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    near = np.mean(np.sum(emb * np.roll(emb, 1, axis=0), axis=1))
    far = np.mean(np.sum(emb * np.roll(emb, n // 2, axis=0), axis=1))
    assert near > far
