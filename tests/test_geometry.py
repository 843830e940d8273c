"""Geometry / clustering ops vs pure-numpy golden references.

Mirrors the reference's geometry test intent (reference
``test/ops/test_{fps,knn,radius,nearest,grid,graclus,edge_sampler}.py``
families) with independently written numpy checks.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pyg_lib_tpu import ops


def test_fps_line_points():
    # 10 points on a line; deterministic start at 0.
    pts = jnp.asarray(np.arange(10, dtype=np.float32)[:, None])
    idx = np.asarray(ops.fps(pts, None, ratio=0.3, random_start=False))
    assert len(idx) == 3
    assert idx[0] == 0
    assert idx[1] == 9  # farthest from 0
    assert idx[2] in (4, 5)  # farthest from {0, 9}


def test_fps_batched_ranges():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(30, 3)).astype(np.float32))
    ptr = jnp.asarray(np.array([0, 10, 30]))
    idx = np.asarray(ops.fps(pts, ptr, ratio=0.5, random_start=False))
    assert len(idx) == 5 + 10
    assert (idx[:5] < 10).all() and (idx[5:] >= 10).all()
    assert len(set(idx.tolist())) == len(idx)


def test_knn_matches_numpy():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(50, 4)).astype(np.float32)
    y = rng.normal(size=(20, 4)).astype(np.float32)
    out = np.asarray(ops.knn(jnp.asarray(x), jnp.asarray(y), k=3))
    assert out.shape == (2, 60)
    d = ((y[:, None, :] - x[None, :, :])**2).sum(-1)
    for q in range(20):
        got = set(out[1, out[0] == q].tolist())
        want = set(np.argsort(d[q])[:3].tolist())
        assert got == want


def test_knn_batched():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(40, 3)).astype(np.float32)
    y = rng.normal(size=(10, 3)).astype(np.float32)
    ptr_x = np.array([0, 25, 40])
    ptr_y = np.array([0, 6, 10])
    out = np.asarray(ops.knn(jnp.asarray(x), jnp.asarray(y), k=2,
                             ptr_x=jnp.asarray(ptr_x),
                             ptr_y=jnp.asarray(ptr_y)))
    # queries 0-5 may only reference points 0-24; 6-9 only 25-39
    for q, r in out.T:
        b = 0 if q < 6 else 1
        assert ptr_x[b] <= r < ptr_x[b + 1]


def test_radius_matches_numpy():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(60, 2)).astype(np.float32)
    y = rng.normal(size=(15, 2)).astype(np.float32)
    r = 0.7
    out = np.asarray(ops.radius(jnp.asarray(x), jnp.asarray(y), r=r,
                                max_num_neighbors=100))
    d = ((y[:, None, :] - x[None, :, :])**2).sum(-1)
    for q in range(15):
        got = set(out[1, out[0] == q].tolist())
        want = set(np.nonzero(d[q] <= r * r)[0].tolist())
        assert got == want


def test_radius_cap():
    x = jnp.zeros((10, 2), jnp.float32)
    y = jnp.zeros((1, 2), jnp.float32)
    out = np.asarray(ops.radius(x, y, r=1.0, max_num_neighbors=4))
    assert out.shape[1] == 4


def test_nearest_matches_numpy():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(30, 3)).astype(np.float32)
    y = rng.normal(size=(12, 3)).astype(np.float32)
    out = np.asarray(ops.nearest(jnp.asarray(x), jnp.asarray(y)))
    d = ((x[:, None, :] - y[None, :, :])**2).sum(-1)
    np.testing.assert_array_equal(out, d.argmin(1))


def test_grid_cluster_simple():
    pos = jnp.asarray(
        np.array([[0.1, 0.1], [0.9, 0.1], [0.1, 0.9], [0.95, 0.95]],
                 np.float32))
    size = jnp.asarray(np.array([0.5, 0.5], np.float32))
    out = np.asarray(ops.grid_cluster(pos, size))
    # 2x2 voxel grid, first dim fastest: ids = x + 2*y
    np.testing.assert_array_equal(out, [0, 1, 2, 3])


def test_graclus_valid_matching():
    rng = np.random.default_rng(5)
    n = 40
    deg = rng.integers(1, 5, size=n)
    rowptr = np.zeros(n + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    col = rng.integers(0, n, size=int(rowptr[-1])).astype(np.int64)
    out = np.asarray(ops.graclus_cluster(jnp.asarray(rowptr),
                                         jnp.asarray(col)))
    assert (out >= 0).all()
    # each cluster has at most 2 members, and cluster id = min member
    for cid in set(out.tolist()):
        members = np.nonzero(out == cid)[0]
        assert 1 <= len(members) <= 2
        assert cid == members.min()
        if len(members) == 2:
            u, v = members
            # matched pair must be adjacent (u->v or v->u)
            assert (v in col[rowptr[u]:rowptr[u + 1]]
                    or u in col[rowptr[v]:rowptr[v + 1]])


def test_edge_sample_count_and_factor():
    rowptr = np.array([0, 4, 4, 10])
    out = np.asarray(ops.edge_sample(jnp.asarray(np.array([0, 1, 2])),
                                     jnp.asarray(rowptr), count=2))
    assert len(out) == 2 + 0 + 2
    assert ((out[:2] >= 0) & (out[:2] < 4)).all()
    assert ((out[2:] >= 4) & (out[2:] < 10)).all()
    out2 = np.asarray(ops.edge_sample(jnp.asarray(np.array([2])),
                                      jnp.asarray(rowptr), factor=0.5))
    assert len(out2) == 3  # ceil(0.5 * 6)
    assert len(set(out2.tolist())) == 3  # without replacement


def test_nearest_validates_ptrs_and_empty_reference():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 3)).astype(
        np.float32))
    with pytest.raises(ValueError, match='batch count'):
        ops.nearest(x, x, ptr_x=jnp.asarray([0, 2, 4]),
                    ptr_y=jnp.asarray([0, 4]))
    with pytest.raises(ValueError, match='empty reference'):
        ops.nearest(x, x, ptr_x=jnp.asarray([0, 2]),
                    ptr_y=jnp.asarray([0, 0]))


def test_knn_cosine_zero_norm_no_nan():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(6, 3)).astype(np.float32)
    x[0] = 0.0  # zero-norm row must not poison the results with NaN
    out = np.asarray(ops.knn(jnp.asarray(x), jnp.asarray(x), k=2,
                             cosine=True))
    assert out.shape == (2, 12)
    assert (out >= 0).all()
