"""Point-cloud / clustering ops: fps, knn, radius, nearest, grid_cluster,
graclus_cluster, edge_sample.

TPU-native counterparts of the reference geometry subsystem
(reference ``pyg_lib/csrc/ops/cpu/{fps,knn,radius,nearest,cluster,graclus,
edge_sampler}_kernel.cpp`` and the CUDA twins; Python wrappers
``pyg_lib/ops/__init__.py:1033-1213``).

Design: the reference uses KD-trees (nanoflann) on CPU and brute-force tile
kernels on CUDA.  On TPU brute force *is* the right algorithm — pairwise
distances are a rank-2 matmul (``|x-y|² = |x|² + |y|² - 2x·yᵀ``) that runs
on the MXU, so knn/radius/nearest are expressed as tiled distance GEMMs +
top-k/argmin.  Ragged outputs (radius) and data-dependent loops (graclus)
are host-side by design, mirroring the reference's CPU-only placement.
"""

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pyg_lib_tpu.utils import Array

__all__ = [
    'fps',
    'knn',
    'radius',
    'nearest',
    'grid_cluster',
    'graclus_cluster',
    'edge_sample',
]


def _pairwise_sqdist(x: Array, y: Array) -> Array:
    """``[N, M]`` squared distances via the MXU-friendly expansion.

    The cross term runs at HIGHEST precision: default bf16 MXU inputs
    give ~±0.05 absolute error at unit-normal scales (measured on v5e),
    which flips radius/knn membership at the boundary — the reference
    computes exact f32 distances, so these ops must too.
    """
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    y2 = jnp.sum(y * y, axis=-1, keepdims=True)
    cross = jnp.dot(x, y.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(x2 + y2.T - 2.0 * cross, 0.0)


def _host_ptr(ptr, n: int) -> np.ndarray:
    if ptr is None:
        return np.array([0, n], dtype=np.int64)
    return np.asarray(jax.device_get(ptr), dtype=np.int64)


def _fps_one(pts: Array, m: int, start: int) -> Array:
    """Greedy farthest point sampling of ``m`` points (static), one batch.

    Reference algorithm: running min-distance argmax loop
    (``csrc/ops/cpu/fps_kernel.cpp:13-56``), expressed as a
    ``lax.fori_loop`` — static trip count, fully jittable.
    """
    n = pts.shape[0]

    def body(i, state):
        dist, idxs = state
        last = pts[idxs[i - 1]]
        d = jnp.sum((pts - last)**2, axis=-1)
        dist = jnp.minimum(dist, d)
        idxs = idxs.at[i].set(jnp.argmax(dist).astype(jnp.int32))
        return dist, idxs

    idxs = jnp.zeros((m, ), jnp.int32).at[0].set(start)
    dist = jnp.full((n, ), jnp.inf, pts.dtype)
    _, idxs = jax.lax.fori_loop(1, m, body, (dist, idxs))
    return idxs


# Module-level jit: per-(n, m) shapes hit the trace cache across calls.
_fps_one_jit = jax.jit(_fps_one, static_argnums=(1, ))


def fps(src: Array, ptr: Array, ratio: float = 0.5,
        random_start: bool = True, seed: int = 0) -> Array:
    """Farthest point sampling per batch (reference
    ``pyg_lib/ops/__init__.py:1059-1079``).

    Host-orchestrated over batches (ragged output sizes); the inner greedy
    loop is jitted per (n, m) shape.
    """
    hptr = _host_ptr(ptr, src.shape[0])
    rng = np.random.default_rng(seed)
    out = []
    fn = _fps_one_jit  # module-level jit: per-call wrapping would retrace
    for b in range(len(hptr) - 1):
        lo, hi = int(hptr[b]), int(hptr[b + 1])
        n = hi - lo
        if n == 0:
            continue
        m = max(1, int(math.ceil(ratio * n)))
        start = int(rng.integers(n)) if random_start else 0
        idx = fn(src[lo:hi], m, start)
        out.append(np.asarray(jax.device_get(idx)) + lo)
    if not out:
        return jnp.zeros((0, ), jnp.int32)
    return jnp.asarray(np.concatenate(out).astype(np.int32))


def knn(x: Array, y: Array, k: int = 1,
        ptr_x: Optional[Array] = None, ptr_y: Optional[Array] = None,
        cosine: bool = False, num_workers: int = 1) -> Array:
    """For each point in ``y``, the ``k`` nearest points in ``x``.

    Returns ``[2, M*k]`` with row 0 = query index, row 1 = reference index
    (reference ``pyg_lib/ops/__init__.py:1082-1107``).  Brute-force tiled
    distance matmul — the TPU plan from SURVEY.md §2.3.
    """
    del num_workers
    if k < 1:
        raise ValueError(f'knn needs k >= 1, got {k}')
    hx = _host_ptr(ptr_x, x.shape[0])
    hy = _host_ptr(ptr_y, y.shape[0])
    if len(hx) != len(hy):
        raise ValueError('ptr_x and ptr_y must have equal batch count')
    rows, cols = [], []
    for b in range(len(hx) - 1):
        xs, xe = int(hx[b]), int(hx[b + 1])
        ys, ye = int(hy[b]), int(hy[b + 1])
        if ye - ys == 0 or xe - xs == 0:
            continue
        xb, yb = x[xs:xe], y[ys:ye]
        if cosine:
            # Guard zero-norm rows (NaN similarity) and run the dot at
            # HIGHEST precision like _pairwise_sqdist: default bf16 MXU
            # error (~±0.05) reorders neighbors whose similarities are
            # close.
            xn = xb / jnp.maximum(
                jnp.linalg.norm(xb, axis=-1, keepdims=True), 1e-12)
            yn = yb / jnp.maximum(
                jnp.linalg.norm(yb, axis=-1, keepdims=True), 1e-12)
            d = 1.0 - jnp.dot(yn, xn.T,
                              precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32)
        else:
            d = _pairwise_sqdist(yb, xb)
        kk = min(k, xe - xs)
        _, idx = jax.lax.top_k(-d, kk)  # [My, kk]
        idx = np.asarray(jax.device_get(idx)) + xs
        q = np.repeat(np.arange(ys, ye), kk)
        rows.append(q)
        cols.append(idx.reshape(-1))
    if not rows:
        return jnp.zeros((2, 0), jnp.int32)
    return jnp.asarray(
        np.stack([np.concatenate(rows),
                  np.concatenate(cols)]).astype(np.int64))


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _radius_blocked(xb: Array, yb: Array, r2: float, kk: int, block: int,
                    diag_offset: Optional[int]):
    """Per-batch device pass: first-``kk``-by-index in-radius neighbors.

    Queries run in ``block``-row tiles under ``lax.map`` so the transient
    distance tile stays ``block × |x|`` no matter how many queries there
    are (a 1M-point query runs in one jit call). The top-k key
    ``|x| - col`` is monotone-decreasing in the column, so ``top_k``
    returns the lowest-index in-radius columns first — the same order the
    reference's brute-force scan keeps when the cap truncates
    (``csrc/ops/cuda/radius_kernel.cu``).
    """
    mx = xb.shape[0]
    my = yb.shape[0]
    nblocks = -(-my // block)
    pad = nblocks * block - my
    ypad = jnp.pad(yb, ((0, pad), (0, 0)))

    def one_block(i0):
        yblk = jax.lax.dynamic_slice(ypad, (i0 * block, 0),
                                     (block, yb.shape[1]))
        d = _pairwise_sqdist(yblk, xb)
        within = d <= r2
        if diag_offset is not None:
            qidx = i0 * block + jnp.arange(block)[:, None] + diag_offset
            within &= qidx != jnp.arange(mx)[None, :]
        key = jnp.where(within, mx - jnp.arange(mx, dtype=jnp.int32), -1)
        vals, idx = jax.lax.top_k(key, kk)
        return idx.astype(jnp.int32), vals > 0

    idx, valid = jax.lax.map(one_block, jnp.arange(nblocks))
    return (idx.reshape(nblocks * block, kk)[:my],
            valid.reshape(nblocks * block, kk)[:my])


def radius(x: Array, y: Array, r: float = 1.0,
           ptr_x: Optional[Array] = None, ptr_y: Optional[Array] = None,
           max_num_neighbors: int = 32, num_workers: int = 1,
           ignore_same_index: bool = False) -> Array:
    """All points of ``x`` within distance ``r`` of each ``y`` point, capped
    at ``max_num_neighbors`` (reference
    ``pyg_lib/ops/__init__.py:1110-1146``). Device-vectorised: one jitted
    blocked pass per batch, one host transfer of the capped ``[My, k]``
    candidate table (round 1 iterated queries in Python)."""
    del num_workers
    if r < 0:
        raise ValueError(f'radius must be non-negative, got {r} '
                         '(r*r would silently match everything)')
    hx = _host_ptr(ptr_x, x.shape[0])
    hy = _host_ptr(ptr_y, y.shape[0])
    rows, cols = [], []
    for b in range(len(hx) - 1):
        xs, xe = int(hx[b]), int(hx[b + 1])
        ys, ye = int(hy[b]), int(hy[b + 1])
        mx, my = xe - xs, ye - ys
        if my == 0 or mx == 0:
            continue
        kk = min(max_num_neighbors, mx)
        # Keep the transient distance tile under ~64 MB.
        block = max(1, min(my, (1 << 24) // max(mx, 1)))
        diag = (ys - xs) if ignore_same_index else None
        idx, valid = _radius_blocked(x[xs:xe], y[ys:ye], float(r * r), kk,
                                     block, diag)
        idx = np.asarray(jax.device_get(idx))
        valid = np.asarray(jax.device_get(valid))
        q, slot = np.nonzero(valid)
        rows.append((q + ys).astype(np.int64))
        cols.append((idx[q, slot] + xs).astype(np.int64))
    if not rows:
        return jnp.zeros((2, 0), jnp.int64)
    return jnp.asarray(np.stack([np.concatenate(rows),
                                 np.concatenate(cols)]))


def nearest(x: Array, y: Array, ptr_x: Optional[Array] = None,
            ptr_y: Optional[Array] = None) -> Array:
    """Nearest point in ``y`` for each point in ``x`` (reference
    ``pyg_lib/ops/__init__.py:1149-1167``)."""
    hx = _host_ptr(ptr_x, x.shape[0])
    hy = _host_ptr(ptr_y, y.shape[0])
    if len(hx) != len(hy):
        raise ValueError('ptr_x and ptr_y must have equal batch count')
    parts = []
    for b in range(len(hx) - 1):
        xs, xe = int(hx[b]), int(hx[b + 1])
        ys, ye = int(hy[b]), int(hy[b + 1])
        if xe - xs == 0:
            continue
        if ye - ys == 0:
            raise ValueError(
                f'nearest: batch {b} has {xe - xs} query points but an '
                'empty reference segment')
        d = _pairwise_sqdist(x[xs:xe], y[ys:ye])
        parts.append(np.asarray(jax.device_get(jnp.argmin(d, axis=1))) + ys)
    if not parts:
        return jnp.zeros((0, ), jnp.int64)
    return jnp.asarray(np.concatenate(parts))


def grid_cluster(pos: Array, size: Array, start: Optional[Array] = None,
                 end: Optional[Array] = None) -> Array:
    """Voxel-grid clustering (reference
    ``pyg_lib/ops/__init__.py:1033-1056``; CPU kernel
    ``csrc/ops/cpu/cluster_kernel.cpp``). Pure JAX: floor-divide + ravel."""
    if start is None:
        start = jnp.min(pos, axis=0)
    if end is None:
        end = jnp.max(pos, axis=0)
    num_voxels = jnp.floor((end - start) / size).astype(jnp.int64) + 1
    coords = jnp.floor((pos - start) / size).astype(jnp.int64)
    coords = jnp.clip(coords, 0, num_voxels - 1)
    # Ravel with the reference's dimension ordering (first dim fastest,
    # csrc/ops/cpu/cluster_kernel.cpp). NOTE: without jax_enable_x64 the
    # int64 astype silently becomes int32; guard the id space so voxel
    # products past 2^31 fail loudly instead of overflowing into
    # colliding/negative cluster ids (the reference computes in int64).
    strides = jnp.concatenate([
        jnp.ones((1, ), jnp.int64),
        jnp.cumprod(num_voxels[:-1]),
    ])
    if strides.dtype != jnp.int64:  # x64 disabled
        import numpy as _np

        nv = _np.asarray(jax.device_get(num_voxels), _np.float64)
        if _np.prod(nv) >= 2**31:
            raise ValueError(
                'grid_cluster: voxel id space exceeds int32 '
                f'({int(_np.prod(nv))} cells) and jax x64 is disabled; '
                'enable jax_enable_x64 or use a coarser grid')
    return jnp.sum(coords * strides, axis=-1)


def graclus_cluster(rowptr: Array, col: Array,
                    weight: Optional[Array] = None,
                    seed: int = 0) -> Array:
    """Greedy randomized heavy-edge matching; cluster id = min(u, v)
    (reference ``csrc/ops/cpu/graclus_kernel.cpp:12-60``).  Host-side: the
    algorithm is sequentially dependent (SURVEY.md §2.3 TPU plan)."""
    rp = np.asarray(jax.device_get(rowptr))
    cl = np.asarray(jax.device_get(col))
    w = None if weight is None else np.asarray(jax.device_get(weight))
    n = len(rp) - 1
    rng = np.random.default_rng(seed)
    order = rng.permutation(n)
    cluster = np.full(n, -1, dtype=np.int64)
    for u in order:
        if cluster[u] >= 0:
            continue
        nbrs = cl[rp[u]:rp[u + 1]]
        wts = None if w is None else w[rp[u]:rp[u + 1]]
        best, best_w = -1, -1.0
        for j, v in enumerate(nbrs):
            if v == u or cluster[v] >= 0:
                continue
            wt = 1.0 if wts is None else float(wts[j])
            if wt > best_w:
                best, best_w = int(v), wt
        if best >= 0:
            cid = min(int(u), best)
            cluster[u] = cid
            cluster[best] = cid
        else:
            cluster[u] = int(u)
    return jnp.asarray(cluster)


def edge_sample(start: Array, rowptr: Array, count: int = 0,
                factor: float = 1.0, seed: int = 0) -> Array:
    """Per-start-node random subset of incident edge ids (reference
    ``csrc/ops/cpu/edge_sampler_kernel.cpp:15-54``; Python wrapper
    ``pyg_lib/ops/__init__.py:1192-1213``). Host-side sampling."""
    st = np.asarray(jax.device_get(start))
    rp = np.asarray(jax.device_get(rowptr))
    rng = np.random.default_rng(seed)
    out = []
    for v in st:
        lo, hi = int(rp[v]), int(rp[v + 1])
        deg = hi - lo
        if deg == 0:
            continue
        c = count if count >= 1 else int(math.ceil(factor * deg))
        c = min(c, deg)
        out.append(lo + rng.choice(deg, size=c, replace=False))
    if not out:
        return jnp.zeros((0, ), jnp.int64)
    return jnp.asarray(np.concatenate(out).astype(np.int64))
