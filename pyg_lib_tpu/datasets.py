"""Synthetic graph generators for tests, examples, and benchmarks.

The OGB/Planetoid datasets named in BASELINE.json require network access;
this environment has none, so the milestone configs run on synthetic
stand-ins with controllable structure: a stochastic block model whose
communities are recoverable by message passing (a GNN that works learns
them; one that is broken does not), plus power-law graphs for sampler and
kernel benchmarks.
"""

from typing import Optional, Tuple

import numpy as np

__all__ = ['sbm_graph', 'powerlaw_graph', 'to_csr']


def to_csr(src: np.ndarray, dst: np.ndarray,
           num_nodes: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """COO -> CSR; returns (rowptr, col, perm) with ``perm`` the edge
    permutation applied (for carrying edge attributes along)."""
    perm = np.argsort(src, kind='stable')
    src, dst = src[perm], dst[perm]
    counts = np.bincount(src, minlength=num_nodes)
    rowptr = np.zeros(num_nodes + 1, np.int64)
    rowptr[1:] = np.cumsum(counts)
    return rowptr, dst.astype(np.int64), perm


def sbm_graph(num_nodes: int = 400, num_classes: int = 4,
              p_in: float = 0.06, p_out: float = 0.004,
              feat_dim: int = 16, noise: float = 1.0,
              seed: int = 0):
    """Stochastic block model with class-informative features.

    Returns dict with rowptr, col, x, y, train/val/test masks. Features are
    a noisy one-hot-ish embedding of the class, so both structure and
    features carry signal (like citation networks).
    """
    rng = np.random.default_rng(seed)
    y = rng.integers(0, num_classes, size=num_nodes)
    # Sample undirected edges blockwise.
    srcs, dsts = [], []
    for i in range(num_nodes):
        same = y == y[i]
        p = np.where(same, p_in, p_out)
        p[i] = 0
        nbrs = np.nonzero(rng.random(num_nodes) < p)[0]
        srcs.append(np.full(len(nbrs), i))
        dsts.append(nbrs)
    src = np.concatenate(srcs)
    dst = np.concatenate(dsts)
    # Symmetrise + dedup: a pair drawn independently in both directions
    # would otherwise appear twice per direction, double-counting those
    # neighbors in every aggregation built on this generator.
    src2 = np.concatenate([src, dst])
    dst2 = np.concatenate([dst, src])
    pair = np.unique(np.stack([src2, dst2], 1), axis=0)
    rowptr, col, _ = to_csr(pair[:, 0], pair[:, 1], num_nodes)

    proto = rng.normal(size=(num_classes, feat_dim)).astype(np.float32)
    x = proto[y] + noise * rng.normal(size=(num_nodes, feat_dim)).astype(
        np.float32)

    idx = rng.permutation(num_nodes)
    train = np.zeros(num_nodes, bool)
    val = np.zeros(num_nodes, bool)
    test = np.zeros(num_nodes, bool)
    train[idx[:num_nodes // 2]] = True
    val[idx[num_nodes // 2:num_nodes * 3 // 4]] = True
    test[idx[num_nodes * 3 // 4:]] = True
    return {
        'rowptr': rowptr, 'col': col, 'x': x, 'y': y.astype(np.int32),
        'train_mask': train, 'val_mask': val, 'test_mask': test,
        'num_classes': num_classes,
    }


def powerlaw_graph(num_nodes: int, avg_degree: int = 16,
                   alpha: float = 1.5, seed: int = 0):
    """Power-law out-degree graph (Zipf-ish), CSR. For benchmarks."""
    rng = np.random.default_rng(seed)
    raw = rng.zipf(alpha, size=num_nodes).astype(np.float64)
    raw = np.minimum(raw, 10 * avg_degree)
    deg = np.maximum(
        (raw * (avg_degree * num_nodes / raw.sum())).astype(np.int64), 0)
    rowptr = np.zeros(num_nodes + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    col = rng.integers(0, num_nodes, size=int(rowptr[-1])).astype(np.int64)
    return rowptr, col
