"""Partition quality + scale table: metis() vs random vs spectral.

VERDICT r2 #7: measure the BFS-grow + boundary-refine partitioner's
edge-cut ratio against a random-partition baseline and (where feasible)
recursive spectral bisection (scipy Lanczos on the graph Laplacian) on
SBM / power-law / 2-D grid families at k in {2,4,8,16,32}.

Prints one JSON line per (family, k):
  {"family": ..., "n": N, "k": K, "cut_frac": cut/E,
   "vs_random": cut/random_cut, "vs_spectral": cut/spectral_cut | null,
   "seconds": t}

Scale entry: set PYGT_PART_SCALE_N (e.g. 10000000) to add a power-law
run at that size (C++ path; spectral skipped).
"""

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyg_lib_tpu import datasets, partition  # noqa: E402

SPECTRAL_MAX_N = 60_000


def grid_graph(side):
    """4-neighbor 2-D grid (the family where good cuts are obvious:
    perimeter/area)."""
    n = side * side
    idx = np.arange(n).reshape(side, side)
    src, dst = [], []
    for shift, axis in ((1, 0), (1, 1)):
        a = idx.take(range(side - shift), axis=axis).ravel()
        b = idx.take(range(shift, side), axis=axis).ravel()
        src += [a, b]
        dst += [b, a]
    src = np.concatenate(src)
    dst = np.concatenate(dst)
    rowptr, col, _ = datasets.to_csr(src, dst, n)
    return rowptr, col


def spectral_parts(rowptr, col, k, seed=0):
    """Recursive spectral bisection (Fiedler-vector sign splits) via
    scipy — the classical quality reference."""
    import scipy.sparse as sp
    from scipy.sparse.linalg import eigsh

    n = len(rowptr) - 1
    indptr = np.asarray(rowptr)
    A = sp.csr_matrix((np.ones(len(col)), np.asarray(col), indptr),
                      shape=(n, n))
    A = ((A + A.T) > 0).astype(np.float64)

    part = np.zeros(n, np.int64)

    def bisect(nodes, k_lo, k_hi, offset):
        if k_hi - k_lo == 1 or len(nodes) < 4:
            part[nodes] = offset
            return
        sub = A[nodes][:, nodes]
        deg = np.asarray(sub.sum(1)).ravel()
        L = sp.diags(deg) - sub
        try:
            _, vecs = eigsh(L, k=2, sigma=-1e-6, which='LM',
                            maxiter=5000)
            fiedler = vecs[:, 1]
        except Exception:
            rng = np.random.default_rng(seed)
            fiedler = rng.normal(size=len(nodes))
        mid = (k_lo + k_hi) // 2
        frac = (mid - k_lo) / (k_hi - k_lo)
        cutpt = np.quantile(fiedler, frac)
        left = nodes[fiedler <= cutpt]
        right = nodes[fiedler > cutpt]
        if len(left) == 0 or len(right) == 0:  # degenerate split
            half = len(nodes) // 2
            left, right = nodes[:half], nodes[half:]
        bisect(left, k_lo, mid, offset)
        bisect(right, mid, k_hi, offset + (mid - k_lo))

    bisect(np.arange(n), 0, k, 0)
    return part


def family_graphs():
    yield 'sbm', datasets.sbm_graph(20_000, num_classes=8, p_in=0.004,
                                    p_out=0.0002, seed=0)['rowptr'], \
        datasets.sbm_graph(20_000, num_classes=8, p_in=0.004,
                           p_out=0.0002, seed=0)['col']
    rp, cc = datasets.powerlaw_graph(100_000, avg_degree=12, seed=1)
    yield 'powerlaw', rp, cc
    rp, cc = grid_graph(200)
    yield 'grid', rp, cc


def main():
    rng = np.random.default_rng(99)
    for family, rowptr, col in family_graphs():
        n = len(rowptr) - 1
        e = len(col)
        for k in (2, 4, 8, 16, 32):
            t0 = time.time()
            part = partition.metis(rowptr, col, k, seed=0)
            el = time.time() - t0
            cut = partition.edge_cut(rowptr, col, part)
            rcut = partition.edge_cut(
                rowptr, col, rng.integers(0, k, n).astype(np.int64))
            scut = None
            if n <= SPECTRAL_MAX_N:
                try:
                    scut = partition.edge_cut(
                        rowptr, col, spectral_parts(rowptr, col, k))
                except Exception:
                    scut = None
            print(json.dumps({
                'family': family, 'n': n, 'k': k,
                'cut_frac': round(cut / max(e, 1), 4),
                'vs_random': round(cut / max(rcut, 1), 3),
                'vs_spectral': (None if not scut else
                                round(cut / max(scut, 1), 3)),
                'seconds': round(el, 2),
            }), flush=True)

    scale_n = int(os.environ.get('PYGT_PART_SCALE_N', 0))
    if scale_n:
        rowptr, col = datasets.powerlaw_graph(scale_n, avg_degree=16,
                                              seed=1)
        t0 = time.time()
        part = partition.metis(rowptr, col, 16, seed=0, impl='cpp')
        el = time.time() - t0
        cut = partition.edge_cut(rowptr, col, part)
        rcut = partition.edge_cut(
            rowptr, col,
            rng.integers(0, 16, len(rowptr) - 1).astype(np.int64))
        print(json.dumps({
            'family': 'powerlaw-scale', 'n': scale_n, 'k': 16,
            'cut_frac': round(cut / len(col), 4),
            'vs_random': round(cut / max(rcut, 1), 3),
            'vs_spectral': None, 'seconds': round(el, 1),
        }), flush=True)


if __name__ == '__main__':
    main()
