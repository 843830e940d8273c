"""On-disk dataset ingestion (``datasets.load_csr`` and friends).

Reference analog: ``pyg_lib/testing.py:78-120`` ``get_sparse_matrix``
(SuiteSparse fetch).  No network here, so the loaders consume local
files; round-trips through every supported format must reproduce the
same CSR.
"""

import gzip
import os

import numpy as np
import pytest

from pyg_lib_tpu import datasets


@pytest.fixture
def coo():
    rng = np.random.default_rng(0)
    n, e = 50, 400
    src = rng.integers(0, n, e).astype(np.int64)
    dst = rng.integers(0, n, e).astype(np.int64)
    w = rng.normal(size=e)
    rowptr, col, perm = datasets.to_csr(src, dst, n)
    return n, src, dst, w, rowptr, col, w[perm]


def test_npz_rowptr_roundtrip(tmp_path, coo):
    n, _src, _dst, _w, rowptr, col, w_csr = coo
    p = str(tmp_path / 'g.npz')
    datasets.save_csr(p, rowptr, col, edge_weight=w_csr,
                      y=np.arange(n, dtype=np.int32))
    d = datasets.load_csr(p)
    assert np.array_equal(d['rowptr'], rowptr)
    assert np.array_equal(d['col'], col)
    assert np.allclose(d['edge_weight'], w_csr)
    assert np.array_equal(d['y'], np.arange(n))


def test_npz_edge_index(tmp_path, coo):
    n, src, dst, w, rowptr, col, w_csr = coo
    p = str(tmp_path / 'g.npz')
    np.savez(p, edge_index=np.stack([src, dst]), edge_weight=w,
             num_nodes=np.int64(n))
    d = datasets.load_csr(p)
    assert np.array_equal(d['rowptr'], rowptr)
    assert np.array_equal(d['col'], col)
    # Edge-aligned arrays follow the CSR permutation.
    assert np.allclose(d['edge_weight'], w_csr)


def test_npz_src_dst(tmp_path, coo):
    n, src, dst, _w, rowptr, col, _ = coo
    p = str(tmp_path / 'g.npz')
    np.savez(p, src=src, dst=dst)
    d = datasets.load_csr(p)
    # num_nodes inferred from max id: rowptr may be shorter, col equal.
    assert np.array_equal(d['col'], col[:len(d['col'])])
    assert d['rowptr'][-1] == rowptr[-1]


def _write_mtx(path, n, src, dst, w=None, symmetric=False, gz=False):
    field = 'pattern' if w is None else 'real'
    sym = 'symmetric' if symmetric else 'general'
    lines = [f'%%MatrixMarket matrix coordinate {field} {sym}',
             '% test graph', f'{n} {n} {len(src)}']
    for i in range(len(src)):
        row = f'{src[i] + 1} {dst[i] + 1}'
        if w is not None:
            row += f' {w[i]:.6g}'
        lines.append(row)
    data = '\n'.join(lines) + '\n'
    if gz:
        with gzip.open(path, 'wt') as f:
            f.write(data)
    else:
        with open(path, 'w') as f:
            f.write(data)


@pytest.mark.parametrize('gz', [False, True])
def test_mtx_general(tmp_path, coo, gz):
    n, src, dst, w, rowptr, col, w_csr = coo
    p = str(tmp_path / ('g.mtx' + ('.gz' if gz else '')))
    _write_mtx(p, n, src, dst, w, gz=gz)
    d = datasets.load_csr(p)
    assert np.array_equal(d['rowptr'], rowptr)
    assert np.array_equal(d['col'], col)
    assert np.allclose(d['edge_weight'], w_csr, atol=1e-4)


def test_mtx_symmetric(tmp_path):
    # Upper triangle of a triangle graph: symmetric expansion doubles
    # off-diagonal entries, keeps the diagonal single.
    src = np.array([0, 0, 1, 2])
    dst = np.array([1, 2, 2, 2])  # (2,2) is a self loop
    p_sym = str(tmp_path / 's.mtx')
    _write_mtx(p_sym, 3, src, dst, symmetric=True)
    d = datasets.load_csr(p_sym)
    assert d['rowptr'][-1] == 7  # 3 off-diagonal pairs * 2 + 1 loop
    deg = np.diff(d['rowptr'])
    assert deg.tolist() == [2, 2, 3]


def test_edge_list_txt(tmp_path, coo):
    n, src, dst, _w, rowptr, col, _ = coo
    p = str(tmp_path / 'g.txt')
    with open(p, 'w') as f:
        f.write('# comment line\n')
        for s, t in zip(src, dst):
            f.write(f'{s}\t{t}\n')
    d = datasets.load_csr(p)
    assert d['rowptr'][-1] == rowptr[-1]
    assert np.array_equal(d['col'], col[:len(d['col'])])


def test_edge_list_csv_weighted(tmp_path):
    p = str(tmp_path / 'g.csv')
    with open(p, 'w') as f:
        f.write('0,1,0.5\n1,2,1.5\n2,0,2.5\n')
    d = datasets.load_csr(p)
    assert d['rowptr'].tolist() == [0, 1, 2, 3]
    assert d['col'].tolist() == [1, 2, 0]
    assert np.allclose(d['edge_weight'], [0.5, 1.5, 2.5])


def test_mat_suitesparse(tmp_path):
    scipy_io = pytest.importorskip('scipy.io')
    import scipy.sparse as sp

    A = sp.random(20, 20, density=0.2, random_state=0, format='csr')
    # SuiteSparse layout: Problem struct whose third field is the matrix.
    dt = np.dtype([('name', object), ('title', object), ('A', object)])
    prob = np.zeros((1, 1), dtype=dt)
    prob[0, 0] = (np.array(['t']), np.array(['t']), A)
    p = str(tmp_path / 'g.mat')
    scipy_io.savemat(p, {'Problem': prob})
    d = datasets.load_csr(p)
    assert np.array_equal(d['rowptr'], A.indptr)
    assert np.array_equal(d['col'], A.indices)


def test_get_sparse_matrix_cache(tmp_path, monkeypatch, coo):
    n, _src, _dst, _w, rowptr, col, _ = coo
    monkeypatch.setenv('PYG_LIB_TPU_HOME', str(tmp_path))
    datasets.save_csr(str(tmp_path / 'web-Google.npz'), rowptr, col)
    rp, cc = datasets.get_sparse_matrix('SNAP', 'web-Google')
    assert np.array_equal(rp, rowptr) and np.array_equal(cc, col)
    with pytest.raises(FileNotFoundError, match='sparse.tamu.edu'):
        datasets.get_sparse_matrix('SNAP', 'absent-graph')


def test_unsupported_extension(tmp_path):
    p = str(tmp_path / 'g.parquet')
    open(p, 'w').close()
    with pytest.raises(ValueError, match='unsupported'):
        datasets.load_csr(p)
