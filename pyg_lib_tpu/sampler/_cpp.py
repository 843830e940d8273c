"""ctypes loader for the native host-sampling library.

Builds ``libpygt_sampler.so`` from ``pyg_lib_tpu/csrc`` on first use (make,
cached next to the source).  Falls back silently to the numpy
implementation when no compiler is available — the numpy path is the
specification; this is the fast path (reference counterpart:
``libpyg.so`` built by CMake, reference ``CMakeLists.txt:97-103``).
"""

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), 'csrc')
_LIB_PATH = os.path.join(_CSRC, 'libpygt_sampler.so')
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(['make', '-C', _CSRC], check=True,
                       capture_output=True, timeout=300)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib():
    """Returns the loaded ctypes library or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get('PYGT_DISABLE_CPP'):
        return None
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.pygt_neighbor_sample.restype = ctypes.c_void_p
    lib.pygt_neighbor_sample.argtypes = [
        i64p, i64p, ctypes.c_int64, i64p, ctypes.c_int64, i64p,
        ctypes.c_int64, f64p, i64p, i64p, i64p, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_uint64,
    ]
    lib.pygt_result_sizes.argtypes = [ctypes.c_void_p, i64p]
    lib.pygt_result_copy.argtypes = [ctypes.c_void_p] + [i64p] * 7
    lib.pygt_result_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def _ptr(a: Optional[np.ndarray], typ=ctypes.c_int64):
    if a is None:
        return None
    return a.ctypes.data_as(ctypes.POINTER(typ))


def neighbor_sample_cpp(
    rowptr: np.ndarray,
    col: np.ndarray,
    seed: np.ndarray,
    num_neighbors: List[int],
    node_time: Optional[np.ndarray] = None,
    edge_time: Optional[np.ndarray] = None,
    seed_time: Optional[np.ndarray] = None,
    edge_weight: Optional[np.ndarray] = None,
    csc: bool = False,
    replace: bool = False,
    disjoint: bool = False,
    temporal_strategy: str = 'uniform',
    return_edge_id: bool = True,
    distributed: bool = False,
    rng_seed: int = 0,
):
    """Runs the C++ sampler; returns the same tuple as the numpy impl
    (or the distributed triple when ``distributed=True``)."""
    lib = get_lib()
    assert lib is not None

    rowptr = np.ascontiguousarray(rowptr, np.int64)
    col = np.ascontiguousarray(col, np.int64)
    seed = np.ascontiguousarray(seed, np.int64)
    fanouts = np.ascontiguousarray(num_neighbors, np.int64)
    ew = None if edge_weight is None else np.ascontiguousarray(
        edge_weight, np.float64)
    nt = None if node_time is None else np.ascontiguousarray(
        node_time, np.int64)
    et = None if edge_time is None else np.ascontiguousarray(
        edge_time, np.int64)
    st = None if seed_time is None else np.ascontiguousarray(
        seed_time, np.int64)

    handle = lib.pygt_neighbor_sample(
        _ptr(rowptr), _ptr(col), len(rowptr) - 1, _ptr(seed), len(seed),
        _ptr(fanouts), len(fanouts), _ptr(ew, ctypes.c_double), _ptr(nt),
        _ptr(et), _ptr(st), int(replace), int(disjoint),
        int(temporal_strategy == 'last'), int(return_edge_id),
        int(distributed), rng_seed & (2**64 - 1))
    try:
        sizes = np.zeros(5, np.int64)
        lib.pygt_result_sizes(handle, _ptr(sizes))
        n_edges, n_nodes, n_eids, n_nph, n_eph = map(int, sizes)
        rows = np.empty(n_edges, np.int64)
        cols = np.empty(n_edges, np.int64)
        eids = np.empty(n_eids, np.int64)
        nodes = np.empty(n_nodes, np.int64)
        batches = np.empty(n_nodes, np.int64)
        nph = np.empty(n_nph, np.int64)
        eph = np.empty(n_eph, np.int64)
        lib.pygt_result_copy(handle, _ptr(rows), _ptr(cols), _ptr(eids),
                             _ptr(nodes), _ptr(batches), _ptr(nph),
                             _ptr(eph))
    finally:
        lib.pygt_result_free(handle)

    if distributed:
        raise NotImplementedError(
            'distributed one-hop sampling uses the numpy path')

    if disjoint:
        node_id = np.stack([batches, nodes], axis=1)
    else:
        node_id = nodes
    out_row, out_col = rows, cols
    if csc:
        out_row, out_col = out_col, out_row
    return (out_row, out_col, node_id, eids if return_edge_id else None,
            nph.tolist(), eph.tolist())
