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


def _stale() -> bool:
    """True when any C++ source is newer than the built library."""
    if not os.path.exists(_LIB_PATH):
        return True
    lib_mtime = os.path.getmtime(_LIB_PATH)
    for name in os.listdir(_CSRC):
        if name.endswith(('.cpp', '.h')):
            if os.path.getmtime(os.path.join(_CSRC, name)) > lib_mtime:
                return True
    return False


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
    if _stale() and not _build():
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
        ctypes.c_int32, ctypes.c_uint64,
    ]
    lib.pygt_result_sizes.argtypes = [ctypes.c_void_p, i64p]
    lib.pygt_result_copy.argtypes = [ctypes.c_void_p] + [i64p] * 7
    lib.pygt_result_free.argtypes = [ctypes.c_void_p]
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.pygt_hetero_sample.restype = ctypes.c_void_p
    lib.pygt_hetero_sample.argtypes = [
        ctypes.c_int64, ctypes.c_int64, i32p, i32p, i64p, i64p, i64p, i64p,
        i64p, i64p, i64p, i64p, ctypes.c_int64, f64p, i64p, i64p, i64p,
        i64p, i32p, i32p, i32p, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_uint64,
    ]
    lib.pygt_hetero_sizes.argtypes = [ctypes.c_void_p, i64p, i64p]
    lib.pygt_hetero_copy_edges.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, i64p, i64p, i64p, i64p]
    lib.pygt_hetero_copy_nodes.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, i64p, i64p, i64p]
    lib.pygt_hetero_free.argtypes = [ctypes.c_void_p]
    lib.pygt_set_num_threads.argtypes = [ctypes.c_int32]
    lib.pygt_get_max_threads.restype = ctypes.c_int32
    _lib = lib
    return _lib


def set_num_threads(n: int) -> None:
    """Set the OpenMP width of the native sampling library at runtime
    (``OMP_NUM_THREADS`` is only consulted at load time)."""
    lib = get_lib()
    if lib is not None:
        lib.pygt_set_num_threads(int(n))


def rng_seed_from(rng) -> int:
    """Shared integer-seed derivation for the C++ fast paths."""
    if isinstance(rng, int):
        return rng
    return int(np.random.default_rng(rng).integers(2**63))


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
    directed: bool = True,
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
        _ptr(et), _ptr(st), int(replace), int(directed), int(disjoint),
        int(temporal_strategy == 'last'), int(return_edge_id),
        int(distributed), rng_seed & (2**64 - 1))
    if not handle:
        raise IndexError(
            'neighbor_sample: seed id out of range [0, num_nodes), or '
            'temporal sampling without disjoint=True')
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
        # rows carries the per-frontier cumulative node counts; prepend the
        # seed count (reference cumsum contract, neighbor.cpp:99-127).
        cumsum = np.concatenate([[len(seed)], rows]).astype(np.int64)
        return nodes, eids, cumsum

    if disjoint:
        node_id = np.stack([batches, nodes], axis=1)
    else:
        node_id = nodes
    out_row, out_col = rows, cols
    if csc:
        out_row, out_col = out_col, out_row
    return (out_row, out_col, node_id, eids if return_edge_id else None,
            nph.tolist(), eph.tolist())


class _HeteroGraphCpp:
    """Flattened per-edge-type CSR arrays for the C++ engine.

    Building this is O(E) (concatenation of every edge-type CSR), so it is
    cached across calls keyed on the input array identities — repeated
    mini-batch sampling from one graph flattens once (the stateful
    ``classes.HeteroNeighborSampler`` gets this for free).
    """

    def __init__(self, rowptr_dict, col_dict, seed_types, csc,
                 node_time_dict, edge_time_dict, edge_weight_dict):
        self._refs = (rowptr_dict, col_dict, node_time_dict, edge_time_dict,
                      edge_weight_dict)  # keep arrays alive for the cache
        # The flattening body lives in module-level _hetero_build (defined
        # below; it needs helpers declared later in the module).
        _hetero_build(self, rowptr_dict, col_dict, seed_types, csc,
                      node_time_dict, edge_time_dict, edge_weight_dict)


_HETERO_CACHE: dict = {}


def _hetero_fingerprint(rowptr_dict, col_dict, seed_types, csc,
                        node_time_dict, edge_time_dict, edge_weight_dict):
    def sig(d):
        if not d:
            return None
        return tuple(
            (k, a.ctypes.data, a.shape[0], a.strides, str(a.dtype))
            for k, a in ((k, np.asarray(v)) for k, v in d.items()))

    return (sig(rowptr_dict), sig(col_dict), tuple(seed_types), csc,
            sig(node_time_dict), sig(edge_time_dict), sig(edge_weight_dict))


def hetero_neighbor_sample_cpp(
    rowptr_dict,
    col_dict,
    seed_dict,
    num_neighbors_dict,
    node_time_dict=None,
    edge_time_dict=None,
    seed_time_dict=None,
    edge_weight_dict=None,
    csc: bool = False,
    replace: bool = False,
    directed: bool = True,
    disjoint: bool = False,
    temporal_strategy: str = 'uniform',
    return_edge_id: bool = True,
    rng_seed: int = 0,
):
    """Runs the C++ hetero sampler; same output tuple as the numpy impl
    (``pyg_lib_tpu/sampler/_hetero_impl.py``), keys preserved."""
    lib = get_lib()
    assert lib is not None

    # Convert dict values FIRST and fingerprint the converted arrays: the
    # cached _HeteroGraphCpp holds references to exactly these arrays, so
    # their data pointers cannot be reused while the entry lives. Callers
    # must treat graph arrays as immutable (in-place edits are not seen).
    conv = lambda d: None if d is None else {
        k: np.asarray(v) for k, v in d.items()}
    rowptr_dict = conv(rowptr_dict)
    col_dict = conv(col_dict)
    node_time_dict = conv(node_time_dict)
    edge_time_dict = conv(edge_time_dict)
    edge_weight_dict = conv(edge_weight_dict)
    fp = _hetero_fingerprint(rowptr_dict, col_dict, tuple(seed_dict), csc,
                             node_time_dict, edge_time_dict,
                             edge_weight_dict)
    g = _HETERO_CACHE.get(fp)
    if g is None:
        if len(_HETERO_CACHE) >= 4:  # bounded FIFO
            _HETERO_CACHE.pop(next(iter(_HETERO_CACHE)))
        g = _HeteroGraphCpp(rowptr_dict, col_dict, tuple(seed_dict), csc,
                            node_time_dict, edge_time_dict,
                            edge_weight_dict)
        _HETERO_CACHE[fp] = g
    return _hetero_sample_run(lib, g, seed_dict, num_neighbors_dict,
                              seed_time_dict, csc, replace, directed,
                              disjoint, temporal_strategy, return_edge_id,
                              rng_seed)


def _cat(arrs, dtype):
    """Concatenate arrays with an offsets table (shared by the hetero
    build and run paths)."""
    offs = np.zeros(len(arrs) + 1, np.int64)
    for i, a in enumerate(arrs):
        offs[i + 1] = offs[i] + len(a)
    flat = (np.ascontiguousarray(np.concatenate(
        [np.asarray(a, dtype) for a in arrs]), dtype)
            if len(arrs) else np.zeros(0, dtype))
    return flat, offs


def _hetero_build(self, rowptr_dict, col_dict, seed_types, csc,
                  node_time_dict, edge_time_dict, edge_weight_dict):
    edge_types = list(rowptr_dict.keys())
    src_of = (lambda k: k[0]) if not csc else (lambda k: k[2])
    dst_of = (lambda k: k[2]) if not csc else (lambda k: k[0])
    # The numpy spec (_hetero_impl.py) assigns disjoint batch ids by
    # iterating ``seed_dict`` in ITS order; the C++ engine numbers batches
    # in node-type slot order. Putting seed types first, in seed_dict
    # order, makes both numberings identical.
    rest = sorted(({src_of(k) for k in edge_types}
                   | {dst_of(k) for k in edge_types}) - set(seed_types))
    node_types = list(seed_types) + rest
    t_idx = {t: i for i, t in enumerate(node_types)}
    T, K = len(node_types), len(edge_types)

    src_type = np.asarray([t_idx[src_of(k)] for k in edge_types], np.int32)
    dst_type = np.asarray([t_idx[dst_of(k)] for k in edge_types], np.int32)

    cat = _cat
    rowptrs = [rowptr_dict[k] for k in edge_types]
    cols = [col_dict[k] for k in edge_types]
    rowptr_cat, rowptr_off = cat(rowptrs, np.int64)
    col_cat, col_off = cat(cols, np.int64)

    num_nodes = np.zeros(T, np.int64)
    for k, rp in zip(edge_types, rowptrs):
        num_nodes[t_idx[src_of(k)]] = max(num_nodes[t_idx[src_of(k)]],
                                          len(rp) - 1)
    for k, c in zip(edge_types, cols):
        if len(c):
            num_nodes[t_idx[dst_of(k)]] = max(num_nodes[t_idx[dst_of(k)]],
                                              int(np.max(c)) + 1)
    if node_time_dict:
        for t, nt in node_time_dict.items():
            if t in t_idx:
                num_nodes[t_idx[t]] = max(num_nodes[t_idx[t]], len(nt))

    has_weight = np.zeros(K, np.int32)
    if edge_weight_dict:
        weight_arrs = []
        for i, k in enumerate(edge_types):
            if k in edge_weight_dict and edge_weight_dict[k] is not None:
                has_weight[i] = 1
                weight_arrs.append(np.asarray(edge_weight_dict[k],
                                              np.float64))
            else:
                weight_arrs.append(np.zeros(len(cols[i]), np.float64))
        weight_cat, _ = cat(weight_arrs, np.float64)
    else:
        weight_cat = None

    has_edge_time = np.zeros(K, np.int32)
    if edge_time_dict:
        et_arrs = []
        for i, k in enumerate(edge_types):
            if k in edge_time_dict and edge_time_dict[k] is not None:
                has_edge_time[i] = 1
                et_arrs.append(np.asarray(edge_time_dict[k], np.int64))
            else:
                et_arrs.append(np.zeros(len(cols[i]), np.int64))
        edge_time_cat, _ = cat(et_arrs, np.int64)
    else:
        edge_time_cat = None

    has_node_time = np.zeros(T, np.int32)
    if node_time_dict:
        nt_arrs = []
        for i, t in enumerate(node_types):
            if t in node_time_dict and node_time_dict[t] is not None:
                has_node_time[i] = 1
                nt = np.asarray(node_time_dict[t], np.int64)
                if len(nt) < int(num_nodes[i]):
                    # The numpy spec IndexErrors on time[col] past the
                    # array; the concatenated layout would silently read
                    # the next type's segment instead — reject upfront.
                    raise IndexError(
                        f'node_time_dict[{t!r}] has {len(nt)} entries but '
                        f'node ids reach {int(num_nodes[i]) - 1}')
                nt_arrs.append(nt)
            else:
                nt_arrs.append(np.zeros(int(num_nodes[i]), np.int64))
        node_time_cat, node_time_off = cat(nt_arrs, np.int64)
    else:
        node_time_cat, node_time_off = None, None

    self.edge_types = edge_types
    self.node_types = node_types
    self.T, self.K = T, K
    self.src_type, self.dst_type = src_type, dst_type
    self.rowptr_cat, self.rowptr_off = rowptr_cat, rowptr_off
    self.col_cat, self.col_off = col_cat, col_off
    self.num_nodes = num_nodes
    self.weight_cat, self.has_weight = weight_cat, has_weight
    self.edge_time_cat, self.has_edge_time = edge_time_cat, has_edge_time
    self.node_time_cat = node_time_cat
    self.node_time_off = node_time_off
    self.has_node_time = has_node_time



def _hetero_sample_run(lib, g, seed_dict, num_neighbors_dict, seed_time_dict,
                       csc, replace, directed, disjoint, temporal_strategy,
                       return_edge_id, rng_seed):
    edge_types, node_types = g.edge_types, g.node_types
    T, K = g.T, g.K
    L = max(len(v) for v in num_neighbors_dict.values())

    cat = _cat
    # Seeds: slot order is node_types (seed types first, in seed_dict
    # order), reproducing the numpy spec's global batch numbering.
    if (disjoint and seed_time_dict is None and g.node_time_cat is not None):
        for t in seed_dict:
            ti = node_types.index(t)
            if len(np.asarray(seed_dict[t])) and not g.has_node_time[ti]:
                # Spec parity: _hetero_impl.py indexes node_time_dict[t].
                raise KeyError(
                    f'node_time_dict is missing seed node type {t!r}')
    seeds_per_type = {t: np.zeros(0, np.int64) for t in node_types}
    seed_times_per_type = {t: None for t in node_types}
    for t, s in seed_dict.items():
        seeds_per_type[t] = np.ascontiguousarray(s, np.int64)
        if seed_time_dict is not None and t in seed_time_dict:
            seed_times_per_type[t] = np.ascontiguousarray(
                seed_time_dict[t], np.int64)
    seed_cat, seed_off = cat([seeds_per_type[t] for t in node_types],
                             np.int64)
    if seed_time_dict is not None:
        st_arrs = []
        for t in node_types:
            st = seed_times_per_type[t]
            if st is None and len(seeds_per_type[t]):
                # Match the numpy specification, which raises for seed
                # types missing from seed_time_dict (_hetero_impl.py).
                raise KeyError(
                    f'seed_time_dict is missing seed node type {t!r}')
            st_arrs.append(st if st is not None else np.zeros(
                len(seeds_per_type[t]), np.int64))
        seed_time_cat, _ = cat(st_arrs, np.int64)
    else:
        seed_time_cat = None

    fanouts = np.zeros((K, L), np.int64)
    for i, k in enumerate(edge_types):
        v = list(num_neighbors_dict[k])
        fanouts[i, :len(v)] = v
    fanouts = np.ascontiguousarray(fanouts)

    i32 = ctypes.c_int32

    handle = lib.pygt_hetero_sample(
        T, K, _ptr(g.src_type, i32), _ptr(g.dst_type, i32),
        _ptr(g.rowptr_cat), _ptr(g.rowptr_off), _ptr(g.col_cat),
        _ptr(g.col_off), _ptr(g.num_nodes),
        _ptr(seed_cat), _ptr(seed_off), _ptr(fanouts), L,
        _ptr(g.weight_cat, ctypes.c_double), _ptr(g.node_time_cat),
        _ptr(g.node_time_off), _ptr(g.edge_time_cat), _ptr(seed_time_cat),
        _ptr(g.has_weight, i32), _ptr(g.has_edge_time, i32),
        _ptr(g.has_node_time, i32), int(replace), int(directed),
        int(disjoint), int(temporal_strategy == 'last'),
        int(return_edge_id), rng_seed & (2**64 - 1))
    if not handle:
        raise IndexError(
            "hetero_neighbor_sample: a seed id is outside its node type's "
            'range or node_time segment')
    try:
        edge_sizes = np.zeros(K, np.int64)
        node_sizes = np.zeros(T, np.int64)
        lib.pygt_hetero_sizes(handle, _ptr(edge_sizes), _ptr(node_sizes))
        out_row, out_col = {}, {}
        out_eid = {} if return_edge_id else None
        num_edges_per_hop = {}
        for i, k in enumerate(edge_types):
            ne = int(edge_sizes[i])
            rows = np.empty(ne, np.int64)
            cc = np.empty(ne, np.int64)
            eids = np.empty(ne if return_edge_id else 0, np.int64)
            # Undirected mode emits ONE induced-edge total per type.
            eph = np.empty(L if directed else 1, np.int64)
            lib.pygt_hetero_copy_edges(handle, i, _ptr(rows), _ptr(cc),
                                       _ptr(eids), _ptr(eph))
            r, c = rows, cc
            if csc:
                r, c = c, r
            out_row[k], out_col[k] = r, c
            if return_edge_id:
                out_eid[k] = eids
            num_edges_per_hop[k] = eph.tolist()
        out_node_id = {}
        num_nodes_per_hop = {}
        for i, t in enumerate(node_types):
            nn = int(node_sizes[i])
            nodes = np.empty(nn, np.int64)
            batches = np.empty(nn, np.int64)
            nph = np.empty(L + 1, np.int64)
            lib.pygt_hetero_copy_nodes(handle, i, _ptr(nodes), _ptr(batches),
                                       _ptr(nph))
            if disjoint:
                out_node_id[t] = np.stack([batches, nodes], axis=1)
            else:
                out_node_id[t] = nodes
            num_nodes_per_hop[t] = nph.tolist()
    finally:
        lib.pygt_hetero_free(handle)

    return (out_row, out_col, out_node_id, out_eid, num_nodes_per_hop,
            num_edges_per_hop)


def _register_graph_ops(lib):
    if hasattr(lib, '_graph_ops_registered'):
        return
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.pygt_subgraph.restype = ctypes.c_void_p
    lib.pygt_subgraph.argtypes = [i64p, i64p, ctypes.c_int64, i64p,
                                  ctypes.c_int64, ctypes.c_int32]
    lib.pygt_subgraph_num_edges.restype = ctypes.c_int64
    lib.pygt_subgraph_num_edges.argtypes = [ctypes.c_void_p]
    lib.pygt_subgraph_copy.argtypes = [ctypes.c_void_p, i64p, i64p, i64p]
    lib.pygt_subgraph_free.argtypes = [ctypes.c_void_p]
    lib.pygt_random_walk.argtypes = [i64p, i64p, i64p, ctypes.c_int64,
                                     ctypes.c_int64, ctypes.c_uint64, i64p]
    lib.pygt_random_walk_pq.argtypes = [i64p, i64p, i64p, ctypes.c_int64,
                                        ctypes.c_int64, ctypes.c_double,
                                        ctypes.c_double, ctypes.c_uint64,
                                        i64p]
    lib._graph_ops_registered = True


def _register_partition(lib):
    if hasattr(lib, '_partition_registered'):
        return
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.pygt_part_grow.argtypes = [
        i64p, i64p, ctypes.c_int64, f64p, ctypes.c_int64, f64p, i64p,
        ctypes.c_int64, i64p, ctypes.c_int64, i64p, f64p]
    lib.pygt_part_refine.restype = ctypes.c_int64
    lib.pygt_part_refine.argtypes = [
        i64p, i64p, ctypes.c_int64, f64p, f64p, i64p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_double]
    lib.pygt_edge_cut.restype = ctypes.c_double
    lib.pygt_edge_cut.argtypes = [i64p, i64p, ctypes.c_int64, i64p, f64p]
    lib._partition_registered = True


def part_grow_cpp(rowptr, col, nw, k, targets, sub, seeds, part, load):
    """C++ balanced BFS growth; mutates ``part``/``load`` in place."""
    lib = get_lib()
    assert lib is not None
    _register_partition(lib)
    lib.pygt_part_grow(
        _ptr(rowptr), _ptr(col), len(rowptr) - 1,
        _ptr(nw, ctypes.c_double), k, _ptr(targets, ctypes.c_double),
        _ptr(sub), 0 if sub is None else len(sub), _ptr(seeds), len(seeds),
        _ptr(part), _ptr(load, ctypes.c_double))


def part_refine_cpp(rowptr, col, nw, ew, part, k, passes, balance):
    """C++ greedy boundary refinement; mutates ``part`` in place."""
    lib = get_lib()
    assert lib is not None
    _register_partition(lib)
    return lib.pygt_part_refine(
        _ptr(rowptr), _ptr(col), len(rowptr) - 1,
        _ptr(nw, ctypes.c_double), _ptr(ew, ctypes.c_double), _ptr(part),
        k, passes, float(balance))


def edge_cut_cpp(rowptr, col, part, ew=None):
    """C++ streaming (weighted) edge cut."""
    lib = get_lib()
    assert lib is not None
    _register_partition(lib)
    return lib.pygt_edge_cut(_ptr(rowptr), _ptr(col), len(rowptr) - 1,
                             _ptr(part), _ptr(ew, ctypes.c_double))


def subgraph_cpp(rowptr, col, nodes, return_edge_id=True):
    """C++ induced subgraph; returns (rowptr, col, edge_id?)."""
    lib = get_lib()
    assert lib is not None
    _register_graph_ops(lib)
    rowptr = np.ascontiguousarray(rowptr, np.int64)
    col = np.ascontiguousarray(col, np.int64)
    nodes = np.ascontiguousarray(nodes, np.int64)
    n_out = len(nodes)
    handle = lib.pygt_subgraph(_ptr(rowptr), _ptr(col), len(rowptr) - 1,
                               _ptr(nodes), n_out, int(return_edge_id))
    try:
        ne = lib.pygt_subgraph_num_edges(handle)
        out_rowptr = np.empty(n_out + 1, np.int64)
        out_col = np.empty(ne, np.int64)
        out_eid = np.empty(ne if return_edge_id else 0, np.int64)
        lib.pygt_subgraph_copy(handle, _ptr(out_rowptr), _ptr(out_col),
                               _ptr(out_eid))
    finally:
        lib.pygt_subgraph_free(handle)
    return out_rowptr, out_col, (out_eid if return_edge_id else None)


def random_walk_cpp(rowptr, col, seed, walk_length, rng_seed=0):
    """C++ uniform random walks; returns [n_seed, walk_length+1]."""
    lib = get_lib()
    assert lib is not None
    _register_graph_ops(lib)
    rowptr = np.ascontiguousarray(rowptr, np.int64)
    col = np.ascontiguousarray(col, np.int64)
    seed = np.ascontiguousarray(seed, np.int64)
    out = np.empty((len(seed), walk_length + 1), np.int64)
    lib.pygt_random_walk(_ptr(rowptr), _ptr(col), _ptr(seed), len(seed),
                         walk_length, rng_seed & (2**64 - 1), _ptr(out))
    return out


def random_walk_pq_cpp(rowptr, col_sorted, seed, walk_length, p, q,
                       rng_seed=0):
    """node2vec walks; ``col_sorted`` must be row-sorted (see wrapper)."""
    lib = get_lib()
    assert lib is not None
    _register_graph_ops(lib)
    rowptr = np.ascontiguousarray(rowptr, np.int64)
    col_sorted = np.ascontiguousarray(col_sorted, np.int64)
    seed = np.ascontiguousarray(seed, np.int64)
    out = np.empty((len(seed), walk_length + 1), np.int64)
    lib.pygt_random_walk_pq(_ptr(rowptr), _ptr(col_sorted), _ptr(seed),
                            len(seed), walk_length, float(p), float(q),
                            rng_seed & (2**64 - 1), _ptr(out))
    return out
