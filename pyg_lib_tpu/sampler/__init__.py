"""Host-side graph sampling (counterpart of reference ``pyg_lib.sampler``).

Samplers run on the host (SURVEY.md §7 design stance #2: the per-neighbor
hashmap hot loop belongs on CPU), emitting numpy arrays; use
``pyg_lib_tpu.sampler.padding`` to produce fixed-shape device batches that
never retrace a jitted step function.

All entry points take ``rng``/``seed`` for reproducibility (the reference
inherits ATen's global RNG; we use explicit counters — SURVEY.md §7 hard
part 3).  A C++ fast path (``pyg_lib_tpu/csrc``) accelerates the hot loops
when built; the numpy implementation is the always-available specification.
"""

from typing import Dict, List, Optional, Tuple, Union

import numpy as np

from pyg_lib_tpu.sampler import padding
from pyg_lib_tpu.sampler._hetero_impl import hetero_neighbor_sample_np
from pyg_lib_tpu.sampler._numpy_impl import neighbor_sample_np
from pyg_lib_tpu.sampler.dist import (
    dist_neighbor_sample,
    hetero_relabel_neighborhood,
    merge_sampler_outputs,
    relabel_neighborhood,
)

NodeType = str
RelType = str
EdgeType = Tuple[str, str, str]

__all__ = [
    'neighbor_sample',
    'hetero_neighbor_sample',
    'subgraph',
    'random_walk',
    'dist_neighbor_sample',
    'merge_sampler_outputs',
    'relabel_neighborhood',
    'hetero_relabel_neighborhood',
    'padding',
]


def _np(x):
    return None if x is None else np.asarray(x)


def _rng(rng: Union[None, int, np.random.Generator]) -> np.random.Generator:
    if isinstance(rng, np.random.Generator):
        return rng
    return np.random.default_rng(rng)


def neighbor_sample(
    rowptr,
    col,
    seed,
    num_neighbors: List[int],
    node_time=None,
    edge_time=None,
    seed_time=None,
    edge_weight=None,
    csc: bool = False,
    replace: bool = False,
    directed: bool = True,
    disjoint: bool = False,
    temporal_strategy: str = 'uniform',
    return_edge_id: bool = True,
    rng: Union[None, int, np.random.Generator] = None,
    impl: str = 'auto',
):
    """Recursively samples neighbors from ``seed`` in the CSR graph
    ``(rowptr, col)``.

    Parity: reference ``pyg_lib.sampler.neighbor_sample``
    (``pyg_lib/sampler/__init__.py:11-100``).  Returns
    ``(row, col, node_id, edge_id?, num_sampled_nodes_per_hop,
    num_sampled_edges_per_hop)`` with local (relabelled) row/col ids; in
    disjoint mode ``node_id`` has shape ``[N, 2]`` carrying
    ``(batch, node)`` pairs.

    ``directed=False`` returns ALL edges among the sampled nodes (the
    induced subgraph) instead of the per-hop sampled edges — the
    semantics the reference documents (``pyg_lib/sampler/__init__.py:69``)
    but rejects in its kernel (``neighbor_kernel.cpp:501``). Node
    discovery (and hence the node set) is identical to ``directed=True``
    under the same ``rng``; hop attribution is meaningless for induced
    edges, so ``num_sampled_edges_per_hop`` is the single-entry list
    ``[num_edges]``. Incompatible with ``disjoint=True``.

    Extra ``rng`` arg fixes the random stream;
    ``impl`` selects 'cpp' (native fast path), 'numpy' (specification), or
    'auto' (cpp when built and ``rng`` is not a Generator).
    """
    # Shared argument validation (reference checks,
    # csrc/sampler/cpu/neighbor_kernel.cpp:355-381).
    if (node_time is not None or edge_time is not None) and not disjoint:
        raise ValueError(
            'Temporal sampling needs to create disjoint subgraphs')
    if node_time is not None and edge_time is not None:
        raise ValueError(
            'Only one of node-level or edge-level sampling is supported')
    if edge_time is not None and seed_time is None:
        raise ValueError('Seed time needs to be specified')
    if temporal_strategy not in ('uniform', 'last'):
        raise ValueError('No valid temporal strategy found')
    if edge_weight is not None and (node_time is not None
                                    or edge_time is not None):
        raise ValueError('Biased temporal sampling not yet supported')
    if not directed and disjoint:
        raise ValueError(
            'Undirected sampling cannot create disjoint subgraphs')

    use_cpp = False
    if impl == 'cpp':
        use_cpp = True
    elif impl == 'auto':
        from pyg_lib_tpu.sampler import _cpp
        use_cpp = (not isinstance(rng, np.random.Generator)
                   and _cpp.get_lib() is not None)
    if use_cpp:
        from pyg_lib_tpu.sampler._cpp import (neighbor_sample_cpp,
                                              rng_seed_from)
        seed_int = rng_seed_from(rng)
        return neighbor_sample_cpp(
            _np(rowptr), _np(col), _np(seed), list(num_neighbors),
            node_time=_np(node_time), edge_time=_np(edge_time),
            seed_time=_np(seed_time), edge_weight=_np(edge_weight),
            csc=csc, replace=replace, directed=directed, disjoint=disjoint,
            temporal_strategy=temporal_strategy,
            return_edge_id=return_edge_id, rng_seed=seed_int)
    return neighbor_sample_np(
        _np(rowptr), _np(col), _np(seed), list(num_neighbors),
        node_time=_np(node_time), edge_time=_np(edge_time),
        seed_time=_np(seed_time), edge_weight=_np(edge_weight), csc=csc,
        replace=replace, directed=directed, disjoint=disjoint,
        temporal_strategy=temporal_strategy, return_edge_id=return_edge_id,
        rng=_rng(rng))


def hetero_neighbor_sample(
    rowptr_dict: Dict[EdgeType, np.ndarray],
    col_dict: Dict[EdgeType, np.ndarray],
    seed_dict: Dict[NodeType, np.ndarray],
    num_neighbors_dict: Dict[EdgeType, List[int]],
    node_time_dict: Optional[Dict[NodeType, np.ndarray]] = None,
    edge_time_dict: Optional[Dict[EdgeType, np.ndarray]] = None,
    seed_time_dict: Optional[Dict[NodeType, np.ndarray]] = None,
    edge_weight_dict: Optional[Dict[EdgeType, np.ndarray]] = None,
    csc: bool = False,
    replace: bool = False,
    directed: bool = True,
    disjoint: bool = False,
    temporal_strategy: str = 'uniform',
    return_edge_id: bool = True,
    rng: Union[None, int, np.random.Generator] = None,
    impl: str = 'auto',
):
    """Heterogeneous multi-hop neighbor sampling over per-edge-type CSR
    graphs.

    Parity: reference ``pyg_lib.sampler.hetero_neighbor_sample``
    (``pyg_lib/sampler/__init__.py:103-201``); dict keys are edge-type
    triples ``(src, rel, dst)`` directly (no ``"src__rel__dst"`` string
    mangling — that reference detail exists only because TorchScript cannot
    key dicts by tuples, ``csrc/utils/types.h:6-13``).  ``impl`` selects
    'cpp' (native fast path, thread-per-dst-type like the reference's
    ``at::parallel_for`` grouping), 'numpy' (specification), or 'auto'.

    ``directed=False`` returns, per edge type, ALL edges between sampled
    src-type and dst-type nodes (the induced subgraph) instead of the
    per-hop sampled edges; ``num_sampled_edges_per_hop[k]`` is then the
    single-entry list ``[num_edges_k]`` (see ``neighbor_sample``).
    Incompatible with ``disjoint=True``.
    """
    # Shared argument validation (mirrors _hetero_impl and the reference
    # checks, csrc/sampler/cpu/neighbor_kernel.cpp:544-575).
    temporal = node_time_dict is not None or edge_time_dict is not None
    if temporal and not disjoint:
        raise ValueError(
            'Temporal sampling needs to create disjoint subgraphs')
    if node_time_dict is not None and edge_time_dict is not None:
        raise ValueError(
            'Only one of node-level or edge-level sampling is supported')
    if edge_time_dict is not None and seed_time_dict is None:
        raise ValueError('Seed time needs to be specified')
    if temporal_strategy not in ('uniform', 'last'):
        raise ValueError('No valid temporal strategy found')
    if not directed and disjoint:
        raise ValueError(
            'Undirected sampling cannot create disjoint subgraphs')

    conv = lambda d: None if d is None else {k: _np(v) for k, v in d.items()}
    use_cpp = False
    if impl == 'cpp':
        use_cpp = True
    elif impl == 'auto':
        from pyg_lib_tpu.sampler import _cpp
        use_cpp = (not isinstance(rng, np.random.Generator)
                   and _cpp.get_lib() is not None)
    if use_cpp:
        from pyg_lib_tpu.sampler._cpp import (hetero_neighbor_sample_cpp,
                                              rng_seed_from)
        seed_int = rng_seed_from(rng)
        return hetero_neighbor_sample_cpp(
            conv(rowptr_dict), conv(col_dict), conv(seed_dict),
            {k: list(v) for k, v in num_neighbors_dict.items()},
            node_time_dict=conv(node_time_dict),
            edge_time_dict=conv(edge_time_dict),
            seed_time_dict=conv(seed_time_dict),
            edge_weight_dict=conv(edge_weight_dict), csc=csc,
            replace=replace, directed=directed, disjoint=disjoint,
            temporal_strategy=temporal_strategy,
            return_edge_id=return_edge_id, rng_seed=seed_int)
    return hetero_neighbor_sample_np(
        conv(rowptr_dict), conv(col_dict), conv(seed_dict),
        {k: list(v) for k, v in num_neighbors_dict.items()},
        node_time_dict=conv(node_time_dict),
        edge_time_dict=conv(edge_time_dict),
        seed_time_dict=conv(seed_time_dict),
        edge_weight_dict=conv(edge_weight_dict), csc=csc, replace=replace,
        directed=directed, disjoint=disjoint,
        temporal_strategy=temporal_strategy, return_edge_id=return_edge_id,
        rng=_rng(rng))


def subgraph(
    rowptr,
    col,
    nodes,
    return_edge_id: bool = True,
    impl: str = 'auto',
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Induced subgraph on ``nodes``; returns local CSR
    ``(rowptr, col, edge_id?)``.

    Parity: reference ``pyg_lib.sampler.subgraph``
    (``pyg_lib/sampler/__init__.py:203-225``; two-pass OpenMP kernel in
    ``pyg_lib_tpu/csrc/graph_ops.cpp`` mirroring
    ``csrc/sampler/cpu/subgraph_kernel.cpp:13-89``).
    """
    rowptr, col, nodes = _np(rowptr), _np(col), _np(nodes)
    if impl != 'numpy':
        from pyg_lib_tpu.sampler import _cpp
        if _cpp.get_lib() is not None:
            return _cpp.subgraph_cpp(rowptr, col, nodes, return_edge_id)
        if impl == 'cpp':
            # Fail loudly like neighbor_sample: silently running the
            # O(E) Python loop would invalidate benchmarks.
            raise RuntimeError("impl='cpp' requested but the native "
                               'sampling library is unavailable')
    n_out = len(nodes)
    local = {int(v): i for i, v in enumerate(nodes.tolist())}
    out_rowptr = np.zeros(n_out + 1, dtype=rowptr.dtype)
    out_cols: List[int] = []
    out_eids: List[int] = []
    for i, v in enumerate(nodes.tolist()):
        for e in range(int(rowptr[v]), int(rowptr[v + 1])):
            w = local.get(int(col[e]))
            if w is not None:
                out_cols.append(w)
                if return_edge_id:
                    out_eids.append(e)
        out_rowptr[i + 1] = len(out_cols)
    out_col = np.asarray(out_cols, dtype=col.dtype)
    out_eid = (np.asarray(out_eids, np.int64) if return_edge_id else None)
    return out_rowptr, out_col, out_eid


def _sorted_rows(rowptr: np.ndarray, col: np.ndarray) -> np.ndarray:
    """Row-sorted copy of ``col`` (binary-searchable neighborhoods)."""
    out = col.copy()
    for v in range(len(rowptr) - 1):  # O(E log d); cached by callers
        lo, hi = rowptr[v], rowptr[v + 1]
        if hi - lo > 1:
            out[lo:hi] = np.sort(out[lo:hi])
    return out


_SORTED_COL_CACHE: dict = {}


def _graph_fingerprint(rowptr, col):
    """Cheap content fingerprint (O(E) memory-bound sum, not O(E)
    hashing): detects in-place mutation under an identity cache key."""
    return (int(rowptr[-1]), int(rowptr.sum() % (1 << 62)),
            int(col.sum() % (1 << 62)) if len(col) else 0)


def _random_walk_pq(rowptr, col, seed, walk_length, p, q, rng, impl,
                    stable_buffers: bool):
    # Identity key for stable numpy buffers (validated by fingerprint);
    # sha1 content key otherwise (fresh host copies every call would
    # miss — or collide on allocator reuse; same scheme as
    # ops/pallas/plan_cache.py). sha1-hashing BOTH arrays on every call
    # cost hundreds of ms per batch on large graphs even on cache hits.
    if stable_buffers:
        key = ('id', rowptr.ctypes.data, rowptr.shape[0],
               col.ctypes.data, col.shape[0])
    else:
        import hashlib

        key = ('sha',
               hashlib.sha1(np.ascontiguousarray(rowptr).tobytes()).
               hexdigest(),
               hashlib.sha1(np.ascontiguousarray(col).tobytes()).
               hexdigest())
    fp = _graph_fingerprint(rowptr, col)
    hit = _SORTED_COL_CACHE.get(key)
    if hit is None or hit[1] != fp:
        hit = (_sorted_rows(np.asarray(rowptr, np.int64),
                            np.asarray(col, np.int64)), fp)
        if key not in _SORTED_COL_CACHE and len(_SORTED_COL_CACHE) >= 4:
            _SORTED_COL_CACHE.pop(next(iter(_SORTED_COL_CACHE)))
        _SORTED_COL_CACHE[key] = hit
    col_sorted = hit[0]
    if impl != 'numpy' and not isinstance(rng, np.random.Generator):
        from pyg_lib_tpu.sampler import _cpp
        if _cpp.get_lib() is not None:
            return _cpp.random_walk_pq_cpp(rowptr, col_sorted, seed,
                                           walk_length, p, q,
                                           _cpp.rng_seed_from(rng))
    # numpy specification: same rejection-sampling algorithm.
    gen = _rng(rng)
    w_p, w_q = 1.0 / p, 1.0 / q
    w_max = max(1.0, w_p, w_q)
    out = np.empty((len(seed), walk_length + 1), np.int64)
    for i, s0 in enumerate(np.asarray(seed, np.int64)):
        cur, prev = int(s0), -1
        out[i, 0] = cur
        for s in range(1, walk_length + 1):
            lo, hi = rowptr[cur], rowptr[cur + 1]
            if hi <= lo:
                out[i, s] = cur
                prev = cur
                continue
            if prev < 0:
                nxt = int(col_sorted[lo + gen.integers(hi - lo)])
            else:
                plo, phi = rowptr[prev], rowptr[prev + 1]
                nbrs_prev = col_sorted[plo:phi]
                nxt = None
                for _ in range(64):
                    cand = int(col_sorted[lo + gen.integers(hi - lo)])
                    if cand == prev:
                        w = w_p
                    elif np.searchsorted(nbrs_prev, cand) < len(
                            nbrs_prev) and nbrs_prev[np.searchsorted(
                                nbrs_prev, cand)] == cand:
                        w = 1.0
                    else:
                        w = w_q
                    nxt = cand
                    if gen.uniform() * w_max <= w:
                        break
                else:
                    # 64 rejections (extreme p/q at this node): draw
                    # EXACTLY from the node2vec distribution via the
                    # weighted CDF — keeping the last rejected uniform
                    # candidate would bias the walk toward the rare
                    # regime the weights are meant to suppress.
                    nbrs = col_sorted[lo:hi]
                    pos = np.searchsorted(nbrs_prev, nbrs)
                    in_prev = (pos < len(nbrs_prev)) & (nbrs_prev[
                        np.minimum(pos, max(len(nbrs_prev) - 1, 0))]
                        == nbrs)
                    w_all = np.where(nbrs == prev, w_p,
                                     np.where(in_prev, 1.0, w_q))
                    cdf = np.cumsum(w_all)
                    r = gen.uniform() * cdf[-1]
                    nxt = int(nbrs[min(np.searchsorted(cdf, r, 'right'),
                                       len(nbrs) - 1)])
            out[i, s] = nxt
            prev, cur = cur, nxt
    return out


def random_walk(
    rowptr,
    col,
    seed,
    walk_length: int,
    p: float = 1.0,
    q: float = 1.0,
    rng: Union[None, int, np.random.Generator] = None,
    impl: str = 'auto',
) -> np.ndarray:
    """Random walks of length ``walk_length`` from each seed.

    Parity: reference ``pyg_lib.sampler.random_walk``
    (``pyg_lib/sampler/__init__.py:228-254``; CPU kernel
    ``csrc/sampler/cpu/random_walk_kernel.cpp:12-51``) — and BEYOND it:
    the reference rejects ``p != 1 or q != 1``
    (``random_walk_kernel.cpp:19-20``); here full node2vec second-order
    walks (Grover & Leskovec 2016) run via rejection sampling (accept a
    uniform neighbor with probability w/w_max, w in {1/p, 1, 1/q}).
    A dead-end node repeats itself for the rest of the walk.
    """
    stable = isinstance(rowptr, np.ndarray) and isinstance(col, np.ndarray)
    rowptr, col, seed = _np(rowptr), _np(col), _np(seed)
    if impl == 'cpp':
        # Fail loudly like neighbor_sample: silently running the slow
        # numpy path would invalidate benchmarks/expectations.
        from pyg_lib_tpu.sampler import _cpp
        if _cpp.get_lib() is None:
            raise RuntimeError("impl='cpp' requested but the native "
                               'sampling library is unavailable')
        if isinstance(rng, np.random.Generator):
            raise ValueError("impl='cpp' cannot honor a numpy Generator "
                             'rng; pass an integer seed')
    if p != 1.0 or q != 1.0:
        return _random_walk_pq(rowptr, col, seed, walk_length, p, q, rng,
                               impl, stable)
    if impl != 'numpy' and not isinstance(rng, np.random.Generator):
        from pyg_lib_tpu.sampler import _cpp
        if _cpp.get_lib() is not None:
            return _cpp.random_walk_cpp(rowptr, col, seed, walk_length,
                                        _cpp.rng_seed_from(rng))
    gen = _rng(rng)
    n_seed = len(seed)
    out = np.empty((n_seed, walk_length + 1), dtype=np.int64)
    out[:, 0] = seed
    cur = seed.astype(np.int64).copy()
    for step in range(1, walk_length + 1):
        deg = rowptr[cur + 1] - rowptr[cur]
        has = deg > 0
        offs = np.zeros_like(cur)
        if has.any():
            offs[has] = gen.integers(0, deg[has])
        if len(col):
            nxt = np.where(has, col[np.minimum(rowptr[cur] + offs,
                                               len(col) - 1)], cur)
        else:  # edgeless graph: every node is a dead end and repeats
            nxt = cur
        out[:, step] = nxt
        cur = nxt
    return out
