"""Functional GNN layers/models on padded batches.

All forwards take the padded-batch arrays produced by
``pyg_lib_tpu.sampler.padding`` (static shapes: ``x [N, F]``,
``rowptr [N+1]`` CSR over destination nodes, ``row [E]`` source local ids
CSR-sorted by destination; pad edges sit past ``rowptr[-1]`` and are
dropped by the segment ops).  Message passing is
``gather(x, row) -> segment_*_csr(msgs, rowptr)`` — the canonical SpMM
decomposition (SURVEY.md §3.3).
"""

from typing import Dict, List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pyg_lib_tpu.ops import (
    scatter_softmax,
    segment_matmul,
    segment_max_csr,
    segment_mean_csr,
    segment_sum_csr,
)
from pyg_lib_tpu.utils import Array


def _glorot(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[-2], shape[-1]
    limit = (6.0 / (fan_in + fan_out))**0.5
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def _gather_src(x: Array, row: Array) -> Array:
    # Pad slots carry row == N (one past last); clip — their contribution is
    # dropped by the CSR segment op anyway (they sit past rowptr[-1]).
    return jnp.take(x, jnp.minimum(row, x.shape[0] - 1), axis=0)


# -- GCN ----------------------------------------------------------------------


def init_gcn(key, dims: List[int]) -> Dict:
    """dims = [in, hidden..., out]; one weight+bias per layer."""
    layers = []
    for i in range(len(dims) - 1):
        key, sub = jax.random.split(key)
        layers.append({
            'w': _glorot(sub, (dims[i], dims[i + 1])),
            'b': jnp.zeros((dims[i + 1], )),
        })
    return {'layers': layers}


def gcn_forward(params: Dict, x: Array, rowptr: Array, row: Array) -> Array:
    """Kipf-Welling GCN with symmetric in-batch degree normalisation
    (BASELINE.json config 1)."""
    deg = (rowptr[1:] - rowptr[:-1]).astype(x.dtype)
    inv_sqrt = jax.lax.rsqrt(jnp.maximum(deg, 1.0))
    n = x.shape[0]
    for i, layer in enumerate(params['layers']):
        h = jnp.dot(x, layer['w'], preferred_element_type=x.dtype)
        msgs = _gather_src(h * inv_sqrt[:, None], row)
        agg = segment_sum_csr(msgs, rowptr)[:n]
        x = agg * inv_sqrt[:, None] + h * inv_sqrt[:, None]**2 + layer['b']
        if i < len(params['layers']) - 1:
            x = jax.nn.relu(x)
    return x


# -- GraphSAGE ----------------------------------------------------------------


def init_sage(key, dims: List[int]) -> Dict:
    layers = []
    for i in range(len(dims) - 1):
        key, k1, k2 = jax.random.split(key, 3)
        layers.append({
            'w_self': _glorot(k1, (dims[i], dims[i + 1])),
            'w_nbr': _glorot(k2, (dims[i], dims[i + 1])),
            'b': jnp.zeros((dims[i + 1], )),
        })
    return {'layers': layers}


def sage_forward(params: Dict, x: Array, rowptr: Array, row: Array,
                 aggr: str = 'mean') -> Array:
    """GraphSAGE (mean or max aggregator) — BASELINE.json configs 2/3."""
    n = x.shape[0]
    for i, layer in enumerate(params['layers']):
        msgs = _gather_src(x, row)
        if aggr == 'mean':
            agg = segment_mean_csr(msgs, rowptr)[:n]
        elif aggr == 'max':
            agg = segment_max_csr(msgs, rowptr)[0][:n]
        else:
            raise ValueError(f'Unknown aggr: {aggr!r}')
        x = (jnp.dot(x, layer['w_self'], preferred_element_type=x.dtype) +
             jnp.dot(agg, layer['w_nbr'], preferred_element_type=x.dtype) +
             layer['b'])
        if i < len(params['layers']) - 1:
            x = jax.nn.relu(x)
    return x


# -- GAT ----------------------------------------------------------------------


def init_gat(key, dims: List[int], heads: int = 4) -> Dict:
    layers = []
    for i in range(len(dims) - 1):
        key, k1, k2, k3 = jax.random.split(key, 4)
        out = dims[i + 1]
        # Hidden layers concatenate heads, so layer i>0 consumes H*dims[i].
        in_dim = dims[i] if i == 0 else heads * dims[i]
        layers.append({
            'w': _glorot(k1, (in_dim, heads * out)),
            'att_src': _glorot(k2, (1, heads, out)),
            'att_dst': _glorot(k3, (1, heads, out)),
            'b': jnp.zeros((out * heads if i < len(dims) - 2 else out, )),
        })
    return {'layers': layers, 'heads': heads}


def gat_forward(params: Dict, x: Array, rowptr: Array, row: Array,
                col: Array) -> Array:
    """Graph attention with per-destination softmax over incoming edges
    (uses ``scatter_softmax``; pad edges carry ``col == N`` and are
    dropped)."""
    heads = params['heads']
    n = x.shape[0]
    num_layers = len(params['layers'])
    for i, layer in enumerate(params['layers']):
        out_dim = layer['att_src'].shape[-1]
        h = jnp.dot(x, layer['w'],
                    preferred_element_type=x.dtype).reshape(n, heads, out_dim)
        a_src = (h * layer['att_src']).sum(-1)  # [N, H]
        a_dst = (h * layer['att_dst']).sum(-1)
        src = jnp.minimum(row, n - 1)
        dst = jnp.minimum(col, n - 1)
        logits = jax.nn.leaky_relu(a_src[src] + a_dst[dst], 0.2)  # [E, H]
        # mask pad edges to -inf so they get zero attention
        pad = (col >= n)[:, None]
        logits = jnp.where(pad, -jnp.inf, logits)
        alpha = scatter_softmax(logits, dst, dim=0, dim_size=n)  # [E, H]
        alpha = jnp.where(pad, 0.0, alpha)
        msgs = h[src] * alpha[:, :, None]  # [E, H, D]
        agg = segment_sum_csr(msgs.reshape(msgs.shape[0], -1),
                              rowptr)[:n].reshape(n, heads, out_dim)
        if i < num_layers - 1:
            x = jax.nn.elu(agg.reshape(n, heads * out_dim) + layer['b'])
        else:
            x = agg.mean(axis=1) + layer['b']
    return x


# -- R-GCN --------------------------------------------------------------------


def init_rgcn(key, dims: List[int], num_relations: int) -> Dict:
    """Relational GCN: one weight per (layer, relation) + a root weight
    (BASELINE.json config 4: ogbn-mag)."""
    layers = []
    for i in range(len(dims) - 1):
        key, k1, k2 = jax.random.split(key, 3)
        layers.append({
            'w_rel': _glorot(k1, (num_relations, dims[i], dims[i + 1])),
            'w_root': _glorot(k2, (dims[i], dims[i + 1])),
            'b': jnp.zeros((dims[i + 1], )),
        })
    return {'layers': layers}


def rgcn_forward(params: Dict, x: Array, row: Array, col: Array,
                 rel_ptr: Array) -> Array:
    """R-GCN over a batch whose edges are grouped (sorted) by relation type.

    ``rel_ptr [R+1]`` bounds each relation's contiguous edge range (the
    hetero sampler emits per-edge-type blocks; ``segment_matmul`` applies
    the per-relation transform in one ragged GEMM — the reference's hetero
    hot path, SURVEY.md §3.2).  Aggregation is the canonical R-GCN
    per-relation mean (Schlichtkrull's 1/c_{i,r}), matching
    :func:`rgcn_forward_spmm`: messages are divided by the (dst,
    relation) in-count before an unsorted scatter-sum over ``col``; pad
    edges carry ``col == N`` and are dropped.
    """
    from pyg_lib_tpu.ops import scatter_sum

    n = x.shape[0]
    num_rel = params['layers'][0]['w_rel'].shape[0]
    e = row.shape[0]
    # Relation id per edge from the rel_ptr boundaries (edges are
    # relation-sorted), then per-(dst, relation) counts for 1/c_{i,r}.
    rel_id = jnp.clip(
        jnp.searchsorted(rel_ptr, jnp.arange(e), side='right') - 1, 0,
        num_rel - 1).astype(jnp.int32)
    key = jnp.minimum(col, n) * num_rel + rel_id
    counts = scatter_sum(jnp.ones((e, ), jnp.float32), key, dim=0,
                         dim_size=(n + 1) * num_rel)
    inv = 1.0 / jnp.maximum(counts, 1.0)
    for i, layer in enumerate(params['layers']):
        msgs = _gather_src(x, row)  # [E, F_in]
        transformed = segment_matmul(msgs, rel_ptr, layer['w_rel'])
        transformed = transformed * inv[key][:, None].astype(x.dtype)
        agg = scatter_sum(transformed, jnp.minimum(col, n), dim=0,
                          dim_size=n + 1)[:n]
        x = (agg +
             jnp.dot(x, layer['w_root'], preferred_element_type=x.dtype) +
             layer['b'])
        if i < len(params['layers']) - 1:
            x = jax.nn.relu(x)
    return x


def gcn_forward_spmm(params: Dict, x: Array, graph) -> Array:
    """Full-graph GCN over a prebuilt :class:`pyg_lib_tpu.ops.SpmmGraph`.

    Same math as :func:`gcn_forward` but the aggregation is the planned
    fused gather+reduce (``ops.spmm``) — the production full-batch path
    (bench.py headline).  ``graph.deg`` supplies the degrees.
    """
    from pyg_lib_tpu.ops import spmm

    deg = graph.deg.astype(x.dtype)
    inv_sqrt = jax.lax.rsqrt(jnp.maximum(deg, 1.0))
    for i, layer in enumerate(params['layers']):
        h = jnp.dot(x, layer['w'], preferred_element_type=x.dtype)
        agg = spmm(h * inv_sqrt[:, None], graph)
        x = agg * inv_sqrt[:, None] + h * inv_sqrt[:, None]**2 + layer['b']
        if i < len(params['layers']) - 1:
            x = jax.nn.relu(x)
    return x


def init_gat_spmm(key, dims: List[int], heads: int = 4) -> Dict:
    """Planned-GAT parameters: per layer W [in, heads*out_h] and attention
    vectors a_src/a_dst [heads, out_h]."""
    layers = []
    for i in range(len(dims) - 1):
        if dims[i + 1] % heads:
            raise ValueError(
                f'dims[{i + 1}]={dims[i + 1]} not divisible by '
                f'heads={heads}')
        key, k1, k2, k3 = jax.random.split(key, 4)
        out_h = dims[i + 1] // heads
        layers.append({
            'w': _glorot(k1, (dims[i], heads * out_h)),
            'a_src': _glorot(k2, (heads, out_h)),
            'a_dst': _glorot(k3, (heads, out_h)),
        })
    return {'layers': layers}


def gat_forward_spmm(params: Dict, x: Array, graph) -> Array:
    """Full-graph GAT over a plan built ``with_edge_maps=True``.

    Every per-edge stage runs in the plan's padded coordinates: one
    feature gather in, fused Pallas softmax for the attention, and the
    chunked membership-matmul kernel for the weighted aggregation — no
    per-edge re-permutations (compare ``gat_forward``, the padded-batch
    path).  The head count must divide 128's multiple with the head dim
    so the packed width stays lane-aligned.
    """
    from pyg_lib_tpu.ops import segment_softmax_padded, segment_sum_padded

    plan = graph.fwd
    for i, layer in enumerate(params['layers']):
        heads, out_h = layer['a_src'].shape
        h = jnp.dot(x, layer['w'], preferred_element_type=x.dtype)
        n, hf = h.shape
        hh = h.reshape(n, heads, out_h)
        s_src = jnp.einsum('nho,ho->nh', hh, layer['a_src'])
        s_dst = jnp.einsum('nho,ho->nh', hh, layer['a_dst'])
        # Padded-edge attention logits, one column block of 128 lanes per
        # softmax invocation: tile the head logits across lanes.
        logits = (jnp.take(s_src, plan.col_padded, axis=0) +
                  jnp.take(s_dst, plan.row_padded, axis=0))  # [E_pad, H]
        logits = jax.nn.leaky_relu(logits, negative_slope=0.2)
        # The Pallas softmax kernel needs a lane-aligned (multiple of 128)
        # feature width: tile the head logits across lanes and zero-pad the
        # remainder when heads does not divide 128 (e.g. heads=12 -> width
        # 120 -> pad to 128; pad columns compute a softmax of zeros that is
        # sliced away).
        rep = max(128 // heads, 1)
        tiled = jnp.tile(logits, (1, rep))
        pad = (-tiled.shape[1]) % 128
        if pad:
            tiled = jnp.pad(tiled, ((0, 0), (0, pad)))
        alpha = segment_softmax_padded(tiled, plan)[:, :heads]  # [E_pad, H]
        msgs = jnp.take(h, plan.col_padded, axis=0).reshape(
            -1, heads, out_h)
        msgs = (msgs * alpha[:, :, None]).reshape(-1, hf)
        x = segment_sum_padded(msgs, plan)
        if i < len(params['layers']) - 1:
            x = jax.nn.elu(x)
    return x


def sage_maxpool_forward_spmm(params: Dict, x: Array, graph) -> Array:
    """Full-graph GraphSAGE with max-pooling aggregation (Hamilton et al.
    variant) over a plan built ``with_edge_maps=True``: neighbor features
    pass through a pooling MLP, are max-reduced per destination via
    :func:`pyg_lib_tpu.ops.segment_max_padded`, then concatenated with the
    self features. Reuses :func:`init_sage` parameters (the pool MLP
    shares the neighbor weight)."""
    from pyg_lib_tpu.ops import segment_max_padded

    plan = graph.fwd
    for i, layer in enumerate(params['layers']):
        h_pool = jax.nn.relu(
            jnp.dot(x, layer['w_nbr'], preferred_element_type=x.dtype))
        msgs = jnp.take(h_pool, plan.col_padded, axis=0)
        agg = segment_max_padded(msgs, plan)
        x = (jnp.dot(x, layer['w_self'], preferred_element_type=x.dtype) +
             agg + layer['b'])
        if i < len(params['layers']) - 1:
            x = jax.nn.relu(x)
    return x


def build_rgcn_graphs(rowptr_dict, col_dict, num_nodes_dict, chunk=512,
                      dedup='auto'):
    """Per-relation :class:`pyg_lib_tpu.ops.SpmmGraph` plans for
    :func:`rgcn_forward_spmm` (host-side, one-time).

    ``rowptr_dict[(src, rel, dst)]`` is the dst-major CSR of that
    relation (rowptr over dst nodes of the dst type, col = src ids of
    the src type). ``dedup='auto'`` (default) lets each relation pick
    the dedup-gather schedule when its in-degree skew pays for it
    (real hetero graphs are hub-heavy; see ``pallas/spmm_dedup``).
    """
    from pyg_lib_tpu.ops import build_spmm_graph

    graphs = {}
    for k, rowptr in rowptr_dict.items():
        src_t = k[0]
        graphs[k] = build_spmm_graph(rowptr, col_dict[k], chunk=chunk,
                                     num_cols=num_nodes_dict[src_t],
                                     dedup=dedup)
    return graphs


def rgcn_forward_spmm(params: Dict, x_dict: Dict, graphs: Dict) -> Dict:
    """Full-graph R-GCN over per-relation SpMM plans.

    Per layer and relation ``(src, rel, dst)``: transform the SOURCE
    nodes (cheaper than per-edge transforms since E >= N), then run the
    planned gather+reduce into the dst type — no materialised per-edge
    messages, unlike the padded-batch :func:`rgcn_forward` path.

    ``params['layers'][i]['w'][rel_index]`` are the relation weights in
    the order of ``sorted(graphs)``; ``params['layers'][i]['w_self']``
    is the per-type self transform (shared across types).
    """
    from pyg_lib_tpu.ops import spmm

    rels = sorted(graphs)
    for i, layer in enumerate(params['layers']):
        out = {
            t: jnp.dot(h, layer['w_self'],
                       preferred_element_type=h.dtype) + layer['b']
            for t, h in x_dict.items()
        }
        for ri, k in enumerate(rels):
            src_t, _, dst_t = k
            h = jnp.dot(x_dict[src_t], layer['w'][ri],
                        preferred_element_type=x_dict[src_t].dtype)
            agg = spmm(h, graphs[k], reduce='mean')
            out[dst_t] = out[dst_t] + agg[:out[dst_t].shape[0]]
        x_dict = out
        if i < len(params['layers']) - 1:
            x_dict = {t: jax.nn.relu(v) for t, v in x_dict.items()}
    return x_dict


def init_rgcn_spmm(key, dims: List[int], num_relations: int) -> Dict:
    """Parameters for :func:`rgcn_forward_spmm` (all types share dims)."""
    layers = []
    for i in range(len(dims) - 1):
        key, k1, k2 = jax.random.split(key, 3)
        layers.append({
            'w': _glorot(k1, (num_relations, dims[i], dims[i + 1])),
            'w_self': _glorot(k2, (dims[i], dims[i + 1])),
            'b': jnp.zeros((dims[i + 1], )),
        })
    return {'layers': layers}


class HeteroSpmmPlan(NamedTuple):
    """Fused hetero aggregation schedule (host-built, one-time).

    Relations targeting one dst type merge into ONE stacked plan: per dst
    node, its edges across all relations concatenate (relation-major),
    and cols offset into a virtual stack of per-relation source features.
    A layer then needs exactly one grouped GEMM (``segment_matmul`` /
    ragged_dot over the relation segments) plus one chunked reduce per
    dst type — versus one dense dot + one spmm PER RELATION in
    :func:`rgcn_forward_spmm`. The per-relation mean normalisation
    (R-GCN, 1/|N_r(v)|) rides along as a per-edge scale in padded
    coordinates (SURVEY.md §7 hard part 2: relation sizes vary 100x on
    ogbn-mag, which ragged_dot absorbs without padding waste).
    """
    graphs: Dict  # dst type -> SpmmGraph (stacked, with_edge_maps=True)
    deginv: Dict  # dst type -> [E_pad] f32 per-edge 1/deg_r(dst)
    rel_order: tuple  # relations in stack order
    src_ptr: 'np.ndarray'  # [R+1] row offsets of x_cat segments
    num_nodes: Dict  # node type -> count


from pyg_lib_tpu.utils.pytree import register_plan_pytree  # noqa: E402

register_plan_pytree(HeteroSpmmPlan,
                     ('rel_order', 'src_ptr', 'num_nodes'))


def build_rgcn_planned(rowptr_dict, col_dict, num_nodes_dict,
                       chunk: int = 512,
                       range_sliced: bool = False) -> HeteroSpmmPlan:
    """Stack per-relation CSRs into one plan per dst type (host-side).

    ``range_sliced=True`` builds each dst type's plan as a weighted
    fused-range plan whose column ranges are the per-relation segments
    of the stacked source space: the aggregation keeps the fused form's
    single dispatch, but every gather reads ONE relation's (small)
    transformed table slice instead of the full stack — the stacked
    gather's large-operand transaction cost is what made the fused path
    lose 2.3x to per-relation plans on the ogbn-mag-shaped bench
    (BENCHMARKS.md). The 1/deg_r(dst) mean normalisation bakes into the
    plan as per-edge weights.
    """
    from pyg_lib_tpu.ops import build_spmm_graph, build_weighted_fused_graph

    rel_order = tuple(sorted(rowptr_dict))
    src_ptr = np.zeros(len(rel_order) + 1, np.int64)
    for i, k in enumerate(rel_order):
        src_ptr[i + 1] = src_ptr[i] + num_nodes_dict[k[0]]

    graphs, deginv = {}, {}
    for dst_t in sorted({k[2] for k in rel_order}):
        ks = [(i, k) for i, k in enumerate(rel_order) if k[2] == dst_t]
        n_dst = num_nodes_dict[dst_t]
        # Relation-major edge concat per dst node, vectorised: concatenate
        # per-relation (row, col+offset, 1/deg) triples in relation order
        # and stable-sort by row — stability keeps the relation-major
        # within-row order without any per-node Python loop.
        rows_all, cols_all, dinv_all = [], [], []
        for ri, k in ks:
            rp = np.asarray(rowptr_dict[k], dtype=np.int64)
            cl = np.asarray(col_dict[k], dtype=np.int64)
            deg_r = np.diff(rp)
            rows_all.append(np.repeat(np.arange(n_dst, dtype=np.int64),
                                      deg_r))
            cols_all.append(cl + src_ptr[ri])
            with np.errstate(divide='ignore'):
                per_row = np.where(deg_r > 0, 1.0 / deg_r, 0.0)
            dinv_all.append(np.repeat(per_row, deg_r).astype(np.float32))
        rows_cat = np.concatenate(rows_all)
        order = np.argsort(rows_cat, kind='stable')
        col = np.concatenate(cols_all)[order]
        dinv = np.concatenate(dinv_all)[order]
        rowptr = np.zeros(n_dst + 1, np.int64)
        np.cumsum(np.bincount(rows_cat, minlength=n_dst), out=rowptr[1:])
        if range_sliced:
            graphs[dst_t] = build_weighted_fused_graph(
                rowptr, col, int(src_ptr[-1]),
                bounds=[(int(src_ptr[ri]), int(src_ptr[ri + 1]))
                        for ri, _ in ks],
                edge_weight=dinv, chunk=chunk)
            continue
        g = build_spmm_graph(rowptr, col, chunk=chunk,
                             with_edge_maps=True,
                             num_cols=int(src_ptr[-1]))
        graphs[dst_t] = g
        # Padded-space 1/deg from the HOST layout: reading plan.edge_pos
        # back from the device runs at tunnel speed (measured ~2 min for
        # 12 MB on axon) — recompute the slot map on host instead.
        from pyg_lib_tpu.ops.pallas.spmm_chunked import _build_padded_layout
        orig, valid, _, _, _ = _build_padded_layout(rowptr, chunk)
        if len(dinv):
            dp = np.where(valid,
                          dinv[np.minimum(orig, len(dinv) - 1)],
                          0.0).astype(np.float32)
        else:  # dst type with zero edges: all slots are padding
            dp = np.zeros(len(orig), np.float32)
        deginv[dst_t] = jnp.asarray(dp)
    return HeteroSpmmPlan(graphs=graphs, deginv=deginv,
                          rel_order=rel_order, src_ptr=src_ptr,
                          num_nodes=dict(num_nodes_dict))


def rgcn_forward_planned(params: Dict, x_dict: Dict,
                         hplan: HeteroSpmmPlan) -> Dict:
    """R-GCN layer stack over the fused hetero plan.

    Numerically identical to :func:`rgcn_forward_spmm` (same params:
    ``init_rgcn_spmm`` with relations in ``sorted`` order): per layer,
    one ``segment_matmul`` transforms the stacked per-relation sources,
    then each dst type runs ONE weighted chunked reduce over all its
    relations at once.
    """
    from pyg_lib_tpu.ops import segment_matmul, segment_sum_padded, spmm
    from pyg_lib_tpu.ops.pallas.spmm_range_fused import FusedRangePlan

    rels = hplan.rel_order
    ptr = jnp.asarray(hplan.src_ptr)
    for i, layer in enumerate(params['layers']):
        out = {
            t: jnp.dot(h, layer['w_self'],
                       preferred_element_type=h.dtype) + layer['b']
            for t, h in x_dict.items()
        }
        x_cat = jnp.concatenate([x_dict[k[0]] for k in rels], axis=0)
        h_cat = segment_matmul(x_cat, ptr, layer['w'])
        for dst_t, g in hplan.graphs.items():
            plan = g.fwd
            if isinstance(plan, FusedRangePlan):
                # range-sliced form: per-relation slice gathers, one
                # fused weighted reduce (weights = 1/deg_r baked in).
                agg = spmm(h_cat, g)
            else:
                msgs = jnp.take(h_cat, plan.col_padded, axis=0)
                msgs = msgs * hplan.deginv[dst_t][:, None].astype(
                    msgs.dtype)
                agg = segment_sum_padded(msgs, plan).astype(h_cat.dtype)
            out[dst_t] = out[dst_t] + agg[:out[dst_t].shape[0]]
        x_dict = out
        if i < len(params['layers']) - 1:
            x_dict = {t: jax.nn.relu(v) for t, v in x_dict.items()}
    return x_dict
