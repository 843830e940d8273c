"""Additional model families proving op-surface composition.

The reference library ships no models (it sits below PyG), but its op
surface exists to power these exact architectures downstream; each model
here is the TPU-native composition of the corresponding ops:

* GIN          — ``segment_sum_csr`` (sum aggregation is GIN's whole point)
* EdgeConv     — ``ops.knn`` dynamic graph + dense per-k max (DGCNN)
* PointNet++   — ``ops.fps`` + ``ops.radius`` + ``segment_max_csr`` set
                 abstraction
* node2vec     — ``sampler.random_walk`` skip-gram with negative sampling

Functional style matching ``models.gnn``: ``init_*`` returns a param
pytree; forwards are pure and jittable on padded static shapes.
"""

from typing import Dict, List

import jax
import jax.numpy as jnp

from pyg_lib_tpu.models.gnn import _gather_src, _glorot
from pyg_lib_tpu.ops import segment_max_csr, segment_sum_csr
from pyg_lib_tpu.utils import Array

__all__ = [
    'init_gin', 'gin_forward',
    'init_edgeconv', 'edgeconv_forward',
    'init_pointnet_sa', 'pointnet_sa_forward',
    'init_node2vec', 'node2vec_loss',
]


# -- GIN ----------------------------------------------------------------------


def _init_mlp(key, dims):
    layers = []
    for i in range(len(dims) - 1):
        key, sub = jax.random.split(key)
        layers.append({
            'w': _glorot(sub, (dims[i], dims[i + 1])),
            'b': jnp.zeros((dims[i + 1], )),
        })
    return layers


def _mlp(layers, h, act=jax.nn.relu):
    for i, lyr in enumerate(layers):
        h = h @ lyr['w'] + lyr['b']
        if i < len(layers) - 1:
            h = act(h)
    return h


def init_gin(key, dims: List[int], hidden_mult: int = 2) -> Dict:
    """dims = [in, hidden..., out]; each GIN layer owns a 2-layer MLP and
    a learnable ``eps`` (Xu et al., "How Powerful are GNNs")."""
    layers = []
    for i in range(len(dims) - 1):
        key, sub = jax.random.split(key)
        layers.append({
            'mlp': _init_mlp(sub, [dims[i], hidden_mult * dims[i + 1],
                                   dims[i + 1]]),
            'eps': jnp.zeros(()),
        })
    return {'layers': layers}


def gin_forward(params: Dict, x: Array, rowptr: Array,
                row: Array) -> Array:
    """``h = MLP((1 + eps) · h + Σ_{j∈N(i)} h_j)`` per layer.

    Sum aggregation via ``segment_sum_csr`` (the injective aggregator is
    the model's defining choice). Padded-batch contract as
    ``models.gnn``: pad edges sit past ``rowptr[-1]``.
    """
    h = x
    for i, lyr in enumerate(params['layers']):
        agg = segment_sum_csr(_gather_src(h, row), rowptr)[:h.shape[0]]
        h = _mlp(lyr['mlp'], (1.0 + lyr['eps']) * h + agg)
        if i < len(params['layers']) - 1:
            h = jax.nn.relu(h)
    return h


# -- EdgeConv / DGCNN ---------------------------------------------------------


def init_edgeconv(key, dims: List[int], hidden_mult: int = 1) -> Dict:
    """One MLP per EdgeConv layer over ``[h_i, h_j - h_i]`` features."""
    layers = []
    for i in range(len(dims) - 1):
        key, sub = jax.random.split(key)
        layers.append({
            'mlp': _init_mlp(sub, [2 * dims[i],
                                   hidden_mult * dims[i + 1],
                                   dims[i + 1]]),
        })
    return {'layers': layers}


def edgeconv_forward(params: Dict, x: Array, knn_idx: Array,
                     k: int) -> Array:
    """DGCNN EdgeConv: ``h_i = max_{j∈knn(i)} MLP([h_i, h_j − h_i])``.

    ``knn_idx`` is ``ops.knn(x, x, k)`` output (``[2, N*k]``; row 0 the
    query, row 1 the neighbor) — exactly ``k`` neighbors per node, so the
    max pools densely over a ``[N, k, F]`` view (no segment op, fully
    static shapes: the TPU-idiomatic form of the reference's
    knn-then-scatter_max composition). The graph is *static across
    layers* here (pass fresh ``knn_idx`` per layer for the dynamic-graph
    DGCNN variant).
    """
    n = x.shape[0]
    nbr = knn_idx[1].reshape(n, k)
    h = x
    for lyr in params['layers']:
        hj = jnp.take(h, nbr, axis=0)  # [N, k, F]
        hi = h[:, None, :]
        edge = jnp.concatenate([jnp.broadcast_to(hi, hj.shape), hj - hi],
                               axis=-1)
        msg = _mlp(lyr['mlp'], edge)  # [N, k, F']
        h = jnp.max(msg, axis=1)
    return h


# -- PointNet++ set abstraction ----------------------------------------------


def init_pointnet_sa(key, in_dim: int, mlp_dims: List[int]) -> Dict:
    """One set-abstraction level: MLP over grouped (relative pos ++
    features), max-pooled per centroid."""
    return {'mlp': _init_mlp(key, [in_dim + 3] + mlp_dims)}


def pointnet_sa_forward(params: Dict, pos: Array, feat, centroid_idx,
                        rowptr: Array, col: Array):
    """PointNet++ SA level on a precomputed grouping.

    Host side builds the grouping once per batch with the geometry ops::

        ptr = np.array([0, n])
        centroid_idx = ops.fps(pos, ptr, ratio)             # [M]
        pairs = ops.radius(pos, pos[centroid_idx], r, cap)  # [2, M*cap]

    and converts ``pairs`` to a CSR (``rowptr`` over centroids, ``col``
    point ids, pad entries past ``rowptr[-1]``). Device side (this
    function, jittable): per-centroid ``max`` over
    ``MLP([pos_j − pos_i, feat_j])`` via ``segment_max_csr``.

    Returns ``(new_pos [M,3], new_feat [M, mlp_dims[-1]])``.
    """
    m = centroid_idx.shape[0]
    cpos = jnp.take(pos, centroid_idx, axis=0)  # [M, 3]
    pj = _gather_src(pos, col)
    # owner centroid of each grouped point, from the CSR
    owner = jnp.searchsorted(rowptr,
                             jnp.arange(col.shape[0], dtype=rowptr.dtype),
                             side='right') - 1
    owner = jnp.clip(owner, 0, m - 1)
    rel = pj - jnp.take(cpos, owner, axis=0)
    h = rel if feat is None else jnp.concatenate(
        [rel, _gather_src(feat, col)], axis=-1)
    h = _mlp(params['mlp'], h)
    pooled = segment_max_csr(h, rowptr)[0][:m]
    return cpos, pooled


# -- node2vec -----------------------------------------------------------------


def init_node2vec(key, num_nodes: int, dim: int) -> Dict:
    scale = 1.0 / dim**0.5
    return {
        'emb': jax.random.normal(key, (num_nodes, dim)) * scale,
    }


def node2vec_loss(params: Dict, walks: Array, neg: Array,
                  window: int = 2) -> Array:
    """Skip-gram with negative sampling over random walks.

    ``walks`` is ``sampler.random_walk`` output (``[B, L+1]`` node ids),
    ``neg`` ``[B, num_neg]`` uniformly drawn negatives. Positive pairs
    are (walk[t], walk[t+d]) for d in 1..window (node2vec/word2vec
    objective: ``-log σ(z_u·z_v) − Σ log σ(−z_u·z_n)``). Jittable;
    differentiable through the embedding table.
    """
    emb = params['emb']
    z = jnp.take(emb, walks, axis=0)  # [B, L+1, D]
    loss = 0.0
    count = 0
    for d in range(1, window + 1):
        zu, zv = z[:, :-d], z[:, d:]
        logits = jnp.sum(zu * zv, axis=-1)
        loss = loss - jnp.mean(jax.nn.log_sigmoid(logits))
        count += 1
    zn = jnp.take(emb, neg, axis=0)  # [B, K, D]
    anchor = z[:, 0:1, :]
    neg_logits = jnp.sum(anchor * zn, axis=-1)
    loss = loss - jnp.mean(jax.nn.log_sigmoid(-neg_logits))
    return loss / (count + 1)
