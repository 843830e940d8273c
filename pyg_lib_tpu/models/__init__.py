"""Reference GNN models built on pyg_lib_tpu ops.

The reference library ships no models (it sits below PyG); these exist to
(a) prove the op surface composes into the BASELINE.json milestone configs
(Cora GCN, Reddit/ogbn-products GraphSAGE, ogbn-mag R-GCN) and (b) anchor
the end-to-end benchmarks.  Functional style: ``init_*`` returns a param
pytree, ``*_forward`` is a pure jittable function over a
:class:`pyg_lib_tpu.sampler.padding.PaddedBatch`-shaped input.
"""

from pyg_lib_tpu.models.extra import (
    edgeconv_forward,
    gin_forward,
    init_edgeconv,
    init_gin,
    init_node2vec,
    init_pointnet_sa,
    node2vec_loss,
    pointnet_sa_forward,
)
from pyg_lib_tpu.models.gnn import (
    gat_forward,
    gcn_forward,
    gat_forward_spmm,
    gcn_forward_spmm,
    init_gat_spmm,
    init_gat,
    init_gcn,
    init_rgcn,
    init_sage,
    build_rgcn_graphs,
    init_rgcn_spmm,
    rgcn_forward,
    rgcn_forward_spmm,
    sage_forward,
    sage_maxpool_forward_spmm,
)

__all__ = [
    'init_gcn',
    'gcn_forward',
    'gcn_forward_spmm',
    'init_sage',
    'sage_forward',
    'sage_maxpool_forward_spmm',
    'init_gat',
    'gat_forward',
    'init_gat_spmm',
    'gat_forward_spmm',
    'init_rgcn',
    'rgcn_forward',
    'init_rgcn_spmm',
    'rgcn_forward_spmm',
    'build_rgcn_graphs',
    'init_gin',
    'gin_forward',
    'init_edgeconv',
    'edgeconv_forward',
    'init_pointnet_sa',
    'pointnet_sa_forward',
    'init_node2vec',
    'node2vec_loss',
]
