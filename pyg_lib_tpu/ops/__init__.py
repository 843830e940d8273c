"""Device ops: the full reference op surface
(parity target: reference ``pyg_lib/ops/__init__.py`` ``__all__``).
"""

from pyg_lib_tpu.ops.composite import (
    scatter_log_softmax,
    scatter_logsumexp,
    scatter_softmax,
    scatter_std,
)
from pyg_lib_tpu.ops.geometry import (
    edge_sample,
    fps,
    graclus_cluster,
    grid_cluster,
    knn,
    nearest,
    radius,
)
from pyg_lib_tpu.ops.index_sort import index_sort
from pyg_lib_tpu.ops.matmul import grouped_matmul, segment_matmul
from pyg_lib_tpu.ops.sampled import (
    sampled_add,
    sampled_div,
    sampled_mul,
    sampled_sub,
)
from pyg_lib_tpu.ops.scatter import (
    scatter,
    scatter_add,
    scatter_max,
    scatter_mean,
    scatter_min,
    scatter_mul,
    scatter_sum,
)
from pyg_lib_tpu.ops.scatter_reduce import fused_scatter_reduce
from pyg_lib_tpu.ops.segment_coo import (
    gather_coo,
    segment_add_coo,
    segment_coo,
    segment_max_coo,
    segment_mean_coo,
    segment_min_coo,
    segment_sum_coo,
)
from pyg_lib_tpu.ops.segment_csr import (
    gather_csr,
    segment_add_csr,
    segment_csr,
    segment_max_csr,
    segment_mean_csr,
    segment_min_csr,
    segment_sum_csr,
)
from pyg_lib_tpu.ops.softmax import softmax_csr
from pyg_lib_tpu.ops.spline import spline_basis, spline_weighting
from pyg_lib_tpu.ops.spmm import (ShardedSpmmGraph, SpmmGraph,
                                  build_spmm_graph,
                                  build_spmm_graph_sharded,
                                  build_weighted_fused_graph, sddmm,
                                  spmm_sharded,
                                  RangeSpmmPlan,
                                  segment_max_padded,
                                  segment_min_padded,
                                  segment_softmax_padded,
                                  segment_sum_padded, spmm, spmm_csr)

__all__ = [
    'spmm',
    'spmm_csr',
    'spmm_sharded',
    'RangeSpmmPlan',
    'ShardedSpmmGraph',
    'build_spmm_graph_sharded',
    'sddmm',
    'build_weighted_fused_graph',
    'build_spmm_graph',
    'SpmmGraph',
    'segment_sum_padded',
    'segment_softmax_padded',
    'segment_max_padded',
    'segment_min_padded',
    'grouped_matmul',
    'segment_matmul',
    'sampled_add',
    'sampled_sub',
    'sampled_mul',
    'sampled_div',
    'index_sort',
    'softmax_csr',
    'scatter_sum',
    'scatter_add',
    'scatter_mul',
    'scatter_mean',
    'scatter_min',
    'scatter_max',
    'segment_sum_coo',
    'segment_add_coo',
    'segment_mean_coo',
    'segment_min_coo',
    'segment_max_coo',
    'gather_coo',
    'segment_sum_csr',
    'segment_add_csr',
    'segment_mean_csr',
    'segment_min_csr',
    'segment_max_csr',
    'gather_csr',
    'scatter',
    'segment_coo',
    'segment_csr',
    'scatter_softmax',
    'scatter_log_softmax',
    'scatter_std',
    'scatter_logsumexp',
    'spline_basis',
    'spline_weighting',
    'grid_cluster',
    'fps',
    'knn',
    'radius',
    'nearest',
    'graclus_cluster',
    'edge_sample',
    'fused_scatter_reduce',
]
