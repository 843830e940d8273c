"""pyg_lib_tpu: a TPU-native GNN kernel framework.

A ground-up JAX / XLA / Pallas re-design of the capabilities of
`pyg-lib <https://github.com/pyg-team/pyg-lib>`_ (reference v0.9.0):

* ``pyg_lib_tpu.ops`` — segment/scatter reduction family, grouped & segment
  matmul (Pallas grouped GEMM), sparse softmax, fused sampled ops, spline
  ops, geometry ops.  All device ops are jittable, statically shaped, and
  differentiable via ``jax.custom_vjp``.
* ``pyg_lib_tpu.sampler`` — host-side neighbor sampling (uniform / biased /
  temporal / disjoint, homogeneous & heterogeneous), subgraph, random walks,
  and the distributed sampling protocol (sample → merge → relabel).
* ``pyg_lib_tpu.classes`` — stateful host objects (HashMap, NeighborSampler).
* ``pyg_lib_tpu.partition`` — graph partitioning (METIS-style API plus a
  mesh-aware edge partitioner for TPU slices).
* ``pyg_lib_tpu.parallel`` — multi-chip execution: meshes, shardings, halo
  feature exchange over ICI.
* ``pyg_lib_tpu.models`` — reference GNN model implementations (GCN,
  GraphSAGE, R-GCN, GAT) built on the ops above.

The reference's dispatcher layers (TORCH_LIBRARY schemas / CPU / CUDA /
Autograd keys, see reference ``pyg_lib/csrc``) collapse here into plain JAX
functions with ``custom_vjp``; the reference's stateful TorchScript classes
become plain Python objects; its CUDA kernels become Pallas-TPU kernels.
"""

from pyg_lib_tpu import (classes, loader, metrics, models, ops, parallel,
                         partition, profiling, sampler, utils)
from pyg_lib_tpu.home import get_home_dir, set_home_dir
from pyg_lib_tpu._version import __version__


def tpu_version() -> str:
    """The TPU device kind JAX reports, or '' when no TPU is attached.

    Parity with reference ``pyg_lib.cuda_version()``
    (``pyg_lib/__init__.py:43-49``): a runtime probe of the accelerator
    the library was loaded against.
    """
    import jax

    try:
        dev = jax.devices()[0]
    except Exception:
        return ''
    return dev.device_kind if dev.platform == 'tpu' else ''

__all__ = [
    '__version__',
    'tpu_version',
    'classes',
    'metrics',
    'models',
    'ops',
    'parallel',
    'partition',
    'sampler',
    'utils',
]
