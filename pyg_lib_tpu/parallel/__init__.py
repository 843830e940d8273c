"""Multi-chip execution: meshes, shardings, halo exchange, train steps.

This subsystem has no counterpart inside the reference (pyg-lib contains no
collective backend — SURVEY.md §2.5); it replaces the reference ecosystem's
METIS + TensorPipe-RPC distribution with TPU-native SPMD:

* :func:`make_mesh` — named device mesh over (data, model) axes.
* :func:`halo_exchange_aggregate` — edge-partitioned full-batch
  aggregation: each device owns a contiguous node shard + the edges whose
  destinations fall in its shard; boundary (halo) source features arrive
  via XLA collectives inside ``shard_map``.
* :func:`make_train_step` — data-parallel (optionally tensor-sharded)
  jitted train step for sampled mini-batches.
"""

from pyg_lib_tpu.parallel.halo import halo_exchange_aggregate
from pyg_lib_tpu.parallel.mesh import make_mesh, named_sharding
from pyg_lib_tpu.parallel.train import make_train_step

__all__ = [
    'make_mesh',
    'named_sharding',
    'halo_exchange_aggregate',
    'make_train_step',
]
from pyg_lib_tpu.parallel.halo import ring_halo_aggregate  # noqa: E402,F401

__all__ = list(dict.fromkeys(list(__all__) + ['ring_halo_aggregate']))
