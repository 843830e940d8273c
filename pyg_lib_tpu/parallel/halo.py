"""Edge-partitioned aggregation with halo feature exchange.

Replaces the reference ecosystem's RPC-based remote feature fetch
(SURVEY.md §3.5: PyG's torch_geometric.distributed does TensorPipe RPC per
partition) with device collectives over ICI inside ``shard_map``.

Partition layout (produced by ``pyg_lib_tpu.partition.mesh_edge_partition``):

* nodes are range-partitioned: device ``i`` owns rows
  ``[i*N/D, (i+1)*N/D)`` of the feature matrix ``x`` (sharded ``P(axis)``),
* each device owns the edges whose DESTINATION falls in its node shard,
  as a local CSR (``rowptr [N/D+1]`` over local destinations, ``src [E_i]``
  global source ids, padded to a common ``E_max`` per device).

v1 exchange strategy: ``all_gather`` of the source features over the axis
(full halo) followed by local gather + ``segment_sum_csr``.  This is the
correct baseline; the ring/`ppermute` overlap variant (SURVEY.md §7 hard
part 4) plugs in behind the same signature.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from pyg_lib_tpu.ops import segment_sum_csr

__all__ = ['halo_exchange_aggregate', 'ring_halo_aggregate']


def halo_exchange_aggregate(mesh: Mesh, x, src_ids, rowptr,
                            axis: str = 'data'):
    """Computes per-destination sums of source features across an
    edge-partitioned graph.

    Args:
        mesh: device mesh containing ``axis``.
        x: ``[N, F]`` node features, sharded ``P(axis, None)``.
        src_ids: ``[D, E_max]`` per-device global source ids (row ``i`` for
            device ``i``; pad slots must point past ``rowptr[-1]``),
            sharded ``P(axis, None)``.
        rowptr: ``[D, N/D + 1]`` per-device local CSR pointers, sharded
            ``P(axis, None)``.

    Returns:
        ``[N, F]`` aggregated features, sharded like ``x``.
    """

    def local(x_shard, src_shard, rowptr_shard):
        # Halo: fetch all source features over ICI (v1: full all-gather).
        xg = jax.lax.all_gather(x_shard, axis, axis=0, tiled=True)  # [N, F]
        src = src_shard[0]
        msgs = jnp.take(xg, jnp.minimum(src, xg.shape[0] - 1), axis=0)
        return segment_sum_csr(msgs, rowptr_shard[0])

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None)),
        out_specs=P(axis, None))(x, src_ids, rowptr)


def ring_halo_aggregate(mesh: Mesh, x, part_rowptr_blk, part_src_blk,
                        axis: str = 'data'):
    """Ring-overlapped edge-partitioned aggregation (SURVEY.md §7 hard
    part 4): source blocks rotate around the ring via ``ppermute`` while
    each device reduces the sub-CSR of edges fed by the block it currently
    holds.  Peak memory is one remote block (vs the full feature matrix
    for :func:`halo_exchange_aggregate`), and XLA's latency-hiding
    scheduler overlaps the permute with the local gather+reduce.

    Args:
        mesh: device mesh containing ``axis`` of size D.
        x: ``[N, F]`` features sharded ``P(axis, None)`` (N = D * npd).
        part_rowptr_blk: ``[D, D, npd+1]`` from
            :func:`pyg_lib_tpu.partition.mesh_edge_partition_blocked`,
            sharded ``P(axis, None, None)``.
        part_src_blk: ``[D, D, E_blk_max]`` block-local source ids,
            sharded ``P(axis, None, None)``.

    Returns:
        ``[N, F]`` per-destination sums, sharded like ``x``.
    """
    num_dev = mesh.shape[axis]
    perm = [(j, (j - 1) % num_dev) for j in range(num_dev)]

    def local(x_shard, rb_shard, sb_shard):
        me = jax.lax.axis_index(axis)
        x_blk = x_shard  # [npd, F]; after s permutes: block (me + s) % D
        rb = rb_shard[0]  # [D, npd+1]
        sb = sb_shard[0]  # [D, E_blk_max]
        npd = x_shard.shape[0]
        acc = jnp.zeros_like(x_shard)

        def consume(x_blk, s, acc):
            owner = jax.lax.rem(me.astype(jnp.int32) + s,
                                jnp.int32(num_dev))
            sub_ptr = jax.lax.dynamic_index_in_dim(rb, owner,
                                                   keepdims=False)
            sub_src = jax.lax.dynamic_index_in_dim(sb, owner,
                                                   keepdims=False)
            msgs = jnp.take(x_blk, jnp.minimum(sub_src, npd - 1), axis=0)
            return acc + segment_sum_csr(msgs, sub_ptr)

        # Own block first, then D-1 permute+consume steps: permuting at
        # the END of every step would pay one extra (discarded) full
        # block rotation over ICI per call.
        acc = consume(x_blk, jnp.int32(0), acc)

        def body(carry, s):
            x_blk, acc = carry
            x_blk = jax.lax.ppermute(x_blk, axis, perm)
            acc = consume(x_blk, s, acc)
            return (x_blk, acc), None

        # scan (not fori_loop) so the ring is reverse-differentiable for
        # training through the aggregation.
        (_, acc), _ = jax.lax.scan(body, (x_blk, acc),
                                   jnp.arange(1, num_dev,
                                              dtype=jnp.int32))
        return acc

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None, None), P(axis, None, None)),
        out_specs=P(axis, None))(x, part_rowptr_blk, part_src_blk)
