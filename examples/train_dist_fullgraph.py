"""Distributed full-graph GCN: edge-partitioned ring-halo aggregation.

Runs on any mesh — by default an 8-virtual-device CPU mesh so it works
everywhere:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/train_dist_fullgraph.py

Node features and destinations are range-sharded over the 'data' axis;
every layer's aggregation is ``parallel.ring_halo_aggregate`` (source
blocks rotate over the ring via ``ppermute``), and gradients flow through
the ring via ``lax.scan``. This is the multi-host training pattern for
graphs larger than one host (SURVEY.md §7 phase 6).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from pyg_lib_tpu import parallel, partition
from pyg_lib_tpu.datasets import sbm_graph
from pyg_lib_tpu.models.gnn import _glorot


def main():
    d_dev = len(jax.devices())
    mesh = parallel.make_mesh((d_dev, ), ('data', ))

    d = sbm_graph(num_nodes=4096, num_classes=4, seed=0)
    n = 4096
    part = partition.mesh_edge_partition_blocked(d['rowptr'], d['col'],
                                                 d_dev)
    sh = NamedSharding(mesh, P('data'))
    sh2 = NamedSharding(mesh, P('data', None))
    x = jax.device_put(jnp.asarray(d['x']), sh2)
    y = jax.device_put(jnp.asarray(d['y'].astype(np.int32)), sh)
    train = jax.device_put(jnp.asarray(d['train_mask']), sh)
    test = jax.device_put(jnp.asarray(d['test_mask']), sh)
    rb = jax.device_put(jnp.asarray(part.rowptr_blk),
                        NamedSharding(mesh, P('data', None, None)))
    sb = jax.device_put(jnp.asarray(part.src_blk),
                        NamedSharding(mesh, P('data', None, None)))
    deg = jnp.asarray((d['rowptr'][1:] - d['rowptr'][:-1]).astype(
        np.float32))
    inv_sqrt = jax.device_put(jax.lax.rsqrt(jnp.maximum(deg, 1.0)), sh)

    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    params = {
        'w1': _glorot(k1, (d['x'].shape[1], 64)),
        'b1': jnp.zeros((64, )),
        'w2': _glorot(k2, (64, d['num_classes'])),
        'b2': jnp.zeros((d['num_classes'], )),
    }

    def forward(p, x):
        h = x @ p['w1'] + p['b1']
        agg = parallel.ring_halo_aggregate(mesh, h * inv_sqrt[:, None], rb,
                                           sb)
        h = jax.nn.relu(agg * inv_sqrt[:, None] + h * inv_sqrt[:, None]**2)
        h = h @ p['w2'] + p['b2']
        agg = parallel.ring_halo_aggregate(mesh, h * inv_sqrt[:, None], rb,
                                           sb)
        return agg * inv_sqrt[:, None] + h * inv_sqrt[:, None]**2

    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = forward(p, x)
            logp = jax.nn.log_softmax(logits)
            nll = -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
            return jnp.where(train, nll, 0).sum() / train.sum()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def accuracy(params, mask):
        pred = forward(params, x).argmax(-1)
        return jnp.where(mask, pred == y, False).sum() / mask.sum()

    t0 = time.perf_counter()
    for epoch in range(40):
        params, opt_state, loss = step(params, opt_state)
    print(f'{d_dev}-device mesh: 40 epochs in '
          f'{time.perf_counter() - t0:.1f}s, final loss {float(loss):.4f}, '
          f'test acc {float(accuracy(params, test)):.3f}')


if __name__ == '__main__':
    main()
