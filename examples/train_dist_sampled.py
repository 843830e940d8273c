"""Distributed mini-batch GraphSAGE: dist sampling protocol + collective
feature fetch.

The multi-host mini-batch pattern (SURVEY.md §3.5 TPU equivalent): the
graph lives partitioned across devices; every step the coordinator runs
sample -> merge -> relabel over the per-partition services
(``sampler.dist_service.DistNeighborSampler``), the mini-batch features
are fetched with the partition-book ``shard_map`` collective instead of
RPC, and a padded batch feeds one jitted training step.

Runs anywhere — by default an 8-virtual-device CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/train_dist_sampled.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pyg_lib_tpu import parallel
from pyg_lib_tpu.datasets import sbm_graph
from pyg_lib_tpu.models import init_sage, sage_forward
from pyg_lib_tpu.sampler.dist_service import (
    DistNeighborSampler,
    collective_feature_fetch,
    partition_graph,
)
from pyg_lib_tpu.sampler.padding import pad_sample_output


def main():
    d_dev = len(jax.devices())
    mesh = parallel.make_mesh((d_dev, ), ('data', ))

    n = 4096  # divisible by d_dev -> equal feature shards
    d = sbm_graph(num_nodes=n, num_classes=4, seed=0)
    x = jnp.asarray(d['x'])
    y = np.asarray(d['y'])
    f = x.shape[1]

    graph = partition_graph(d['rowptr'], d['col'], d_dev)
    ds = DistNeighborSampler(graph, rng=0)

    batch_seeds, fanouts = 64, [10, 5]
    max_nodes, max_edges = 4096, 8192
    params = init_sage(jax.random.key(0), [f, 64, 4])
    opt = optax.adam(5e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, bx, rowptr, row, labels, mask):
        def loss_fn(p):
            logits = sage_forward(p, bx, rowptr, row)
            logp = jax.nn.log_softmax(logits)
            nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
            return (nll * mask).sum() / jnp.maximum(mask.sum(), 1)

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(0)
    t0 = time.time()
    for it in range(30):
        seeds = rng.choice(n, size=batch_seeds, replace=False)
        row, col, node_id, _ = ds.sample(seeds, fanouts)
        b = pad_sample_output((row, col, node_id, None, [], []), max_nodes,
                              max_edges, num_seeds=batch_seeds)
        pad_ids = np.zeros(max_nodes, np.int64)
        pad_ids[:len(node_id)] = node_id
        bx = collective_feature_fetch(mesh, x,
                                      jnp.asarray(pad_ids.astype(np.int32)),
                                      axis='data')
        labels = jnp.asarray(y[pad_ids].astype(np.int32))
        params, opt_state, loss = step(params, opt_state, bx,
                                       jnp.asarray(b.rowptr),
                                       jnp.asarray(b.row), labels,
                                       jnp.asarray(b.node_mask.astype(
                                           np.float32)))
        if it % 10 == 0:
            print(f'step {it:3d}  loss {float(loss):.4f}')
    print(f'final loss {float(loss):.4f}  ({time.time() - t0:.1f}s, '
          f'{d_dev} devices)')
    assert float(loss) < 1.0, 'did not converge'


if __name__ == '__main__':
    main()
