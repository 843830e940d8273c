"""Temporal GraphSAGE: node-time-constrained disjoint neighbor sampling.

Every mini-batch subgraph only contains neighbors whose timestamp is at or
before the seed's timestamp (causality, as in TGN/TGAT-style pipelines) —
the reference's node-temporal mode (reference
``csrc/sampler/cpu/neighbor_kernel.cpp:74-108``) driven through the async
loader. Neighborhoods must be time-sorted once up front (the reference has
the same precondition).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pyg_lib_tpu.datasets import sbm_graph
from pyg_lib_tpu.loader import NeighborLoader
from pyg_lib_tpu.models import init_sage, sage_forward


def time_sort_neighborhoods(rowptr, col, node_time):
    col = col.copy()
    for v in range(len(rowptr) - 1):
        lo, hi = rowptr[v], rowptr[v + 1]
        order = np.argsort(node_time[col[lo:hi]], kind='stable')
        col[lo:hi] = col[lo:hi][order]
    return col


def main():
    d = sbm_graph(num_nodes=2000, num_classes=4, seed=3)
    rng = np.random.default_rng(0)
    node_time = rng.integers(0, 100, size=2000).astype(np.int64)
    col = time_sort_neighborhoods(d['rowptr'], d['col'], node_time)

    train_ids = np.nonzero(d['train_mask'])[0]
    loader = NeighborLoader(d['rowptr'], col, d['x'], d['y'],
                            seeds=train_ids, batch_size=64,
                            num_neighbors=[8, 4], num_workers=2, rng=0,
                            disjoint=True, node_time=node_time,
                            temporal_strategy='last')

    params = init_sage(jax.random.key(0), [d['x'].shape[1], 64,
                                           d['num_classes']])
    opt = optax.adam(5e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(p):
            logits = sage_forward(p, batch['x'], batch['rowptr'],
                                  batch['row'])
            logp = jax.nn.log_softmax(logits)
            nll = -jnp.take_along_axis(
                logp, batch['y'][:, None].astype(jnp.int32), axis=1)[:, 0]
            mask = batch['node_mask'] & (jnp.arange(nll.shape[0])
                                         < batch['num_seeds'])
            return (nll * mask).sum() / jnp.maximum(mask.sum(), 1)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.perf_counter()
    for epoch in range(5):
        for batch in loader:
            params, opt_state, loss = step(params, opt_state, batch)
    print(f'5 epochs in {time.perf_counter() - t0:.1f}s, '
          f'final loss {float(loss):.4f} '
          f'(node-temporal disjoint sampling, {jax.default_backend()})')


if __name__ == '__main__':
    main()
