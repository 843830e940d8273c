"""Full-batch GCN on a synthetic SBM graph via the planned SpMM path.

The aggregation of every layer runs through ``ops.spmm`` (one host-built
plan for the whole run) — the same pipeline bench.py measures.  Compare
``examples/train_gcn.py``, which uses the per-batch padded-CSR path.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pyg_lib_tpu import ops
from pyg_lib_tpu.datasets import sbm_graph
from pyg_lib_tpu.metrics import Metrics
from pyg_lib_tpu.models import gcn_forward_spmm, init_gcn


def main():
    d = sbm_graph(num_nodes=4000, num_classes=4, seed=0)
    graph = ops.build_spmm_graph(d['rowptr'], d['col'])
    x = jnp.asarray(d['x'])
    y = jnp.asarray(d['y'].astype(np.int32))
    train = jnp.asarray(d['train_mask'])
    test = jnp.asarray(d['test_mask'])

    params = init_gcn(jax.random.key(0), [d['x'].shape[1], 64,
                                          d['num_classes']])
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = gcn_forward_spmm(p, x, graph)
            logp = jax.nn.log_softmax(logits)
            nll = -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
            return jnp.where(train, nll, 0).sum() / train.sum()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def accuracy(params, mask):
        pred = gcn_forward_spmm(params, x, graph).argmax(-1)
        return jnp.where(mask, pred == y, False).sum() / mask.sum()

    # Per-epoch HBM gauge: 2 layers × fwd+bwd SpMM passes over the edge
    # slab (x rows per edge + output), the dominant traffic term.
    e, f = len(d['col']), 64
    metrics = Metrics(every=20, edges_per_step=2 * e,
                      bytes_per_step=4 * (2 * e * f + 2 * d['x'].shape[0] * f))
    t0 = time.perf_counter()
    for epoch in range(60):
        with metrics.phase('step'):
            params, opt_state, loss = step(params, opt_state)
        metrics.step(loss=loss)
    print(f'metrics: {metrics.summary()}')
    print(f'60 epochs in {time.perf_counter() - t0:.1f}s, '
          f'final loss {float(loss):.4f}, '
          f'test acc {float(accuracy(params, test)):.3f}')


if __name__ == '__main__':
    main()
