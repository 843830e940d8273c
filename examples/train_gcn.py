"""End-to-end full-batch GCN training (BASELINE.json config 1 shape).

Runs on whatever backend JAX selects (TPU under axon; CPU elsewhere):

    PYTHONPATH=. python examples/train_gcn.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pyg_lib_tpu.datasets import sbm_graph
from pyg_lib_tpu.models import gcn_forward, init_gcn


def main(num_nodes: int = 400, epochs: int = 100, verbose: bool = True):
    data = sbm_graph(num_nodes=num_nodes, seed=0)
    x = jnp.asarray(data['x'])
    y = jnp.asarray(data['y'])
    rowptr = jnp.asarray(data['rowptr'])
    # CSR col = destination of each outgoing edge; for incoming-edge
    # aggregation on an undirected (symmetrised) graph the same CSR works
    # with row=col semantics swapped: messages flow col -> rowptr rows.
    row = jnp.asarray(data['col'])
    train = jnp.asarray(data['train_mask'])
    test = jnp.asarray(data['test_mask'])

    params = init_gcn(jax.random.key(0),
                      [x.shape[1], 32, data['num_classes']])
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    def loss_fn(params):
        logits = gcn_forward(params, x, rowptr, row)
        logp = jax.nn.log_softmax(logits)
        nll = -jnp.take_along_axis(logp, y[:, None].astype(jnp.int32),
                                   axis=1)[:, 0]
        return jnp.where(train, nll, 0.0).sum() / train.sum()

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def accuracy(params, mask):
        logits = gcn_forward(params, x, rowptr, row)
        pred = jnp.argmax(logits, axis=1)
        correct = (pred == y) & mask
        return correct.sum() / mask.sum()

    t0 = time.perf_counter()
    for epoch in range(epochs):
        params, opt_state, loss = step(params, opt_state)
        if verbose and (epoch + 1) % 20 == 0:
            print(f'epoch {epoch+1}: loss={float(loss):.4f} '
                  f'test_acc={float(accuracy(params, test)):.3f}')
    elapsed = time.perf_counter() - t0
    acc = float(accuracy(params, test))
    if verbose:
        print(f'final test accuracy: {acc:.3f} ({elapsed:.1f}s, '
              f'{jax.default_backend()})')
    return acc


if __name__ == '__main__':
    main()
