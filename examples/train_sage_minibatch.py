"""Mini-batch GraphSAGE training with the host sampling pipeline
(BASELINE.json config 2 shape: Reddit GraphSAGE [25,10] at small scale).

Demonstrates the full TPU-native loop: host C++/numpy neighbor sampling ->
fixed-shape padded batches (one bucket size, so the jitted step never
retraces) -> jitted train step on device.

    PYTHONPATH=. python examples/train_sage_minibatch.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pyg_lib_tpu import sampler
from pyg_lib_tpu.datasets import sbm_graph
from pyg_lib_tpu.metrics import Metrics
from pyg_lib_tpu.models import init_sage, sage_forward


def main(num_nodes: int = 1000, steps: int = 60, batch_size: int = 64,
         fanouts=(10, 5), verbose: bool = True):
    data = sbm_graph(num_nodes=num_nodes, p_in=0.03, p_out=0.002, seed=1)
    x_full = data['x']
    y_full = data['y']
    rowptr, col = data['rowptr'], data['col']
    train_idx = np.nonzero(data['train_mask'])[0]
    test_idx = np.nonzero(data['test_mask'])[0]

    max_nodes, max_edges = sampler.padding.budget_for(
        batch_size, list(fanouts))
    max_nodes = min(max_nodes, 4096)
    max_edges = min(max_edges, 8192)

    params = init_sage(jax.random.key(0),
                       [x_full.shape[1], 64, data['num_classes']])
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    def loss_fn(params, x, rowptr_b, row_b, labels, seed_mask):
        logits = sage_forward(params, x, rowptr_b, row_b)
        logp = jax.nn.log_softmax(logits)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
        return jnp.where(seed_mask, nll, 0.0).sum() / seed_mask.sum()

    @jax.jit
    def step(params, opt_state, x, rowptr_b, row_b, labels, seed_mask):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, rowptr_b,
                                                  row_b, labels, seed_mask)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def make_batch(seeds, rng):
        out = sampler.neighbor_sample(rowptr, col, seeds, list(fanouts),
                                      rng=rng)
        b = sampler.padding.pad_sample_output(out, max_nodes, max_edges,
                                              len(seeds))
        x = np.zeros((max_nodes, x_full.shape[1]), np.float32)
        x[:b.num_nodes] = x_full[b.node_id[:b.num_nodes]]
        labels = np.zeros(max_nodes, np.int32)
        labels[:b.num_nodes] = y_full[b.node_id[:b.num_nodes]]
        seed_mask = np.zeros(max_nodes, bool)
        seed_mask[:b.num_seeds] = True  # seeds are the first locals
        return (jnp.asarray(x), jnp.asarray(b.rowptr), jnp.asarray(b.row),
                jnp.asarray(labels), jnp.asarray(seed_mask))

    rng = np.random.default_rng(0)
    metrics = Metrics(every=20, edges_per_step=max_edges,
                      sink=None if verbose else lambda rec: None)
    t0 = time.perf_counter()
    for it in range(steps):
        seeds = rng.choice(train_idx, size=batch_size, replace=False)
        with metrics.phase('sample'):
            batch = make_batch(seeds, it)
        with metrics.phase('step'):
            params, opt_state, loss = step(params, opt_state, *batch)
        metrics.step(loss=loss)
    elapsed = time.perf_counter() - t0
    if verbose:
        print(f'metrics: {metrics.summary()}')

    # Eval: full-neighborhood batches over test seeds.
    correct = total = 0
    for lo in range(0, len(test_idx), batch_size):
        seeds = test_idx[lo:lo + batch_size]
        batch = make_batch(seeds, 10_000 + lo)
        x, rp, rw, labels, seed_mask = batch
        logits = sage_forward(params, x, rp, rw)
        pred = np.asarray(jnp.argmax(logits, axis=1))
        m = np.asarray(seed_mask)
        correct += int((pred[m] == np.asarray(labels)[m]).sum())
        total += int(m.sum())
    acc = correct / max(total, 1)
    if verbose:
        print(f'test accuracy {acc:.3f} ({elapsed:.1f}s train, '
              f'{jax.default_backend()})')
    return acc


if __name__ == '__main__':
    main()
