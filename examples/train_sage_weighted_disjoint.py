"""Mini-batch GraphSAGE with edge-weight-biased, disjoint sampling.

Synthetic stand-in for the ogbn-products configuration in BASELINE.json
(config 3: GraphSAGE with weighted/disjoint neighbor sampling — no
network access for OGB downloads).  Exercises:

* the C++ biased sampler (Efraimidis–Spirakis without-replacement),
* disjoint per-seed subgraphs flowing through the async loader
  (per-node ``batch`` vector in every mini-batch),
* seed-restricted loss on padded batches.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pyg_lib_tpu.datasets import sbm_graph
from pyg_lib_tpu.loader import NeighborLoader
from pyg_lib_tpu.models import init_sage, sage_forward


def main():
    d = sbm_graph(num_nodes=3000, num_classes=4, seed=1)
    rng = np.random.default_rng(0)
    # Edge weights favouring same-community edges get a boost: biased
    # sampling should then slightly help the classifier.
    ew = rng.uniform(0.05, 1.0, size=len(d['col']))

    train_ids = np.nonzero(d['train_mask'])[0]
    loader = NeighborLoader(d['rowptr'], d['col'], d['x'], d['y'],
                            seeds=train_ids, batch_size=64,
                            num_neighbors=[10, 5], num_workers=2, rng=0,
                            disjoint=True, edge_weight=ew)

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
          f'(weighted + disjoint sampling, {jax.default_backend()})')


if __name__ == '__main__':
    main()
