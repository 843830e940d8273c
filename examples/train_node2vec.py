"""node2vec embeddings: host random walks + device skip-gram training.

The reference exposes ``random_walk`` as a kernel and leaves the model
to downstream code; this example is the full loop — the C++ walker
(``sampler.random_walk``) produces walk batches on the host while the
device trains the embedding table with skip-gram negative sampling
(``models.node2vec_loss``).

    PYTHONPATH=. python examples/train_node2vec.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from pyg_lib_tpu.datasets import sbm_graph
from pyg_lib_tpu.models import init_node2vec, node2vec_loss
from pyg_lib_tpu.sampler import random_walk


def main(num_nodes: int = 600, steps: int = 300, dim: int = 32,
         batch: int = 256, walk_length: int = 10, num_neg: int = 5,
         verbose: bool = True):
    data = sbm_graph(num_nodes=num_nodes, seed=0)
    rowptr, col = data['rowptr'], data['col']
    labels = np.asarray(data['y'])
    rng = np.random.default_rng(1)

    params = init_node2vec(jax.random.key(0), num_nodes, dim)
    opt = optax.adam(2e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, walks, neg):
        loss, grads = jax.value_and_grad(node2vec_loss)(params, walks, neg)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.time()
    for i in range(steps):
        seeds = rng.integers(0, num_nodes, batch)
        walks = np.asarray(
            random_walk(rowptr, col, seeds, walk_length=walk_length,
                        rng=i))
        neg = rng.integers(0, num_nodes, (batch, num_neg))
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(walks),
                                       jnp.asarray(neg))
        if verbose and i % 50 == 0:
            print(f'step {i:4d} loss {float(loss):.4f}')

    # Evaluate: SBM communities should be linearly separable in the
    # embedding — score a 1-NN community-agreement rate.
    emb = np.asarray(params['emb'])
    emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True),
                           1e-9)
    sims = emb @ emb.T
    np.fill_diagonal(sims, -np.inf)
    agree = float((labels[np.argmax(sims, axis=1)] == labels).mean())
    if verbose:
        print(f'1-NN community agreement: {agree:.3f} '
              f'({time.time() - t0:.1f}s)')
    return agree


if __name__ == '__main__':
    main()
