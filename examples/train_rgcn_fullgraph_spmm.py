"""Full-graph R-GCN over per-relation SpMM plans (planned hetero path).

Synthetic stand-in for the ogbn-mag configuration in BASELINE.json
(config 4): 2 node types, 3 relations; each relation transforms source
nodes then runs the planned gather+reduce into the destination type —
no materialised per-edge messages (compare examples/train_rgcn_hetero.py,
the padded mini-batch + segment_matmul path).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pyg_lib_tpu.models import (build_rgcn_graphs, init_rgcn_spmm,
                                rgcn_forward_spmm)


def main():
    rng = np.random.default_rng(0)
    n_a, n_b, f = 4000, 2000, 32

    def csr(nd, ns, d):  # dst-major CSR
        deg = rng.integers(0, 2 * d, size=nd)
        rp = np.zeros(nd + 1, np.int64)
        rp[1:] = np.cumsum(deg)
        return rp, rng.integers(0, ns, size=int(rp[-1])).astype(np.int64)

    rowptr_d, col_d = {}, {}
    rowptr_d[('a', 'r1', 'a')], col_d[('a', 'r1', 'a')] = csr(n_a, n_a, 6)
    rowptr_d[('b', 'r2', 'a')], col_d[('b', 'r2', 'a')] = csr(n_a, n_b, 3)
    rowptr_d[('a', 'r3', 'b')], col_d[('a', 'r3', 'b')] = csr(n_b, n_a, 3)
    graphs = build_rgcn_graphs(rowptr_d, col_d, {'a': n_a, 'b': n_b})

    x_dict = {'a': jnp.asarray(rng.normal(size=(n_a, f)).astype(
        np.float32)),
              'b': jnp.asarray(rng.normal(size=(n_b, f)).astype(
                  np.float32))}
    proj = rng.normal(size=(f, 4)).astype(np.float32)
    y = jnp.asarray((np.asarray(x_dict['a']) @ proj).argmax(-1).astype(
        np.int32))
    train = jnp.asarray(rng.random(n_a) < 0.6)

    params = init_rgcn_spmm(jax.random.key(0), [f, 64, 4],
                            num_relations=3)
    opt = optax.adam(5e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = rgcn_forward_spmm(p, x_dict, graphs)
            logp = jax.nn.log_softmax(out['a'])
            nll = -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
            return jnp.where(train, nll, 0).sum() / train.sum()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def accuracy(params):
        pred = rgcn_forward_spmm(params, x_dict, graphs)['a'].argmax(-1)
        return jnp.where(~train, pred == y, False).sum() / (~train).sum()

    t0 = time.perf_counter()
    for epoch in range(60):
        params, opt_state, loss = step(params, opt_state)
    print(f'60 epochs in {time.perf_counter() - t0:.1f}s, '
          f'loss {float(loss):.4f}, '
          f'held-out acc {float(accuracy(params)):.3f} '
          f'({jax.default_backend()})')


if __name__ == '__main__':
    main()
