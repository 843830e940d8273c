"""Heterogeneous R-GCN training with hetero neighbor sampling
(BASELINE.json config 4 shape: ogbn-mag R-GCN at synthetic scale).

Pipeline: hetero_neighbor_sample -> pad_hetero_sample_output (flattened
relation-blocked layout) -> rgcn_forward (ragged segment_matmul per
relation) -> optax.

    PYTHONPATH=. python examples/train_rgcn_hetero.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pyg_lib_tpu import sampler
from pyg_lib_tpu.datasets import sbm_graph, to_csr
from pyg_lib_tpu.models import init_rgcn, rgcn_forward


def make_hetero_data(num_papers=400, num_authors=200, seed=0):
    """Papers with SBM structure + authors writing papers."""
    rng = np.random.default_rng(seed)
    paper = sbm_graph(num_nodes=num_papers, p_in=0.04, p_out=0.003,
                      seed=seed)
    # author -> paper edges (each author writes 1-5 papers, biased to one
    # class so author features would carry signal if present).
    a_src, a_dst = [], []
    for a in range(num_authors):
        k = rng.integers(1, 6)
        papers = rng.choice(num_papers, size=k, replace=False)
        a_src.extend([a] * k)
        a_dst.extend(papers.tolist())
    ap_rowptr, ap_col, _ = to_csr(np.asarray(a_src), np.asarray(a_dst),
                                  num_authors)
    # reverse: paper -> author
    pa_rowptr, pa_col, _ = to_csr(np.asarray(a_dst), np.asarray(a_src),
                                  num_papers)
    return paper, (ap_rowptr, ap_col), (pa_rowptr, pa_col), num_authors


def main(num_papers=400, num_authors=200, steps=60, batch_size=32,
         verbose=True):
    paper, (ap_rowptr, ap_col), (pa_rowptr, pa_col), _ = make_hetero_data(
        num_papers, num_authors)
    rowptr_dict = {
        ('paper', 'cites', 'paper'): paper['rowptr'],
        ('author', 'writes', 'paper'): ap_rowptr,
        ('paper', 'rev_writes', 'author'): pa_rowptr,
    }
    col_dict = {
        ('paper', 'cites', 'paper'): paper['col'],
        ('author', 'writes', 'paper'): ap_col,
        ('paper', 'rev_writes', 'author'): pa_col,
    }
    num_neighbors = {k: [5, 5] for k in rowptr_dict}
    feat = paper['x'].shape[1]
    x_paper = paper['x']
    x_author = np.random.default_rng(1).normal(
        size=(num_authors, feat)).astype(np.float32)
    y = paper['y']
    train_idx = np.nonzero(paper['train_mask'])[0]
    test_idx = np.nonzero(paper['test_mask'])[0]

    budgets = {'paper': 2048, 'author': 1024}
    max_edges = 8192
    num_rel = len(rowptr_dict)

    params = init_rgcn(jax.random.key(0), [feat, 64, paper['num_classes']],
                       num_relations=num_rel)
    opt = optax.adam(5e-3)
    opt_state = opt.init(params)

    def make_batch(seeds, rng_seed):
        out = sampler.hetero_neighbor_sample(
            rowptr_dict, col_dict, {'paper': seeds}, num_neighbors,
            rng=rng_seed)
        hb = sampler.padding.pad_hetero_sample_output(out, budgets,
                                                      max_edges)
        n = hb.num_flat_nodes
        x = np.zeros((n, feat), np.float32)
        po, ao = hb.type_offset['paper'], hb.type_offset['author']
        x[po:po + budgets['paper']] = x_paper[hb.node_id['paper']]
        x[ao:ao + budgets['author']] = x_author[hb.node_id['author']]
        x[po:po + budgets['paper']][~hb.node_mask['paper']] = 0
        x[ao:ao + budgets['author']][~hb.node_mask['author']] = 0
        labels = np.zeros(n, np.int32)
        labels[po:po + budgets['paper']] = y[hb.node_id['paper']]
        seed_mask = np.zeros(n, bool)
        seed_mask[po:po + len(seeds)] = True
        return (jnp.asarray(x), jnp.asarray(hb.row), jnp.asarray(hb.col),
                jnp.asarray(hb.rel_ptr), jnp.asarray(labels),
                jnp.asarray(seed_mask))

    def loss_fn(params, x, row, col, rel_ptr, labels, seed_mask):
        logits = rgcn_forward(params, x, row, col, rel_ptr)
        logp = jax.nn.log_softmax(logits)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
        return jnp.where(seed_mask, nll, 0.0).sum() / seed_mask.sum()

    @jax.jit
    def step(params, opt_state, *batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, *batch)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    for it in range(steps):
        seeds = rng.choice(train_idx, size=batch_size, replace=False)
        params, opt_state, loss = step(params, opt_state,
                                       *make_batch(seeds, it))
        if verbose and (it + 1) % 20 == 0:
            print(f'step {it+1}: loss={float(loss):.4f}')
    elapsed = time.perf_counter() - t0

    correct = total = 0
    for lo in range(0, len(test_idx), batch_size):
        seeds = test_idx[lo:lo + batch_size]
        x, row, col, rel_ptr, labels, seed_mask = make_batch(
            seeds, 10_000 + lo)
        logits = rgcn_forward(params, x, row, col, rel_ptr)
        pred = np.asarray(jnp.argmax(logits, axis=1))
        m = np.asarray(seed_mask)
        correct += int((pred[m] == np.asarray(labels)[m]).sum())
        total += int(m.sum())
    acc = correct / max(total, 1)
    if verbose:
        print(f'test accuracy {acc:.3f} ({elapsed:.1f}s, '
              f'{jax.default_backend()})')
    return acc


if __name__ == '__main__':
    main()
