"""End-to-end training tests: the milestone-config shapes actually learn
(BASELINE.json configs 1-2 at synthetic scale)."""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def test_full_batch_gcn_learns():
    from examples.train_gcn import main
    acc = main(num_nodes=200, epochs=60, verbose=False)
    assert acc > 0.85, acc


def test_minibatch_sage_learns():
    from examples.train_sage_minibatch import main
    acc = main(num_nodes=400, steps=40, batch_size=32, verbose=False)
    assert acc > 0.8, acc


def test_hetero_rgcn_learns():
    from examples.train_rgcn_hetero import main
    acc = main(num_papers=200, num_authors=100, steps=40, batch_size=24,
               verbose=False)
    assert acc > 0.8, acc


def test_gcn_spmm_matches_padded_csr_path():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pyg_lib_tpu import ops
    from pyg_lib_tpu.datasets import sbm_graph
    from pyg_lib_tpu.models import gcn_forward, gcn_forward_spmm, init_gcn

    d = sbm_graph(num_nodes=300, num_classes=3, seed=1)
    rowptr, col = d['rowptr'], d['col']
    graph = ops.build_spmm_graph(rowptr, col)
    params = init_gcn(jax.random.key(1), [d['x'].shape[1], 16, 3])
    x = jnp.asarray(d['x'])

    a = gcn_forward_spmm(params, x, graph)
    # padded path: full graph as one "batch", row = col ids per CSR slot
    b = gcn_forward(params, x, jnp.asarray(rowptr), jnp.asarray(col))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                               rtol=2e-4)
