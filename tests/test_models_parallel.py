"""End-to-end model + multi-device tests (8 virtual CPU devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyg_lib_tpu import sampler
from pyg_lib_tpu.models import (
    gat_forward,
    gcn_forward,
    init_gat,
    init_gcn,
    init_rgcn,
    init_sage,
    rgcn_forward,
    sage_forward,
)
from pyg_lib_tpu.testing import cycle_graph


@pytest.fixture
def batch():
    rowptr, col = cycle_graph(32)
    out = sampler.neighbor_sample(rowptr, col, np.arange(0, 32, 4), [4, 4],
                                  rng=0)
    b = sampler.padding.pad_sample_output(out, max_nodes=64, max_edges=128,
                                          num_seeds=8)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(64, 16)).astype(np.float32))
    return b, x


def test_gcn_forward_grad(batch):
    b, x = batch
    params = init_gcn(jax.random.key(0), [16, 32, 7])
    rp, rw = jnp.asarray(b.rowptr), jnp.asarray(b.row)
    out = jax.jit(gcn_forward)(params, x, rp, rw)
    assert out.shape == (64, 7)
    assert bool(jnp.isfinite(out).all())
    g = jax.grad(lambda p: (gcn_forward(p, x, rp, rw)**2).sum())(params)
    assert bool(jnp.isfinite(g['layers'][0]['w']).all())


def test_sage_forward(batch):
    b, x = batch
    params = init_sage(jax.random.key(0), [16, 32, 7])
    rp, rw = jnp.asarray(b.rowptr), jnp.asarray(b.row)
    for aggr in ['mean', 'max']:
        out = sage_forward(params, x, rp, rw, aggr=aggr)
        assert out.shape == (64, 7)
        assert bool(jnp.isfinite(out).all())


def test_gat_forward(batch):
    b, x = batch
    params = init_gat(jax.random.key(0), [16, 8, 7], heads=2)
    rp = jnp.asarray(b.rowptr)
    out = gat_forward(params, x, rp, jnp.asarray(b.row),
                      jnp.asarray(b.col))
    assert out.shape == (64, 7)
    assert bool(jnp.isfinite(out).all())


def test_rgcn_forward():
    # Edges sorted by relation: 2 relations over 8 nodes.
    n, f = 8, 16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    row = jnp.asarray(np.array([0, 1, 2, 3, 4, 5], np.int32))
    col = jnp.asarray(np.array([1, 2, 3, 4, 5, 6], np.int32))
    rel_ptr = jnp.asarray(np.array([0, 3, 6], np.int32))
    params = init_rgcn(jax.random.key(0), [f, 4], num_relations=2)
    out = rgcn_forward(params, x, row, col, rel_ptr)
    assert out.shape == (n, 4)
    assert bool(jnp.isfinite(out).all())


def test_dryrun_multichip_8():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[1] == 7
