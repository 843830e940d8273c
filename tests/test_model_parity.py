"""Per-layer model activation parity vs the reference composition.

BASELINE.md's parity axis: GCN / GraphSAGE (mean + max) / R-GCN forward
passes, computed layer by layer in float64 twice — once through
pyg_lib_tpu (``models/gnn.py``), once through torch compositions built
from the REFERENCE's own kernels (``torch.ops.pyg.segment_sum_csr``,
``segment_matmul``, ``scatter_sum``, ... — the composition PyG itself
performs, reference ``pyg_lib/ops/__init__.py:816-835``) — and asserted
allclose per layer. Real-dataset accuracy parity stays environment-
blocked (no egress); this closes the parity axis as far as the container
allows, on the same synthetic-graph configs the milestone models use.

Skips (with the build command) when the locally-built reference library
is absent, like test_reference_parity.py.
"""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from pyg_lib_tpu import models

_LIB = os.environ.get('PYGT_REFERENCE_LIB', '/tmp/refsrc/build/libpyg.so')

if not os.path.exists(_LIB):
    pytest.skip(
        f'reference libpyg.so not found at {_LIB}; build it with '
        '`python tools/build_reference.py` (~15 min, CPU-only)',
        allow_module_level=True)

torch.ops.load_library(_LIB)
torch.set_num_threads(1)  # the phmap build shim is not thread-safe
pyg = torch.ops.pyg


def _graph(seed=0, n=512, e=4096):
    """Padded-batch layout: rowptr over dst rows, row = src ids."""
    rng = np.random.default_rng(seed)
    dst = np.sort(rng.integers(0, n, e))
    rowptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(dst, minlength=n), out=rowptr[1:])
    row = rng.integers(0, n, e).astype(np.int64)
    return rowptr, row, dst


def _params64(tree):
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float64)
        if hasattr(a, 'dtype') and jnp.issubdtype(a.dtype, jnp.floating)
        else a, tree)


def _t(a):
    return torch.from_numpy(np.asarray(a))


def test_gcn_layers_allclose():
    n, f_in, hid, out = 512, 32, 64, 8
    rowptr, row, _ = _graph(0, n)
    rng = np.random.default_rng(1)
    x0 = rng.normal(size=(n, f_in))
    params = _params64(models.init_gcn(jax.random.key(0),
                                       [f_in, hid, out]))

    ours_layers = []
    x = jnp.asarray(x0)
    deg = (jnp.asarray(rowptr[1:] - rowptr[:-1])).astype(x.dtype)
    inv = jax.lax.rsqrt(jnp.maximum(deg, 1.0))
    for i, layer in enumerate(params['layers']):
        x = models.gcn_forward({'layers': [layer]}, x,
                               jnp.asarray(rowptr), jnp.asarray(row))
        if i < len(params['layers']) - 1:
            x = jax.nn.relu(x)  # single-layer call skips inner relu
        ours_layers.append(np.asarray(x))

    # torch twin from the reference's own segment_sum_csr
    xt = _t(x0)
    rowptr_t, row_t = _t(rowptr), _t(row)
    deg_t = (rowptr_t[1:] - rowptr_t[:-1]).double()
    inv_t = 1.0 / torch.sqrt(torch.clamp(deg_t, min=1.0))
    ref_layers = []
    for i, layer in enumerate(params['layers']):
        w, b = _t(layer['w']), _t(layer['b'])
        h = xt @ w
        msgs = (h * inv_t[:, None])[row_t]
        agg = pyg.segment_sum_csr(msgs, rowptr_t, None)
        xt = agg * inv_t[:, None] + h * inv_t[:, None]**2 + b
        if i < len(params['layers']) - 1:
            xt = torch.relu(xt)
        ref_layers.append(xt.numpy())

    for i, (a, b) in enumerate(zip(ours_layers, ref_layers)):
        np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12,
                                   err_msg=f'GCN layer {i}')


@pytest.mark.parametrize('aggr', ['mean', 'max'])
def test_sage_layers_allclose(aggr):
    n, f_in, hid, out = 400, 24, 48, 6
    rowptr, row, _ = _graph(3, n, 3000)
    # make a few empty rows to exercise the empty-bucket contract
    rng = np.random.default_rng(4)
    x0 = rng.normal(size=(n, f_in))
    params = _params64(models.init_sage(jax.random.key(1),
                                        [f_in, hid, out]))

    x = jnp.asarray(x0)
    ours_layers = []
    for i, layer in enumerate(params['layers']):
        x = models.sage_forward({'layers': [layer]}, x,
                                jnp.asarray(rowptr), jnp.asarray(row),
                                aggr=aggr)
        if i < len(params['layers']) - 1:
            x = jax.nn.relu(x)
        ours_layers.append(np.asarray(x))

    xt = _t(x0)
    rowptr_t, row_t = _t(rowptr), _t(row)
    ref_layers = []
    for i, layer in enumerate(params['layers']):
        ws, wn, b = _t(layer['w_self']), _t(layer['w_nbr']), _t(layer['b'])
        msgs = xt[row_t]
        if aggr == 'mean':
            agg = pyg.segment_mean_csr(msgs, rowptr_t, None)
        else:
            agg = pyg.segment_max_csr(msgs, rowptr_t, None)[0]
        xt = xt @ ws + agg @ wn + b
        if i < len(params['layers']) - 1:
            xt = torch.relu(xt)
        ref_layers.append(xt.numpy())

    for i, (a, b) in enumerate(zip(ours_layers, ref_layers)):
        np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12,
                                   err_msg=f'SAGE({aggr}) layer {i}')


def test_rgcn_layers_allclose():
    n, f_in, hid, out, nrel = 300, 16, 32, 4, 5
    rng = np.random.default_rng(7)
    e = 2500
    rel_sizes = rng.multinomial(e, np.ones(nrel) / nrel)
    rel_ptr = np.zeros(nrel + 1, np.int64)
    np.cumsum(rel_sizes, out=rel_ptr[1:])
    row = rng.integers(0, n, e).astype(np.int64)
    col = rng.integers(0, n, e).astype(np.int64)
    x0 = rng.normal(size=(n, f_in))
    params = _params64(models.init_rgcn(jax.random.key(2),
                                        [f_in, hid, out], nrel))

    x = jnp.asarray(x0)
    ours_layers = []
    for i, layer in enumerate(params['layers']):
        x = models.rgcn_forward({'layers': [layer]}, x, jnp.asarray(row),
                                jnp.asarray(col), jnp.asarray(rel_ptr))
        if i < len(params['layers']) - 1:
            x = jax.nn.relu(x)
        ours_layers.append(np.asarray(x))

    xt = _t(x0)
    row_t, col_t, rel_ptr_t = _t(row), _t(col), _t(rel_ptr)
    rel_id = np.searchsorted(rel_ptr, np.arange(e), side='right') - 1
    key = col * nrel + rel_id
    counts = np.bincount(key, minlength=n * nrel).astype(np.float64)
    inv = 1.0 / np.maximum(counts, 1.0)
    ref_layers = []
    for i, layer in enumerate(params['layers']):
        wr, wroot, b = (_t(layer['w_rel']), _t(layer['w_root']),
                        _t(layer['b']))
        msgs = xt[row_t]
        transformed = pyg.segment_matmul(msgs, rel_ptr_t, wr)
        transformed = transformed * _t(inv[key])[:, None]
        agg = pyg.scatter_sum(transformed, col_t, 0, None, n)
        xt = agg + xt @ wroot + b
        if i < len(params['layers']) - 1:
            xt = torch.relu(xt)
        ref_layers.append(xt.numpy())

    # segment_matmul rides jax.lax.ragged_dot, whose XLA:CPU lowering
    # accumulates in f32 even for f64 operands — layer agreement is at
    # f32 precision here, unlike the pure-f64 GCN/SAGE paths above.
    for i, (a, b) in enumerate(zip(ours_layers, ref_layers)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6,
                                   err_msg=f'R-GCN layer {i}')
