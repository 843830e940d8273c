"""Property fuzzing of the padding layer: padded batches must reproduce
the unpadded sampler output exactly through the device ops (pad slots
drop out of segment reductions; ids roundtrip)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pyg_lib_tpu import ops, sampler
from pyg_lib_tpu.sampler.padding import pad_sample_output


@pytest.mark.parametrize('seed', range(5))
def test_padded_aggregation_matches_unpadded(seed):
    rng = np.random.default_rng(700 + seed)
    n = int(rng.integers(30, 200))
    deg = rng.integers(0, 6, size=n)
    rowptr = np.zeros(n + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    col = rng.integers(0, n, size=int(rowptr[-1])).astype(np.int64)
    num_seed = int(rng.integers(1, 8))
    seeds = rng.choice(n, size=num_seed, replace=False)
    fanouts = rng.integers(1, 4, size=2).tolist()

    out = sampler.neighbor_sample(rowptr, col, seeds, fanouts, rng=seed)
    row, c, node_id, eid, nnph, neph = out
    b = pad_sample_output(out, max_nodes=512, max_edges=1024,
                          num_seeds=num_seed)

    # features per local node; aggregate over the padded batch
    x = rng.normal(size=(512, 16)).astype(np.float32)
    agg_pad = np.asarray(
        ops.segment_sum_csr(jnp.take(jnp.asarray(x), jnp.asarray(b.row),
                                     axis=0), jnp.asarray(b.rowptr)))

    # reference aggregation from the unpadded output: the padded CSR is
    # built over incoming edges per dst (col), so compare per-dst sums.
    ref = np.zeros((len(node_id), 16), np.float32)
    np.add.at(ref, c, x[row])
    np.testing.assert_allclose(agg_pad[:len(node_id)], ref, atol=1e-4,
                               rtol=1e-4)
    # pad rows contribute zeros
    assert np.abs(agg_pad[len(node_id):]).max() == 0.0

    # masks and ids roundtrip
    assert b.node_mask[:len(node_id)].all()
    assert not b.node_mask[len(node_id):].any()
    np.testing.assert_array_equal(b.node_id[:len(node_id)], node_id)
