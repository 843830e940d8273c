"""Pallas kernel tests (interpret mode on CPU; the real-TPU path is
exercised by bench.py and the verify drive)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pyg_lib_tpu.ops.pallas.segment_csr_kernel import (
    pallas_supported,
    segment_sum_csr_pallas,
)


def _ref(src, indptr):
    out = np.zeros((len(indptr) - 1, ) + src.shape[1:], src.dtype)
    for r in range(len(indptr) - 1):
        seg = src[indptr[r]:indptr[r + 1]]
        if len(seg):
            out[r] = seg.sum(0)
    return out


@pytest.mark.parametrize('n,maxdeg', [(100, 40), (300, 3), (17, 200)])
def test_segment_sum_csr_pallas_interpret(n, maxdeg):
    rng = np.random.default_rng(0)
    deg = rng.integers(0, maxdeg, size=n)
    indptr = np.zeros(n + 1, np.int64)
    indptr[1:] = np.cumsum(deg)
    e = max(int(indptr[-1]), 1)
    src = rng.normal(size=(e, 128)).astype(np.float32)
    out = segment_sum_csr_pallas(jnp.asarray(src), jnp.asarray(indptr),
                                 True)
    np.testing.assert_allclose(np.asarray(out), _ref(src, indptr),
                               rtol=1e-3, atol=1e-3)


def test_empty_rows_and_padding_interpret():
    # rows with zero degree interleaved; edge count not CHUNK-aligned
    indptr = np.array([0, 0, 5, 5, 5, 700, 701], np.int64)
    rng = np.random.default_rng(1)
    src = rng.normal(size=(701, 128)).astype(np.float32)
    out = segment_sum_csr_pallas(jnp.asarray(src), jnp.asarray(indptr),
                                 True)
    np.testing.assert_allclose(np.asarray(out), _ref(src, indptr),
                               rtol=1e-3, atol=1e-3)


def test_pallas_supported():
    assert pallas_supported((10000, 128), 100)
    assert not pallas_supported((10000, 100), 100)  # unaligned F
    assert pallas_supported((10, 128), 100)  # small E is padded
    assert not pallas_supported((10000, 128, 2), 100)  # 3-D


def test_minmax_kernel_handles_neg_inf_and_extreme_values():
    """Masked logits (-inf) and values below the old -3e38 mask floor
    must round-trip exactly, with correct first-winner positions even
    when a row's members start in a later chunk."""
    from pyg_lib_tpu.ops.pallas.segment_minmax_kernel import (
        segment_max_planned_exact, )
    from pyg_lib_tpu.ops.pallas.spmm_chunked import build_spmm_plan

    # Row 0 fills chunk 0 entirely (128 edges); row 1's edges live in
    # chunk 1 only and are all -inf / ultra-negative.
    rowptr = np.array([0, 128, 132], np.int64)
    col = np.zeros(132, np.int64)
    plan = build_spmm_plan(rowptr, col, chunk=128)
    x = np.zeros((132 + 124, 128), np.float32)  # padded length 256
    x[:128] = 1.0
    x[128:132] = -np.inf
    x[129, :] = -3.3e38  # finite, below the old mask constant
    for interpret in (True, None):  # Pallas interpreter AND XLA fallback
        vals, pos = segment_max_planned_exact(jnp.asarray(x), plan,
                                              interpret=interpret)
        vals, pos = np.asarray(vals), np.asarray(pos)
        assert (vals[0] == 1.0).all() and (pos[0] == 0).all()
        assert (vals[1] == -3.3e38).all(), vals[1, 0]
        assert (pos[1] == 129).all(), pos[1, 0]
