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
