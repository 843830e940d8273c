"""Tests for grouped_matmul / segment_matmul (mirrors reference
``test/ops/test_matmul.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyg_lib_tpu import ops
from pyg_lib_tpu.testing import assert_allclose


def test_segment_matmul():
    rng = np.random.default_rng(0)
    inputs = rng.normal(size=(8, 16)).astype(np.float32)
    other = rng.normal(size=(2, 16, 32)).astype(np.float32)
    ptr = np.array([0, 5, 8], np.int64)
    out = ops.segment_matmul(jnp.asarray(inputs), jnp.asarray(ptr),
                             jnp.asarray(other))
    assert out.shape == (8, 32)
    assert_allclose(out[0:5], inputs[0:5] @ other[0], rtol=1e-4, atol=1e-4)
    assert_allclose(out[5:8], inputs[5:8] @ other[1], rtol=1e-4, atol=1e-4)


def test_segment_matmul_bias():
    rng = np.random.default_rng(1)
    inputs = rng.normal(size=(6, 4)).astype(np.float32)
    other = rng.normal(size=(3, 4, 5)).astype(np.float32)
    bias = rng.normal(size=(3, 5)).astype(np.float32)
    ptr = np.array([0, 2, 2, 6], np.int64)
    out = ops.segment_matmul(jnp.asarray(inputs), jnp.asarray(ptr),
                             jnp.asarray(other), jnp.asarray(bias))
    assert_allclose(out[0:2], inputs[0:2] @ other[0] + bias[0], rtol=1e-4,
                    atol=1e-4)
    assert_allclose(out[2:6], inputs[2:6] @ other[2] + bias[2], rtol=1e-4,
                    atol=1e-4)


def test_segment_matmul_grad():
    rng = np.random.default_rng(2)
    inputs = jnp.asarray(rng.normal(size=(7, 3)))
    other = jnp.asarray(rng.normal(size=(2, 3, 4)))
    ptr = jnp.asarray(np.array([0, 4, 7], np.int64))

    def loss(x, w):
        return ops.segment_matmul(x, ptr, w).sum()

    gx, gw = jax.grad(loss, argnums=(0, 1))(inputs, other)
    x_np, w_np = np.asarray(inputs), np.asarray(other)
    g_out = np.ones((7, 4))
    expected_gx = np.concatenate(
        [g_out[0:4] @ w_np[0].T, g_out[4:7] @ w_np[1].T])
    expected_gw = np.stack(
        [x_np[0:4].T @ g_out[0:4], x_np[4:7].T @ g_out[4:7]])
    assert_allclose(gx, expected_gx, rtol=1e-5)
    assert_allclose(gw, expected_gw, rtol=1e-5)


def test_grouped_matmul_same_shapes():
    rng = np.random.default_rng(3)
    inputs = [
        rng.normal(size=(5, 16)).astype(np.float32),
        rng.normal(size=(3, 16)).astype(np.float32),
    ]
    others = [
        rng.normal(size=(16, 32)).astype(np.float32),
        rng.normal(size=(16, 32)).astype(np.float32),
    ]
    outs = ops.grouped_matmul([jnp.asarray(x) for x in inputs],
                              [jnp.asarray(w) for w in others])
    assert len(outs) == 2
    assert_allclose(outs[0], inputs[0] @ others[0], rtol=1e-4, atol=1e-4)
    assert_allclose(outs[1], inputs[1] @ others[1], rtol=1e-4, atol=1e-4)


def test_grouped_matmul_mixed_shapes():
    rng = np.random.default_rng(4)
    inputs = [
        rng.normal(size=(5, 16)).astype(np.float32),
        rng.normal(size=(3, 32)).astype(np.float32),
    ]
    others = [
        rng.normal(size=(16, 32)).astype(np.float32),
        rng.normal(size=(32, 64)).astype(np.float32),
    ]
    outs = ops.grouped_matmul([jnp.asarray(x) for x in inputs],
                              [jnp.asarray(w) for w in others])
    assert outs[0].shape == (5, 32)
    assert outs[1].shape == (3, 64)
    assert_allclose(outs[0], inputs[0] @ others[0], rtol=1e-4, atol=1e-4)
    assert_allclose(outs[1], inputs[1] @ others[1], rtol=1e-4, atol=1e-4)


def test_segment_matmul_empty_segment_and_padding():
    rng = np.random.default_rng(5)
    inputs = rng.normal(size=(10, 4)).astype(np.float32)
    other = rng.normal(size=(3, 4, 4)).astype(np.float32)
    # ptr[-1] < N: rows 8..9 are padding
    ptr = np.array([0, 4, 4, 8], np.int64)
    out = ops.segment_matmul(jnp.asarray(inputs), jnp.asarray(ptr),
                             jnp.asarray(other))
    assert out.shape == (10, 4)
    assert_allclose(out[0:4], inputs[0:4] @ other[0], rtol=1e-4, atol=1e-4)
    assert_allclose(out[4:8], inputs[4:8] @ other[2], rtol=1e-4, atol=1e-4)


def test_grouped_matmul_bias_and_version():
    import pyg_lib_tpu

    # Version string parity (reference test/test_version.py intent).
    assert isinstance(pyg_lib_tpu.__version__, str)
    assert pyg_lib_tpu.__version__.count('.') == 2

    rng = np.random.default_rng(9)
    xs = [rng.normal(size=(m, 6)).astype(np.float32) for m in (4, 7)]
    ws = [rng.normal(size=(6, 5)).astype(np.float32) for _ in range(2)]
    bs = [rng.normal(size=(5, )).astype(np.float32) for _ in range(2)]
    outs = ops.grouped_matmul([jnp.asarray(x) for x in xs],
                              [jnp.asarray(w) for w in ws],
                              [jnp.asarray(b) for b in bs])
    for x, w, b, o in zip(xs, ws, bs, outs):
        assert_allclose(np.asarray(o), x @ w + b, rtol=1e-4, atol=1e-4)


def test_segment_matmul_padding_rows_stay_zero_with_bias():
    """ptr[-1] < N: trailing padding rows must stay ZERO even with bias
    (jnp.repeat's total_repeat_length pads ids with the LAST group)."""
    rng = np.random.default_rng(30)
    inputs = jnp.asarray(rng.normal(size=(10, 8)).astype(np.float32))
    ptr = jnp.asarray(np.array([0, 4, 8], np.int64))
    other = jnp.asarray(rng.normal(size=(2, 8, 4)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(2, 4)).astype(np.float32))
    out = np.asarray(ops.segment_matmul(inputs, ptr, other, bias=bias))
    ref0 = np.asarray(inputs)[:4] @ np.asarray(other)[0] + np.asarray(
        bias)[0]
    ref1 = np.asarray(inputs)[4:8] @ np.asarray(other)[1] + np.asarray(
        bias)[1]
    np.testing.assert_allclose(out[:4], ref0, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(out[4:8], ref1, atol=1e-4, rtol=1e-4)
    np.testing.assert_array_equal(out[8:], 0.0)
    # backward: grad_other must not absorb padding-row contributions
    g = jax.grad(lambda o: ops.segment_matmul(inputs, ptr, o,
                                              bias=bias).sum())(other)
    gref = np.stack([
        np.asarray(inputs)[:4].T @ np.ones((4, 4), np.float32),
        np.asarray(inputs)[4:8].T @ np.ones((4, 4), np.float32),
    ])
    np.testing.assert_allclose(np.asarray(g), gref, atol=1e-4, rtol=1e-4)
