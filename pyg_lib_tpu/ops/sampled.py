"""Fused sampled binary ops: ``out = left[left_index] op right[right_index]``.

TPU-native counterpart of the reference sampled-op subsystem
(reference ``pyg_lib/csrc/ops/cpu/sampled_kernel.cpp:17-46``,
``csrc/ops/cuda/sampled_kernel.cu`` fused kernel,
``csrc/ops/autograd/sampled_kernel.cpp`` gradients, Python wrappers
``pyg_lib/ops/__init__.py:175-292``).

On TPU the fusion the reference hand-writes in CUDA comes for free: XLA
fuses the two gathers with the elementwise binop into one HBM pass.  These
are the SDDMM building block (edge features from node features).
"""

from typing import Optional

import jax.numpy as jnp

from pyg_lib_tpu.utils import Array

__all__ = ['sampled_add', 'sampled_sub', 'sampled_mul', 'sampled_div']


def _sampled_op(left: Array, right: Array, left_index: Optional[Array],
                right_index: Optional[Array], op: str) -> Array:
    a = left if left_index is None else jnp.take(left, left_index, axis=0)
    b = right if right_index is None else jnp.take(right, right_index, axis=0)
    if op == 'add':
        return a + b
    if op == 'sub':
        return a - b
    if op == 'mul':
        return a * b
    if op == 'div':
        return a / b
    raise ValueError(f'Unknown op: {op!r}')


def sampled_add(left: Array, right: Array,
                left_index: Optional[Array] = None,
                right_index: Optional[Array] = None) -> Array:
    """Parity: reference ``sampled_add``
    (``pyg_lib/ops/__init__.py:175-203``)."""
    return _sampled_op(left, right, left_index, right_index, 'add')


def sampled_sub(left: Array, right: Array,
                left_index: Optional[Array] = None,
                right_index: Optional[Array] = None) -> Array:
    """Parity: reference ``sampled_sub``."""
    return _sampled_op(left, right, left_index, right_index, 'sub')


def sampled_mul(left: Array, right: Array,
                left_index: Optional[Array] = None,
                right_index: Optional[Array] = None) -> Array:
    """Parity: reference ``sampled_mul``."""
    return _sampled_op(left, right, left_index, right_index, 'mul')


def sampled_div(left: Array, right: Array,
                left_index: Optional[Array] = None,
                right_index: Optional[Array] = None) -> Array:
    """Parity: reference ``sampled_div``."""
    return _sampled_op(left, right, left_index, right_index, 'div')
