"""Stable integer sort returning (values, permutation).

TPU-native counterpart of reference ``index_sort``
(reference ``pyg_lib/csrc/ops/cpu/index_sort_kernel.cpp:14-59`` fbgemm radix
sort; Python wrapper ``pyg_lib/ops/__init__.py:295-321``).

On device, ``jax.lax.sort`` is a single fused XLA sort (stable) — the radix
specialisation the reference hand-rolls is already how XLA lowers integer
sorts on TPU.  ``max_value`` is accepted for API parity; it is a hint the
XLA sort does not need.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pyg_lib_tpu.utils import Array

__all__ = ['index_sort']


def index_sort(inputs: Array,
               max_value: Optional[int] = None) -> Tuple[Array, Array]:
    """Sorts a 1-D non-negative integer vector ascending; returns
    ``(values, indices)``.

    Parity: reference ``pyg_lib.ops.index_sort``
    (``pyg_lib/ops/__init__.py:295-321``). Stable.
    """
    del max_value  # API parity; XLA's sort needs no bound hint.
    if inputs.ndim != 1:
        raise ValueError('index_sort expects a 1-D tensor')
    perm = jnp.argsort(inputs, stable=True)
    return jnp.take(inputs, perm), perm
