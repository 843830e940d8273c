"""Test utilities (counterpart of reference ``pyg_lib/testing.py``).

The reference parametrises over cpu/cuda devices (``withCUDA``,
``testing.py:42-49``) and fixes seeds (``withSeed``, ``:15-21``).  Here the
device matrix collapses to the active JAX backend; seeds are explicit
``jax.random`` keys.  Golden-reference helpers produce pure-numpy expected
values.
"""

import functools

import jax
import numpy as np

__all__ = ['withSeed', 'assert_allclose', 'cycle_graph']

SEED = 12345


def withSeed(fn):
    """Injects a fixed jax.random key (reference seed 12345,
    ``pyg_lib/testing.py:15-21``)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        kwargs['key'] = jax.random.key(SEED)
        return fn(*args, **kwargs)

    return wrapper


def assert_allclose(actual, expected, rtol=1e-6, atol=1e-6):
    np.testing.assert_allclose(np.asarray(jax.device_get(actual)),
                               np.asarray(expected), rtol=rtol, atol=atol)


def cycle_graph(num_nodes: int = 6):
    """Cycle-graph fixture: every node has exactly two neighbours
    ``(v±1) % n`` so expected sampler outputs are hand-computable.

    Port of the reference C++ test fixture ``test/csrc/graph.h:5-18``.
    Returns CSR ``(rowptr, col)`` as numpy int64.
    """
    n = num_nodes
    rowptr = np.arange(0, 2 * n + 1, 2, dtype=np.int64)
    col = np.empty(2 * n, dtype=np.int64)
    for v in range(n):
        col[2 * v] = (v - 1) % n
        col[2 * v + 1] = (v + 1) % n
    return rowptr, col
