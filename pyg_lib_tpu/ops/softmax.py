"""Sparse (CSR-grouped) softmax with custom backward.

TPU-native counterpart of the reference fused sparse softmax
(reference ``pyg_lib/csrc/ops/cpu/softmax_kernel.cpp:55-155`` forward /
``:157-233`` backward, ``csrc/ops/autograd/softmax_kernel.cpp``, Python
wrapper ``pyg_lib/ops/__init__.py:324-350``).

Forward: 3 logical passes (group max → exp/sum → normalise) over `ptr`
groups; backward is the fused ``out * (grad - sum(out*grad))`` per group —
same closed form as the reference.  XLA fuses all passes; no Pallas needed
for this op until the attention benchmarks say otherwise.
"""

from functools import partial

import jax
import jax.numpy as jnp

from pyg_lib_tpu.utils import Array, canonicalize_dim, indptr_to_index

__all__ = ['softmax_csr']


def _group_ops(src: Array, ptr: Array, dim: int):
    n = src.shape[dim]
    ids = indptr_to_index(ptr, n)
    num_groups = ptr.shape[0] - 1
    return ids, num_groups


def _softmax_fwd_impl(src: Array, ptr: Array, dim: int) -> Array:
    ids, num_groups = _group_ops(src, ptr, dim)
    src_m = jnp.moveaxis(src, dim, 0)
    neg_inf = jnp.array(-jnp.inf, src.dtype)
    gmax = jnp.full((num_groups, ) + src_m.shape[1:], neg_inf, src.dtype)
    gmax = gmax.at[ids].max(src_m, mode='drop', indices_are_sorted=True)
    centered = src_m - gmax[ids]
    e = jnp.exp(centered)
    gsum = jnp.zeros((num_groups, ) + src_m.shape[1:], src.dtype)
    gsum = gsum.at[ids].add(e, mode='drop', indices_are_sorted=True)
    out_m = e / gsum[ids]
    return jnp.moveaxis(out_m, 0, dim)


@partial(jax.custom_vjp, nondiff_argnums=(2, ))
def _softmax_csr(src: Array, ptr: Array, dim: int = 0) -> Array:
    return _softmax_fwd_impl(src, ptr, dim)


def _softmax_vjp_fwd(src, ptr, dim):
    out = _softmax_fwd_impl(src, ptr, dim)
    return out, (out, ptr)


def _softmax_vjp_bwd(dim, res, g):
    out, ptr = res
    # Fused backward: grad_in = out * (g - sum_group(out * g))
    # (reference csrc/ops/cpu/softmax_kernel.cpp:207-227).
    ids, num_groups = _group_ops(out, ptr, dim)
    out_m = jnp.moveaxis(out, dim, 0)
    g_m = jnp.moveaxis(g, dim, 0)
    prod = out_m * g_m
    gsum = jnp.zeros((num_groups, ) + out_m.shape[1:], out.dtype)
    gsum = gsum.at[ids].add(prod, mode='drop', indices_are_sorted=True)
    grad_m = out_m * (g_m - gsum[ids])
    return jnp.moveaxis(grad_m, 0, dim), None


_softmax_csr.defvjp(_softmax_vjp_fwd, _softmax_vjp_bwd)


def softmax_csr(src: Array, ptr: Array, dim: int = 0) -> Array:
    """Sparsely-evaluated softmax over CSR groups.

    Parity: reference ``pyg_lib.ops.softmax_csr``
    (``pyg_lib/ops/__init__.py:324-350``).
    """
    dim = canonicalize_dim(dim, src.ndim)
    return _softmax_csr(src, ptr, dim)
