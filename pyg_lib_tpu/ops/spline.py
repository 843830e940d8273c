"""SplineCNN B-spline basis and weighting ops.

TPU-native counterpart of the reference spline subsystem
(reference ``pyg_lib/csrc/ops/cpu/spline_kernel.cpp:11-60`` closed-form
bases, forward kernel ``:83-132``, ``csrc/ops/cuda/spline_kernel.cu``,
autograd shims ``csrc/ops/autograd/spline_kernel.cpp``, Python wrappers
``pyg_lib/ops/__init__.py:984-1031``).

Design: fully vectorised — the per-(e, s, d) triple loop of the reference
becomes one gather + product over a static ``[S, D]`` digit table, and
``spline_weighting`` is an einsum over gathered weight slices, so both run
on VPU/MXU.  Gradients come from plain JAX AD: ``frac = v - floor(v)`` has
``d frac/d v = 1`` a.e. (floor's grad is 0), which reproduces exactly the
reference's hand-written backward (``spline_kernel.cpp:37-59``).
"""

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from pyg_lib_tpu.utils import Array

__all__ = ['spline_basis', 'spline_weighting']


def _basis_closed_form(v: Array, degree: int) -> Array:
    """Stack of the (degree+1) basis polynomials evaluated at v: [..., p+1].

    Closed forms from reference ``spline_kernel.cpp:13-35``.
    """
    if degree == 1:
        return jnp.stack([1.0 - v, v], axis=-1)
    if degree == 2:
        return jnp.stack([
            0.5 * v * v - v + 0.5,
            -v * v + v + 0.5,
            0.5 * v * v,
        ], axis=-1)
    if degree == 3:
        return jnp.stack([
            (1.0 - v)**3 / 6.0,
            (3.0 * v**3 - 6.0 * v * v + 4.0) / 6.0,
            (-3.0 * v**3 + 3.0 * v * v + 3.0 * v + 1.0) / 6.0,
            v**3 / 6.0,
        ], axis=-1)
    raise ValueError(f'Basis degree {degree} not implemented')


def spline_basis(pseudo: Array, kernel_size: Array, is_open_spline: Array,
                 degree: int = 1) -> Tuple[Array, Array]:
    """Computes B-spline bases and weight indices.

    Parity: reference ``pyg_lib.ops.spline_basis``
    (``pyg_lib/ops/__init__.py:984-1010``).

    Args:
        pseudo: ``[E, D]`` pseudo-coordinates in ``[0, 1]``.
        kernel_size: ``[D]`` int kernel size per dim.
        is_open_spline: ``[D]`` 0/1 per dim.
        degree: B-spline degree (1-3).

    Returns:
        ``(basis [E, S], weight_index [E, S])`` with ``S = (degree+1)**D``.
    """
    E, D = pseudo.shape
    p1 = degree + 1
    S = p1**D

    # Static digit table: k_mod[s, d] = d-th base-(p+1) digit of s
    # (reference loop spline_kernel.cpp:108-126).
    s_idx = np.arange(S)
    kmod = np.stack([(s_idx // (p1**d)) % p1 for d in range(D)],
                    axis=1)  # [S, D]
    kmod_j = jnp.asarray(kmod, dtype=jnp.int32)

    ks = kernel_size.astype(pseudo.dtype)
    open_f = is_open_spline.astype(pseudo.dtype)
    scale = ks - degree * open_f  # [D]
    v = pseudo * scale  # [E, D]
    vfloor = jnp.floor(v)
    frac = v - vfloor

    b_all = _basis_closed_form(frac, degree)  # [E, D, p+1]
    dims = jnp.arange(D, dtype=jnp.int32)
    # basis[e, s] = prod_d b_all[e, d, kmod[s, d]]
    chosen = b_all[:, dims[None, :], kmod_j]  # [E, S, D]
    basis = jnp.prod(chosen, axis=-1)

    ks_i = kernel_size.astype(jnp.int64)
    stride = jnp.concatenate([
        jnp.ones((1, ), jnp.int64),
        jnp.cumprod(ks_i)[:-1],
    ])  # [D]
    vint = vfloor.astype(jnp.int64)  # [E, D]
    wi_d = (vint[:, None, :] + kmod_j.astype(jnp.int64)) % ks_i  # [E, S, D]
    weight_index = jnp.sum(wi_d * stride, axis=-1)  # [E, S]
    return basis, weight_index


def spline_weighting(x: Array, weight: Array, basis: Array,
                     weight_index: Array) -> Array:
    """Basis-weighted feature transform.

    Parity: reference ``pyg_lib.ops.spline_weighting``
    (``pyg_lib/ops/__init__.py:1013-1031``;
    CPU kernel ``spline_kernel.cpp:196-245``).

    ``out[e] = sum_s basis[e, s] * (x[e] @ weight[weight_index[e, s]])``.
    """
    w_g = jnp.take(weight, weight_index, axis=0)  # [E, S, M_in, M_out]
    return jnp.einsum('es,ei,esio->eo', basis, x, w_g,
                      preferred_element_type=x.dtype)
