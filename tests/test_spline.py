"""SplineCNN basis/weighting vs closed-form numpy references.

Mirrors the reference spline tests (reference ``test/ops/test_spline.py``)
with independent numpy golden values.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyg_lib_tpu import ops


def _spline_basis_ref(pseudo, kernel_size, is_open_spline, degree):
    """Direct numpy port of the closed-form definition."""
    E, D = pseudo.shape
    p1 = degree + 1
    S = p1**D

    def b(v, k):
        if degree == 1:
            return [1 - v, v][k]
        if degree == 2:
            return [0.5 * v**2 - v + 0.5, -v**2 + v + 0.5, 0.5 * v**2][k]
        if degree == 3:
            return [(1 - v)**3 / 6, (3 * v**3 - 6 * v**2 + 4) / 6,
                    (-3 * v**3 + 3 * v**2 + 3 * v + 1) / 6, v**3 / 6][k]

    basis = np.zeros((E, S))
    wi = np.zeros((E, S), np.int64)
    for e in range(E):
        for s in range(S):
            prod = 1.0
            idx = 0
            stride = 1
            for d in range(D):
                k = (s // p1**d) % p1
                v = pseudo[e, d] * (kernel_size[d] -
                                    degree * is_open_spline[d])
                frac = v - np.floor(v)
                prod *= b(frac, k)
                idx += int((np.floor(v) + k) % kernel_size[d]) * stride
                stride *= int(kernel_size[d])
            basis[e, s] = prod
            wi[e, s] = idx
    return basis, wi


@pytest.mark.parametrize('degree', [1, 2, 3])
@pytest.mark.parametrize('open_spline', [1, 0])
def test_spline_basis_matches_reference(degree, open_spline):
    rng = np.random.default_rng(0)
    E, D = 20, 2
    pseudo = rng.uniform(0, 0.99, size=(E, D)).astype(np.float32)
    ks = np.array([5, 4])
    iso = np.array([open_spline, open_spline])

    basis, wi = ops.spline_basis(jnp.asarray(pseudo), jnp.asarray(ks),
                                 jnp.asarray(iso), degree)
    rb, rwi = _spline_basis_ref(pseudo.astype(np.float64), ks, iso, degree)
    np.testing.assert_allclose(np.asarray(basis), rb, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(wi), rwi)


def test_spline_basis_partition_of_unity():
    # For open splines the basis functions sum to 1 at every point.
    rng = np.random.default_rng(1)
    pseudo = rng.uniform(0, 0.99, size=(50, 3)).astype(np.float32)
    ks = jnp.asarray(np.array([5, 5, 5]))
    iso = jnp.asarray(np.array([1, 1, 1]))
    basis, _ = ops.spline_basis(jnp.asarray(pseudo), ks, iso, degree=2)
    np.testing.assert_allclose(np.asarray(basis).sum(-1), 1.0, atol=1e-5)


def test_spline_weighting_matches_loop():
    rng = np.random.default_rng(2)
    E, S, Mi, Mo, K = 10, 4, 6, 5, 20
    x = rng.normal(size=(E, Mi)).astype(np.float32)
    weight = rng.normal(size=(K, Mi, Mo)).astype(np.float32)
    basis = rng.uniform(size=(E, S)).astype(np.float32)
    wi = rng.integers(0, K, size=(E, S))

    out = ops.spline_weighting(jnp.asarray(x), jnp.asarray(weight),
                               jnp.asarray(basis), jnp.asarray(wi))
    ref = np.zeros((E, Mo), np.float32)
    for e in range(E):
        for s in range(S):
            ref[e] += basis[e, s] * (x[e] @ weight[wi[e, s]])
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-3, rtol=1e-3)


def test_spline_grads_finite():
    rng = np.random.default_rng(3)
    pseudo = jnp.asarray(rng.uniform(0.01, 0.98, size=(12, 2)).astype(
        np.float32))
    ks = jnp.asarray(np.array([5, 5]))
    iso = jnp.asarray(np.array([1, 1]))
    x = jnp.asarray(rng.normal(size=(12, 4)).astype(np.float32))
    weight = jnp.asarray(rng.normal(size=(25, 4, 3)).astype(np.float32))

    def f(pseudo, x, weight):
        basis, wi = ops.spline_basis(pseudo, ks, iso, degree=2)
        return jnp.sum(ops.spline_weighting(x, weight, basis, wi)**2)

    grads = jax.grad(f, argnums=(0, 1, 2))(pseudo, x, weight)
    assert all(bool(jnp.isfinite(g).all()) for g in grads)
