"""utils/smallmat.py: trace-time-unrolled small-matrix linear algebra.

These kernels replace XLA's blocked cholesky/LU custom calls on every
hot path that factors n <= 16 matrices (estimation combines, Riccati
combines, iLQR backward solves) — parity here is against numpy's LAPACK
results, the same oracle the reference's linalg tests use
(/root/reference/tests/ndmath/, linalg.c:1068 spotrf, :893 sgesv).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from numpower_tpu.utils.smallmat import (
    cholesky_unrolled, lu_solve_unrolled, psd_solve_unrolled, solve_small,
    tri_solve_unrolled,
)


def _spd(rng, shape_batch, n):
    A = rng.standard_normal(shape_batch + (n, n)).astype(np.float32)
    return A @ np.swapaxes(A, -1, -2) + n * np.eye(n, dtype=np.float32)


@pytest.mark.parametrize("n", [1, 2, 3, 4, 8, 12, 16])
def test_cholesky_unrolled_matches_lapack(n):
    rng = np.random.default_rng(n)
    M = _spd(rng, (6,), n)
    L = np.asarray(cholesky_unrolled(jnp.asarray(M)))
    np.testing.assert_allclose(L, np.linalg.cholesky(M), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("n", [1, 2, 3, 4, 8, 12, 16])
def test_psd_solve_unrolled(n):
    rng = np.random.default_rng(10 + n)
    M = _spd(rng, (5,), n)
    rhs = rng.standard_normal((5, n, 3)).astype(np.float32)
    X = np.asarray(psd_solve_unrolled(jnp.asarray(M), jnp.asarray(rhs)))
    np.testing.assert_allclose(X, np.linalg.solve(M, rhs), rtol=2e-4,
                               atol=2e-4)
    # vector rhs variant
    v = rng.standard_normal((5, n)).astype(np.float32)
    xv = np.asarray(psd_solve_unrolled(jnp.asarray(M), jnp.asarray(v)))
    np.testing.assert_allclose(
        xv, np.linalg.solve(M, v[..., None])[..., 0], rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("lower", [True, False])
def test_tri_solve_unrolled(lower):
    rng = np.random.default_rng(3)
    n = 6
    L = np.tril(rng.standard_normal((4, n, n)).astype(np.float32)) + \
        2 * np.eye(n, dtype=np.float32)
    if not lower:
        L = np.swapaxes(L, -1, -2)
    rhs = rng.standard_normal((4, n, 2)).astype(np.float32)
    X = np.asarray(tri_solve_unrolled(jnp.asarray(L), jnp.asarray(rhs),
                                      lower=lower))
    np.testing.assert_allclose(X, np.linalg.solve(L, rhs), rtol=2e-5,
                               atol=2e-5)


@pytest.mark.parametrize("n", [2, 4, 12, 16])
def test_lu_solve_unrolled_general(n):
    rng = np.random.default_rng(20 + n)
    M = rng.standard_normal((5, n, n)).astype(np.float32) + \
        2 * np.eye(n, dtype=np.float32)
    rhs = rng.standard_normal((5, n, 4)).astype(np.float32)
    X = np.asarray(lu_solve_unrolled(jnp.asarray(M), jnp.asarray(rhs)))
    ref = np.linalg.solve(M, rhs)
    np.testing.assert_allclose(X, ref, rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("n", [4, 8, 12])
def test_lu_pivoting_handles_zero_leading_pivot(n):
    """A cyclic permutation matrix has a zero leading pivot at every
    elimination step — only partial pivoting survives it."""
    P = np.zeros((n, n), np.float32)
    P[np.arange(n), (np.arange(n) + 1) % n] = 1.0
    rhs = np.random.default_rng(1).standard_normal((1, n, 2)).astype(
        np.float32)
    X = np.asarray(lu_solve_unrolled(jnp.asarray(P[None]), jnp.asarray(rhs)))
    np.testing.assert_allclose(X, np.linalg.solve(P[None], rhs), atol=1e-6)


@pytest.mark.parametrize("n", [1, 2, 3, 5, 12])
def test_solve_small_all_regimes(n):
    """solve_small dispatches adjugate (n<=3) / unrolled LU (<=16); all
    must agree with LAPACK."""
    rng = np.random.default_rng(30 + n)
    M = rng.standard_normal((8, n, n)).astype(np.float32) + \
        2 * np.eye(n, dtype=np.float32)
    rhs = rng.standard_normal((8, n, 3)).astype(np.float32)
    X = np.asarray(solve_small(jnp.asarray(M), jnp.asarray(rhs)))
    np.testing.assert_allclose(X, np.linalg.solve(M, rhs), rtol=3e-4,
                               atol=3e-4)


def test_jit_and_vmap_composability():
    rng = np.random.default_rng(0)
    M = jnp.asarray(_spd(rng, (4,), 5))
    rhs = jnp.asarray(rng.standard_normal((4, 5, 2)).astype(np.float32))
    jitted = jax.jit(psd_solve_unrolled)(M, rhs)
    vmapped = jax.vmap(psd_solve_unrolled)(M, rhs)
    np.testing.assert_allclose(np.asarray(jitted), np.asarray(vmapped),
                               rtol=1e-6, atol=1e-6)
