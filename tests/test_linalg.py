"""Linalg parity tests.

Mirrors /root/reference/tests/linalg/*.phpt (matmul 2x2, matrix x column,
cholesky, solve, det, svd, ...) and validates the batched generalizations the
reference lacks (linalg.c:240-243 rejects batched matmul; Dot Nd.Nd
unimplemented linalg.c:387-391).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from numpower_tpu import ops

M = np.array([[1.0, 2.0], [3.0, 4.0]], np.float32)
SPD = np.array([[4.0, 2.0], [2.0, 3.0]], np.float32)


def test_matmul_2x2():
    # mirrors tests/linalg/001-ndarray-matmul.phpt
    np.testing.assert_allclose(np.asarray(ops.matmul(M, M)), M @ M, rtol=1e-6)
    col = np.array([[1.0], [2.0]], np.float32)
    np.testing.assert_allclose(np.asarray(ops.matmul(M, col)), M @ col, rtol=1e-6)


def test_matmul_batched_superset():
    a = np.random.default_rng(0).standard_normal((5, 3, 4)).astype(np.float32)
    b = np.random.default_rng(1).standard_normal((5, 4, 2)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(ops.matmul(a, b)), a @ b, rtol=1e-4, atol=1e-5)


def test_dot_dispatch():
    v = np.array([1.0, 2.0], np.float32)
    assert float(ops.dot(v, v)) == 5.0  # 1d.1d -> inner
    np.testing.assert_allclose(np.asarray(ops.dot(M, M)), M @ M, rtol=1e-6)  # 2d.2d
    np.testing.assert_allclose(np.asarray(ops.dot(M, v)), M @ v, rtol=1e-6)  # gemv
    # Nd.Nd — unimplemented in the reference, works here:
    a = np.ones((2, 3, 4), np.float32)
    b = np.ones((4, 5), np.float32)
    np.testing.assert_allclose(np.asarray(ops.dot(a, b)), np.dot(a, b), rtol=1e-6)


def test_inner_outer():
    v = np.array([1.0, 2.0, 3.0], np.float32)
    w = np.array([4.0, 5.0, 6.0], np.float32)
    assert float(ops.inner(v, w)) == np.inner(v, w)
    np.testing.assert_allclose(np.asarray(ops.outer(v, w)), np.outer(v, w), rtol=1e-6)


def test_cholesky():
    L = np.asarray(ops.cholesky(SPD))
    np.testing.assert_allclose(L, np.linalg.cholesky(SPD), rtol=1e-5)
    U = np.asarray(ops.cholesky(SPD, upper=True))
    np.testing.assert_allclose(U, np.linalg.cholesky(SPD).T, rtol=1e-5)


def test_cholesky_batched():
    rng = np.random.default_rng(3)
    a = rng.standard_normal((8, 5, 5)).astype(np.float32)
    spd = a @ a.transpose(0, 2, 1) + 5 * np.eye(5, dtype=np.float32)
    L = np.asarray(ops.cholesky(spd))
    np.testing.assert_allclose(L @ L.transpose(0, 2, 1), spd, rtol=1e-3, atol=1e-3)


def test_solve():
    b = np.array([1.0, 2.0], np.float32)
    x = np.asarray(ops.solve(M, b))
    np.testing.assert_allclose(M @ x, b, rtol=1e-4, atol=1e-5)
    B = np.array([[1.0, 0.0], [0.0, 1.0]], np.float32)
    X = np.asarray(ops.solve(M, B))
    np.testing.assert_allclose(M @ X, B, rtol=1e-4, atol=1e-4)


def test_solve_triangular_and_cho_solve():
    L = np.linalg.cholesky(SPD).astype(np.float32)
    b = np.array([1.0, 2.0], np.float32)
    y = np.asarray(ops.solve_triangular(L, b, lower=True))
    np.testing.assert_allclose(L @ y, b, rtol=1e-5)
    x = np.asarray(ops.cho_solve(L, b))
    np.testing.assert_allclose(SPD @ x, b, rtol=1e-4, atol=1e-5)


def test_inv_det():
    np.testing.assert_allclose(np.asarray(ops.inv(M)), np.linalg.inv(M), rtol=1e-4)
    np.testing.assert_allclose(float(ops.det(M)), np.linalg.det(M), rtol=1e-5)


def test_lu():
    P, L, U = ops.lu(M)
    np.testing.assert_allclose(
        np.asarray(P) @ np.asarray(L) @ np.asarray(U), M, rtol=1e-5, atol=1e-6
    )
    # L unit lower, U upper
    np.testing.assert_allclose(np.tril(np.asarray(L), -1), np.asarray(L) - np.eye(2), atol=1e-6)


def test_qr_complete():
    # reference sgeqrf never forms Q (incomplete); ours returns proper (Q, R)
    Q, R = ops.qr(M)
    np.testing.assert_allclose(np.asarray(Q) @ np.asarray(R), M, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(Q).T @ np.asarray(Q), np.eye(2), rtol=1e-4, atol=1e-5
    )


def test_svd():
    U, S, Vt = ops.svd(M)
    recon = np.asarray(U) @ np.diag(np.asarray(S)) @ np.asarray(Vt)
    np.testing.assert_allclose(recon, M, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(S), np.linalg.svd(M, compute_uv=False), rtol=1e-5)


def test_eig_host_fallback():
    w, v = ops.eig(SPD)
    w_np, _ = np.linalg.eig(SPD)
    np.testing.assert_allclose(np.sort(np.asarray(w)), np.sort(w_np), rtol=1e-5)
    # A v = w v
    np.testing.assert_allclose(
        SPD @ np.asarray(v), np.asarray(v) * np.asarray(w), rtol=1e-4, atol=1e-4
    )


def test_eigh():
    w, v = ops.eigh(SPD)
    np.testing.assert_allclose(
        SPD @ np.asarray(v), np.asarray(v) * np.asarray(w), rtol=1e-4, atol=1e-4
    )


def test_norms():
    # linalg.c:424-447: l1 = max abs column sum; l2 = max singular value
    np.testing.assert_allclose(float(ops.norm(M, "l1")), np.linalg.norm(M, 1), rtol=1e-6)
    np.testing.assert_allclose(float(ops.norm(M, "l2")), np.linalg.norm(M, 2), rtol=1e-5)
    v = np.array([3.0, 4.0], np.float32)
    assert float(ops.norm(v)) == 5.0


def test_cond_rank_trace():
    np.testing.assert_allclose(float(ops.cond(M)), np.linalg.cond(M, 2), rtol=1e-4)
    assert int(ops.matrix_rank(M)) == 2
    assert int(ops.matrix_rank(np.ones((3, 3), np.float32))) == 1
    assert float(ops.trace(M)) == 5.0


def test_lstsq():
    a = np.array([[1.0, 1.0], [1.0, 2.0], [1.0, 3.0]], np.float32)
    b = np.array([6.0, 9.0, 12.0], np.float32)
    x = np.asarray(ops.lstsq(a, b))
    expected, *_ = np.linalg.lstsq(a, b, rcond=None)
    np.testing.assert_allclose(x, expected, rtol=1e-3, atol=1e-3)


def test_eig_jittable():
    """VERDICT r1 #2: eig must work under jit (host pure_callback)."""
    w, v = jax.jit(ops.eig)(SPD)
    w_np, _ = np.linalg.eig(np.asarray(SPD, np.float64))
    np.testing.assert_allclose(np.sort(np.asarray(w)), np.sort(w_np), rtol=1e-5)
    # eigenpair residual: A v = w v
    resid = np.asarray(SPD) @ np.asarray(v) - np.asarray(v) * np.asarray(w)[None, :]
    assert np.max(np.abs(resid)) < 1e-4


def test_eig_complex_spectrum():
    """Rotation matrix: complex eigenvalues preserved by eig_complex,
    real parts returned by eig (reference discards wi — linalg.c:770-838)."""
    R = np.array([[0.0, -1.0], [1.0, 0.0]], np.float32)
    wc, vc = jax.jit(ops.eig_complex)(R)
    np.testing.assert_allclose(np.sort_complex(np.asarray(wc)),
                               np.array([-1j, 1j], np.complex64), atol=1e-6)
    w, _ = ops.eig(R)
    np.testing.assert_allclose(np.asarray(w), np.zeros(2), atol=1e-6)


def test_eig_vmap():
    rng = np.random.default_rng(7)
    batch = jnp.asarray(rng.standard_normal((4, 3, 3)).astype(np.float32))
    sym = batch + jnp.swapaxes(batch, -1, -2)  # real spectra
    w, v = jax.vmap(ops.eig)(sym)
    assert w.shape == (4, 3) and v.shape == (4, 3, 3)
    for i in range(4):
        w_np = np.linalg.eigvals(np.asarray(sym[i], np.float64))
        np.testing.assert_allclose(np.sort(np.asarray(w[i])),
                                   np.sort(w_np.real), rtol=1e-4, atol=1e-5)


def test_eigvals_jittable():
    w = jax.jit(ops.eigvals)(SPD)
    w_np = np.linalg.eigvals(np.asarray(SPD, np.float64))
    np.testing.assert_allclose(np.sort(np.asarray(w)), np.sort(w_np.real), rtol=1e-5)
