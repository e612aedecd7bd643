"""Moving-horizon estimation (MHE): constrained estimation as a QP.

The optimization-based dual of the Kalman filter: over a window of M
measurements, estimate the state trajectory by minimizing

    J = ||x_0 - x_prior||^2_{P0^-1} + sum_k ||w_k||^2_{Q^-1}
        + sum_k ||y_k - C x_k||^2_{R^-1}
    s.t. x_{k+1} = A x_k + B u_k + w_k      (k = 0..M-1)
         x_lo <= x_k <= x_hi                (optional — the MHE payoff)

Condensed exactly like the MPC QP (models/condensed.py): states are
eliminated through the prediction matrices, the decision variable is
d = [x_0; w_0..w_{M-1}], and the problem becomes a dense QP whose
unconstrained optimum EQUALS the RTS smoother (tested), while state bounds
route through the same OSQP splitting as state-constrained MPC
(models/admm.solve_qp_osqp) — one solver stack for control AND estimation.

Reference parity: nothing comparable exists; the reference user has only
eager cholesky/solve (linalg.c:981-1102) and no way to express either the
window QP or its batched solve.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from numpower_tpu.models.admm import solve_qp_osqp
from numpower_tpu.models.condensed import (
    _power_iteration_lmax, prediction_matrices,
)


class MHEResult(NamedTuple):
    xs: jax.Array          # (M+1, n) estimated states x_0..x_M
    ws: jax.Array          # (M, n) estimated process noise
    objective: jax.Array   # scalar J at the solution
    primal_residual: jax.Array  # OSQP residual (0.0 for unconstrained)


def _mhe_matrices(A, C, Q, R, P0, M: int):
    """Static window matrices: G maps d=[x0; W] to stacked predicted
    measurements; Hq/gq build the condensed QP (formed once per window
    size, shared across solves — condense() pattern)."""
    n = A.shape[0]
    p = C.shape[0]
    dt = A.dtype
    Sx, Sn = prediction_matrices(A, jnp.eye(n, dtype=dt), M)  # noise enters via I
    Md = jnp.concatenate([Sx, Sn], axis=1)            # (M n, n(M+1))
    Cb = jax.scipy.linalg.block_diag(*([C] * M))      # (M p, M n)
    G = Cb @ Md                                       # (M p, n(M+1))
    P0inv = jnp.linalg.inv(P0)
    Qinv = jnp.linalg.inv(Q)
    Rinv = jnp.linalg.inv(R)
    Pblk = jax.scipy.linalg.block_diag(P0inv, *([Qinv] * M))
    Rblk = jax.scipy.linalg.block_diag(*([Rinv] * M))
    GtR = G.T @ Rblk
    Hq = 2.0 * (Pblk + GtR @ G)
    Hq = 0.5 * (Hq + Hq.T)
    return Md, Cb, Pblk, Rblk, GtR, Hq, P0inv


def mhe_solve(
    A: jax.Array,
    C: jax.Array,
    Q: jax.Array,
    R: jax.Array,
    P0: jax.Array,
    x_prior: jax.Array,   # (n,) arrival-cost mean for x_0
    ys: jax.Array,        # (M, p) window measurements y_1..y_M
    B: Optional[jax.Array] = None,
    us: Optional[jax.Array] = None,   # (M, m) known inputs u_0..u_{M-1}
    x_lo=None,
    x_hi=None,
    iters: int = 100,
) -> MHEResult:
    """Solve one MHE window; jit-compatible, vmap over (x_prior, ys[, us])
    for batched windows. Without bounds this is the exact linear-Gaussian
    smoother (one Cholesky solve); with bounds it runs the OSQP splitting."""
    M, p = ys.shape
    n = A.shape[0]
    dt = A.dtype
    Md, Cb, Pblk, Rblk, GtR, Hq, P0inv = _mhe_matrices(A, C, Q, R, P0, M)

    if us is None:
        c = jnp.zeros((M * n,), dt)
    else:
        if B is None:
            raise ValueError("us requires B (the input matrix)")
        # known-input contribution to the stacked states: Su @ U
        _, Su = prediction_matrices(A, B, M)
        c = Su @ us.reshape(-1)

    e = ys.reshape(-1) - Cb @ c
    gq = -2.0 * (GtR @ e + jnp.concatenate(
        [P0inv @ x_prior, jnp.zeros((M * n,), dt)]))

    if x_lo is None and x_hi is None:
        L = jnp.linalg.cholesky(Hq)
        d = jax.scipy.linalg.cho_solve((L, True), -gq)
        r_prim = jnp.asarray(0.0, dt)
    else:
        lo = -jnp.inf if x_lo is None else x_lo
        hi = jnp.inf if x_hi is None else x_hi
        xl = jnp.broadcast_to(jnp.asarray(lo, dt), (n,))
        xh = jnp.broadcast_to(jnp.asarray(hi, dt), (n,))
        # bounds on x_0 (the first n entries of d) and on x_1..x_M (= Md d + c)
        Ac = jnp.concatenate([
            jnp.concatenate(
                [jnp.eye(n, dtype=dt), jnp.zeros((n, M * n), dt)], axis=1),
            Md,
        ], axis=0)
        l = jnp.concatenate([xl, jnp.tile(xl, M) - c])
        u = jnp.concatenate([xh, jnp.tile(xh, M) - c])
        # geometric-mean rho: Hq = 2(Pblk + G'RinvG) >= 2 Pblk, so the
        # smallest block eigenvalue bounds lam_min; inverse-covariance
        # weights make lam_max huge (1/Q scale), so rho=1 converges slowly
        mu_bound = 2.0 * jnp.minimum(
            jnp.linalg.eigvalsh(P0inv)[0], jnp.linalg.eigvalsh(
                jnp.linalg.inv(Q))[0])
        rho = jnp.sqrt(_power_iteration_lmax(Hq) * jnp.maximum(mu_bound, 1e-9))
        res = solve_qp_osqp(Hq, gq, Ac, l, u, rho=rho, iters=iters)
        d, r_prim = res.U, res.primal_residual

    x0 = d[:n]
    W = d[n:].reshape(M, n)
    X = (Md @ d + c).reshape(M, n)
    xs = jnp.concatenate([x0[None], X], axis=0)
    obj = 0.5 * d @ (Hq @ d) + gq @ d
    return MHEResult(xs=xs, ws=W, objective=obj, primal_residual=r_prim)
