"""Tests for the extended solver families: ADMM box-QP, AL-iLQR, MPPI,
plus the unicycle / planar-quadrotor plants.

Same parity strategy as test_mpc.py: each solver is checked against an
independent fp64 numpy implementation or a previously-validated solver on
the identical problem (BASELINE.md <=1e-4 ambition, relaxed per-solver to
its convergence tolerance).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from numpower_tpu.models import (
    al_ilqr_solve, al_ilqr_solve_batched, cartpole_step, condense,
    double_integrator, gradient_offset, ilqr_solve, mppi_solve,
    mppi_solve_batched, mppi_step, pendulum_step, planar_quadrotor_step,
    quadratic_mppi_cost, quadrotor12, rollout_nonlinear, solve_boxqp_admm,
    solve_boxqp_fista, solve_mpc_boxqp, solve_mpc_boxqp_admm, unicycle_step,
)


@pytest.fixture(scope="module")
def di():
    return double_integrator(0.1)


@pytest.fixture(scope="module")
def quad():
    return quadrotor12(0.02)


# ---------------------------------------------------------------- plants

def test_unicycle_step_kinematics():
    x = jnp.array([0.0, 0.0, 0.0])
    u = jnp.array([1.0, 0.0])
    x1 = np.asarray(unicycle_step(x, u, dt=0.1))
    np.testing.assert_allclose(x1, [0.1, 0.0, 0.0], atol=1e-6)
    # pure rotation does not translate
    x2 = np.asarray(unicycle_step(x, jnp.array([0.0, 1.0]), dt=0.1))
    np.testing.assert_allclose(x2, [0.0, 0.0, 0.1], atol=1e-6)


def test_planar_quadrotor_hover_equilibrium():
    # total thrust m*g split evenly => zero acceleration: state is fixed
    m, g = 1.0, 9.81
    x = jnp.zeros(6)
    u = jnp.array([m * g / 2, m * g / 2])
    x1 = np.asarray(planar_quadrotor_step(x, u, m=m, g=g, dt=0.05))
    np.testing.assert_allclose(x1, np.zeros(6), atol=1e-6)
    # thrust imbalance induces rotation
    x2 = np.asarray(planar_quadrotor_step(x, jnp.array([m * g / 2 + 0.1,
                                                        m * g / 2 - 0.1])))
    assert abs(x2[5]) > 0.0  # nonzero phi_dot


# ---------------------------------------------------------------- ADMM

def _np_boxqp_exact(H, g, lo, hi, iters=20000):
    H = np.asarray(H, np.float64); g = np.asarray(g, np.float64)
    L = np.linalg.eigvalsh(H).max()
    U = np.zeros_like(g)
    for _ in range(iters):
        U = np.clip(U - (1.0 / L) * (U @ H.T + g), lo, hi)
    return U


def test_admm_unconstrained_matches_linear_solve(di):
    A, B = di
    qp = condense(A, B, jnp.eye(2), jnp.eye(1) * 0.1, jnp.eye(2) * 10.0, 10)
    x0s = jnp.array([[0.3, -0.2]])
    g = gradient_offset(qp, x0s)
    res = solve_boxqp_admm(qp.H, g, -1e6, 1e6, rho=float(jnp.sqrt(qp.lipschitz)),
                           iters=200)
    U_ref = -np.linalg.solve(np.asarray(qp.H, np.float64),
                             np.asarray(g[0], np.float64))
    np.testing.assert_allclose(np.asarray(res.U[0]), U_ref, rtol=1e-3, atol=1e-4)
    assert float(res.primal_residual) < 1e-3


def test_admm_constrained_parity_vs_fp64(quad):
    A, B = quad
    qp = condense(A, B, jnp.eye(12), jnp.eye(4) * 0.1, jnp.eye(12) * 5.0, 10)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.standard_normal((4, 12)).astype(np.float32))
    res = solve_mpc_boxqp_admm(qp, x0s, -0.5, 0.5, iters=250)
    for i in range(4):
        g_i = np.asarray(gradient_offset(qp, x0s)[i])
        U_ref = _np_boxqp_exact(qp.H, g_i, -0.5, 0.5)
        np.testing.assert_allclose(np.asarray(res.U[i]), U_ref,
                                   rtol=2e-3, atol=5e-4)
    # z iterate is feasible by construction
    assert float(jnp.max(jnp.abs(res.U))) <= 0.5 + 1e-6


def test_admm_agrees_with_fista(quad):
    A, B = quad
    qp = condense(A, B, jnp.eye(12), jnp.eye(4) * 0.1, jnp.eye(12) * 5.0, 20)
    rng = np.random.default_rng(3)
    x0s = jnp.asarray(0.3 * rng.standard_normal((8, 12)).astype(np.float32))
    r_admm = solve_mpc_boxqp_admm(qp, x0s, -1.0, 1.0, iters=200)
    r_fista = solve_mpc_boxqp(qp, x0s, -1.0, 1.0, iters=300)
    np.testing.assert_allclose(np.asarray(r_admm.U), np.asarray(r_fista.U),
                               rtol=3e-3, atol=1e-3)


def test_admm_jit_and_residual_reporting(di):
    A, B = di
    qp = condense(A, B, jnp.eye(2), jnp.eye(1) * 0.1, jnp.eye(2) * 10.0, 15)
    x0s = jnp.array([[1.0, 0.0], [0.0, -1.0]])

    @jax.jit
    def run(H, g):
        return solve_boxqp_admm(H, g, -0.4, 0.4, rho=2.0, iters=100)

    res = run(qp.H, gradient_offset(qp, x0s))
    assert res.U.shape == (2, 15)
    assert np.isfinite(float(res.primal_residual))
    assert np.isfinite(float(res.dual_residual))


def test_mixed_precision_tail_scales_with_conditioning(di):
    """Regression: the bf16-coarse default must hold the 1e-4 parity bound
    on ILL-conditioned QPs too (kappa~37 here vs ~3.6 on the flagship).
    A fixed 12-iteration fp32 tail leaves ~2.3e-3 error on this problem."""
    from numpower_tpu.models.condensed import default_coarse_iters

    A, B = di
    qp = condense(A, B, jnp.eye(2), jnp.eye(1) * 0.1, jnp.eye(2) * 10.0, 15)
    # mu bound is tight: lam_min(H) ~= 0.1025, lam_min(R) = 0.1
    lam_min = np.linalg.eigvalsh(np.asarray(qp.H, np.float64)).min()
    assert 0.0 < float(qp.mu) <= lam_min + 1e-6
    x0s = jnp.array([[1.0, 0.0], [-0.5, 0.3]])
    res = solve_mpc_boxqp(qp, x0s, -0.5, 0.5, iters=300)  # default schedule
    U_ref = np.stack([
        _np_boxqp_exact(qp.H, np.asarray(gradient_offset(qp, x0s))[i], -0.5, 0.5)
        for i in range(2)
    ])
    err = np.abs(np.asarray(res.U) - U_ref).max()
    assert err < 1e-4, f"mixed-precision error {err:.2e} exceeds parity bound"
    # schedule actually used bf16 for the bulk of iterations
    ci = default_coarse_iters(qp, 300)
    assert 200 < ci < 300
    # under jit (traced qp) the default must not crash — degrades to fp32
    U_jit = jax.jit(lambda q, x: solve_mpc_boxqp(q, x, -0.5, 0.5, iters=60).U)(qp, x0s)
    assert np.all(np.isfinite(np.asarray(U_jit)))


# ---------------------------------------------------------------- AL-iLQR

def _np_osqp_exact(H, g, A, l, u, rho=1.0, sigma=1e-6, iters=20000,
                   alpha=1.6):
    """fp64 OSQP reference run to convergence — ground truth for general
    l <= A U <= u constraints."""
    H = np.asarray(H, np.float64); g = np.asarray(g, np.float64)
    A = np.asarray(A, np.float64)
    l = np.asarray(l, np.float64); u = np.asarray(u, np.float64)
    d = H.shape[0]
    K = np.linalg.inv(H + sigma * np.eye(d) + rho * A.T @ A)
    x = np.zeros(d); z = np.clip(np.zeros(A.shape[0]), l, u); y = np.zeros_like(z)
    for _ in range(iters):
        x = K @ (sigma * x - g + A.T @ (rho * z - y))
        ax = A @ x
        ax_r = alpha * ax + (1 - alpha) * z
        z = np.clip(ax_r + y / rho, l, u)
        y = y + rho * (ax_r - z)
    return x


def test_osqp_matches_box_admm_when_states_loose(di):
    """With state bounds at infinity the OSQP solver must reduce to the
    control-box ADMM optimum."""
    from numpower_tpu.models import solve_mpc_state_constrained

    A, B = di
    qp = condense(A, B, jnp.eye(2), jnp.eye(1) * 0.1, jnp.eye(2) * 10.0, 12)
    x0s = jnp.array([[1.2, 0.0], [-0.4, 0.5]])
    r_box = solve_mpc_boxqp_admm(qp, x0s, -0.5, 0.5, iters=200)
    r_osqp = solve_mpc_state_constrained(qp, x0s, -0.5, 0.5, -1e6, 1e6,
                                         iters=400)
    np.testing.assert_allclose(np.asarray(r_osqp.U), np.asarray(r_box.U),
                               rtol=2e-3, atol=5e-4)
    assert float(r_osqp.primal_residual) < 1e-3


def test_osqp_parity_vs_fp64(quad):
    from numpower_tpu.models import solve_qp_osqp

    A, B = quad
    qp = condense(A, B, jnp.eye(12), jnp.eye(4) * 0.1, jnp.eye(12) * 5.0, 8)
    rng = np.random.default_rng(21)
    x0s = jnp.asarray(0.5 * rng.standard_normal((3, 12)).astype(np.float32))
    g = gradient_offset(qp, x0s)
    d = qp.H.shape[0]
    Ac = jnp.concatenate([jnp.eye(d), qp.Su], axis=0)
    sx = np.asarray(x0s @ qp.Sx.T)
    l = np.concatenate([np.full((3, d), -0.6, np.float32), -2.0 - sx], axis=1)
    u = np.concatenate([np.full((3, d), 0.6, np.float32), 2.0 - sx], axis=1)
    res = solve_qp_osqp(qp.H, g, Ac, jnp.asarray(l), jnp.asarray(u),
                        rho=1.0, iters=800)
    for i in range(3):
        U_ref = _np_osqp_exact(qp.H, np.asarray(g)[i], Ac, l[i], u[i], rho=1.0)
        np.testing.assert_allclose(np.asarray(res.U[i]), U_ref,
                                   rtol=3e-3, atol=3e-3)


def test_state_constraints_actually_bind(di):
    """Drive the double integrator from a large offset with a velocity cap:
    the unconstrained solution exceeds the cap, the constrained one must not."""
    from numpower_tpu.models import solve_mpc_state_constrained
    from numpower_tpu.models import rollout_lti

    A, B = di
    qp = condense(A, B, jnp.diag(jnp.array([10.0, 0.1])), jnp.eye(1) * 0.01,
                  jnp.eye(2) * 20.0, 20)
    x0 = jnp.array([[3.0, 0.0]])
    v_cap = 0.8
    r_un = solve_mpc_boxqp_admm(qp, x0, -50.0, 50.0, iters=200)
    r_c = solve_mpc_state_constrained(qp, x0, -50.0, 50.0,
                                      jnp.array([-10.0, -v_cap]),
                                      jnp.array([10.0, v_cap]), iters=600)
    xs_un = np.asarray(rollout_lti(A, B, x0[0], r_un.U[0].reshape(20, 1)))
    xs_c = np.asarray(rollout_lti(A, B, x0[0], r_c.U[0].reshape(20, 1)))
    assert np.abs(xs_un[1:, 1]).max() > v_cap + 0.1  # unconstrained violates
    assert np.abs(xs_c[1:, 1]).max() <= v_cap + 0.02  # constrained respects
    assert float(r_c.primal_residual) < 5e-3
    # still makes progress toward the origin
    assert abs(xs_c[-1, 0]) < abs(float(x0[0, 0]))


def test_admm_pallas_kernel_matches_xla(quad):
    """Fused Pallas ADMM (interpret mode on CPU) must match the XLA scan
    solver iterate-for-iterate (same algorithm, same static schedule)."""
    from numpower_tpu.kernels.boxqp_admm import admm_boxqp_pallas

    A, B = quad
    qp = condense(A, B, jnp.eye(12), jnp.eye(4) * 0.1, jnp.eye(12) * 5.0, 10)
    rng = np.random.default_rng(13)
    x0s = jnp.asarray(rng.standard_normal((6, 12)).astype(np.float32))
    g = gradient_offset(qp, x0s)
    rho = jnp.sqrt(qp.lipschitz * qp.mu)
    z, y = admm_boxqp_pallas(qp.H, g, jnp.float32(-0.5), jnp.float32(0.5),
                             rho, iters=60, tile_n=8, interpret=True)
    ref = solve_boxqp_admm(qp.H, g, -0.5, 0.5, rho=rho, iters=60)
    # interpret mode always executes on the HOST; when the active backend
    # is TPU the reference scan runs on-chip, and 60 cross-backend-rounded
    # ADMM iterations drift to ~2e-3 (scripts/tpu_suite.sh) — both still
    # land on the optimum (checked below vs the exact solution either way)
    kernel_tol = 1e-4 if jax.default_backend() == "cpu" else 5e-3
    np.testing.assert_allclose(np.asarray(z), np.asarray(ref.U),
                               rtol=kernel_tol, atol=kernel_tol / 10)
    # dual output consistency: exact residuals recomputed from (z, y) match
    # the ground-truth optimum within solver tolerance
    U_ref = np.stack([_np_boxqp_exact(qp.H, np.asarray(g)[i], -0.5, 0.5)
                      for i in range(6)])
    # 60 iterations land ~1e-3 from the exact optimum; with a TPU-computed
    # qp/g feeding the host-interpret kernel the residual reads 2.3e-3
    # (cross-backend condense rounding) — bound per backend
    opt_tol = 2e-3 if jax.default_backend() == "cpu" else 4e-3
    np.testing.assert_allclose(np.asarray(z), U_ref, rtol=opt_tol,
                               atol=opt_tol / 4)
    # warm start path (same cross-backend drift class as above)
    z2, _ = admm_boxqp_pallas(qp.H, g, jnp.float32(-0.5), jnp.float32(0.5),
                              rho, iters=30, tile_n=8, interpret=True, U0=z)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z),
                               rtol=2 * opt_tol, atol=opt_tol / 2)


def test_admm_mpc_pallas_fused_g_matches_two_step(quad):
    """Fused-g ADMM kernel (g formed in-kernel from x0) must match the
    two-step kernel and emit the correct g."""
    from numpower_tpu.kernels.boxqp_admm import (
        admm_boxqp_pallas, admm_mpc_pallas,
    )

    A, B = quad
    qp = condense(A, B, jnp.eye(12), jnp.eye(4) * 0.1, jnp.eye(12) * 5.0, 10)
    rng = np.random.default_rng(17)
    x0s = jnp.asarray(rng.standard_normal((5, 12)).astype(np.float32))
    g_ref = gradient_offset(qp, x0s)
    rho = jnp.sqrt(qp.lipschitz * qp.mu)
    z1, y1, g1 = admm_mpc_pallas(qp.H, qp.Sx.T, qp.SuTQ.T, x0s,
                                 jnp.float32(-0.5), jnp.float32(0.5), rho,
                                 iters=50, tile_n=8, interpret=True)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)
    z2, y2 = admm_boxqp_pallas(qp.H, g_ref, jnp.float32(-0.5),
                               jnp.float32(0.5), rho, iters=50, tile_n=8,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-4, atol=1e-5)


def test_admm_pallas_bf16_coarse_holds_parity(quad):
    """bf16-coarse x-updates + fp32 tail must still meet the parity bound."""
    from numpower_tpu.kernels.boxqp_admm import admm_boxqp_pallas

    A, B = quad
    qp = condense(A, B, jnp.eye(12), jnp.eye(4) * 0.1, jnp.eye(12) * 5.0, 10)
    rng = np.random.default_rng(14)
    x0s = jnp.asarray(rng.standard_normal((4, 12)).astype(np.float32))
    g = gradient_offset(qp, x0s)
    rho = jnp.sqrt(qp.lipschitz * qp.mu)
    z_fp, _ = admm_boxqp_pallas(qp.H, g, jnp.float32(-0.5), jnp.float32(0.5),
                                rho, iters=60, tile_n=8, interpret=True)
    z_bf, _ = admm_boxqp_pallas(qp.H, g, jnp.float32(-0.5), jnp.float32(0.5),
                                rho, iters=60, coarse_iters=45, tile_n=8,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(z_bf), np.asarray(z_fp),
                               rtol=1e-4, atol=1e-4)


def test_al_ilqr_loose_bounds_matches_ilqr():
    """With bounds far outside the active region, AL-iLQR == plain iLQR."""
    x0 = jnp.array([0.0, 0.3, 0.0, 0.0])
    x_goal = jnp.zeros(4)
    Q = jnp.eye(4); R = jnp.eye(1) * 0.1; QF = jnp.eye(4) * 10.0
    r_un = ilqr_solve(cartpole_step, x0, Q, R, QF, x_goal, horizon=40, iters=20)
    r_al = al_ilqr_solve(cartpole_step, x0, Q, R, QF, x_goal, horizon=40,
                         u_lo=-100.0, u_hi=100.0, al_iters=3, ilqr_iters=10)
    np.testing.assert_allclose(float(r_al.cost), float(r_un.cost), rtol=2e-2)
    assert float(r_al.max_violation) == 0.0


def test_al_ilqr_respects_bounds_pendulum():
    # underactuated swingup: unconstrained iLQR uses |u| >> 1; with the box
    # the solver must find a feasible (pump-up) plan
    x0 = jnp.array([jnp.pi, 0.0])
    x_goal = jnp.zeros(2)
    Q = jnp.diag(jnp.array([1.0, 0.1]))
    R = jnp.eye(1) * 0.01
    QF = jnp.diag(jnp.array([100.0, 10.0]))
    res = al_ilqr_solve(pendulum_step, x0, Q, R, QF, x_goal, horizon=80,
                        u_lo=-2.0, u_hi=2.0, al_iters=6, ilqr_iters=10)
    assert float(jnp.max(jnp.abs(res.us))) <= 2.0 + 1e-6  # strictly feasible
    # cost improves over the zero-control plan
    xs0 = rollout_nonlinear(pendulum_step, x0, jnp.zeros((80, 1)))
    from numpower_tpu.models.ilqr import _total_cost
    cost0 = float(_total_cost(xs0, jnp.zeros((80, 1)), Q, R, QF, x_goal))
    assert float(res.cost) < cost0
    # NOTE: true cost may RISE across AL outer iterations as feasibility
    # tightens (early iterates exploit box violations) — only check finiteness
    assert np.all(np.isfinite(np.asarray(res.costs)))


def test_al_ilqr_matches_boxqp_on_lti(di):
    """On an LTI plant AL-iLQR must agree with the condensed box-QP optimum
    (two completely different algorithms, same convex problem)."""
    A, B = di
    Q = jnp.eye(2); R = jnp.eye(1) * 0.1; QF = jnp.eye(2) * 10.0
    T = 12
    x0 = jnp.array([1.5, 0.0])
    lo, hi = -0.6, 0.6

    f = lambda x, u: A @ x + B @ u
    r_al = al_ilqr_solve(f, x0, Q, R, QF, jnp.zeros(2), horizon=T,
                         u_lo=lo, u_hi=hi, al_iters=8, ilqr_iters=10,
                         mu0=1.0, mu_scale=10.0)
    qp = condense(A, B, Q, R, QF, T)
    g = gradient_offset(qp, x0[None])
    U_ref = _np_boxqp_exact(qp.H, np.asarray(g[0]), lo, hi)
    np.testing.assert_allclose(np.asarray(r_al.us).reshape(-1), U_ref,
                               rtol=5e-3, atol=5e-3)


def test_al_ilqr_batched(di):
    A, B = di
    f = lambda x, u: A @ x + B @ u
    x0s = jnp.array([[1.0, 0.0], [-0.5, 0.2], [0.0, 1.0]])
    res = al_ilqr_solve_batched(
        f, x0s, jnp.eye(2), jnp.eye(1) * 0.1, jnp.eye(2) * 10.0,
        jnp.zeros(2), 10, -0.5, 0.5, al_iters=4, ilqr_iters=6)
    assert res.us.shape == (3, 10, 1)
    assert float(jnp.max(jnp.abs(res.us))) <= 0.5 + 1e-6
    # scenario 0 equals the single solve
    r0 = al_ilqr_solve(f, x0s[0], jnp.eye(2), jnp.eye(1) * 0.1,
                       jnp.eye(2) * 10.0, jnp.zeros(2), 10, -0.5, 0.5,
                       al_iters=4, ilqr_iters=6)
    np.testing.assert_allclose(np.asarray(res.us[0]), np.asarray(r0.us),
                               rtol=1e-4, atol=1e-5)


def test_al_ilqr_fused_matches_vmap():
    """Fused-backward batched AL-iLQR (Pallas interpret mode on CPU) must
    match the vmapped reference path on the same problems."""
    from numpower_tpu.models.al_ilqr import _al_ilqr_solve_batched_fused

    Q = jnp.diag(jnp.array([1.0, 0.1]))
    R = jnp.eye(1) * 0.01
    QF = jnp.diag(jnp.array([100.0, 10.0]))
    x0s = jnp.array([[jnp.pi, 0.0], [1.0, 0.5], [-0.7, 0.0], [2.0, -1.0]])
    kw = dict(al_iters=3, ilqr_iters=5, mu0=1.0, mu_scale=8.0)
    r_v = al_ilqr_solve_batched(pendulum_step, x0s, Q, R, QF, jnp.zeros(2),
                                30, -2.0, 2.0, **kw)
    r_f = _al_ilqr_solve_batched_fused(pendulum_step, x0s, Q, R, QF,
                                       jnp.zeros(2), 30, -2.0, 2.0,
                                       interpret=True, **kw)
    assert r_f.us.shape == r_v.us.shape == (4, 30, 1)
    assert r_f.costs.shape == r_v.costs.shape == (4, 3)
    np.testing.assert_allclose(np.asarray(r_f.cost), np.asarray(r_v.cost),
                               rtol=2e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(r_f.us), np.asarray(r_v.us),
                               rtol=5e-3, atol=5e-3)
    assert float(jnp.max(jnp.abs(r_f.us))) <= 2.0 + 1e-6


def test_ilqr_backward_fused_luu_diags_parity():
    """The per-timestep diagonal luu stream must equal adding diag(luu_pen)
    to a dense luu in the XLA backward pass."""
    from numpower_tpu.kernels.ilqr_backward import ilqr_backward_fused
    from numpower_tpu.models.al_ilqr import _backward_pass_al

    rng = np.random.default_rng(11)
    N, T, n, m = 3, 8, 4, 2
    As = jnp.asarray(np.eye(n, dtype=np.float32)
                     + 0.05 * rng.standard_normal((N, T, n, n)).astype(np.float32))
    Bs = jnp.asarray(0.3 * rng.standard_normal((N, T, n, m)).astype(np.float32))
    xs = jnp.asarray(rng.standard_normal((N, T + 1, n)).astype(np.float32))
    us = jnp.asarray(rng.standard_normal((N, T, m)).astype(np.float32))
    lu_pen = jnp.asarray(rng.standard_normal((N, T, m)).astype(np.float32))
    luu_pen = jnp.asarray(rng.uniform(0.0, 2.0, (N, T, m)).astype(np.float32))
    Q = jnp.eye(n); R = jnp.eye(m) * 0.1; QF = jnp.eye(n) * 5.0
    goal = jnp.zeros(n)
    reg = 1e-3

    lxs = 2.0 * (xs[:, :T] - goal) @ Q.T
    lus = 2.0 * us @ R.T + lu_pen
    lxT = 2.0 * (xs[:, T] - goal) @ QF.T
    ks_f, Ks_f = ilqr_backward_fused(As, Bs, lxs, lus, 2.0 * Q, 2.0 * R,
                                     lxT, 2.0 * QF, reg=reg, interpret=True,
                                     luu_diags=luu_pen)
    for i in range(N):
        ks_r, Ks_r = _backward_pass_al(As[i], Bs[i], xs[i], us[i], Q, R, QF,
                                       goal, reg, lu_pen[i], luu_pen[i])
        np.testing.assert_allclose(np.asarray(ks_f[i]), np.asarray(ks_r),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(Ks_f[i]), np.asarray(Ks_r),
                                   rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------- MPPI

def test_mppi_improves_pendulum_swingup():
    x0 = jnp.array([jnp.pi, 0.0])
    Q = jnp.diag(jnp.array([1.0, 0.1]))
    R = jnp.eye(1) * 0.01
    QF = jnp.diag(jnp.array([100.0, 10.0]))
    cost_fn = quadratic_mppi_cost(Q, R, QF, jnp.zeros(2))
    key = jax.random.key(0)
    res = mppi_solve(pendulum_step, x0, cost_fn, horizon=60, key=key,
                     samples=512, iters=12, lam=2.0, sigma=1.5, m=1)
    # baseline: zero-control cost
    xs0 = rollout_nonlinear(pendulum_step, x0, jnp.zeros((60, 1)))
    from numpower_tpu.models.mppi import _trajectory_cost
    cost0 = float(_trajectory_cost(cost_fn, xs0, jnp.zeros((60, 1))))
    assert float(res.cost) < 0.8 * cost0
    assert 1.0 <= float(res.ess) <= 512.0


def test_mppi_respects_box():
    x0 = jnp.array([jnp.pi, 0.0])
    cost_fn = quadratic_mppi_cost(jnp.eye(2), jnp.eye(1) * 0.01,
                                  jnp.eye(2) * 50.0, jnp.zeros(2))
    res = mppi_solve(pendulum_step, x0, cost_fn, horizon=40,
                     key=jax.random.key(1), samples=256, iters=6,
                     sigma=1.0, m=1, u_lo=-2.0, u_hi=2.0)
    assert float(jnp.max(jnp.abs(res.us))) <= 2.0 + 1e-6


def test_mppi_reproducible_and_jittable():
    x0 = jnp.array([0.5, 0.0])
    cost_fn = quadratic_mppi_cost(jnp.eye(2), jnp.eye(1) * 0.1,
                                  jnp.eye(2) * 10.0, jnp.zeros(2))

    @jax.jit
    def run(x0, key):
        return mppi_solve(pendulum_step, x0, cost_fn, horizon=30, key=key,
                          samples=128, iters=4, m=1).us

    u1 = run(x0, jax.random.key(7))
    u2 = run(x0, jax.random.key(7))
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
    u3 = run(x0, jax.random.key(8))
    assert not np.allclose(np.asarray(u1), np.asarray(u3))


def test_mppi_batched_scenarios():
    cost_fn = quadratic_mppi_cost(jnp.eye(2), jnp.eye(1) * 0.1,
                                  jnp.eye(2) * 10.0, jnp.zeros(2))
    x0s = jnp.array([[0.5, 0.0], [jnp.pi / 2, 0.0]])
    res = mppi_solve_batched(pendulum_step, x0s, cost_fn, 30,
                             jax.random.key(2), samples=128, iters=4, m=1)
    assert res.us.shape == (2, 30, 1)
    assert res.xs.shape == (2, 31, 2)
    assert res.cost.shape == (2,)


def test_mppi_step_receding_horizon():
    cost_fn = quadratic_mppi_cost(jnp.eye(2), jnp.eye(1) * 0.1,
                                  jnp.eye(2) * 10.0, jnp.zeros(2))
    us_prev = jnp.zeros((20, 1))
    u0, res = mppi_step(pendulum_step, us_prev, jnp.array([0.3, 0.0]),
                        cost_fn, jax.random.key(3), samples=128, iters=3)
    assert u0.shape == (1,)
    assert res.us.shape == (20, 1)


def test_mppi_unicycle_reaches_goal():
    """Nonholonomic plant end-to-end: drive the unicycle toward a waypoint."""
    x0 = jnp.array([0.0, 0.0, 0.0])
    goal = jnp.array([1.0, 1.0, 0.0])
    Q = jnp.diag(jnp.array([1.0, 1.0, 0.0]))
    QF = jnp.diag(jnp.array([50.0, 50.0, 0.0]))
    cost_fn = quadratic_mppi_cost(Q, jnp.eye(2) * 0.01, QF, goal)
    res = mppi_solve(unicycle_step, x0, cost_fn, horizon=30,
                     key=jax.random.key(4), samples=512, iters=15,
                     lam=0.5, sigma=1.0, m=2)
    final = np.asarray(res.xs[-1])
    assert np.linalg.norm(final[:2] - np.array([1.0, 1.0])) < 0.3
