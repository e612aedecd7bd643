"""Kalman filter / RTS smoother / EKF tests.

Parity strategy (test_mpc.py pattern): each estimator is checked against an
independent fp64 numpy implementation of the same recursions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from numpower_tpu.models import (
    double_integrator, ekf_filter, kalman_filter, kalman_filter_batched,
    kalman_smoother, pendulum_step, rollout_nonlinear,
)


def np_kalman(A, C, Q, R, x0, P0, ys, u_terms=None):
    A, C, Q, R, P = [np.asarray(M, np.float64) for M in (A, C, Q, R, P0)]
    x = np.asarray(x0, np.float64)
    ys = np.asarray(ys, np.float64)
    T = ys.shape[0]
    if u_terms is None:
        u_terms = np.zeros((T, x.shape[0]))
    xs_f, Ps_f, xs_p, Ps_p = [], [], [], []
    ll = 0.0
    for t in range(T):
        x = A @ x + u_terms[t]
        P = A @ P @ A.T + Q
        S = C @ P @ C.T + R
        v = ys[t] - C @ x
        K = P @ C.T @ np.linalg.inv(S)
        xs_p.append(x.copy()); Ps_p.append(P.copy())
        x = x + K @ v
        P = P - K @ C @ P
        xs_f.append(x.copy()); Ps_f.append(P.copy())
        ll += -0.5 * (v @ np.linalg.solve(S, v)
                      + np.log(np.linalg.det(S))
                      + len(v) * np.log(2 * np.pi))
    return (np.array(xs_f), np.array(Ps_f), np.array(xs_p), np.array(Ps_p), ll)


def np_rts(A, xs_f, Ps_f, xs_p, Ps_p):
    A = np.asarray(A, np.float64)
    T = xs_f.shape[0]
    xs_s = xs_f.copy(); Ps_s = Ps_f.copy()
    for t in range(T - 2, -1, -1):
        G = Ps_f[t] @ A.T @ np.linalg.inv(Ps_p[t + 1])
        xs_s[t] = xs_f[t] + G @ (xs_s[t + 1] - xs_p[t + 1])
        Ps_s[t] = Ps_f[t] + G @ (Ps_s[t + 1] - Ps_p[t + 1]) @ G.T
    return xs_s, Ps_s


@pytest.fixture(scope="module")
def lti_data():
    A, B = double_integrator(0.1)
    C = jnp.array([[1.0, 0.0]])  # position-only measurement
    Q = jnp.eye(2) * 1e-3
    R = jnp.eye(1) * 1e-2
    rng = np.random.default_rng(0)
    T = 50
    x = np.array([1.0, 0.0])
    xs, ys = [], []
    An, Bn = np.asarray(A, np.float64), np.asarray(B, np.float64)
    for _ in range(T):
        x = An @ x + rng.multivariate_normal(np.zeros(2), np.asarray(Q))
        ys.append(x[0] + rng.normal(0, 0.1))
        xs.append(x.copy())
    return A, B, C, Q, R, np.array(xs), jnp.asarray(
        np.array(ys, np.float32).reshape(T, 1))


def test_kalman_filter_matches_fp64(lti_data):
    A, B, C, Q, R, xs_true, ys = lti_data
    x0 = jnp.array([1.0, 0.0]); P0 = jnp.eye(2) * 0.1
    res = kalman_filter(A, C, Q, R, x0, P0, ys)
    xs_ref, Ps_ref, xs_p_ref, Ps_p_ref, ll_ref = np_kalman(
        A, C, Q, R, x0, P0, ys)
    np.testing.assert_allclose(np.asarray(res.means), xs_ref, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.covs), Ps_ref, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.pred_means), xs_p_ref,
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(float(res.log_likelihood), ll_ref, rtol=1e-3)
    # tracks the true state better than raw measurements track position
    err_filt = np.abs(np.asarray(res.means)[:, 0] - xs_true[:, 0]).mean()
    err_meas = np.abs(np.asarray(ys)[:, 0] - xs_true[:, 0]).mean()
    assert err_filt < err_meas


def test_kalman_with_inputs(lti_data):
    A, B, C, Q, R, _, _ = lti_data
    # drive with known inputs; filter must track the deterministic part
    T = 30
    us = jnp.ones((T, 1)) * 0.3
    x0 = jnp.zeros(2)
    An, Bn = np.asarray(A, np.float64), np.asarray(B, np.float64)
    x = np.zeros(2); ys = []
    for t in range(T):
        x = An @ x + (Bn @ np.asarray(us[t])).ravel()
        ys.append([x[0]])
    ys = jnp.asarray(np.array(ys, np.float32))
    res = kalman_filter(A, C, Q, R, x0, jnp.eye(2) * 0.1, ys, B=B, us=us)
    xs_ref, *_ = np_kalman(A, C, Q, R, x0, jnp.eye(2) * 0.1, ys,
                           u_terms=np.asarray(us) @ Bn.T)
    np.testing.assert_allclose(np.asarray(res.means), xs_ref, rtol=1e-3,
                               atol=1e-4)


def test_rts_smoother_matches_fp64(lti_data):
    A, B, C, Q, R, xs_true, ys = lti_data
    x0 = jnp.array([1.0, 0.0]); P0 = jnp.eye(2) * 0.1
    filt = kalman_filter(A, C, Q, R, x0, P0, ys)
    sm = kalman_smoother(A, filt)
    xs_ref, Ps_ref, xs_p_ref, Ps_p_ref, _ = np_kalman(A, C, Q, R, x0, P0, ys)
    xs_s_ref, Ps_s_ref = np_rts(A, xs_ref, Ps_ref, xs_p_ref, Ps_p_ref)
    np.testing.assert_allclose(np.asarray(sm.means), xs_s_ref, rtol=2e-3,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(sm.covs), Ps_s_ref, rtol=2e-3,
                               atol=2e-5)
    # smoothing reduces (or matches) filtered velocity error
    err_f = np.abs(np.asarray(filt.means)[:, 1] - xs_true[:, 1]).mean()
    err_s = np.abs(np.asarray(sm.means)[:, 1] - xs_true[:, 1]).mean()
    assert err_s <= err_f * 1.05


def test_kalman_batched_matches_single(lti_data):
    A, B, C, Q, R, _, ys = lti_data
    x0s = jnp.stack([jnp.array([1.0, 0.0]), jnp.array([0.5, -0.2])])
    yss = jnp.stack([ys, ys * 0.9])
    res = kalman_filter_batched(A, C, Q, R, x0s, jnp.eye(2) * 0.1, yss)
    assert res.means.shape == (2, 50, 2)
    r0 = kalman_filter(A, C, Q, R, x0s[0], jnp.eye(2) * 0.1, yss[0])
    np.testing.assert_allclose(np.asarray(res.means[0]), np.asarray(r0.means),
                               rtol=1e-5, atol=1e-6)
    # ll accumulates 50 rounding-ordered steps: the batched fused program
    # rounds differently from the single filter on TPU (measured 2.3e-5
    # relative on v5e, scripts/tpu_suite.sh) — 1e-4 covers both backends
    np.testing.assert_allclose(float(res.log_likelihood[0]),
                               float(r0.log_likelihood), rtol=1e-4)


def test_batched_fast_path_matches_vmap():
    """The shared-covariance fast path (gains computed once, batched mean
    recurrence) must match the vmapped full filter field-for-field — with
    and without known inputs, on dims that exercise n != p."""
    from numpower_tpu.models.estimation import _kalman_filter_batched_vmap

    rng = np.random.default_rng(3)
    n, p, m, N, T = 3, 2, 2, 9, 23
    A = jnp.asarray(np.eye(n) + 0.05 * rng.standard_normal((n, n)),
                    jnp.float32)
    C = jnp.asarray(rng.standard_normal((p, n)), jnp.float32)
    B = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
    Q = jnp.eye(n) * 0.01
    R = jnp.eye(p) * 0.1
    P0 = jnp.eye(n) * 0.5
    x0s = jnp.asarray(rng.standard_normal((N, n)), jnp.float32)
    yss = jnp.asarray(rng.standard_normal((N, T, p)), jnp.float32)
    uss = jnp.asarray(0.3 * rng.standard_normal((N, T, m)), jnp.float32)
    for kw in ({}, {"B": B, "uss": uss}):
        fast = kalman_filter_batched(A, C, Q, R, x0s, P0, yss, **kw)
        ref = _kalman_filter_batched_vmap(A, C, Q, R, x0s, P0, yss, **kw)
        for field in fast._fields:
            np.testing.assert_allclose(
                np.asarray(getattr(fast, field)),
                np.asarray(getattr(ref, field)),
                rtol=1e-5, atol=1e-4, err_msg=field)


def test_kalman_jittable(lti_data):
    A, B, C, Q, R, _, ys = lti_data

    @jax.jit
    def run(ys):
        return kalman_filter(A, C, Q, R, jnp.array([1.0, 0.0]),
                             jnp.eye(2) * 0.1, ys).log_likelihood

    ll1 = float(run(ys))
    ll2 = float(run(ys))
    assert ll1 == ll2 and np.isfinite(ll1)


def test_ekf_pendulum_tracks():
    """EKF on the nonlinear pendulum with angle-only measurements must beat
    dead reckoning (pure prediction without updates)."""
    rng = np.random.default_rng(3)
    T = 60
    us = jnp.asarray(0.5 * np.sin(0.3 * np.arange(T)).astype(np.float32)
                     ).reshape(T, 1)
    x = jnp.array([0.5, 0.0])
    xs_true = rollout_nonlinear(pendulum_step, x, us)
    ys = jnp.asarray(np.asarray(xs_true[1:, 0]).reshape(T, 1)
                     + 0.05 * rng.standard_normal((T, 1)).astype(np.float32))
    h = lambda x: x[:1]
    Q = jnp.eye(2) * 1e-4
    R = jnp.eye(1) * 2.5e-3
    # deliberately wrong prior mean: the filter must recover
    res = ekf_filter(pendulum_step, h, Q, R, jnp.array([0.0, 0.0]),
                     jnp.eye(2) * 1.0, ys, us)
    err_ekf = np.abs(np.asarray(res.means)[:, 0]
                     - np.asarray(xs_true)[1:, 0]).mean()
    dead = rollout_nonlinear(pendulum_step, jnp.array([0.0, 0.0]), us)
    err_dead = np.abs(np.asarray(dead)[1:, 0]
                      - np.asarray(xs_true)[1:, 0]).mean()
    assert err_ekf < 0.5 * err_dead
    assert err_ekf < 0.05  # close to measurement noise floor
    assert np.isfinite(float(res.log_likelihood))


def test_kalman_associative_matches_sequential(lti_data):
    """Parallel-in-time filter (associative scan) must reproduce the
    sequential scan: means, covs, predictions, log-likelihood."""
    from numpower_tpu.models import kalman_filter_associative

    A, B, C, Q, R, _, ys = lti_data
    x0 = jnp.array([1.0, 0.0]); P0 = jnp.eye(2) * 0.1
    seq = kalman_filter(A, C, Q, R, x0, P0, ys)
    par = kalman_filter_associative(A, C, Q, R, x0, P0, ys)
    np.testing.assert_allclose(np.asarray(par.means), np.asarray(seq.means),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(par.covs), np.asarray(seq.covs),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(par.pred_means),
                               np.asarray(seq.pred_means), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(float(par.log_likelihood),
                               float(seq.log_likelihood), rtol=1e-3)


def test_kalman_associative_with_inputs(lti_data):
    from numpower_tpu.models import kalman_filter_associative

    A, B, C, Q, R, _, _ = lti_data
    T = 40
    rng = np.random.default_rng(7)
    us = jnp.asarray(0.4 * rng.standard_normal((T, 1)).astype(np.float32))
    x0 = jnp.zeros(2)
    An, Bn = np.asarray(A, np.float64), np.asarray(B, np.float64)
    x = np.zeros(2); ys = []
    for t in range(T):
        x = An @ x + (Bn @ np.asarray(us[t])).ravel() + rng.normal(0, 0.01, 2)
        ys.append([x[0] + rng.normal(0, 0.05)])
    ys = jnp.asarray(np.array(ys, np.float32))
    seq = kalman_filter(A, C, Q, R, x0, jnp.eye(2) * 0.2, ys, B=B, us=us)
    par = kalman_filter_associative(A, C, Q, R, x0, jnp.eye(2) * 0.2, ys,
                                    B=B, us=us)
    np.testing.assert_allclose(np.asarray(par.means), np.asarray(seq.means),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(float(par.log_likelihood),
                               float(seq.log_likelihood), rtol=1e-3)


def test_kalman_associative_long_horizon(lti_data):
    """T=512: the parallel form must stay numerically stable (fp32) over a
    long prefix composition."""
    from numpower_tpu.models import kalman_filter_associative

    A, B, C, Q, R, _, _ = lti_data
    rng = np.random.default_rng(8)
    T = 512
    x = np.array([1.0, 0.0]); ys = []
    An = np.asarray(A, np.float64)
    for _ in range(T):
        x = An @ x + rng.normal(0, 0.02, 2)
        ys.append([x[0] + rng.normal(0, 0.1)])
    ys = jnp.asarray(np.array(ys, np.float32))
    x0 = jnp.array([1.0, 0.0]); P0 = jnp.eye(2) * 0.1
    seq = kalman_filter(A, C, Q, R, x0, P0, ys)
    par = kalman_filter_associative(A, C, Q, R, x0, P0, ys)
    np.testing.assert_allclose(np.asarray(par.means), np.asarray(seq.means),
                               rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(par.covs), np.asarray(seq.covs),
                               rtol=5e-3, atol=5e-5)


# ---------------------------------------------------------------- MHE

def test_mhe_unconstrained_equals_rts_smoother(lti_data):
    """The unconstrained MHE window optimum is the linear-Gaussian MAP
    trajectory == RTS smoother means (two completely different algorithms)."""
    from numpower_tpu.models import mhe_solve

    A, B, C, Q, R, _, ys = lti_data
    x0 = jnp.array([1.0, 0.0]); P0 = jnp.eye(2) * 0.1
    M = 20
    filt = kalman_filter(A, C, Q, R, x0, P0, ys[:M])
    sm = kalman_smoother(A, filt)
    res = mhe_solve(A, C, Q, R, P0, x0, ys[:M])
    assert res.xs.shape == (M + 1, 2)
    np.testing.assert_allclose(np.asarray(res.xs[1:]), np.asarray(sm.means),
                               rtol=2e-3, atol=2e-4)


def test_mhe_with_inputs_matches_smoother(lti_data):
    from numpower_tpu.models import mhe_solve

    A, B, C, Q, R, _, _ = lti_data
    M = 15
    rng = np.random.default_rng(9)
    us = jnp.asarray(0.3 * rng.standard_normal((M, 1)).astype(np.float32))
    x0 = jnp.zeros(2)
    An, Bn = np.asarray(A, np.float64), np.asarray(B, np.float64)
    x = np.zeros(2); ys = []
    for t in range(M):
        x = An @ x + (Bn @ np.asarray(us[t])).ravel() + rng.normal(0, 0.01, 2)
        ys.append([x[0] + rng.normal(0, 0.05)])
    ys = jnp.asarray(np.array(ys, np.float32))
    P0 = jnp.eye(2) * 0.2
    filt = kalman_filter(A, C, Q, R, x0, P0, ys, B=B, us=us)
    sm = kalman_smoother(A, filt)
    res = mhe_solve(A, C, Q, R, P0, x0, ys, B=B, us=us)
    np.testing.assert_allclose(np.asarray(res.xs[1:]), np.asarray(sm.means),
                               rtol=5e-3, atol=5e-4)


def test_mhe_state_bounds_bind(lti_data):
    """Physical bound knowledge improves the estimate: with a velocity known
    to be in [-0.5, 0.5], the constrained MHE estimate respects it while the
    unconstrained one is pushed out of range by noisy measurements."""
    from numpower_tpu.models import mhe_solve

    A, B, C, Q, R, _, _ = lti_data
    M = 15
    rng = np.random.default_rng(10)
    # true trajectory hugs the velocity bound
    An = np.asarray(A, np.float64)
    x = np.array([0.0, 0.45]); ys = []
    for _ in range(M):
        x = An @ x
        ys.append([x[0] + rng.normal(0, 0.3)])  # very noisy position
    ys = jnp.asarray(np.array(ys, np.float32))
    P0 = jnp.eye(2) * 1.0
    x_prior = jnp.array([0.0, 0.0])
    r_un = mhe_solve(A, C, Q, R, P0, x_prior, ys)
    r_c = mhe_solve(A, C, Q, R, P0, x_prior, ys,
                    x_lo=jnp.array([-10.0, -0.5]),
                    x_hi=jnp.array([10.0, 0.5]), iters=300)
    assert np.abs(np.asarray(r_c.xs)[:, 1]).max() <= 0.5 + 1e-3
    assert float(r_c.primal_residual) < 1e-2
    # the constraint actually bound (the unconstrained optimum violates it)
    assert np.abs(np.asarray(r_un.xs)[:, 1]).max() > 0.5
    # restricting the feasible set cannot lower the optimum
    assert float(r_c.objective) >= float(r_un.objective) - 1e-3


def test_mhe_batched_and_jittable(lti_data):
    from numpower_tpu.models import mhe_solve

    A, B, C, Q, R, _, ys = lti_data
    M = 10
    x_priors = jnp.stack([jnp.array([1.0, 0.0]), jnp.array([0.0, 0.5])])
    yss = jnp.stack([ys[:M], ys[5:5 + M]])
    run = jax.jit(jax.vmap(
        lambda xp, yw: mhe_solve(A, C, Q, R, jnp.eye(2) * 0.1, xp, yw).xs))
    xs = run(x_priors, yss)
    assert xs.shape == (2, M + 1, 2)
    x0_single = mhe_solve(A, C, Q, R, jnp.eye(2) * 0.1, x_priors[0], yss[0]).xs
    np.testing.assert_allclose(np.asarray(xs[0]), np.asarray(x0_single),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- UKF

def test_ukf_equals_kf_on_linear_system(lti_data):
    """The unscented transform is exact for linear f/h, so UKF == KF."""
    from numpower_tpu.models import ukf_filter

    A, B, C, Q, R, _, ys = lti_data
    T = 30
    x0 = jnp.array([1.0, 0.0]); P0 = jnp.eye(2) * 0.1
    us = jnp.zeros((T, 1))
    f = lambda x, u: A @ x + B @ u
    h = lambda x: C @ x
    kf = kalman_filter(A, C, Q, R, x0, P0, ys[:T])
    uk = ukf_filter(f, h, Q, R, x0, P0, ys[:T], us)
    np.testing.assert_allclose(np.asarray(uk.means), np.asarray(kf.means),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(uk.covs), np.asarray(kf.covs),
                               rtol=5e-3, atol=5e-5)
    np.testing.assert_allclose(float(uk.log_likelihood),
                               float(kf.log_likelihood), rtol=1e-3)


def test_ukf_pendulum_tracks_like_ekf():
    from numpower_tpu.models import ukf_filter

    rng = np.random.default_rng(5)
    T = 60
    us = jnp.asarray(0.5 * np.sin(0.3 * np.arange(T)).astype(np.float32)
                     ).reshape(T, 1)
    xs_true = rollout_nonlinear(pendulum_step, jnp.array([0.5, 0.0]), us)
    ys = jnp.asarray(np.asarray(xs_true[1:, 0]).reshape(T, 1)
                     + 0.05 * rng.standard_normal((T, 1)).astype(np.float32))
    h = lambda x: x[:1]
    Q = jnp.eye(2) * 1e-4
    R = jnp.eye(1) * 2.5e-3
    r_ukf = ukf_filter(pendulum_step, h, Q, R, jnp.array([0.0, 0.0]),
                       jnp.eye(2) * 1.0, ys, us)
    r_ekf = ekf_filter(pendulum_step, h, Q, R, jnp.array([0.0, 0.0]),
                       jnp.eye(2) * 1.0, ys, us)
    e_ukf = np.abs(np.asarray(r_ukf.means)[:, 0]
                   - np.asarray(xs_true)[1:, 0]).mean()
    e_ekf = np.abs(np.asarray(r_ekf.means)[:, 0]
                   - np.asarray(xs_true)[1:, 0]).mean()
    assert e_ukf < 0.05
    assert e_ukf < 2.0 * e_ekf  # comparable accuracy on a smooth plant
    assert np.isfinite(float(r_ukf.log_likelihood))


# --- square-root Kalman filter ----------------------------------------------


def test_sqrt_kalman_matches_standard(lti_data):
    """QR array algorithm must reproduce the covariance-form filter (means,
    covariances via S S', and log-likelihood) to fp32 tolerance."""
    from numpower_tpu.models import kalman_filter_sqrt

    A, B, C, Q, R, xs_true, ys = lti_data
    x0 = jnp.array([1.0, 0.0]); P0 = jnp.eye(2) * 0.1
    ref = kalman_filter(A, C, Q, R, x0, P0, ys)
    res = kalman_filter_sqrt(A, C, Q, R, x0, P0, ys)
    np.testing.assert_allclose(np.asarray(res.means), np.asarray(ref.means),
                               atol=1e-5)
    covs = np.asarray(res.chol_covs) @ np.asarray(res.chol_covs).transpose(
        0, 2, 1)
    np.testing.assert_allclose(covs, np.asarray(ref.covs), atol=1e-5)
    pcovs = np.asarray(res.pred_chol_covs) @ np.asarray(
        res.pred_chol_covs).transpose(0, 2, 1)
    np.testing.assert_allclose(pcovs, np.asarray(ref.pred_covs), atol=1e-5)
    np.testing.assert_allclose(float(res.log_likelihood),
                               float(ref.log_likelihood), rtol=1e-4)


def test_sqrt_kalman_with_inputs_jit_vmap(lti_data):
    from numpower_tpu.models import kalman_filter_sqrt

    A, B, C, Q, R, xs_true, ys = lti_data
    T = ys.shape[0]
    us = jnp.asarray(0.1 * np.sin(np.arange(T, dtype=np.float32)))[:, None]
    x0 = jnp.array([1.0, 0.0]); P0 = jnp.eye(2) * 0.1
    ref = kalman_filter(A, C, Q, R, x0, P0, ys, B=B, us=us)
    res = jax.jit(
        lambda x0, ys, us: kalman_filter_sqrt(
            A, C, Q, R, x0, P0, ys, B=B, us=us)
    )(x0, ys, us)
    np.testing.assert_allclose(np.asarray(res.means), np.asarray(ref.means),
                               atol=1e-5)
    # vmap over a small batch
    x0s = jnp.stack([x0, x0 + 0.5])
    yss = jnp.stack([ys, ys + 0.1])
    vres = jax.vmap(
        lambda x0, ys: kalman_filter_sqrt(A, C, Q, R, x0, P0, ys)
    )(x0s, yss)
    single = kalman_filter_sqrt(A, C, Q, R, x0s[1], P0, yss[1])
    np.testing.assert_allclose(np.asarray(vres.means[1]),
                               np.asarray(single.means), atol=1e-6)


def test_sqrt_kalman_ill_conditioned_stays_psd():
    """The regime the square-root form exists for: tiny measurement noise +
    wide prior (kappa(P) ~ 1e7) where the covariance-form update can lose
    definiteness in fp32. S S' is PSD by construction: every step's
    reconstructed covariance must have nonnegative eigenvalues."""
    from numpower_tpu.models import kalman_filter_sqrt

    A, B = double_integrator(0.1)
    C = jnp.array([[1.0, 0.0]])
    Q = jnp.eye(2) * 1e-8
    R = jnp.eye(1) * 1e-9   # ~exact position measurements
    P0 = jnp.eye(2) * 1e2   # wide prior: kappa(S_pre) ~ 1e6
    rng = np.random.default_rng(5)
    T = 40
    ys = jnp.asarray(rng.standard_normal((T, 1)).astype(np.float32))
    res = kalman_filter_sqrt(A, C, Q, R, jnp.zeros(2), P0, ys)
    covs = np.asarray(res.chol_covs) @ np.asarray(res.chol_covs).transpose(
        0, 2, 1)
    eigs = np.linalg.eigvalsh(covs)
    # S S' is PSD in exact arithmetic; the fp32 reconstruction product and
    # eigvalsh rounding allow ~eps * ||P|| of negative slack
    assert np.all(eigs >= -1e-5 * max(1.0, float(eigs.max())))
    assert np.all(np.isfinite(np.asarray(res.means)))
    assert np.isfinite(float(res.log_likelihood))


# --- particle filter ---------------------------------------------------------


def test_particle_filter_matches_kf_on_linear_gaussian(lti_data):
    """On an LTI Gaussian plant the bootstrap PF is a Monte Carlo estimate of
    the exact KF posterior: means must track within MC error and the
    log-likelihood must land near the exact innovation likelihood."""
    from numpower_tpu.models import particle_filter

    A, B, C, Q, R, xs_true, ys = lti_data
    x0 = jnp.array([1.0, 0.0]); P0 = jnp.eye(2) * 0.1
    ref = kalman_filter(A, C, Q, R, x0, P0, ys)
    A_j = jnp.asarray(A)
    f = lambda x, u: A_j @ x
    h = lambda x: x[:1]
    T = ys.shape[0]
    us = jnp.zeros((T, 1))
    res = particle_filter(f, h, Q, R, x0, P0, ys, us, jax.random.key(0),
                          n_particles=4096)
    err = np.abs(np.asarray(res.means) - np.asarray(ref.means)).mean()
    scale = np.abs(np.asarray(ref.means)).mean()
    assert err < 0.05 * max(scale, 1.0)
    # log-likelihood within ~2% of the exact value
    assert abs(float(res.log_likelihood) - float(ref.log_likelihood)) < max(
        0.02 * abs(float(ref.log_likelihood)), 2.0)
    assert np.all(np.asarray(res.ess) >= 1.0)


def test_particle_filter_resampling_keeps_ess_healthy(lti_data):
    """With resampling on, ESS must stay above the degeneracy floor; with it
    off (threshold 0) the weights are free to collapse."""
    from numpower_tpu.models import particle_filter

    A, B, C, Q, R, xs_true, ys = lti_data
    x0 = jnp.array([1.0, 0.0]); P0 = jnp.eye(2) * 0.1
    A_j = jnp.asarray(A)
    f = lambda x, u: A_j @ x
    h = lambda x: x[:1]
    us = jnp.zeros((ys.shape[0], 1))
    N = 512
    on = particle_filter(f, h, Q, R, x0, P0, ys, us, jax.random.key(1),
                         n_particles=N, resample_threshold=0.5)
    off = particle_filter(f, h, Q, R, x0, P0, ys, us, jax.random.key(1),
                          n_particles=N, resample_threshold=0.0)
    assert float(np.min(np.asarray(on.ess))) > 0.05 * N
    assert float(np.min(np.asarray(off.ess))) < float(
        np.min(np.asarray(on.ess)))


def test_particle_filter_nonlinear_tracks_and_is_reproducible():
    """Pendulum with angle-only measurements: PF must beat dead reckoning
    (the EKF test's bar) and be key-reproducible; jit and batched paths
    agree with the direct call."""
    from numpower_tpu.models import particle_filter, particle_filter_batched

    rng = np.random.default_rng(3)
    T = 60
    us = jnp.asarray(0.5 * np.sin(0.3 * np.arange(T)).astype(np.float32)
                     ).reshape(T, 1)
    xs_true = rollout_nonlinear(pendulum_step, jnp.array([0.5, 0.0]), us)
    ys = jnp.asarray(np.asarray(xs_true[1:, 0]).reshape(T, 1)
                     + 0.05 * rng.standard_normal((T, 1)).astype(np.float32))
    h = lambda x: x[:1]
    Q = jnp.eye(2) * 1e-4
    R = jnp.eye(1) * 2.5e-3
    x0 = jnp.array([0.0, 0.0]); P0 = jnp.eye(2) * 1.0
    key = jax.random.key(7)
    res = particle_filter(pendulum_step, h, Q, R, x0, P0, ys, us, key,
                          n_particles=2048)
    err_pf = np.abs(np.asarray(res.means)[:, 0]
                    - np.asarray(xs_true)[1:, 0]).mean()
    dead = rollout_nonlinear(pendulum_step, x0, us)
    err_dead = np.abs(np.asarray(dead)[1:, 0]
                      - np.asarray(xs_true)[1:, 0]).mean()
    assert err_pf < 0.5 * err_dead
    assert err_pf < 0.08
    # reproducible under the same key; jit parity
    res2 = particle_filter(pendulum_step, h, Q, R, x0, P0, ys, us, key,
                           n_particles=2048)
    np.testing.assert_array_equal(np.asarray(res.means),
                                  np.asarray(res2.means))
    jres = jax.jit(
        lambda x0, ys, us, key: particle_filter(
            pendulum_step, h, Q, R, x0, P0, ys, us, key, n_particles=2048)
    )(x0, ys, us, key)
    # jit-vs-eager fuse differently on TPU; a single fp-flipped resampling
    # index cascades to O(5e-3) mean shifts (resampling is discontinuous in
    # the weights). On CPU the paths agree to fp noise; on TPU assert the
    # jitted filter still tracks the same posterior.
    jit_atol = 1e-5 if jax.default_backend() == "cpu" else 5e-2
    np.testing.assert_allclose(np.asarray(jres.means),
                               np.asarray(res.means), atol=jit_atol)
    # batched wrapper runs and each row is a valid filter
    bres = particle_filter_batched(
        pendulum_step, h, Q, R, jnp.stack([x0, x0]), P0,
        jnp.stack([ys, ys]), jnp.stack([us, us]), jax.random.key(9),
        n_particles=256)
    assert bres.means.shape == (2, T, 2)
    assert np.all(np.isfinite(np.asarray(bres.log_likelihood)))


# --- parallel-in-time RTS smoother -------------------------------------------


def test_smoother_associative_matches_sequential(lti_data):
    """O(log T) associative smoother must reproduce the sequential RTS
    backward scan (means and covariances) to fp32 tolerance."""
    from numpower_tpu.models import kalman_smoother_associative

    A, B, C, Q, R, xs_true, ys = lti_data
    x0 = jnp.array([1.0, 0.0]); P0 = jnp.eye(2) * 0.1
    filt = kalman_filter(A, C, Q, R, x0, P0, ys)
    seq = kalman_smoother(A, filt)
    par = kalman_smoother_associative(A, filt)
    np.testing.assert_allclose(np.asarray(par.means), np.asarray(seq.means),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(par.covs), np.asarray(seq.covs),
                               atol=2e-5)


def test_smoother_associative_long_horizon_jit():
    """T=512 stability + jit: the tree composition must stay finite and
    match the sequential smoother at long horizons."""
    from numpower_tpu.models import kalman_smoother_associative

    A, B = double_integrator(0.1)
    C = jnp.array([[1.0, 0.0]])
    Q = jnp.eye(2) * 1e-3
    R = jnp.eye(1) * 1e-2
    rng = np.random.default_rng(9)
    ys = jnp.asarray(rng.standard_normal((512, 1)).astype(np.float32))
    x0 = jnp.array([0.0, 0.0]); P0 = jnp.eye(2) * 0.1
    filt = kalman_filter(A, C, Q, R, x0, P0, ys)
    seq = kalman_smoother(A, filt)
    par = jax.jit(lambda f: kalman_smoother_associative(A, f))(filt)
    assert np.all(np.isfinite(np.asarray(par.means)))
    np.testing.assert_allclose(np.asarray(par.means), np.asarray(seq.means),
                               atol=1e-4)


def test_sqrt_kalman_and_pf_accept_psd_singular_noise():
    """Q driving only some states (PSD-singular) is a standard setup the
    covariance-form filter accepts — the square-root form and the particle
    filter must not NaN out on it (eigh-based square roots)."""
    from numpower_tpu.models import kalman_filter_sqrt, particle_filter

    A, B = double_integrator(0.1)
    C = jnp.array([[1.0, 0.0]])
    Q = jnp.diag(jnp.array([0.0, 1e-3]))   # noise only on velocity
    R = jnp.eye(1) * 1e-2
    rng = np.random.default_rng(12)
    ys = jnp.asarray(rng.standard_normal((30, 1)).astype(np.float32))
    x0 = jnp.array([1.0, 0.0]); P0 = jnp.eye(2) * 0.1
    ref = kalman_filter(A, C, Q, R, x0, P0, ys)
    sq = kalman_filter_sqrt(A, C, Q, R, x0, P0, ys)
    assert np.all(np.isfinite(np.asarray(sq.means)))
    np.testing.assert_allclose(np.asarray(sq.means), np.asarray(ref.means),
                               atol=1e-5)
    A_j = jnp.asarray(A)
    pf = particle_filter(lambda x, u: A_j @ x, lambda x: x[:1], Q, R, x0, P0,
                         ys, jnp.zeros((30, 1)), jax.random.key(2),
                         n_particles=512)
    assert np.all(np.isfinite(np.asarray(pf.means)))
    assert np.isfinite(float(pf.log_likelihood))


def test_kalman_associative_nopivot_matches():
    """nopivot combine solver parity on a 4-state system (n > 3 so the
    unrolled LU actually runs; the n<=3 bench case uses the adjugate)."""
    from numpower_tpu.models import kalman_filter, kalman_filter_associative

    rng = np.random.default_rng(8)
    n, p, T = 4, 2, 64
    A = jnp.asarray(np.eye(n, dtype=np.float32)
                    + 0.05 * rng.standard_normal((n, n)).astype(np.float32))
    C = jnp.asarray(rng.standard_normal((p, n)).astype(np.float32))
    Q = jnp.eye(n) * 1e-3
    R = jnp.eye(p) * 1e-2
    x0 = jnp.zeros(n)
    P0 = jnp.eye(n) * 0.1
    ys = jnp.asarray(rng.standard_normal((T, p)).astype(np.float32))
    seq = kalman_filter(A, C, Q, R, x0, P0, ys)
    par = kalman_filter_associative(A, C, Q, R, x0, P0, ys, nopivot=True)
    np.testing.assert_allclose(np.asarray(par.means), np.asarray(seq.means),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(float(par.log_likelihood),
                               float(seq.log_likelihood), rtol=1e-4)


@pytest.mark.parametrize("L", [4, 8, 16])
def test_batched_mean_chunked_matches_sequential(L):
    """mean_chunk=L replaces the sequential mean recurrence with
    chunk-parallel prefix-product recovery; parity must hold at the
    supported chunk sizes (large L is documented to blow up the inverse
    prefix products — measured 4e-2 at L=T=50, so it stays opt-in with
    small L)."""
    from numpower_tpu.models.estimation import kalman_filter_batched

    rng = np.random.default_rng(0)
    A = jnp.asarray([[1.0, 0.1], [0.0, 1.0]])
    C = jnp.asarray([[1.0, 0.0]])
    Q = jnp.eye(2) * 1e-3
    R = jnp.eye(1) * 1e-2
    P0 = jnp.eye(2) * 0.1
    N, T = 64, 50
    yss = jnp.asarray(rng.standard_normal((N, T, 1)).astype(np.float32))
    x0s = jnp.asarray(rng.standard_normal((N, 2)).astype(np.float32))
    B = jnp.asarray([[0.005], [0.1]])
    uss = jnp.asarray(rng.standard_normal((N, T, 1)).astype(np.float32))
    ref = kalman_filter_batched(A, C, Q, R, x0s, P0, yss, B=B, uss=uss)
    ch = kalman_filter_batched(A, C, Q, R, x0s, P0, yss, B=B, uss=uss,
                               mean_chunk=L)
    np.testing.assert_allclose(np.asarray(ch.means), np.asarray(ref.means),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ch.pred_means),
                               np.asarray(ref.pred_means), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(ch.log_likelihood),
                               np.asarray(ref.log_likelihood), rtol=1e-4,
                               atol=1e-2)


def test_particle_resample_gather_matches_onehot():
    """The gather construction and the one-hot MXU contraction implement
    the SAME systematic-resampling slot assignment (r5: the gather path
    serves N past the measured O(N^2) crossover, RESAMPLE_ONEHOT_MAX_N) —
    the resampled clouds must be identical, not just close."""
    from numpower_tpu.models.particle import _systematic_resample

    rng = np.random.default_rng(12)
    for N in (64, 257, 1024):
        parts = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
        logw = jnp.asarray(2.0 * rng.standard_normal((N,)).astype(np.float32))
        for seed in (0, 1, 2):
            key = jax.random.key(seed)
            oh, w_oh = jax.jit(
                lambda k, p, lw: _systematic_resample(k, p, lw,
                                                      method="onehot"))(
                key, parts, logw)
            ga, w_ga = jax.jit(
                lambda k, p, lw: _systematic_resample(k, p, lw,
                                                      method="gather"))(
                key, parts, logw)
            np.testing.assert_array_equal(np.asarray(oh), np.asarray(ga))
            np.testing.assert_array_equal(np.asarray(w_oh), np.asarray(w_ga))


def test_particle_filter_gather_method_end_to_end(lti_data):
    """Full filter parity between resample methods on a shared key."""
    from numpower_tpu.models import particle_filter

    A, B, C, Q, R, xs_true, ys = lti_data
    x0 = jnp.array([1.0, 0.0])
    P0 = jnp.eye(2) * 0.1
    A_j = jnp.asarray(A)
    f = lambda x, u: A_j @ x
    h = lambda x: x[:1]
    us = jnp.zeros((ys.shape[0], 1))
    r_oh = particle_filter(f, h, Q, R, x0, P0, ys, us, jax.random.key(3),
                           n_particles=512, resample_method="onehot")
    r_ga = particle_filter(f, h, Q, R, x0, P0, ys, us, jax.random.key(3),
                           n_particles=512, resample_method="gather")
    np.testing.assert_allclose(np.asarray(r_oh.means),
                               np.asarray(r_ga.means), atol=1e-6)
    np.testing.assert_allclose(float(r_oh.log_likelihood),
                               float(r_ga.log_likelihood), rtol=1e-6)


def test_sqrt_batched_matches_vmapped_sqrt(lti_data):
    """Shared-covariance batched sqrt filter (cov recursion once + batched
    mean pass, r5) == vmapped kalman_filter_sqrt, both mean-pass methods."""
    from numpower_tpu.models.estimation import (
        kalman_filter_sqrt, kalman_filter_sqrt_batched,
    )

    A, B, C, Q, R, xs_true, ys = lti_data
    rng = np.random.default_rng(6)
    N, T = 32, ys.shape[0]
    yss = jnp.asarray(rng.standard_normal((N, T, 1)).astype(np.float32))
    x0s = jnp.asarray(rng.standard_normal((N, 2)).astype(np.float32))
    P0 = jnp.eye(2) * 0.1
    uss = jnp.asarray(rng.standard_normal((N, T, 1)).astype(np.float32))
    Bm = jnp.asarray([[0.005], [0.1]])
    ref = jax.vmap(lambda x0, y, u: kalman_filter_sqrt(
        A, C, Q, R, x0, P0, y, B=Bm, us=u))(x0s, yss, uss)
    for method in ("xla", "pallas"):
        fast = kalman_filter_sqrt_batched(A, C, Q, R, x0s, P0, yss, B=Bm,
                                          uss=uss, method=method)
        np.testing.assert_allclose(np.asarray(fast.means),
                                   np.asarray(ref.means), atol=2e-5)
        np.testing.assert_allclose(np.asarray(fast.log_likelihood),
                                   np.asarray(ref.log_likelihood),
                                   rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(np.asarray(fast.chol_covs),
                                   np.asarray(ref.chol_covs), atol=1e-6)


def test_smoother_batched_matches_vmap():
    """Batched RTS smoother (shared gain/cov recursions once + batched
    mean backward pass, r5) == vmapped kalman_smoother, both mean-pass
    methods, with and without known inputs, n != p dims."""
    from numpower_tpu.models.estimation import (
        KalmanResult, kalman_smoother_batched,
    )

    rng = np.random.default_rng(11)
    n, p, m, N, T = 3, 2, 2, 9, 23
    A = jnp.asarray(np.eye(n) + 0.05 * rng.standard_normal((n, n)),
                    jnp.float32)
    C = jnp.asarray(rng.standard_normal((p, n)), jnp.float32)
    B = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
    Q = jnp.eye(n) * 0.01
    R = jnp.eye(p) * 0.1
    P0 = jnp.eye(n) * 0.5
    x0s = jnp.asarray(rng.standard_normal((N, n)), jnp.float32)
    yss = jnp.asarray(rng.standard_normal((N, T, p)), jnp.float32)
    uss = jnp.asarray(0.3 * rng.standard_normal((N, T, m)), jnp.float32)
    for kw in ({}, {"B": B, "uss": uss}):
        filt = kalman_filter_batched(A, C, Q, R, x0s, P0, yss, **kw)
        ref = jax.vmap(lambda m_, c, pm, pc, ll: kalman_smoother(
            A, KalmanResult(m_, c, pm, pc, ll)))(*filt)
        for method in ("xla", "pallas"):
            fast = kalman_smoother_batched(A, filt, method=method)
            np.testing.assert_allclose(
                np.asarray(fast.means), np.asarray(ref.means),
                rtol=1e-5, atol=1e-4, err_msg=f"means {method} {kw.keys()}")
            np.testing.assert_allclose(
                np.asarray(fast.covs), np.asarray(ref.covs),
                rtol=1e-5, atol=1e-4, err_msg=f"covs {method}")


def test_smoother_batched_t1_passthrough():
    """T=1 degenerates to the filtered estimate (nothing to smooth)."""
    from numpower_tpu.models.estimation import kalman_smoother_batched

    A = jnp.eye(2)
    filt = kalman_filter_batched(
        A, jnp.eye(2)[:1], jnp.eye(2) * 0.01, jnp.eye(1) * 0.1,
        jnp.zeros((4, 2)), jnp.eye(2), jnp.zeros((4, 1, 1)))
    sm = kalman_smoother_batched(A, filt)
    np.testing.assert_allclose(np.asarray(sm.means),
                               np.asarray(filt.means))
