"""Closed-loop simulation harness tests (plant + estimator + controller)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from numpower_tpu.models import (
    MPCController, double_integrator, kalman_estimator, lqr_feedback,
    lqr_infinite_gain, simulate_closed_loop,
)


@pytest.fixture(scope="module")
def di():
    return double_integrator(0.1)


def test_lqr_full_state_feedback_stabilizes(di):
    A, B = di
    K, _ = lqr_infinite_gain(A, B, jnp.eye(2), jnp.eye(1) * 0.1)
    f = lambda x, u: A @ x + B @ u
    x0s = jnp.array([[2.0, 0.0], [-1.0, 0.5], [0.0, -2.0]])
    res = simulate_closed_loop(f, lqr_feedback(), K, x0s, steps=100)
    assert res.xs.shape == (101, 3, 2)
    assert res.us.shape == (100, 3, 1)
    assert res.ys is None and res.xhats is None
    final = np.asarray(res.xs[-1])
    assert np.abs(final).max() < 1e-2  # all trajectories converge


def test_noise_is_reproducible_and_keyed(di):
    A, B = di
    K, _ = lqr_infinite_gain(A, B, jnp.eye(2), jnp.eye(1) * 0.1)
    f = lambda x, u: A @ x + B @ u
    x0s = jnp.array([[1.0, 0.0]])
    r1 = simulate_closed_loop(f, lqr_feedback(), K, x0s, 50,
                              key=jax.random.key(5), w_std=0.05)
    r2 = simulate_closed_loop(f, lqr_feedback(), K, x0s, 50,
                              key=jax.random.key(5), w_std=0.05)
    r3 = simulate_closed_loop(f, lqr_feedback(), K, x0s, 50,
                              key=jax.random.key(6), w_std=0.05)
    np.testing.assert_array_equal(np.asarray(r1.xs), np.asarray(r2.xs))
    assert not np.allclose(np.asarray(r1.xs), np.asarray(r3.xs))
    # noise keeps the state near but not at the origin
    tail = np.asarray(r1.xs[30:]).reshape(-1, 2)
    assert 0 < np.abs(tail).mean() < 0.5


def test_output_feedback_kalman_mpc(di):
    """Full output-feedback loop: position-only measurements -> KF -> MPC.
    The estimate must track the true state and the loop must regulate."""
    A, B = di
    C = jnp.array([[1.0, 0.0]])
    Qn = jnp.eye(2) * 1e-4
    Rn = jnp.eye(1) * 1e-2
    ctrl = MPCController(A, B, np.eye(2, dtype=np.float32),
                         0.1 * np.eye(1, dtype=np.float32),
                         10 * np.eye(2, dtype=np.float32),
                         horizon=15, u_lo=-1.0, u_hi=1.0, iters=30)
    N = 4
    x0s = jnp.asarray(np.random.default_rng(0).uniform(-2, 2, (N, 2)),
                      jnp.float32)
    make_state, kf_update = kalman_estimator(A, C, Qn, Rn, jnp.eye(2) * 0.5,
                                             B=B)
    f = lambda x, u: A @ x + B @ u
    res = simulate_closed_loop(
        f, ctrl.callback(), ctrl.callback_init(N), x0s, steps=80,
        key=jax.random.key(1), w_std=0.01,
        h=lambda x: x[:1], v_std=0.05,
        estimator=kf_update, est_state0=make_state(x0s),
    )
    assert res.ys.shape == (80, N, 1)
    assert res.xhats.shape == (80, N, 2)
    # regulation: true states driven near origin despite output feedback
    assert np.abs(np.asarray(res.xs[-1])).max() < 0.3
    # estimation: velocity estimate tracks true velocity (never measured)
    err = np.abs(np.asarray(res.xhats)[20:, :, 1]
                 - np.asarray(res.xs)[21:, :, 1]).mean()
    assert err < 0.1
    # controls respect the box
    assert float(jnp.max(jnp.abs(res.us))) <= 1.0 + 1e-6


def test_whole_loop_is_jittable(di):
    A, B = di
    K, _ = lqr_infinite_gain(A, B, jnp.eye(2), jnp.eye(1) * 0.1)
    f = lambda x, u: A @ x + B @ u

    @jax.jit
    def run(x0s, key):
        return simulate_closed_loop(f, lqr_feedback(), K, x0s, 40,
                                    key=key, w_std=0.02).xs

    xs = run(jnp.array([[1.0, 0.0]]), jax.random.key(2))
    assert xs.shape == (41, 1, 2)
    assert np.all(np.isfinite(np.asarray(xs)))
