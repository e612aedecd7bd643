"""Benchmark plants (dynamics models).

These are the BASELINE.json measurement configs' plants:
  #1 double-integrator LQR       (2-state, 1-input)
  #2/#5 LTI MPC / tube-MPC       (any LTI instance)
  #3 cartpole iLQR               (4-state nonlinear, 1-input)
  #4 quadrotor trajopt           (12-state linearized hover, 4-input)

The reference has no plant library — users hand-roll dynamics in PHP loops
over nd::matmul/add (SURVEY.md §5 "long-context" note). Here plants are
first-class: an LTI plant is an (A, B) pair; nonlinear plants are pure jax
functions `f(x, u) -> x_next` usable under jit/vmap/scan and differentiable
with jax.jacfwd (the idiomatic upgrade over finite differences).

All matrices are fp32 row-major, discrete-time (dt pre-applied), sized so
batched stacks tile cleanly onto the TPU MXU/VPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LTIPlant(NamedTuple):
    """Discrete-time x_{t+1} = A x_t + B u_t."""

    A: jax.Array  # (n, n)
    B: jax.Array  # (n, m)

    @property
    def n(self) -> int:
        return self.A.shape[-1]

    @property
    def m(self) -> int:
        return self.B.shape[-1]

    def step(self, x, u):
        return self.A @ x + self.B @ u


def double_integrator(dt: float = 0.1) -> LTIPlant:
    """BASELINE config #1: 1-D double integrator (pos, vel) with force input."""
    A = jnp.array([[1.0, dt], [0.0, 1.0]], jnp.float32)
    B = jnp.array([[0.5 * dt * dt], [dt]], jnp.float32)
    return LTIPlant(A, B)


def quadrotor12(dt: float = 0.02) -> LTIPlant:
    """BASELINE config #4: 12-state quadrotor linearized about hover.

    State: [pos(3), vel(3), rpy(3), angular rate(3)];
    inputs: [total thrust delta, body torques(3)] (mass/inertia normalized).
    Standard hover linearization: horizontal accelerations couple to roll/
    pitch via gravity tilt; yaw decoupled; altitude couples to thrust.
    """
    g = 9.81
    n, m = 12, 4
    A = jnp.eye(n, dtype=jnp.float32)
    # pos += vel*dt
    A = A.at[0, 3].set(dt).at[1, 4].set(dt).at[2, 5].set(dt)
    # horizontal vel += g*tilt*dt  (x couples to pitch(7), y to -roll(6))
    A = A.at[3, 7].set(g * dt).at[4, 6].set(-g * dt)
    # attitude += rate*dt
    A = A.at[6, 9].set(dt).at[7, 10].set(dt).at[8, 11].set(dt)
    B = jnp.zeros((n, m), jnp.float32)
    # thrust -> vertical acceleration; torques -> angular accelerations
    B = B.at[5, 0].set(dt)
    B = B.at[9, 1].set(dt).at[10, 2].set(dt).at[11, 3].set(dt)
    return LTIPlant(A, B)


def cartpole_params():
    return dict(mc=1.0, mp=0.1, l=0.5, g=9.81, dt=0.05)


def cartpole_step(x, u, mc=1.0, mp=0.1, l=0.5, g=9.81, dt=0.05):
    """BASELINE config #3: nonlinear cartpole, semi-implicit Euler.

    State [pos, theta, vel, theta_dot]; input: cart force (1,).
    Pure jax function — jit/vmap/scan/jacfwd-compatible (compare the
    reference approach: PHP loops over eager nd ops, SURVEY.md §3.2).
    """
    pos, th, v, w = x[0], x[1], x[2], x[3]
    f = u[0]
    sin_t, cos_t = jnp.sin(th), jnp.cos(th)
    total_m = mc + mp
    tmp = (f + mp * l * w * w * sin_t) / total_m
    th_acc = (g * sin_t - cos_t * tmp) / (l * (4.0 / 3.0 - mp * cos_t * cos_t / total_m))
    x_acc = tmp - mp * l * th_acc * cos_t / total_m
    v2 = v + x_acc * dt
    w2 = w + th_acc * dt
    return jnp.stack([pos + v2 * dt, th + w2 * dt, v2, w2])


def pendulum_step(x, u, g=9.81, l=1.0, m=1.0, dt=0.05):
    """Simple pendulum swing-up plant (extra nonlinear test case).
    State [theta, theta_dot]; input torque (1,)."""
    th, w = x[0], x[1]
    w2 = w + (-(g / l) * jnp.sin(th) + u[0] / (m * l * l)) * dt
    return jnp.stack([th + w2 * dt, w2])
