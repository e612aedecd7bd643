"""Tube MPC scenario sweep.

BASELINE config #5: multi-host 65k-scenario tube-MPC sweep with QP block
reduction across a pod slice. Tube MPC = nominal trajectory from the
condensed box-QP + ancillary LQR feedback K holding each disturbed scenario
inside a tube around the nominal.

Solve structure (one jitted program):
 1. nominal box-QP solve for the nominal x0            (shared GEMMs)
 2. ancillary infinite-horizon LQR gain K              (computed once)
 3. per-scenario disturbed closed-loop rollouts        (vmap over N)
 4. tube statistics (max deviation per stage — reductions)

Sharding: scenarios ride the mesh `data` axis; the cross-scenario tube
reduction is a `psum`/max collective (numpower_tpu.parallel wires this).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from numpower_tpu.models.boxqp import solve_boxqp_fista
from numpower_tpu.models.condensed import CondensedQP, gradient_offset
from numpower_tpu.models.lqr import lqr_infinite_gain


class TubeMPCResult(NamedTuple):
    U_nominal: jax.Array     # (T*m,) nominal optimal controls
    xs_nominal: jax.Array    # (T+1, n) nominal trajectory
    xs_scenarios: jax.Array  # (N, T+1, n) disturbed closed-loop trajectories
    tube_radius: jax.Array   # (T+1,) max cross-scenario deviation per stage
    max_violation: jax.Array  # scalar: max control-bound violation after feedback clip


def tube_mpc_solve(
    qp: CondensedQP,
    A: jax.Array,
    B: jax.Array,
    Q: jax.Array,
    R: jax.Array,
    x0_nominal: jax.Array,
    disturbances: jax.Array,  # (N, T, n) additive per-scenario disturbances
    u_lo: float,
    u_hi: float,
    x_ref: Optional[jax.Array] = None,
    qp_iters: int = 40,
) -> TubeMPCResult:
    T, n, m = qp.T, qp.n, qp.m

    # 1. nominal solve (single-scenario condensed QP)
    g = gradient_offset(qp, x0_nominal, x_ref)
    res = solve_boxqp_fista(qp.H, g, u_lo, u_hi, L=qp.lipschitz, iters=qp_iters)
    U_nom = res.U
    us_nom = U_nom.reshape(T, m)

    # nominal rollout
    def nom_step(x, u):
        x_next = A @ x + B @ u
        return x_next, x_next

    _, xs_tail = lax.scan(nom_step, x0_nominal, us_nom)
    xs_nom = jnp.concatenate([x0_nominal[None], xs_tail], axis=0)

    # 2. ancillary feedback gain (disturbance rejection around the tube)
    K_anc, _ = lqr_infinite_gain(A, B, Q, R)

    # 3. disturbed closed-loop rollouts, vmapped over scenarios
    def one_scenario(w_seq):
        def step(x, inputs):
            x_nom_t, u_nom_t, w = inputs
            u = jnp.clip(u_nom_t - K_anc @ (x - x_nom_t), u_lo, u_hi)
            x_next = A @ x + B @ u + w
            return x_next, (x_next, u)

        _, (xs, us) = lax.scan(step, x0_nominal, (xs_nom[:-1], us_nom, w_seq))
        return jnp.concatenate([x0_nominal[None], xs], axis=0), us

    xs_all, us_all = jax.vmap(one_scenario)(disturbances)

    # 4. tube statistics — cross-scenario reductions
    dev = jnp.linalg.norm(xs_all - xs_nom[None], axis=-1)  # (N, T+1)
    tube_radius = jnp.max(dev, axis=0)
    max_violation = jnp.maximum(
        jnp.max(us_all) - u_hi, u_lo - jnp.min(us_all)
    )
    return TubeMPCResult(
        U_nominal=U_nom,
        xs_nominal=xs_nom,
        xs_scenarios=xs_all,
        tube_radius=tube_radius,
        max_violation=max_violation,
    )
