#!/usr/bin/env python
"""Serving-tick decomposition (round 5): why does the 20-iteration
warm-started ADMM tick (~66-71 us in r4/r5 captures) cost MORE than the
40-iteration cold flagship solve (~51 us)?

Itemizes, interleaved in one process:
  kernel   — admm_mpc_pallas_res alone, warm-started, 20 iters
  solve    — models/admm.solve_mpc_boxqp_admm (wrapper: rho/Minv/schedule)
  tick     — MPCController._step_impl (shift + solve + slice + state)
  tick+sim — the bench's tick body (adds the x' = Ax + Bu rollout)
and the FISTA twins for contrast.

TPU: python scripts/serving_breakdown.py    CPU smoke: --quick
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()

    import jax

    if args.quick:
        jax.config.update("jax_platforms", "cpu")
    N = 256 if args.quick else 4096
    reps = 2 if args.quick else args.reps
    iters = 20

    import jax.numpy as jnp

    from bench import _device_time_per_call, _log
    from numpower_tpu.models import MPCController, quadrotor12

    dev = jax.devices()[0]
    interp = dev.platform not in ("tpu", "axon")
    _log(f"device: {dev.platform}:{dev.device_kind}  N={N} iters={iters}")
    float(jnp.ones((1,))[0])

    A, B = quadrotor12(0.02)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(0.3 * rng.standard_normal((N, 12)), jnp.float32)
    A_j, B_j = jnp.asarray(A), jnp.asarray(B)

    results = {}

    def measure(name, fn, fargs, K=512):
        results.setdefault(name, []).append(
            _device_time_per_call(fn, fargs, K=K if not args.quick else 16,
                                  reps=reps))

    for solver in ("admm", "fista"):
        ctrl = MPCController(
            A, B, np.eye(12, dtype=np.float32),
            np.eye(4, dtype=np.float32) * 0.1,
            np.eye(12, dtype=np.float32) * 5.0, horizon=30,
            u_lo=-1.0, u_hi=1.0, iters=iters, solver=solver)
        qp = ctrl.qp
        ci = ctrl.coarse_iters
        _log(f"[{solver}] schedule: {ci} bf16 + {iters - ci} fp32")
        d = qp.T * qp.m
        U0 = jnp.asarray(0.1 * rng.standard_normal((N, d)), jnp.float32)

        if solver == "admm":
            from numpower_tpu.kernels.boxqp_admm import admm_mpc_pallas_res
            from numpower_tpu.models.admm import solve_mpc_boxqp_admm

            rho = jnp.sqrt(qp.lipschitz * jnp.maximum(qp.mu, 1e-12))

            def k_only(x0s, U0, i):
                z, _, _ = admm_mpc_pallas_res(
                    qp.H, qp.Sx.T, qp.SuTQ.T, x0s + i * 1e-6,
                    jnp.float32(-1.0), jnp.float32(1.0), rho, iters=iters,
                    coarse_iters=ci, U0=U0, interpret=interp)
                return z[0, 0]

            def s_only(x0s, U0, i):
                return solve_mpc_boxqp_admm(
                    qp, x0s + i * 1e-6, -1.0, 1.0, iters=iters, U0=U0,
                    coarse_iters=ci).U[0, 0]
        else:
            from numpower_tpu.kernels.boxqp_fista import fista_mpc_pallas_res
            from numpower_tpu.models.boxqp import solve_mpc_boxqp

            def k_only(x0s, U0, i):
                U, _ = fista_mpc_pallas_res(
                    qp.H, qp.Sx.T, qp.SuTQ.T, x0s + i * 1e-6,
                    jnp.float32(-1.0), jnp.float32(1.0), qp.lipschitz,
                    iters=iters, coarse_iters=ci, U0=U0, interpret=interp)
                return U[0, 0]

            def s_only(x0s, U0, i):
                return solve_mpc_boxqp(
                    qp, x0s + i * 1e-6, -1.0, 1.0, iters=iters, U0=U0,
                    coarse_iters=ci).U[0, 0]

        st0 = ctrl.init(N)

        def tick_only(x0s, U_prev, i):
            from numpower_tpu.models.mpc import MPCState

            st = MPCState(U_prev=U_prev + i * 1e-9, tick=st0.tick)
            u0, st2, _ = ctrl._step_impl(qp, st, x0s + i * 1e-6)
            return u0[0, 0]

        def tick_sim(x0s, U_prev, i):
            from numpower_tpu.models.mpc import MPCState

            st = MPCState(U_prev=U_prev + i * 1e-9, tick=st0.tick)
            u0, st2, _ = ctrl._step_impl(qp, st, x0s + i * 1e-6)
            x_next = x0s @ A_j.T + u0 @ B_j.T
            return x_next[0, 0]

        for _ in range(3):
            measure(f"{solver}:kernel", k_only, (x0s, U0))
            measure(f"{solver}:solve", s_only, (x0s, U0))
            measure(f"{solver}:tick", tick_only, (x0s, U0))
            measure(f"{solver}:tick+sim", tick_sim, (x0s, U0))

    for name, ts in results.items():
        t = float(np.median(ts))
        _log(f"[serving] {name:14s}: {t*1e6:7.2f} us/batch")


if __name__ == "__main__":
    main()
