#!/usr/bin/env python
"""Benchmark harness.

Headline metric (BASELINE.json): MPC solves/s/chip for the 4096-scenario
horizon-30 quadrotor box-constrained QP (config #4), target >=10,000 with a
10 ms p50 latency budget. Prints ONE JSON line on stdout:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is value / 10_000 (the BASELINE north-star target; the reference
itself publishes no numbers — BASELINE.md).

Details (all configs, latency percentiles) go to stderr. `--full` runs every
BASELINE config; `--quick` shrinks shapes for CPU smoke tests.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


def _time_fn(fn, *args, warmup: int = 2, reps: int = 10):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(reps):
        t = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t)
    return np.asarray(times)


def bench_flagship(scenarios: int, horizon: int, iters: int, reps: int):
    """Config #4: quadrotor 12-state, box-constrained QP via FISTA."""
    import jax
    import jax.numpy as jnp

    from numpower_tpu.models import condense, quadrotor12, solve_mpc_boxqp

    A, B = quadrotor12(0.02)
    n, m = 12, 4
    Q = jnp.eye(n, dtype=jnp.float32)
    R = jnp.eye(m, dtype=jnp.float32) * 0.1
    QF = jnp.eye(n, dtype=jnp.float32) * 5.0

    t0 = time.perf_counter()
    qp = jax.jit(lambda: condense(A, B, Q, R, QF, horizon))()
    jax.block_until_ready(qp.H)
    _log(f"[flagship] condense formed in {time.perf_counter()-t0:.1f}s")

    solve = jax.jit(lambda x0s: solve_mpc_boxqp(qp, x0s, -1.0, 1.0, iters=iters).U)
    x0s = jnp.asarray(
        0.3 * np.random.default_rng(0).standard_normal((scenarios, n)), jnp.float32
    )

    t0 = time.perf_counter()
    jax.block_until_ready(solve(x0s))
    _log(f"[flagship] solve compiled in {time.perf_counter()-t0:.1f}s")
    times = _time_fn(solve, x0s, reps=reps)
    solves_per_sec = scenarios / times.mean()
    p50 = float(np.percentile(times, 50) * 1e3)
    p99 = float(np.percentile(times, 99) * 1e3)
    _log(
        f"[flagship] quadrotor h={horizon} N={scenarios} iters={iters}: "
        f"{solves_per_sec:,.0f} solves/s/chip | batch p50={p50:.2f} ms p99={p99:.2f} ms"
    )

    # latency config: small batch for the 10 ms real-time budget
    x0s_small = x0s[:256]
    solve_small = jax.jit(lambda xs: solve_mpc_boxqp(qp, xs, -1.0, 1.0, iters=iters).U)
    t_small = _time_fn(solve_small, x0s_small, reps=reps)
    _log(
        f"[latency]  256-scenario batch p50={np.percentile(t_small,50)*1e3:.2f} ms "
        f"(budget 10 ms)"
    )
    return solves_per_sec, p50


def bench_lqr(horizon: int, reps: int):
    """Config #1: double-integrator LQR single rollout; #2: 256-scenario
    batched Riccati."""
    import jax
    import jax.numpy as jnp

    from numpower_tpu.models import double_integrator, lqr_solve, lqr_solve_batched

    A, B = double_integrator(0.1)
    Q = jnp.eye(2); R = jnp.eye(1) * 0.1; QF = jnp.eye(2) * 100.0

    f1 = jax.jit(lambda x0: lqr_solve(A, B, Q, R, QF, x0, horizon)[0])
    t1 = _time_fn(f1, jnp.array([1.0, 0.0]), reps=reps)
    _log(f"[config1] double-integrator LQR h={horizon}: p50={np.percentile(t1,50)*1e3:.3f} ms/solve")

    x0s = jnp.asarray(np.random.default_rng(1).standard_normal((256, 2)), jnp.float32)
    f2 = jax.jit(lambda xs: lqr_solve_batched(A, B, Q, R, QF, xs, horizon)[0])
    t2 = _time_fn(f2, x0s, reps=reps)
    _log(
        f"[config2] 256-scenario LTI Riccati h={horizon}: "
        f"p50={np.percentile(t2,50)*1e3:.3f} ms -> {256/t2.mean():,.0f} solves/s"
    )


def bench_ilqr(reps: int):
    """Config #3: cartpole iLQR with finite-diff Jacobians."""
    import jax
    import jax.numpy as jnp

    from numpower_tpu.models import cartpole_step, ilqr_solve

    Q = jnp.diag(jnp.array([1.0, 10.0, 0.1, 0.1]))
    R = jnp.eye(1) * 0.01
    QF = jnp.diag(jnp.array([10.0, 100.0, 1.0, 1.0]))
    x_goal = jnp.zeros(4)

    f = jax.jit(
        lambda x0: ilqr_solve(
            cartpole_step, x0, Q, R, QF, x_goal, horizon=50, iters=10, use_fd=True
        ).cost
    )
    t = _time_fn(f, jnp.array([0.0, 0.5, 0.0, 0.0]), reps=max(3, reps // 2))
    _log(f"[config3] cartpole iLQR (fd, 10 iters, h=50): p50={np.percentile(t,50)*1e3:.2f} ms/solve")


def bench_tube(scenarios: int, reps: int):
    """Config #5 (single-host slice): tube-MPC scenario sweep."""
    import jax
    import jax.numpy as jnp

    from numpower_tpu.models import condense, quadrotor12, tube_mpc_solve

    A, B = quadrotor12(0.02)
    Q = jnp.eye(12); R = jnp.eye(4) * 0.1; QF = jnp.eye(12) * 5.0
    qp = jax.jit(lambda: condense(A, B, Q, R, QF, 20))()
    rng = np.random.default_rng(2)
    w = jnp.asarray(0.002 * rng.standard_normal((scenarios, 20, 12)), jnp.float32)
    x0 = jnp.asarray(0.2 * rng.standard_normal(12), jnp.float32)

    f = jax.jit(
        lambda x0, w: tube_mpc_solve(qp, A, B, Q, R, x0, w, -1.0, 1.0).tube_radius
    )
    t = _time_fn(f, x0, w, reps=reps)
    _log(
        f"[config5] tube-MPC sweep N={scenarios}: p50={np.percentile(t,50)*1e3:.2f} ms "
        f"-> {scenarios/t.mean():,.0f} scenario-rollouts/s"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="tiny shapes (CPU smoke)")
    ap.add_argument("--full", action="store_true", help="run all BASELINE configs")
    ap.add_argument("--scenarios", type=int, default=None)
    ap.add_argument("--horizon", type=int, default=30)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax

    if args.quick:
        jax.config.update("jax_platforms", "cpu")
    scenarios = args.scenarios or (256 if args.quick else 4096)
    reps = 3 if args.quick else args.reps

    dev = jax.devices()[0]
    _log(f"device: {dev.platform}:{dev.device_kind} x{jax.device_count()}")

    solves_per_sec, p50 = bench_flagship(scenarios, args.horizon, args.iters, reps)

    if args.full:
        bench_lqr(args.horizon, reps)
        bench_ilqr(reps)
        bench_tube(min(scenarios * 4, 16384) if not args.quick else 512, reps)

    target = 10_000.0  # BASELINE north star: solves/s/chip
    print(
        json.dumps(
            {
                "metric": "mpc_solves_per_sec_per_chip",
                "value": round(solves_per_sec, 1),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_sec / target, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
