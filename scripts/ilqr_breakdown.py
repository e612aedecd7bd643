#!/usr/bin/env python
"""Batched-iLQR (config #3b) per-phase breakdown: full fused solve vs
linearize-only vs backward-only vs forward-line-search-only, interleaved
in one process. Identifies whether the residual after the fused backward
kernel is the T-step forward scan (dispatch-latency class — the
whole-solve-kernel candidate) or the vmapped linearization.

TPU: python scripts/ilqr_breakdown.py     CPU smoke: --quick
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
    N = 16 if args.quick else 256
    T, iters = (16, 3) if args.quick else (50, 10)
    reps = 2 if args.quick else args.reps

    import jax.numpy as jnp

    from bench import _device_time_per_call, _log
    from numpower_tpu.kernels.ilqr_backward import ilqr_backward_fused
    from numpower_tpu.models import cartpole_step, ilqr_solve_batched
    from numpower_tpu.models.ilqr import (
        _forward_pass, _total_cost, linearize_trajectory,
    )
    from numpower_tpu.models.rollout import rollout_nonlinear

    dev = jax.devices()[0]
    _log(f"device: {dev.platform}:{dev.device_kind}  N={N} T={T} "
         f"iters={iters}")
    float(jnp.ones((1,))[0])

    n, m = 4, 1
    Q = jnp.diag(jnp.asarray([1.0, 0.1, 10.0, 0.1], jnp.float32))
    R = jnp.eye(1, dtype=jnp.float32) * 0.05
    QF = Q * 10.0
    x_goal = jnp.asarray([0.0, 0.0, np.pi, 0.0], jnp.float32)
    rng = np.random.default_rng(4)
    x0s = jnp.asarray(
        0.1 * rng.standard_normal((N, n)).astype(np.float32))
    interp = jax.default_backend() not in ("tpu", "axon")
    alphas = (1.0, 0.6, 0.3, 0.1, 0.03, 0.01)

    # one-iteration state for phase bodies
    us0 = jnp.zeros((N, T, m), jnp.float32)
    roll = jax.vmap(lambda x0, u: rollout_nonlinear(cartpole_step, x0, u))
    xs0 = roll(x0s, us0)

    def lin_body(xs, us, i):
        As, Bs = jax.vmap(lambda x, u: linearize_trajectory(
            cartpole_step, x, u))(xs + i * 1e-6, us)
        return As[0, 0, 0, 0]

    def bwd_body(xs, us, i):
        As, Bs = jax.vmap(lambda x, u: linearize_trajectory(
            cartpole_step, x, u))(xs + i * 1e-6, us)
        lxs = 2.0 * (xs[:, :T] - x_goal) @ Q.T
        lus = 2.0 * us @ R.T
        lxT = 2.0 * (xs[:, T] - x_goal) @ QF.T
        ks, Ks = ilqr_backward_fused(As, Bs, lxs, lus, 2.0 * Q, 2.0 * R,
                                     lxT, 2.0 * QF, reg=1e-3,
                                     interpret=interp)
        return ks[0, 0, 0]

    def fwd_body(xs, us, i):
        # backward outputs faked as zeros+identity-free gains: the scan
        # structure (T sequential steps x 6 alphas) is what is timed
        ks = jnp.zeros((N, T, m), jnp.float32) + i * 1e-6
        Ks = jnp.zeros((N, T, m, n), jnp.float32)
        alphas_arr = jnp.asarray(alphas, jnp.float32)

        def try_alpha(alpha):
            us_a, xs_a = jax.vmap(lambda x0, xs_n, us_n, k_n, K_n:
                                  _forward_pass(cartpole_step, x0, xs_n,
                                                us_n, k_n, K_n, alpha))(
                x0s, xs, us, ks, Ks)
            return jax.vmap(lambda x, u: _total_cost(
                x, u, Q, R, QF, x_goal))(xs_a, us_a)

        return jax.vmap(try_alpha)(alphas_arr)[0, 0]

    def full_body(fwd):
        def body(x0s_, i):
            r = ilqr_solve_batched(cartpole_step, x0s_ + i * 1e-6, Q, R,
                                   QF, x_goal, T,
                                   backend="vmap" if interp else "fused",
                                   iters=iters,
                                   **({} if interp else
                                      {"forward": fwd}))
            return r.cost[0]
        return body

    Kw = 2 if args.quick else 16
    results = {}
    for _ in range(3):
        results.setdefault("full-fwd-xla", []).append(
            _device_time_per_call(full_body("xla"), (x0s,),
                                  K=max(2, Kw // 4), reps=reps))
        results.setdefault("full-fwd-pallas", []).append(
            _device_time_per_call(full_body("pallas"), (x0s,),
                                  K=Kw, reps=reps))
        results.setdefault("linearize", []).append(_device_time_per_call(
            lin_body, (xs0, us0), K=Kw * 4, reps=reps))
        results.setdefault("backward", []).append(_device_time_per_call(
            bwd_body, (xs0, us0), K=Kw * 2, reps=reps))
        results.setdefault("forward6a", []).append(_device_time_per_call(
            fwd_body, (xs0, us0), K=Kw * 2, reps=reps))
    tf = float(np.median(results["full-fwd-xla"]))
    for name in ("full-fwd-xla", "full-fwd-pallas", "linearize",
                 "backward", "forward6a"):
        t = float(np.median(results[name]))
        per_it = "" if name.startswith("full") else (
            f"  ({100 * t * iters / tf:.0f}% of full-fwd-xla over "
            f"{iters} iters)")
        _log(f"[ilqr] {name:15s}: {t*1e3:8.3f} ms{per_it}")
    tp = float(np.median(results["full-fwd-pallas"]))
    _log(f"[ilqr] fused-forward speedup on the full solve: {tf/tp:.2f}x "
         f"({N/tp:,.0f} solves/s)")


if __name__ == "__main__":
    main()
