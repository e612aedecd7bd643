#!/usr/bin/env python
"""Sublane-occupancy packing validation (r5): the (1, lanes) batch
layout left 7/8 of the VPU idle in five kernels (fused Riccati measured
5% of its VPU roofline, UKF 6%, EKF 16%, KF 53%, RTS 60%); the
(8, lanes/8) packed layout moves 8 sublanes of scenarios per VPU op.
This script times each packed kernel COMPILED at its bench shape with a
parity check against its XLA reference path, in one process.

TPU: python scripts/occupancy_ab.py     CPU smoke: --quick
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
    q = args.quick
    reps = 2 if q else args.reps

    import jax.numpy as jnp

    from bench import _device_time_per_call, _log
    from numpower_tpu.utils.flops import (
        ekf_batched_cost, kalman_batched_cost, roofline_report,
        rts_batched_cost, ukf_batched_cost,
    )

    dev = jax.devices()[0]
    _log(f"device: {dev.platform}:{dev.device_kind}")
    float(jnp.ones((1,))[0])
    rng = np.random.default_rng(11)

    # --- fused Riccati (config #2b shape) --------------------------------
    from numpower_tpu.models.lqr import riccati_scan_per_scenario

    N_r = 64 if q else 1024
    n, m, T_r = 12, 4, 30
    from numpower_tpu.models import quadrotor12

    A, B = quadrotor12(0.02)
    As = jnp.asarray(np.broadcast_to(np.asarray(A), (N_r, n, n))
                     + 0.001 * rng.standard_normal((N_r, n, n)),
                     jnp.float32)
    Bs = jnp.asarray(np.broadcast_to(np.asarray(B), (N_r, n, m)),
                     jnp.float32)
    Q = jnp.eye(n)
    R = jnp.eye(m) * 0.1
    QF = jnp.eye(n) * 5.0
    from numpower_tpu.kernels.riccati import riccati_batched_fused

    Ks_k, P0_k = riccati_batched_fused(As, Bs, Q, R, QF, T_r,
                                       interpret=q)
    Ks_x, P0_x = riccati_scan_per_scenario(As, Bs, Q, R, QF, T_r,
                                           method="xla")
    d = float(jnp.max(jnp.abs(Ks_k - Ks_x)))
    _log(f"[parity] riccati fused: K dev {d:.2e}")
    assert d < 1e-3
    t = _device_time_per_call(
        lambda As, i: riccati_batched_fused(
            As + i * 1e-6, Bs, Q, R, QF, T_r, interpret=q)[0][0, 0, 0, 0],
        (As,), K=4 if q else 64, reps=reps)
    _log(f"[riccati] fused N={N_r} h={T_r}: {t*1e3:.3f} ms "
         f"({N_r/t/1e6:.2f}M solves/s)")

    # --- batched KF + RTS (N=4096, T=50) ---------------------------------
    from numpower_tpu.models.estimation import (
        kalman_filter_batched, kalman_smoother_batched,
    )

    A2 = jnp.asarray([[1.0, 0.1], [0.0, 1.0]])
    C2 = jnp.asarray([[1.0, 0.0]])
    Q2 = jnp.eye(2) * 1e-3
    R2 = jnp.eye(1) * 1e-2
    P02 = jnp.eye(2) * 0.1
    N_k, T_k = (256 if q else 4096), 50
    yss = jnp.asarray(rng.standard_normal((N_k, T_k, 1)).astype(np.float32))
    x0s = jnp.asarray(rng.standard_normal((N_k, 2)).astype(np.float32))
    ref = kalman_filter_batched(A2, C2, Q2, R2, x0s, P02, yss,
                                method="xla")
    fast = kalman_filter_batched(A2, C2, Q2, R2, x0s, P02, yss,
                                 method="pallas")
    d = float(jnp.max(jnp.abs(fast.means - ref.means)))
    _log(f"[parity] kf mean-pass: {d:.2e}")
    assert d < 1e-4
    t = _device_time_per_call(
        lambda x0s, yss, i: kalman_filter_batched(
            A2, C2, Q2, R2, x0s + i * 1e-6, P02, yss,
            method="pallas").log_likelihood[0],
        (x0s, yss), K=256 if q else 4096, reps=reps)
    _log(f"[kf]  packed: {t*1e6:.2f} us ({N_k*T_k/t/1e9:.1f}B updates/s)")
    _log(roofline_report("batched KF packed",
                         kalman_batched_cost(N_k, T_k, 2, 1), t))

    filt = jax.tree.map(jax.block_until_ready,
                        kalman_filter_batched(A2, C2, Q2, R2, x0s, P02,
                                              yss))
    sref = kalman_smoother_batched(A2, filt, method="xla")
    sfast = kalman_smoother_batched(A2, filt, method="pallas")
    d = float(jnp.max(jnp.abs(sfast.means - sref.means)))
    _log(f"[parity] rts backward: {d:.2e}")
    assert d < 1e-4
    t = _device_time_per_call(
        lambda filt, i: kalman_smoother_batched(
            A2, filt._replace(means=filt.means + i * 1e-6),
            method="pallas").means[0, 0, 0],
        (filt,), K=256 if q else 2048, reps=reps)
    _log(f"[rts] packed: {t*1e6:.2f} us ({N_k*T_k/t/1e9:.1f}B states/s)")
    _log(roofline_report("batched RTS packed",
                         rts_batched_cost(N_k, T_k, 2), t))

    # --- EKF / UKF (N=1024, T=50 pendulum) -------------------------------
    from numpower_tpu.models.estimation import (
        ekf_filter_batched, ukf_filter_batched,
    )

    def f_pend(x, u):
        th, om = x[0], x[1]
        return jnp.stack(
            [th + 0.05 * om, om - 0.05 * 9.81 * jnp.sin(th) + 0.05 * u[0]])

    def h_pend(x):
        return x[:1]

    N_u = 128 if q else 1024
    ys_u = jnp.asarray(rng.standard_normal((N_u, T_k, 1)).astype(np.float32))
    us_u = jnp.zeros((N_u, T_k, 1), jnp.float32)
    x0_u = jnp.asarray(0.3 * rng.standard_normal((N_u, 2)).astype(np.float32))
    for name, fb, cost in (
            ("ekf", ekf_filter_batched, ekf_batched_cost),
            ("ukf", ukf_filter_batched, ukf_batched_cost)):
        rref = fb(f_pend, h_pend, Q2, R2, x0_u, P02, ys_u, us_u,
                  method="xla")
        rfast = fb(f_pend, h_pend, Q2, R2, x0_u, P02, ys_u, us_u,
                   method="pallas")
        d = float(jnp.max(jnp.abs(rfast.means - rref.means)))
        _log(f"[parity] {name}: {d:.2e}")
        assert d < 1e-3
        t = _device_time_per_call(
            lambda x0s, ys, us, i: fb(
                f_pend, h_pend, Q2, R2, x0s + i * 1e-6, P02, ys,
                us, method="pallas").log_likelihood[0],
            (x0_u, ys_u, us_u), K=32 if q else 1024, reps=reps)
        _log(f"[{name}] packed: {t*1e6:.2f} us "
             f"({N_u*T_k/t/1e9:.2f}B updates/s)")
        _log(roofline_report(f"batched {name} packed",
                             cost(N_u, T_k, 2, 1), t))


if __name__ == "__main__":
    main()
