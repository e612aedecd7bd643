#!/usr/bin/env python
"""FISTA g-formation precision A/B (the ADMM c-formation result's twin):
HIGHEST vs bf16x4, interleaved, with the solution deviation printed.

TPU: python scripts/fista_gprec_ab.py    CPU smoke: --quick
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax

    if args.quick:
        jax.config.update("jax_platforms", "cpu")
    N = 256 if args.quick else 4096
    reps = 3 if args.quick else args.reps

    import jax.numpy as jnp

    from bench import _device_time_per_call, _log
    from numpower_tpu.kernels.boxqp_fista import fista_mpc_pallas_res
    from numpower_tpu.models import condense, quadrotor12
    from numpower_tpu.models.condensed import default_coarse_iters

    dev = jax.devices()[0]
    _log(f"device: {dev.platform}:{dev.device_kind}")
    float(jnp.ones((1,))[0])

    A, B = quadrotor12(0.02)
    qp = jax.jit(condense, static_argnums=5)(
        A, B, np.eye(12, dtype=np.float32),
        np.eye(4, dtype=np.float32) * 0.1,
        np.eye(12, dtype=np.float32) * 5.0, 30)
    iters = 40
    ci = default_coarse_iters(qp, iters)
    x0s = jnp.asarray(
        0.3 * np.random.default_rng(0).standard_normal((N, 12)), jnp.float32)
    interp = jax.default_backend() not in ("tpu", "axon")
    K = 32 if N <= 512 else 512

    def t_of(gp):
        def body(qp, xs, i):
            U, _ = fista_mpc_pallas_res(
                qp.H, qp.Sx.T, qp.SuTQ.T, xs + i * 1e-6, jnp.float32(-1.0),
                jnp.float32(1.0), qp.lipschitz, iters=iters, coarse_iters=ci,
                interpret=interp, g_precision=gp)
            return U[0, 0]
        return _device_time_per_call(body, (qp, x0s), K=K, reps=reps)

    pairs = [(t_of("highest"), t_of("bf16x4")) for _ in range(3)]
    t_hi = float(np.median([p[0] for p in pairs]))
    t_b4 = float(np.median([p[1] for p in pairs]))
    U_hi, _ = fista_mpc_pallas_res(
        qp.H, qp.Sx.T, qp.SuTQ.T, x0s, jnp.float32(-1.0), jnp.float32(1.0),
        qp.lipschitz, iters=iters, coarse_iters=ci, interpret=interp)
    U_b4, _ = fista_mpc_pallas_res(
        qp.H, qp.Sx.T, qp.SuTQ.T, x0s, jnp.float32(-1.0), jnp.float32(1.0),
        qp.lipschitz, iters=iters, coarse_iters=ci, interpret=interp,
        g_precision="bf16x4")
    dU = float(jnp.max(jnp.abs(U_hi - U_b4)))
    _log(f"[g-prec] HIGHEST {t_hi*1e6:.1f} us vs bf16x4 {t_b4*1e6:.1f} us "
         f"({(t_hi/t_b4-1)*100:+.1f}%), max |dU| {dU:.2e} "
         f"(parity bound 1e-4)")


if __name__ == "__main__":
    main()
