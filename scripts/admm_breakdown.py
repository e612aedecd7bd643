#!/usr/bin/env python
"""ADMM flagship residual breakdown (r3 verdict next-round #7).

The driver-captured flagship measured 52.0 us vs the pass-weighted MXU
speed-of-light 44.3 us (~15% non-MXU residual). This script decomposes the
residual on the real chip with interleaved A/Bs:

  1. iteration-count sweep (iters = 0 / 10 / 20 / 40 at the flagship
     schedule ratio): the intercept of the per-call time vs MXU-pass line
     is the fixed overhead (grid dispatch, c formation, epilogue); the
     slope is the true per-pass cost vs the 197 TFLOP/s model.
  2. c-formation precision A/B: HIGHEST (6 nominal passes) vs bf16x3
     (3 passes) — accuracy delta printed alongside.
  3. VPU-op lever: the s-form loop (~6 VPU ops/iter) vs the (z,y) form
     (~10) isolates how much of the residual is un-overlapped VPU time.

Usage (TPU): python scripts/admm_breakdown.py [--scenarios 4096]
CPU smoke:   python scripts/admm_breakdown.py --quick
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")  # repo root (bench harness import)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--scenarios", type=int, default=None)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax

    if args.quick:
        jax.config.update("jax_platforms", "cpu")
    N = args.scenarios or (256 if args.quick else 4096)
    reps = 3 if args.quick else args.reps

    import jax.numpy as jnp

    from bench import _device_time_per_call, _log
    from numpower_tpu.kernels.boxqp_admm import admm_mpc_pallas_res
    from numpower_tpu.models import condense, quadrotor12
    from numpower_tpu.models.condensed import admm_coarse_iters
    from numpower_tpu.utils.flops import admm_mpc_cost, peak_tflops

    dev = jax.devices()[0]
    _log(f"device: {dev.platform}:{dev.device_kind}")
    float(jnp.ones((1,))[0])  # warm D2H

    A, B = quadrotor12(0.02)
    Q = np.eye(12, dtype=np.float32)
    R = np.eye(4, dtype=np.float32) * 0.1
    QF = np.eye(12, dtype=np.float32) * 5.0
    qp = jax.jit(condense, static_argnums=5)(A, B, Q, R, QF, 30)
    rho = jnp.sqrt(qp.lipschitz * jnp.maximum(qp.mu, 1e-12))
    x0s = jnp.asarray(
        0.3 * np.random.default_rng(0).standard_normal((N, 12)), jnp.float32)
    interp = jax.default_backend() not in ("tpu", "axon")
    K = 32 if N <= 512 else 512
    peak = peak_tflops()

    def t_of(iters, ci, form="s", c_precision="highest"):
        def body(qp, xs, rho, i):
            z, _, _ = admm_mpc_pallas_res(
                qp.H, qp.Sx.T, qp.SuTQ.T, xs + i * 1e-6, jnp.float32(-1.0),
                jnp.float32(1.0), rho, iters=iters, coarse_iters=ci,
                interpret=interp, form=form, c_precision=c_precision)
            return z[0, 0]
        return _device_time_per_call(body, (qp, x0s, rho), K=K, reps=reps)

    # (1) iteration sweep at the flagship schedule ratio (32/40 coarse)
    sweep = []
    for iters in (0, 10, 20, 40):
        ci = admm_coarse_iters(qp, iters) if iters else 0
        t = t_of(iters, ci)
        cost = admm_mpc_cost(N, 12, int(qp.H.shape[0]), iters, ci)
        sol = cost.sol_seconds(peak) if peak else float("nan")
        sweep.append((iters, ci, t, sol))
        _log(f"[sweep] iters={iters:3d} (ci={ci:3d}): {t*1e6:7.1f} us "
             f"(model SoL {sol*1e6:6.1f} us)")
    (i0, _, t0, s0), (iN, _, tN, sN) = sweep[0], sweep[-1]
    slope = (tN - t0) / (iN - i0)
    _log(f"[sweep] fixed overhead (iters=0 incl. c formation + epilogue): "
         f"{t0*1e6:.1f} us; per-iteration slope {slope*1e6:.2f} us/iter "
         f"(model {((sN-s0)/(iN-i0))*1e6:.2f})")

    # (2) c-formation precision A/B (interleaved pairs)
    iters = 40
    ci = admm_coarse_iters(qp, iters)
    trips = [(t_of(iters, ci, c_precision="highest"),
              t_of(iters, ci, c_precision="bf16x3"),
              t_of(iters, ci, c_precision="bf16x4")) for _ in range(3)]
    t_hi = float(np.median([p[0] for p in trips]))
    t_b3 = float(np.median([p[1] for p in trips]))
    t_b4 = float(np.median([p[2] for p in trips]))
    z_hi, _, _ = admm_mpc_pallas_res(
        qp.H, qp.Sx.T, qp.SuTQ.T, x0s, jnp.float32(-1.0), jnp.float32(1.0),
        rho, iters=iters, coarse_iters=ci, interpret=interp)
    z_b3, _, _ = admm_mpc_pallas_res(
        qp.H, qp.Sx.T, qp.SuTQ.T, x0s, jnp.float32(-1.0), jnp.float32(1.0),
        rho, iters=iters, coarse_iters=ci, interpret=interp,
        c_precision="bf16x3")
    z_b4, _, _ = admm_mpc_pallas_res(
        qp.H, qp.Sx.T, qp.SuTQ.T, x0s, jnp.float32(-1.0), jnp.float32(1.0),
        rho, iters=iters, coarse_iters=ci, interpret=interp,
        c_precision="bf16x4")
    dz3 = float(jnp.max(jnp.abs(z_hi - z_b3)))
    dz4 = float(jnp.max(jnp.abs(z_hi - z_b4)))
    _log(f"[c-prec] HIGHEST {t_hi*1e6:.1f} us vs bf16x3 {t_b3*1e6:.1f} us "
         f"({(t_hi/t_b3-1)*100:+.1f}%) vs bf16x4 {t_b4*1e6:.1f} us "
         f"({(t_hi/t_b4-1)*100:+.1f}%); |dz| bf16x3 {dz3:.2e}, "
         f"bf16x4 {dz4:.2e} (parity bound 1e-4)")

    # (3) VPU-op lever: s-form (~6 ops) vs zy-form (~10 ops), interleaved
    pairs = [(t_of(iters, ci, form="s"), t_of(iters, ci, form="zy"))
             for _ in range(3)]
    t_s = float(np.median([p[0] for p in pairs]))
    t_zy = float(np.median([p[1] for p in pairs]))
    d_vpu = (t_zy - t_s) / 4.0  # ~4 extra VPU ops -> us per VPU op per iter
    _log(f"[vpu] s {t_s*1e6:.1f} us vs zy {t_zy*1e6:.1f} us -> "
         f"~{d_vpu*1e6/iters*1e3:.1f} ns per extra VPU op per iteration "
         f"(un-overlapped VPU share of the residual)")


if __name__ == "__main__":
    main()
