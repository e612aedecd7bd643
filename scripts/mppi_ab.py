#!/usr/bin/env python
"""Batched-MPPI A/B: vmapped XLA solve vs the fused whole-solve Pallas
kernel (mppi_solve_batched method="xla" / "pallas") at the bench config
(N=256 scenarios x K=256 samples, pendulum, h=40, 8 updates).

Also itemizes the eps pre-generation (shared by both paths' key-stream
contract) so the kernel's residual is attributable. Interleaved variant
rounds, medians over reps; window K sized per variant so each clears the
>=25 ms sampling rule.

TPU: python scripts/mppi_ab.py     CPU smoke: --quick
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
    K_s = 128 if args.quick else 256
    T, iters = (16, 2) if args.quick else (40, 8)
    reps = 2 if args.quick else args.reps

    import jax.numpy as jnp

    from bench import _device_time_per_call, _log
    from numpower_tpu.kernels.mppi import eps_kernel_layout
    from numpower_tpu.models import (
        mppi_solve_batched, pendulum_step, quadratic_mppi_cost,
    )

    dev = jax.devices()[0]
    _log(f"device: {dev.platform}:{dev.device_kind}  "
         f"N={N} K={K_s} T={T} iters={iters}")
    float(jnp.ones((1,))[0])

    Qp = jnp.diag(jnp.array([1.0, 0.1]))
    Rp = jnp.eye(1) * 0.01
    QFp = jnp.diag(jnp.array([100.0, 10.0]))
    cost = quadratic_mppi_cost(Qp, Rp, QFp, jnp.zeros(2))
    rng = np.random.default_rng(8)
    x0s = jnp.asarray(rng.uniform(-np.pi, np.pi, (N, 2)), jnp.float32)
    key = jax.random.key(0)
    kw = dict(samples=K_s, iters=iters, m=1)

    # parity gate at low depth: with lam=1 and cost spreads in the
    # hundreds the softmax is argmin-sharp, so near-tied samples make the
    # iteration chaotic — fp reassociation between the kernel and XLA
    # amplifies ~e-6 per-round differences geometrically (same class as
    # the on-chip PF resampling-index chaos, scripts/tpu_suite.sh notes).
    # Gate exact parity at iters=2; at full depth compare the OBJECTIVE
    # (final nominal cost), which is flat where the argmin is near-tied.
    kw2 = dict(kw, iters=2)
    ref2 = mppi_solve_batched(pendulum_step, x0s, cost, T, key,
                              method="xla", **kw2)
    pal2 = mppi_solve_batched(pendulum_step, x0s, cost, T, key,
                              method="pallas", **kw2)
    d2 = float(jnp.max(jnp.abs(pal2.us - ref2.us)))
    ref = mppi_solve_batched(pendulum_step, x0s, cost, T, key,
                             method="xla", **kw)
    pal = mppi_solve_batched(pendulum_step, x0s, cost, T, key,
                             method="pallas", **kw)
    d = float(jnp.max(jnp.abs(pal.us - ref.us)))
    dc = float(jnp.max(jnp.abs(pal.cost - ref.cost)
                       / (1.0 + jnp.abs(ref.cost))))
    _log(f"[parity] iters=2 us dev {d2:.2e}; iters={iters} us dev {d:.2e} "
         f"(chaotic), cost rel dev {dc:.2e}")
    assert d2 < 2e-3 and dc < 5e-2

    def t_of(method, Kw):
        return _device_time_per_call(
            lambda xs, k, i: jnp.sum(mppi_solve_batched(
                pendulum_step, xs + i * 1e-6, cost, T, k,
                method=method, **kw).cost),
            (x0s, key), K=Kw, reps=reps)

    def t_eps(Kw):
        return _device_time_per_call(
            lambda xs, k, i: eps_kernel_layout(
                jax.random.fold_in(k, i), N, iters, T, 1, K_s,
                jnp.ones((1,)))[0, 0, 0],
            (x0s, key), K=Kw, reps=reps)

    # rbg + direct-stream lever: eps_stream="direct" draws the tensor in
    # ONE normal call in kernel layout; with a hardware-RNG key the
    # generation drops ~3x (threefry is compute-bound at 21M normals).
    # NOTE measured dead end: rbg keys through the EXACT-stream layout
    # are SLOWER (2.79 vs 1.53 ms) — vmapped rbg splits do not batch.
    key_rbg = jax.random.key(0, impl="rbg")

    # solve-quality equivalence of the direct stream, on the MEDIAN final
    # cost: the pendulum swing-up objective is heavy-tailed, so the MEAN
    # varies ~11% even between threefry keys (measured 259.8/274.5/288.1
    # for keys 0/1/2 at this config, medians 97.1-99.7, v5e 2026-08-21);
    # streams need only be statistically interchangeable
    pal_d = mppi_solve_batched(pendulum_step, x0s, cost, T, key_rbg,
                               method="pallas", eps_stream="direct", **kw)
    c_e = float(jnp.median(pal.cost))
    c_d = float(jnp.median(pal_d.cost))
    _log(f"[quality] median final cost exact {c_e:.2f} vs direct-rbg "
         f"{c_d:.2f} ({abs(c_d-c_e)/abs(c_e)*100:.1f}% rel)")
    assert abs(c_d - c_e) / abs(c_e) < 0.10

    def t_pallas_rbg(Kw):
        return _device_time_per_call(
            lambda xs, k, i: jnp.sum(mppi_solve_batched(
                pendulum_step, xs + i * 1e-6, cost, T, k,
                method="pallas", eps_stream="direct", **kw).cost),
            (x0s, key_rbg), K=Kw, reps=reps)

    Kw_x = 2 if args.quick else 4
    Kw_p = 4 if args.quick else 64
    results = {}
    for _ in range(3):
        results.setdefault("xla", []).append(t_of("xla", Kw_x))
        results.setdefault("pallas", []).append(t_of("pallas", Kw_p))
        results.setdefault("pallas-rbg", []).append(t_pallas_rbg(Kw_p))
        results.setdefault("eps-gen", []).append(t_eps(Kw_p))
    rollouts = N * K_s * iters
    for m in ("xla", "pallas", "pallas-rbg", "eps-gen"):
        t = float(np.median(results[m]))
        _log(f"[mppi] {m:10s}: {t*1e3:8.3f} ms/solve-batch "
             f"({rollouts/t/1e6:,.1f}M rollouts/s)")
    tx = float(np.median(results["xla"]))
    tp = float(np.median(results["pallas"]))
    tr = float(np.median(results["pallas-rbg"]))
    _log(f"[mppi] fused-kernel speedup: {tx/tp:.2f}x "
         f"(with rbg keys: {tx/tr:.2f}x)")


if __name__ == "__main__":
    main()
