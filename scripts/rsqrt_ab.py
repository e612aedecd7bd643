#!/usr/bin/env python
"""rsqrt + inverse-diagonal substitution A/B (r5).

Every unrolled small-matrix Cholesky chain in the Pallas kernels used
`d = sqrt(acc); inv = 1/d` (two multi-cycle VPU special-unit ops per
pivot) and divided by the diagonal in every substitution row. The change
under test: one `lax.rsqrt` per pivot (d = acc * inv) and a cached
inverse diagonal so all substitutions multiply. Affected kernels:
riccati fused (+ ilqr_backward via _chol_solve_rows), ekf, ukf,
psd_solve_batched.

Methodology (CLAUDE.md): OLD kernels are loaded from the pinned
pre-change commit via `git show` as standalone modules; the baseline /
old / new streams are INTERLEAVED in one process and medians subtracted
— cross-process comparison drifts 2-5x on the relay.

TPU: python scripts/rsqrt_ab.py        CPU smoke: --quick
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")

PRE_CHANGE = "8d65475"  # last commit with the sqrt+divide chains


def load_old(relpath: str, name: str, sed=()):
    src = subprocess.run(["git", "show", f"{PRE_CHANGE}:{relpath}"],
                         capture_output=True, text=True, check=True).stdout
    for a, b in sed:
        src = src.replace(a, b)
    path = os.path.join(tempfile.gettempdir(), name + ".py")
    with open(path, "w") as fh:
        fh.write(src)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def ab_time(body_old, body_new, args, K: int, reps: int):
    """Interleaved three-stream timing: per-call seconds (old, new)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def make_rep(fn):
        @jax.jit
        def rep(*a):
            acc, _ = lax.scan(lambda acc, i: (acc + fn(*a, i), None),
                              jnp.float32(0.0),
                              jnp.arange(K, dtype=jnp.float32))
            return acc
        return rep

    rb = make_rep(lambda *a: a[-1])
    ro = make_rep(body_old)
    rn = make_rep(body_new)
    for r in (rb, ro, rn):
        float(jax.device_get(r(*args)))
    B, O, N = [], [], []
    for _ in range(max(reps, 5)):
        for lst, r in ((B, rb), (O, ro), (N, rn)):
            t = time.perf_counter()
            float(jax.device_get(r(*args)))
            lst.append(time.perf_counter() - t)
    base = float(np.median(B))
    return (max((float(np.median(O)) - base) / K, 1e-9),
            max((float(np.median(N)) - base) / K, 1e-9))


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

    from bench import _log

    dev = jax.devices()[0]
    _log(f"device: {dev.platform}:{dev.device_kind}")
    float(jnp.ones((1,))[0])
    rng = np.random.default_rng(11)

    old_ric = load_old("numpower_tpu/kernels/riccati.py", "old_riccati")
    old_ch = load_old("numpower_tpu/kernels/cholesky.py", "old_cholesky")
    old_ukf = load_old("numpower_tpu/kernels/ukf.py", "old_ukf")
    old_ekf = load_old(
        "numpower_tpu/kernels/ekf.py", "old_ekf",
        sed=[("from numpower_tpu.kernels.ukf import", "from old_ukf import")])

    # --- fused Riccati (N=1024, quadrotor12, h=30) -----------------------
    from numpower_tpu.kernels.riccati import riccati_batched_fused
    from numpower_tpu.models import quadrotor12

    N_r = 64 if q else 1024
    n, m, T_r = 12, 4, 30
    A, B = quadrotor12(0.02)
    As = jnp.asarray(np.broadcast_to(np.asarray(A), (N_r, n, n))
                     + 0.001 * rng.standard_normal((N_r, n, n)), jnp.float32)
    Bs = jnp.asarray(np.broadcast_to(np.asarray(B), (N_r, n, m)), jnp.float32)
    Q = jnp.eye(n)
    R = jnp.eye(m) * 0.1
    QF = jnp.eye(n) * 5.0

    Ko = old_ric.riccati_batched_fused(As, Bs, Q, R, QF, T_r, interpret=q)[0]
    Kn = riccati_batched_fused(As, Bs, Q, R, QF, T_r, interpret=q)[0]
    d = float(jnp.max(jnp.abs(Ko - Kn)))
    _log(f"[parity] riccati old-vs-new: {d:.2e}")
    assert d < 1e-4
    to, tn = ab_time(
        lambda As, i: old_ric.riccati_batched_fused(
            As + i * 1e-6, Bs, Q, R, QF, T_r, interpret=q)[0][0, 0, 0, 0],
        lambda As, i: riccati_batched_fused(
            As + i * 1e-6, Bs, Q, R, QF, T_r, interpret=q)[0][0, 0, 0, 0],
        (As,), K=4 if q else 1024, reps=reps)
    _log(f"[riccati] old {to*1e6:.2f} us -> new {tn*1e6:.2f} us "
         f"({to/tn:.2f}x, {N_r/tn/1e6:.2f}M solves/s)")

    # --- psd_solve_batched (riccati inner-op shape, N=4096) --------------
    from numpower_tpu.kernels.cholesky import psd_solve_batched

    N_p = 256 if q else 4096
    M0 = rng.standard_normal((N_p, n, n)).astype(np.float32)
    Ap = jnp.asarray(M0 @ M0.transpose(0, 2, 1) + 3 * np.eye(n, dtype=np.float32))
    Bp = jnp.asarray(rng.standard_normal((N_p, n, m)).astype(np.float32))
    Xo = old_ch.psd_solve_batched(Ap, Bp, interpret=q)
    Xn = psd_solve_batched(Ap, Bp, interpret=q)
    d = float(jnp.max(jnp.abs(Xo - Xn)))
    _log(f"[parity] psd_solve old-vs-new: {d:.2e}")
    assert d < 1e-3
    to, tn = ab_time(
        lambda Ap, Bp, i: old_ch.psd_solve_batched(
            Ap + i * 1e-6, Bp, interpret=q)[0, 0, 0],
        lambda Ap, Bp, i: psd_solve_batched(
            Ap + i * 1e-6, Bp, interpret=q)[0, 0, 0],
        (Ap, Bp), K=8 if q else 1024, reps=reps)
    _log(f"[psd_solve] old {to*1e6:.2f} us -> new {tn*1e6:.2f} us "
         f"({to/tn:.2f}x)")

    # --- EKF / UKF (N=1024, T=50 pendulum) -------------------------------
    from numpower_tpu.kernels.ekf import ekf_pallas
    from numpower_tpu.kernels.ukf import ukf_pallas

    def f_pend(x, u):
        th, om = x[0], x[1]
        return jnp.stack(
            [th + 0.05 * om, om - 0.05 * 9.81 * jnp.sin(th) + 0.05 * u[0]])

    def h_pend(x):
        return x[:1]

    A2 = jnp.asarray([[1.0, 0.1], [0.0, 1.0]])  # noqa: F841 (shape doc)
    Q2 = jnp.eye(2) * 1e-3
    R2 = jnp.eye(1) * 1e-2
    P02 = jnp.eye(2) * 0.1
    N_u, T_k = (128 if q else 1024), 50
    ys_u = jnp.asarray(rng.standard_normal((N_u, T_k, 1)).astype(np.float32))
    us_u = jnp.zeros((N_u, T_k, 1), jnp.float32)
    x0_u = jnp.asarray(0.3 * rng.standard_normal((N_u, 2)).astype(np.float32))

    for name, fo, fn_, K in (
            ("ekf", old_ekf.ekf_pallas, ekf_pallas, 32 if q else 4096),
            ("ukf", old_ukf.ukf_pallas, ukf_pallas, 32 if q else 2048)):
        ro = fo(f_pend, h_pend, Q2, R2, x0_u, P02, ys_u, us_u, interpret=q)
        rn = fn_(f_pend, h_pend, Q2, R2, x0_u, P02, ys_u, us_u, interpret=q)
        d = float(jnp.max(jnp.abs(ro[0] - rn[0])))
        _log(f"[parity] {name} old-vs-new means: {d:.2e}")
        assert d < 1e-4
        to, tn = ab_time(
            lambda x0s, ys, us, i, fo=fo: fo(
                f_pend, h_pend, Q2, R2, x0s + i * 1e-6, P02, ys, us,
                interpret=q)[4][0],
            lambda x0s, ys, us, i, fn_=fn_: fn_(
                f_pend, h_pend, Q2, R2, x0s + i * 1e-6, P02, ys, us,
                interpret=q)[4][0],
            (x0_u, ys_u, us_u), K=K, reps=reps)
        _log(f"[{name}] old {to*1e6:.2f} us -> new {tn*1e6:.2f} us "
             f"({to/tn:.2f}x, {N_u*T_k/tn/1e9:.2f}B updates/s)")


if __name__ == "__main__":
    main()
