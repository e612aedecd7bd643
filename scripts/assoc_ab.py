#!/usr/bin/env python
"""Pivoted vs unpivoted combine-solver A/B for the associative engines
(r3 verdict roofline follow-up: the associative paths sit far below their
bytes-based speed-of-light; the pivoted unrolled LU's per-column masked
argmax breaks XLA fusion ~6x per column, and the PSD combine algebra
admits the fully-fusable unpivoted form — utils/smallmat.lu_solve_nopivot).

Interleaved pairs (relay drift hits both equally), with on-device parity
asserted alongside. Run on TPU: python scripts/assoc_ab.py
CPU smoke: python scripts/assoc_ab.py --quick
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
    ap.add_argument("--T", type=int, default=None)
    args = ap.parse_args()

    import jax

    if args.quick:
        jax.config.update("jax_platforms", "cpu")
    T = args.T or (256 if args.quick else 4096)
    reps = 2 if args.quick else args.reps

    import jax.numpy as jnp

    from bench import _device_time_per_call, _log
    from numpower_tpu.models import quadrotor12
    from numpower_tpu.models.estimation import kalman_filter_associative
    from numpower_tpu.models.lqr import riccati_associative

    dev = jax.devices()[0]
    _log(f"device: {dev.platform}:{dev.device_kind}  T={T}")
    float(jnp.ones((1,))[0])

    A, B = quadrotor12(0.02)
    Aj, Bj = jnp.asarray(A), jnp.asarray(B)
    Q = np.eye(12, dtype=np.float32)
    R = np.eye(4, dtype=np.float32) * 0.1
    QF = jnp.asarray(np.eye(12, dtype=np.float32) * 5.0)

    # parity on-device first (JIT the whole solve: an eager associative
    # scan dispatches its unrolled combine op-by-op through the relay —
    # measured ~10 min per eager call at T=4096)
    import functools

    ric = jax.jit(functools.partial(riccati_associative, horizon=T),
                  static_argnames="nopivot")
    Ks_pv, _ = ric(Aj, Bj, Q, R, QF, nopivot=False)
    Ks_np, _ = ric(Aj, Bj, Q, R, QF, nopivot=True)
    d = float(jnp.max(jnp.abs(Ks_pv - Ks_np)))
    _log(f"[riccati] pivot-vs-nopivot gain dev: {d:.2e}")
    assert d < 1e-3

    def t_ric(nopivot):
        return _device_time_per_call(
            lambda QF_, i: riccati_associative(
                Aj, Bj, Q, R, QF_ + i * 1e-6, T, nopivot=nopivot)[0][0, 0, 0],
            (QF,), K=32, reps=reps)

    pairs = [(t_ric(False), t_ric(True)) for _ in range(3)]
    t_pv = float(np.median([p[0] for p in pairs]))
    t_np = float(np.median([p[1] for p in pairs]))
    _log(f"[riccati] T={T} n=12: pivot {t_pv*1e3:.2f} ms vs nopivot "
         f"{t_np*1e3:.2f} ms ({t_pv/t_np:.2f}x)")

    # 12-state associative KF (SP estimation shape; n>3 so the unrolled
    # LU actually runs — the n=2 bench case uses the adjugate)
    n, p = 12, 3
    C = np.zeros((p, n), np.float32)
    C[np.arange(p), np.arange(p)] = 1.0
    C = jnp.asarray(C)
    Qn = jnp.eye(n) * 1e-3
    Rn = jnp.eye(p) * 1e-2
    x0 = jnp.zeros(n)
    P0 = jnp.eye(n) * 0.1
    ys = jnp.asarray(
        np.random.default_rng(0).standard_normal((T, p)).astype(np.float32))

    kf = jax.jit(kalman_filter_associative, static_argnames="nopivot")
    r_pv = kf(Aj, C, Qn, Rn, x0, P0, ys, nopivot=False)
    r_np = kf(Aj, C, Qn, Rn, x0, P0, ys, nopivot=True)
    d = float(jnp.max(jnp.abs(r_pv.means - r_np.means)))
    _log(f"[kf12] pivot-vs-nopivot means dev: {d:.2e}")
    assert d < 1e-3

    def t_kf(nopivot):
        return _device_time_per_call(
            lambda ys_, i: kalman_filter_associative(
                Aj, C, Qn, Rn, x0, P0, ys_ + i * 1e-6,
                nopivot=nopivot).log_likelihood,
            (ys,), K=32, reps=reps)

    pairs = [(t_kf(False), t_kf(True)) for _ in range(3)]
    t_pv = float(np.median([p[0] for p in pairs]))
    t_np = float(np.median([p[1] for p in pairs]))
    _log(f"[kf12] T={T} n=12: pivot {t_pv*1e3:.2f} ms vs nopivot "
         f"{t_np*1e3:.2f} ms ({t_pv/t_np:.2f}x)")


if __name__ == "__main__":
    main()
