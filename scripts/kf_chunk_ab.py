#!/usr/bin/env python
"""Batched-KF mean-recurrence A/B: sequential unrolled scan vs the
chunk-parallel prefix-product pass (kalman_filter_batched mean_chunk=L).

K sizing: the pallas path is ~9 us/call — K=256 gave a 0.4 ms window far
under the >=25 ms sampling rule and read a physically-impossible 1.6 us
(306% of bytes-SoL, 2026-08-21); K=4096 (36 ms) reads a stable 8.7 us.

The r4 roofline model puts the flagship batched KF (N=4096, T=50) at
~5 us HBM speed-of-light vs ~31 us measured — the gap hypothesis is the
~100 sequential tiny (N, n) fusions (two unrolled scans x T steps, each
~0.3-1 us of XLA dispatch/fusion latency). The chunked pass collapses
each L-step chunk into 3 batched ops. Interleaved pairs over several L.

TPU: python scripts/kf_chunk_ab.py     CPU smoke: --quick
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    import jax

    if args.quick:
        jax.config.update("jax_platforms", "cpu")
    N = 256 if args.quick else 4096
    reps = 2 if args.quick else args.reps

    import jax.numpy as jnp

    from bench import _device_time_per_call, _log
    from numpower_tpu.models.estimation import kalman_filter_batched
    from numpower_tpu.utils.flops import (
        kalman_batched_cost, roofline_report,
    )

    dev = jax.devices()[0]
    _log(f"device: {dev.platform}:{dev.device_kind}  N={N}")
    float(jnp.ones((1,))[0])

    A = jnp.asarray([[1.0, 0.1], [0.0, 1.0]])
    C = jnp.asarray([[1.0, 0.0]])
    Q = jnp.eye(2) * 1e-3
    R = jnp.eye(1) * 1e-2
    P0 = jnp.eye(2) * 0.1
    T = 50
    rng = np.random.default_rng(11)
    yss = jnp.asarray(rng.standard_normal((N, T, 1)).astype(np.float32))
    x0s = jnp.asarray(rng.standard_normal((N, 2)).astype(np.float32))

    # parity on-device
    ref = kalman_filter_batched(A, C, Q, R, x0s, P0, yss)
    for L in (8, 16):
        ch = kalman_filter_batched(A, C, Q, R, x0s, P0, yss, mean_chunk=L)
        d = float(jnp.max(jnp.abs(ch.means - ref.means)))
        _log(f"[parity] L={L}: means dev {d:.2e}")
        assert d < 1e-3

    def t_of(L):
        return _device_time_per_call(
            lambda x0s, yss, i: kalman_filter_batched(
                A, C, Q, R, x0s + i * 1e-6, P0, yss,
                mean_chunk=L).log_likelihood[0],
            (x0s, yss), K=2048, reps=reps)

    # r5 (VERDICT r4 #5): the fused whole-T Pallas mean pass — state in
    # VMEM, gains in SMEM, zero per-step dispatch
    def t_pallas():
        return _device_time_per_call(
            lambda x0s, yss, i: kalman_filter_batched(
                A, C, Q, R, x0s + i * 1e-6, P0, yss,
                method="pallas").log_likelihood[0],
            (x0s, yss), K=4096, reps=reps)

    d_pl = float(jnp.max(jnp.abs(
        kalman_filter_batched(A, C, Q, R, x0s, P0, yss,
                              method="pallas").means - ref.means)))
    _log(f"[parity] pallas: means dev {d_pl:.2e}")
    assert d_pl < 1e-3

    # L=25 was probed in the r4 experiment and is now rejected by the
    # mean_chunk<=16 envelope guard (advisor r4) — the measured 4e-2
    # deviation at L=50 documented the blow-up this guard prevents.
    results = {}
    for _ in range(3):
        for L in (0, 8, 16):
            results.setdefault(L, []).append(t_of(L))
        results.setdefault("pallas", []).append(t_pallas())
    for L in (0, 8, 16, "pallas"):
        t = float(np.median(results[L]))
        label = ("sequential" if L == 0
                 else "pallas fused" if L == "pallas" else f"chunk L={L}")
        _log(f"[kf] {label:12s}: {t*1e6:7.1f} us/batch "
             f"({N*T/t/1e6:,.0f}M updates/s)")
        _log(roofline_report(f"batched KF {label}",
                             kalman_batched_cost(N, T, 2, 1), t))


if __name__ == "__main__":
    main()
