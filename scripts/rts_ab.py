#!/usr/bin/env python
"""Batched-RTS backward-pass A/B: unrolled XLA scan vs the fused whole-T
Pallas kernel (kalman_smoother_batched method="xla" / "pallas").

Same shape and protocol as scripts/kf_chunk_ab.py (the filter-side twin):
interleaved variant rounds, K sized so each window clears the >=25 ms
sampling rule (the smoother is ~10-30 us/call at N=4096), medians over
reps, roofline line per variant. The smoother is timed over a
precomputed filter result, perturbed per call so it cannot hoist.

TPU: python scripts/rts_ab.py     CPU smoke: --quick
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
    K = 256 if args.quick else 2048

    import jax.numpy as jnp

    from bench import _device_time_per_call, _log
    from numpower_tpu.models.estimation import (
        kalman_filter_batched, kalman_smoother_batched,
    )
    from numpower_tpu.utils.flops import roofline_report, rts_batched_cost

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

    filt = jax.tree.map(jax.block_until_ready,
                        kalman_filter_batched(A, C, Q, R, x0s, P0, yss))

    # parity on-device
    ref = kalman_smoother_batched(A, filt, method="xla")
    pal = kalman_smoother_batched(A, filt, method="pallas")
    d = float(jnp.max(jnp.abs(pal.means - ref.means)))
    _log(f"[parity] pallas vs xla: means dev {d:.2e}")
    assert d < 1e-4

    def t_of(method):
        return _device_time_per_call(
            lambda filt, i: kalman_smoother_batched(
                A, filt._replace(means=filt.means + i * 1e-6),
                method=method).means[0, 0, 0],
            (filt,), K=K, reps=reps)

    results = {}
    for _ in range(3):
        for m in ("xla", "pallas"):
            results.setdefault(m, []).append(t_of(m))
    for m in ("xla", "pallas"):
        t = float(np.median(results[m]))
        _log(f"[rts] {m:6s}: {t*1e6:7.1f} us/batch "
             f"({N*T/t/1e6:,.0f}M smoothed states/s)")
        _log(roofline_report(f"batched RTS {m}",
                             rts_batched_cost(N, T, 2), t))


if __name__ == "__main__":
    main()
