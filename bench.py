#!/usr/bin/env python
"""Benchmark harness.

Headline metric (BASELINE.json): MPC solves/s/chip for the 4096-scenario
horizon-30 quadrotor box-constrained QP (config #4), target >=10,000 with a
10 ms p50 latency budget. The LAST stdout line is a compact JSON summary:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
     "verify_pass": bool, "verify_checks": "14/14", "rows_file": ...}

and the FULL certify payload (every BASELINE section row, plausibility-gated
with relay-artifact markers, plus per-check verify verdicts with error
strings) is written to CERTIFY.json at the repo root — the driver's stdout
tail window is 2000 chars, which round 4's all-rows-in-one-line JSON
overflowed (VERDICT r4 #1). vs_baseline is value / 10_000 (the BASELINE
north-star target; the reference itself publishes no numbers — BASELINE.md).

Details (all configs, latency percentiles) go to stderr. `--full` runs every
BASELINE config; `--quick` shrinks shapes for CPU smoke tests.
"""

from __future__ import annotations

import argparse
import faulthandler
import json
import os
import signal
import sys
import time

import numpy as np

# kill -USR1 <pid> dumps all thread stacks to stderr (hang diagnosis).
faulthandler.register(signal.SIGUSR1, all_threads=True)


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


def _readback(out):
    """Force TRUE completion: fetch one scalar to the host. On the remote-TPU
    relay, block_until_ready returns at dispatch (~0.1 ms) — only a host
    readback observes real execution time."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf.ravel()[0])


def _device_time_per_call(body_fn, args, K: int = 64, reps: int = 5,
                          return_stats: bool = False):
    """TRUE device seconds per body invocation: run K data-dependent body
    iterations inside ONE jitted scan (single dispatch), subtract the no-op
    scan baseline (pure host<->device RTT), divide by K. Immune to both the
    relay's optimistic block_until_ready and its ~25 ms readback RTT.

    Variance-bounded (VERDICT r1 #9): >=5 in-process repeats; returns the
    MEDIAN per-call time (robust to the relay's ±2x run-to-run noise), and
    with return_stats=True also the IQR so round-over-round deltas are
    separable from noise."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def make_rep(fn):
        @jax.jit
        def rep(*a):
            def body(acc, i):
                return acc + fn(*a, i), None

            acc, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(K, dtype=jnp.float32))
            return acc

        return rep

    n = max(int(reps), 5)

    rep_base = make_rep(lambda *a: a[-1])
    rep_body = make_rep(body_fn)
    # compile + warm both
    float(jax.device_get(rep_base(*args)))
    float(jax.device_get(rep_body(*args)))

    # INTERLEAVE baseline/body sampling: measuring all baselines first
    # and all bodies after lets relay drift between the two phases bias
    # the subtraction — observed as a physically-impossible
    # sub-speed-of-light flagship read (MFU 118%, 2026-08-21). Sampling
    # alternates (the CLAUDE.md interleaved-A/B rule applied to the
    # harness itself) but the estimate subtracts MEDIANS, not pairs: a
    # single stalled baseline rep makes its pair's difference negative
    # (observed collapsing a 117 us quantity to 0), while the median of
    # each interleaved stream is robust to isolated stalls.
    base_ts, body_ts = [], []
    for _ in range(n):
        t = time.perf_counter()
        float(jax.device_get(rep_base(*args)))
        base_ts.append(time.perf_counter() - t)
        t = time.perf_counter()
        float(jax.device_get(rep_body(*args)))
        body_ts.append(time.perf_counter() - t)
    med = max(
        (float(np.median(body_ts)) - float(np.median(base_ts))) / K, 1e-9)
    if return_stats:
        # IQR of the baseline-subtracted per-call estimates, so median and
        # IQR describe the SAME quantity (advisor r4: raw body_ts/K folds
        # the no-op baseline/readback into the spread and overstates noise
        # on small quantities).
        diffs = (np.asarray(body_ts) - float(np.median(base_ts))) / K
        q25, q75 = np.percentile(diffs, [25, 75])
        return med, float(q75 - q25)
    return med


# Plausibility bands per certify row (VERDICT r4 #2): (lo, hi) in the row's
# own unit. These catch relay-drift ARTIFACTS — the driver's r4 capture
# recorded a 16.2 us flagship (266% of the 42.9 us speed-of-light), a 33 us
# 256-batch latency (builder range 2.3-4.5), and a 108M solves/s ADMM row
# (above the 100M SoL ceiling) with no marker. Bounds are loose (real
# improvements land INSIDE them; lo on us-rows sits just under the
# utils/flops.py speed-of-light, hi on rate-rows just over it). A row
# outside its band triggers ONE re-measure of its section; if still outside
# it is emitted with "artifact": true + the band, never as a bare number.
PLAUSIBILITY_BANDS = {
    "fista_flagship_us_per_batch": (44.0, 400.0),   # SoL ~51 us @40 iters
    "fista_flagship_solves_per_sec": (1e7, 9.5e7),
    "fista_mfu": (0.0, 1.0),
    "admm_flagship_us_per_batch": (40.0, 400.0),    # SoL 42.9 us @40 iters
    "admm_flagship_solves_per_sec": (1e7, 1.03e8),
    "admm_mfu": (0.0, 1.0),
    "latency_256batch_us": (0.3, 20.0),
    "config1_lqr_us": (15.0, 500.0),
    "config2_riccati_solves_per_sec": (8e5, 2e7),
    "config2b_fused_riccati_solves_per_sec": (4e5, 1e8),  # r5 packed: ~40M
    "riccati_assoc_ms": (1.2, 15.0),
    "riccati_assoc_speedup": (2.0, 40.0),
    "config3_ilqr_ms": (0.8, 12.0),
    "config3b_batched_ilqr_solves_per_sec": (5e4, 5e6),  # r5 fwd kernel
    "ilqr_backward_fused_ms": (0.001, 0.5),
    "tube_sweep_rollouts_per_sec": (2e7, 2.5e8),
    "serving_fista_tick_us": (15.0, 300.0),
    "serving_admm_tick_us": (15.0, 300.0),
    "solvers_admm_solves_per_sec": (1e7, 1.03e8),   # SoL ceiling ~100M
    "al_ilqr_solves_per_sec": (3e4, 3e6),  # r5 fwd kernel
    "mppi_rollouts_per_sec": (1e7, 5e9),  # r5 fused kernel: ~0.3-1B
    "kalman_batched_updates_per_sec": (1e9, 4e10),
    "rts_batched_states_per_sec": (1e9, 4e10),  # bytes-SoL ~3.4e10 @4096x50
    "pf_particle_steps_per_sec": (5e7, 2e9),
    "ukf_updates_per_sec": (2e6, 1e10),  # r5 packed kernel: ~3.7B
    "ekf_updates_per_sec": (5e6, 2e10),  # r5 packed kernel: ~5.1B
    "kalman_assoc_ms": (0.25, 6.0),
    "kalman_assoc_speedup": (4.0, 60.0),
    "shardmap_overhead_pct": (-3.0, 60.0),
}


def _rows_out_of_band(rows: dict) -> dict:
    """Row keys whose values fall outside PLAUSIBILITY_BANDS → (value, lo, hi)."""
    bad = {}
    for k, (v, _u) in rows.items():
        band = PLAUSIBILITY_BANDS.get(k)
        if band and not (band[0] <= float(v) <= band[1]):
            bad[k] = (float(v), band[0], band[1])
    return bad


def _gated_section(name: str, fn, artifacts: dict, enabled: bool = True) -> dict:
    """Run a certify section; if any row is physically implausible, re-measure
    the WHOLE section once (relay-stall defense); rows still outside their
    band after the retry are recorded in `artifacts` (VERDICT r4 #2).
    `enabled=False` (CPU smoke) skips gating — the bands are TPU-calibrated."""
    if not enabled:
        return fn() or {}
    rows = fn() or {}
    bad = _rows_out_of_band(rows)
    if bad:
        for k, (v, lo, hi) in bad.items():
            _log(f"[gate] IMPLAUSIBLE {k}={v:.6g} outside [{lo:g}, {hi:g}] "
                 f"— re-measuring section {name}")
        rows = fn() or rows
        bad = _rows_out_of_band(rows)
        for k, (v, lo, hi) in bad.items():
            _log(f"[gate] STILL IMPLAUSIBLE after re-measure: {k}={v:.6g} "
                 f"outside [{lo:g}, {hi:g}] — marking as relay artifact")
            artifacts[k] = [lo, hi]
    return rows


def bench_flagship(scenarios: int, horizon: int, iters: int, reps: int):
    """Config #4: quadrotor 12-state, box-constrained QP (Pallas fused FISTA
    on TPU, XLA FISTA elsewhere; bf16 coarse + fp32 tail precision policy)."""
    import jax
    import jax.numpy as jnp

    from numpower_tpu.models import condense, quadrotor12, solve_mpc_boxqp

    A, B = quadrotor12(0.02)
    n, m = 12, 4
    Q = np.eye(n, dtype=np.float32)
    R = np.eye(m, dtype=np.float32) * 0.1
    QF = np.eye(n, dtype=np.float32) * 5.0

    t0 = time.perf_counter()
    qp = jax.jit(condense, static_argnums=5)(A, B, Q, R, QF, horizon)
    jax.block_until_ready(qp.H)
    _log(f"[flagship] condense formed in {time.perf_counter()-t0:.1f}s")

    x0s = jnp.asarray(
        0.3 * np.random.default_rng(0).standard_normal((scenarios, n)), jnp.float32
    )

    # bf16-coarse schedule needs concrete kappa — compute it here (host
    # readback of two scalars; also warms the D2H channel) and pass it into
    # the jitted body, where qp is traced and the default degrades to fp32.
    from numpower_tpu.models.condensed import default_coarse_iters

    ci = default_coarse_iters(qp, iters)
    _log(f"[flagship] FISTA precision schedule: {ci} bf16 + {iters - ci} fp32 iters")

    # ADMM schedule likewise resolved EAGERLY (qp is concrete here; inside
    # the jitted body it is traced and the schedule would silently degrade
    # to all-fp32 — the exact footgun VERDICT r2 weak #1 flagged).
    from numpower_tpu.models.condensed import admm_coarse_iters

    ai = admm_coarse_iters(qp, iters)
    _log(f"[flagship] ADMM precision schedule: {ai} bf16 + {iters - ai} fp32 iters")

    # full solve (g formation + FISTA) per body call; i-dependent input
    # defeats loop-invariant hoisting
    def body(qp, x0s, i):
        return solve_mpc_boxqp(qp, x0s + i * 1e-6, -1.0, 1.0, iters=iters,
                               coarse_iters=ci).U[0, 0]

    # K=512 at the 4096-scenario shape: ~26 ms of device work per rep —
    # comfortably above the relay's ±few-ms RTT jitter. K=64 measured a
    # 28 us IQR on a 50 us quantity (BENCH_r02-era noise); K=512 gets the
    # IQR down to ~6 us.
    rows = {}
    K_flag = 32 if scenarios <= 512 else 512
    per_batch, iqr_f = _device_time_per_call(
        body, (qp, x0s), K=K_flag, reps=reps, return_stats=True)
    solves_per_sec = scenarios / per_batch
    rows["fista_flagship_us_per_batch"] = (per_batch * 1e6, "us")
    rows["fista_flagship_solves_per_sec"] = (solves_per_sec, "solves/s")
    _log(
        f"[flagship] quadrotor h={horizon} N={scenarios} iters={iters} (FISTA): "
        f"{per_batch*1e6:.1f} us/batch median (IQR {iqr_f*1e6:.1f} us) "
        f"-> {solves_per_sec:,.0f} solves/s/chip"
    )

    # MFU (VERDICT r2 weak #3): pass-weighted speed-of-light vs measured
    from numpower_tpu.utils.flops import (
        admm_mpc_cost, fista_mpc_cost, mfu_report, peak_tflops,
    )

    d = qp.H.shape[0]
    peak = peak_tflops()
    cost_f = fista_mpc_cost(scenarios, n, d, iters, ci)
    _log(mfu_report(f"FISTA N={scenarios} d={d}", cost_f, per_batch, peak))
    if peak:
        rows["fista_mfu"] = (cost_f.mfu(per_batch, peak), "fraction")

    # same QP via fused ADMM (exact-solve splitting; converges tighter at the
    # same iteration count — both solvers hit the same optimum within 1e-4,
    # so the headline is the faster of the two)
    from numpower_tpu.models import solve_mpc_boxqp_admm

    def body_admm(qp, x0s, i):
        return solve_mpc_boxqp_admm(qp, x0s + i * 1e-6, -1.0, 1.0,
                                    iters=iters, coarse_iters=ai).U[0, 0]

    per_admm, iqr_a = _device_time_per_call(
        body_admm, (qp, x0s), K=K_flag, reps=reps, return_stats=True)
    admm_per_sec = scenarios / per_admm
    rows["admm_flagship_us_per_batch"] = (per_admm * 1e6, "us")
    rows["admm_flagship_solves_per_sec"] = (admm_per_sec, "solves/s")
    _log(
        f"[flagship] quadrotor h={horizon} N={scenarios} iters={iters} (ADMM):  "
        f"{per_admm*1e6:.1f} us/batch median (IQR {iqr_a*1e6:.1f} us) "
        f"-> {admm_per_sec:,.0f} solves/s/chip"
    )
    cost_a = admm_mpc_cost(scenarios, n, d, iters, ai)
    _log(mfu_report(f"ADMM  N={scenarios} d={d}", cost_a, per_admm, peak))
    if peak:
        rows["admm_mfu"] = (cost_a.mfu(per_admm, peak), "fraction")
    if admm_per_sec > solves_per_sec:
        solves_per_sec, per_batch = admm_per_sec, per_admm

    # latency config: small batch for the 10 ms real-time budget
    def body_small(qp, x0s, i):
        return solve_mpc_boxqp(qp, x0s[:256] + i * 1e-6, -1.0, 1.0, iters=iters,
                               coarse_iters=ci).U[0, 0]

    per_small = _device_time_per_call(body_small, (qp, x0s), K=256, reps=reps)
    rows["latency_256batch_us"] = (per_small * 1e6, "us")
    if per_small <= 2e-8:
        _log("[latency]  256-scenario batch device time below the relay "
             "noise floor (<0.02 us measured; budget 10 ms)")
    else:
        _log(
            f"[latency]  256-scenario batch device time ~{per_small*1e6:.1f} us "
            f"(budget 10 ms; excludes host link RTT)"
        )
    return solves_per_sec, per_batch * 1e3, rows


def bench_lqr(horizon: int, reps: int) -> dict:
    """Config #1: double-integrator LQR single rollout; #2: 256-scenario
    batched Riccati. Returns summary rows for the driver JSON."""
    import jax
    import jax.numpy as jnp

    from numpower_tpu.models import double_integrator, lqr_solve, lqr_solve_batched

    A, B = double_integrator(0.1)
    Q = np.eye(2, dtype=np.float32)
    R = np.eye(1, dtype=np.float32) * 0.1
    QF = np.eye(2, dtype=np.float32) * 100.0

    rows = {}
    x0 = jnp.array([1.0, 0.0])
    t1 = _device_time_per_call(
        lambda x0, i: lqr_solve(A, B, Q, R, QF, x0 + i * 1e-6, horizon)[0][0, 0],
        (x0,), K=256, reps=reps,
    )
    _log(f"[config1] double-integrator LQR h={horizon}: {t1*1e6:.1f} us/solve device")
    rows["config1_lqr_us"] = (t1 * 1e6, "us")

    x0s = jnp.asarray(np.random.default_rng(1).standard_normal((256, 2)), jnp.float32)
    t2 = _device_time_per_call(
        lambda xs, i: lqr_solve_batched(A, B, Q, R, QF, xs + i * 1e-6, horizon)[0][0, 0, 0],
        (x0s,), K=256, reps=reps,
    )
    _log(
        f"[config2] 256-scenario LTI Riccati h={horizon}: "
        f"{t2*1e6:.1f} us/batch -> {256/t2:,.0f} solves/s"
    )
    rows["config2_riccati_solves_per_sec"] = (256 / t2, "solves/s")

    # config #2b: per-scenario dynamics (the batched-small-cholesky path,
    # Pallas kernel on TPU)
    from numpower_tpu.models import quadrotor12, riccati_scan_per_scenario

    Aq, Bq = quadrotor12(0.02)
    N = 1024
    rng = np.random.default_rng(4)
    As = jnp.asarray(
        np.tile(np.asarray(Aq), (N, 1, 1))
        + 0.01 * rng.standard_normal((N, 12, 12)).astype(np.float32)
    )
    Bs = jnp.broadcast_to(jnp.asarray(Bq), (N, 12, 4))
    Qq = np.eye(12, dtype=np.float32)
    Rq = np.eye(4, dtype=np.float32) * 0.1
    QFq = np.eye(12, dtype=np.float32) * 5.0
    # K=64: at ~0.5 ms/call an 8-call window sits inside the relay's RTT
    # jitter (observed collapsing to 0.00 ms)
    t2b = _device_time_per_call(
        lambda As, Bs, i: riccati_scan_per_scenario(
            As + i * 1e-6, Bs, Qq, Rq, QFq, horizon
        )[0][0, 0, 0, 0],
        (As, Bs), K=64, reps=max(2, reps // 3),
    )
    _log(
        f"[config2b] {N}-scenario per-scenario Riccati h={horizon}: "
        f"{t2b*1e3:.2f} ms/batch -> {N/t2b:,.0f} solves/s"
    )
    from numpower_tpu.utils.flops import riccati_fused_cost, roofline_report

    _log(roofline_report(f"fused Riccati N={N} h={horizon}",
                         riccati_fused_cost(N, horizon, 12, 4), t2b))
    rows["config2b_fused_riccati_solves_per_sec"] = (N / t2b, "solves/s")

    # long-horizon parallel-in-time Riccati (the SP engine's in-device
    # primitive): sequential scan vs associative O(log T) at flagship dims
    from numpower_tpu.models.lqr import riccati_associative, riccati_scan

    T_long = 4096
    Aq_j, Bq_j = jnp.asarray(Aq), jnp.asarray(Bq)
    QFq_j = jnp.asarray(QFq)
    t_rs = _device_time_per_call(
        lambda QF_, i: riccati_scan(
            Aq_j, Bq_j, Qq, Rq, QF_ + i * 1e-6, T_long)[0][0, 0, 0],
        (QFq_j,), K=8, reps=max(2, reps // 3),
    )
    # nopivot=True: explicit opt-in (1.11x) — the quadrotor combine chain is
    # well-conditioned; the library default is the pivoted solver (advisor
    # r4: PSD factors do not bound unpivoted pivots on general inputs).
    t_ra = _device_time_per_call(
        lambda QF_, i: riccati_associative(
            Aq_j, Bq_j, Qq, Rq, QF_ + i * 1e-6, T_long,
            nopivot=True)[0][0, 0, 0],
        (QFq_j,), K=32, reps=max(2, reps // 3),
    )
    _log(
        f"[riccati] T={T_long} n=12 single: sequential {t_rs*1e3:.2f} ms vs "
        f"associative {t_ra*1e3:.2f} ms ({t_rs/t_ra:.1f}x)"
    )
    from numpower_tpu.utils.flops import riccati_associative_cost

    _log(roofline_report(f"assoc Riccati T={T_long} n=12",
                         riccati_associative_cost(T_long, 12), t_ra))
    rows["riccati_assoc_ms"] = (t_ra * 1e3, "ms")
    rows["riccati_assoc_speedup"] = (t_rs / t_ra, "x")
    return rows


def bench_ilqr(reps: int):
    """Config #3: cartpole iLQR with finite-diff Jacobians."""
    import jax
    import jax.numpy as jnp

    from numpower_tpu.models import cartpole_step, ilqr_solve

    Q = jnp.diag(jnp.array([1.0, 10.0, 0.1, 0.1]))
    R = jnp.eye(1) * 0.01
    QF = jnp.diag(jnp.array([10.0, 100.0, 1.0, 1.0]))
    x_goal = jnp.zeros(4)

    x0 = jnp.array([0.0, 0.5, 0.0, 0.0])
    t = _device_time_per_call(
        lambda x0, i: ilqr_solve(
            cartpole_step, x0 + i * 1e-6, Q, R, QF, x_goal,
            horizon=50, iters=10, use_fd=True, unroll_scans=True,
        ).cost,
        (x0,), K=32, reps=max(2, reps // 2),
    )
    _log(f"[config3] cartpole iLQR (fd, 10 iters, h=50): {t*1e3:.2f} ms/solve device")
    rows = {"config3_ilqr_ms": (t * 1e3, "ms")}

    # batched scenarios (the TPU-native way to run config #3 at scale)
    x0s = jnp.asarray(
        np.random.default_rng(3).standard_normal((256, 4)) * 0.3, jnp.float32
    )
    from numpower_tpu.models import ilqr_solve_batched

    backend = "fused" if jax.default_backend() in ("tpu", "axon") else "vmap"
    t = _device_time_per_call(
        lambda xs, i: jnp.sum(
            ilqr_solve_batched(
                cartpole_step, xs + i * 1e-6, Q, R, QF, x_goal,
                horizon=50, iters=10, use_fd=True, backend=backend,
            ).cost
        ),
        (x0s,), K=16, reps=3,
    )
    _log(
        f"[config3b] 256-scenario batched iLQR ({backend} backward): "
        f"{t*1e3:.2f} ms/batch -> {256/t:,.0f} iLQR solves/s"
    )
    rows["config3b_batched_ilqr_solves_per_sec"] = (256 / t, "solves/s")

    # standalone fused-backward kernel timing + roofline (r3 verdict weak
    # #2: every fast path carries a utilization figure)
    from numpower_tpu.kernels.ilqr_backward import ilqr_backward_fused
    from numpower_tpu.models import linearize_trajectory, rollout_nonlinear
    from numpower_tpu.utils.flops import ilqr_backward_cost, roofline_report

    Nb, Tb = 256, 50
    interp = jax.default_backend() not in ("tpu", "axon")
    usb = jnp.asarray(
        0.1 * np.random.default_rng(5).standard_normal((Nb, Tb, 1)),
        jnp.float32)
    xsb = jax.vmap(lambda x0, u: rollout_nonlinear(cartpole_step, x0, u))(
        x0s, usb)
    As, Bs = jax.vmap(
        lambda x, u: linearize_trajectory(cartpole_step, x, u))(xsb, usb)
    lxs = 2.0 * xsb[:, :Tb] @ Q.T
    lus = 2.0 * usb @ R.T
    lxT = 2.0 * xsb[:, Tb] @ QF.T
    # K=256: at ~0.1 ms/call a 64-call window (~7 ms) sits inside the
    # relay RTT noise (reads drifted 18-117 us between captures);
    # 256 calls ~= 30 ms of device work clears it
    t_bw = _device_time_per_call(
        lambda As, Bs, i: ilqr_backward_fused(
            As + i * 1e-7, Bs, lxs, lus, 2 * Q, 2 * R, lxT, 2 * QF,
            reg=1e-3, interpret=interp)[0][0, 0, 0],
        (As, Bs), K=256, reps=max(2, reps // 2),
    )
    _log(f"[ilqr-bw] fused backward N={Nb} T={Tb}: {t_bw*1e3:.3f} ms/batch")
    _log(roofline_report(f"fused iLQR backward N={Nb} T={Tb}",
                         ilqr_backward_cost(Nb, Tb, 4, 1), t_bw))
    rows["ilqr_backward_fused_ms"] = (t_bw * 1e3, "ms")
    return rows


def bench_solvers_extra(scenarios: int, horizon: int, iters: int, reps: int):
    """Beyond-reference solver families: ADMM condensed QP, AL-iLQR, MPPI."""
    import jax
    import jax.numpy as jnp

    from numpower_tpu.models import (
        al_ilqr_solve_batched, condense, mppi_solve_batched, pendulum_step,
        quadratic_mppi_cost, quadrotor12, solve_mpc_boxqp_admm,
    )

    # ADMM on the flagship condensed QP (exact-solve splitting: the
    # per-iteration core is the same (N, d) @ (d, d) GEMM as FISTA)
    A, B = quadrotor12(0.02)
    Q = np.eye(12, dtype=np.float32)
    R = np.eye(4, dtype=np.float32) * 0.1
    QF = np.eye(12, dtype=np.float32) * 5.0
    qp = jax.jit(condense, static_argnums=5)(A, B, Q, R, QF, horizon)
    x0s = jnp.asarray(
        0.3 * np.random.default_rng(7).standard_normal((scenarios, 12)), jnp.float32
    )
    # schedule resolved eagerly (qp is traced inside the body — see
    # bench_flagship)
    from numpower_tpu.models.condensed import admm_coarse_iters

    ai = admm_coarse_iters(qp, iters)
    t = _device_time_per_call(
        lambda qp, xs, i: solve_mpc_boxqp_admm(
            qp, xs + i * 1e-6, -1.0, 1.0, iters=iters, coarse_iters=ai
        ).U[0, 0],
        (qp, x0s), K=32 if scenarios <= 512 else 512, reps=reps,
    )
    _log(
        f"[admm]  quadrotor h={horizon} N={scenarios} iters={iters}: "
        f"{t*1e6:.1f} us/batch -> {scenarios/t:,.0f} solves/s/chip"
    )
    rows = {"solvers_admm_solves_per_sec": (scenarios / t, "solves/s")}

    # AL-iLQR: constrained nonlinear swingup, batched scenarios
    N_al = max(1, min(scenarios // 16, 256))
    Qp = jnp.diag(jnp.array([1.0, 0.1]))
    Rp = jnp.eye(1) * 0.01
    QFp = jnp.diag(jnp.array([100.0, 10.0]))
    x0s_p = jnp.asarray(
        np.random.default_rng(8).uniform(-np.pi, np.pi, (N_al, 2)), jnp.float32
    )
    backend = "fused" if jax.default_backend() in ("tpu", "axon") else "vmap"
    t = _device_time_per_call(
        lambda xs, i: jnp.sum(al_ilqr_solve_batched(
            pendulum_step, xs + i * 1e-6, Qp, Rp, QFp, jnp.zeros(2),
            40, -2.0, 2.0, al_iters=4, ilqr_iters=6, backend=backend,
        ).cost),
        (x0s_p,), K=4, reps=max(2, reps // 3),
    )
    _log(
        f"[al-ilqr] {N_al}-scenario pendulum (h=40, 4x6 iters, box +-2, "
        f"{backend} backward): {t*1e3:.2f} ms/batch -> {N_al/t:,.0f} solves/s"
    )
    rows["al_ilqr_solves_per_sec"] = (N_al / t, "solves/s")

    # MPPI: N scenarios x K samples fused rollouts. On TPU method="auto"
    # routes the whole solve through the fused kernel (kernels/mppi.py,
    # r5) — ~0.5 ms/solve-batch, so the window needs K=64 to clear the
    # >=25 ms sampling rule (the XLA path at ~14 ms was fine with K=4)
    N_mp, K_mp = max(1, min(scenarios // 16, 256)), 256
    cost_fn = quadratic_mppi_cost(Qp, Rp, QFp, jnp.zeros(2))
    key = jax.random.key(0)
    on_tpu = jax.default_backend() in ("tpu", "axon")
    t = _device_time_per_call(
        lambda xs, k, i: jnp.sum(mppi_solve_batched(
            pendulum_step, xs + i * 1e-6, cost_fn, 40, k,
            samples=K_mp, iters=8, m=1,
        ).cost),
        (x0s_p[:N_mp], key), K=64 if on_tpu else 4,
        reps=max(2, reps // 3),
    )
    rollouts = N_mp * K_mp * 8
    _log(
        f"[mppi]  {N_mp}-scenario x {K_mp}-sample pendulum (h=40, 8 updates): "
        f"{t*1e3:.2f} ms/batch -> {N_mp/t:,.0f} solves/s "
        f"({rollouts/t/1e6:.1f} M rollouts/s)"
    )
    from numpower_tpu.utils.flops import mppi_batched_cost, roofline_report

    _log(roofline_report(f"MPPI N={N_mp} K={K_mp} T=40 iters=8",
                         mppi_batched_cost(N_mp, K_mp, 8, 40, 1), t))
    rows["mppi_rollouts_per_sec"] = (rollouts / t, "rollouts/s")
    return rows


def bench_estimation(scenarios: int, reps: int):
    """Batched Kalman filtering throughput (the estimation side of the MPC
    loop) + sequential-vs-associative parallel-in-time comparison."""
    import jax
    import jax.numpy as jnp

    from numpower_tpu.models import (
        double_integrator, kalman_filter, kalman_filter_associative,
        kalman_filter_batched,
    )

    A, B = double_integrator(0.1)
    C = jnp.array([[1.0, 0.0]])
    Q = jnp.eye(2) * 1e-3
    R = jnp.eye(1) * 1e-2
    P0 = jnp.eye(2) * 0.1
    N, T = scenarios, 50
    rng = np.random.default_rng(11)
    yss = jnp.asarray(rng.standard_normal((N, T, 1)).astype(np.float32))
    x0s = jnp.asarray(rng.standard_normal((N, 2)).astype(np.float32))
    # K=2048: the r5 fused mean-pass kernel runs this row at ~9 us/call —
    # K=256 (2 ms window) sits under the >=25 ms sampling rule and read a
    # physically-impossible 1.6 us in the kernel A/B (scripts/kf_chunk_ab.py)
    t = _device_time_per_call(
        lambda x0s, yss, i: kalman_filter_batched(
            A, C, Q, R, x0s + i * 1e-6, P0, yss).log_likelihood[0],
        (x0s, yss), K=2048 if scenarios >= 2048 else 256, reps=reps,
    )
    if t <= 2e-8:
        _log(f"[kalman] {N}-trajectory batched filter T={T}: below timer "
             f"resolution (<{t*1e6:.2f} us/batch)")
    else:
        _log(
            f"[kalman] {N}-trajectory batched filter T={T}: {t*1e3:.2f} ms/batch "
            f"-> {N/t:,.0f} filters/s ({N*T/t/1e6:.1f}M updates/s)"
        )
    from numpower_tpu.utils.flops import (
        kalman_associative_cost, kalman_batched_cost, particle_filter_cost,
        roofline_report,
    )

    _log(roofline_report(f"batched KF N={N} T={T}",
                         kalman_batched_cost(N, T, 2, 1), t))
    rows = {"kalman_batched_updates_per_sec": (N * T / t, "updates/s")}

    # batched RTS smoother (r5): shared gain/cov recursions once + fused
    # backward mean-pass kernel (kernels/rts_batched.py). Timed over a
    # precomputed filter result, perturbed per-iteration so the smoother
    # cannot hoist out of the timing loop.
    from numpower_tpu.models.estimation import kalman_smoother_batched
    from numpower_tpu.utils.flops import rts_batched_cost

    filt_sm = jax.tree.map(
        jax.block_until_ready,
        kalman_filter_batched(A, C, Q, R, x0s, P0, yss))
    t_sm = _device_time_per_call(
        lambda filt, i: kalman_smoother_batched(
            A, filt._replace(means=filt.means + i * 1e-6)).means[0, 0, 0],
        (filt_sm,), K=2048 if scenarios >= 2048 else 256, reps=reps,
    )
    _log(
        f"[rts]    {N}-trajectory batched RTS smoother T={T}: "
        f"{t_sm*1e6:.2f} us/batch -> {N*T/t_sm/1e6:.1f}M smoothed states/s"
    )
    _log(roofline_report(f"batched RTS N={N} T={T}",
                         rts_batched_cost(N, T, 2), t_sm))
    rows["rts_batched_states_per_sec"] = (N * T / t_sm, "states/s")

    # particle filter: batched nonlinear SMC throughput (plant evals/s is
    # the cost driver: N_traj x n_particles x T pendulum steps per call)
    from numpower_tpu.models import particle_filter_batched, pendulum_step

    N_pf, P_pf, T_pf = max(1, min(scenarios // 16, 256)), 1024, 50
    h_pf = lambda x: x[:1]
    ys_pf = jnp.asarray(rng.standard_normal((N_pf, T_pf, 1)).astype(np.float32))
    us_pf = jnp.zeros((N_pf, T_pf, 1), jnp.float32)
    x0s_pf = jnp.asarray(
        0.3 * rng.standard_normal((N_pf, 2)).astype(np.float32))
    key_pf = jax.random.key(0)
    t = _device_time_per_call(
        lambda x0s, yss, us, k, i: jnp.sum(particle_filter_batched(
            pendulum_step, h_pf, jnp.eye(2) * 1e-4, jnp.eye(1) * 2.5e-3,
            x0s + i * 1e-6, jnp.eye(2), yss, us, k,
            n_particles=P_pf).log_likelihood),
        (x0s_pf, ys_pf, us_pf, key_pf), K=4, reps=max(2, reps // 3),
    )
    _log(
        f"[pf]     {N_pf}-trajectory x {P_pf}-particle bootstrap PF T={T_pf} "
        f"(pendulum): {t*1e3:.2f} ms/batch -> {N_pf/t:,.0f} filters/s "
        f"({N_pf*P_pf*T_pf/t/1e6:.0f}M particle-steps/s)"
    )
    # split roofline (advisor r4): propagate/weight is VPU/HBM-class; the
    # r4 one-hot resampler is an O(Np^2) MXU contraction — the old single
    # gather-based model understated the work ~100x, making its printed
    # utilization meaningless
    from numpower_tpu.utils.flops import (
        peak_hbm_gbps, peak_tflops, pf_resample_cost, vpu_peak_tflops,
    )

    prop_c = particle_filter_cost(N_pf, P_pf, T_pf, 2, 1)
    res_c = pf_resample_cost(N_pf, P_pf, T_pf, 2)
    hbm_pk, vpu_pk, mxu_pk = peak_hbm_gbps(), vpu_peak_tflops(), peak_tflops()
    if hbm_pk and vpu_pk and mxu_pk:
        sol_prop = prop_c.sol_seconds(hbm_pk, vpu_pk)
        sol_res = res_c.sol_seconds(mxu_pk)
        util = (sol_prop + sol_res) / t
        flag = (" [IMPOSSIBLE >100%: relay-drift artifact, discard]"
                if util > 1.0 else "")
        _log(f"[roofline] particle filter {N_pf}x{P_pf} T={T_pf} split: "
             f"propagate SoL {sol_prop*1e3:.2f} ms (VPU/HBM) + resample "
             f"SoL {sol_res*1e3:.2f} ms (one-hot MXU, n-pad "
             f"{100*res_c.padding_waste:.0f}% waste) vs measured "
             f"{t*1e3:.2f} ms -> {100*util:.0f}% of combined roofline"
             f"{flag}")
    else:
        _log(roofline_report(f"particle filter {N_pf}x{P_pf} T={T_pf} "
                             f"(propagate only)", prop_c, t))
    rows["pf_particle_steps_per_sec"] = (N_pf * P_pf * T_pf / t, "steps/s")

    # batched UKF (nonlinear estimator lineup): on TPU this routes through
    # the whole-T fused kernel (kernels/ukf.py, r5); the r4 vmapped path
    # (method="xla") measured 4.65 ms at this shape
    from numpower_tpu.models.estimation import ukf_filter_batched

    def f_pend(x, u):
        th, om = x[0], x[1]
        return jnp.stack(
            [th + 0.05 * om, om - 0.05 * 9.81 * jnp.sin(th) + 0.05 * u[0]])

    def h_pend(x):
        return x[:1]

    N_ukf, T_ukf = max(1, min(scenarios // 4, 1024)), 50
    ys_u = jnp.asarray(rng.standard_normal((N_ukf, T_ukf, 1)).astype(np.float32))
    us_u = jnp.zeros((N_ukf, T_ukf, 1), jnp.float32)
    x0_u = jnp.asarray(0.3 * rng.standard_normal((N_ukf, 2)).astype(np.float32))
    # K=512: the r5 fused kernel runs this row at ~58 us/call — K=32 (1.9 ms
    # window) would sit under the >=25 ms sampling rule
    t_u = _device_time_per_call(
        lambda x0s, ys, us, i: ukf_filter_batched(
            f_pend, h_pend, Q, R, x0s + i * 1e-6, P0, ys,
            us).log_likelihood[0],
        (x0_u, ys_u, us_u), K=512 if scenarios >= 2048 else 32, reps=reps,
    )
    _log(
        f"[ukf]    {N_ukf}-trajectory vmapped UKF T={T_ukf} (pendulum): "
        f"{t_u*1e3:.2f} ms/batch -> {N_ukf*T_ukf/t_u/1e6:.1f}M updates/s"
    )
    from numpower_tpu.utils.flops import ekf_batched_cost, ukf_batched_cost

    _log(roofline_report(f"batched UKF N={N_ukf} T={T_ukf}",
                         ukf_batched_cost(N_ukf, T_ukf, 2, 1), t_u))
    rows["ukf_updates_per_sec"] = (N_ukf * T_ukf / t_u, "updates/s")

    # batched EKF (r5 fused kernel with in-kernel jvp Jacobians; the
    # vmapped XLA path measured 2.77 ms at this shape)
    from numpower_tpu.models.estimation import ekf_filter_batched

    t_e = _device_time_per_call(
        lambda x0s, ys, us, i: ekf_filter_batched(
            f_pend, h_pend, Q, R, x0s + i * 1e-6, P0, ys,
            us).log_likelihood[0],
        (x0_u, ys_u, us_u), K=512 if scenarios >= 2048 else 32, reps=reps,
    )
    _log(
        f"[ekf]    {N_ukf}-trajectory batched EKF T={T_ukf} (pendulum): "
        f"{t_e*1e3:.3f} ms/batch -> {N_ukf*T_ukf/t_e/1e6:.1f}M updates/s"
    )
    _log(roofline_report(f"batched EKF N={N_ukf} T={T_ukf}",
                         ekf_batched_cost(N_ukf, T_ukf, 2, 1), t_e))
    rows["ekf_updates_per_sec"] = (N_ukf * T_ukf / t_e, "updates/s")

    # long-horizon: sequential scan vs associative O(log T)
    T_long = 4096
    ys_long = jnp.asarray(rng.standard_normal((T_long, 1)).astype(np.float32))
    x0 = jnp.array([1.0, 0.0])
    t_seq = _device_time_per_call(
        lambda ys, i: kalman_filter(
            A, C, Q, R, x0, P0, ys + i * 1e-6).log_likelihood,
        (ys_long,), K=8, reps=max(2, reps // 3),
    )
    # K=64: the associative path is ~0.7 ms/call, so an 8-call window
    # (~10 ms) sits inside the relay's RTT jitter. nopivot=True: explicit
    # opt-in (r4: 0.70 vs 1.16 ms even at n=2 — the unpivoted GJ fuses
    # where the adjugate's stacked construction does not); the library
    # default is the pivoted solver (advisor r4).
    t_par = _device_time_per_call(
        lambda ys, i: kalman_filter_associative(
            A, C, Q, R, x0, P0, ys + i * 1e-6,
            nopivot=True).log_likelihood,
        (ys_long,), K=64, reps=max(2, reps // 3),
    )
    _log(
        f"[kalman] T={T_long} single filter: sequential {t_seq*1e3:.2f} ms vs "
        f"associative {t_par*1e3:.2f} ms ({t_seq/t_par:.1f}x)"
    )
    _log(roofline_report(f"assoc KF T={T_long} n=2",
                         kalman_associative_cost(T_long, 2), t_par))
    rows["kalman_assoc_ms"] = (t_par * 1e3, "ms")
    rows["kalman_assoc_speedup"] = (t_seq / t_par, "x")
    return rows


def bench_tube(scenarios: int, reps: int):
    """Config #5 (single-host slice): tube-MPC scenario sweep."""
    import jax
    import jax.numpy as jnp

    from numpower_tpu.models import condense, quadrotor12, tube_mpc_solve

    A, B = quadrotor12(0.02)
    Q = np.eye(12, dtype=np.float32)
    R = np.eye(4, dtype=np.float32) * 0.1
    QF = np.eye(12, dtype=np.float32) * 5.0
    qp = jax.jit(condense, static_argnums=5)(A, B, Q, R, QF, 20)
    rng = np.random.default_rng(2)
    w = jnp.asarray(0.002 * rng.standard_normal((scenarios, 20, 12)), jnp.float32)
    x0 = jnp.asarray(0.2 * rng.standard_normal(12), jnp.float32)

    t = _device_time_per_call(
        lambda qp, x0, w, i: tube_mpc_solve(
            qp, A, B, Q, R, x0 + i * 1e-6, w, -1.0, 1.0
        ).tube_radius[0],
        (qp, x0, w), K=256, reps=reps,
    )
    _log(
        f"[config5] tube-MPC sweep N={scenarios}: {t*1e3:.3f} ms/sweep device "
        f"-> {scenarios/t:,.0f} scenario-rollouts/s"
    )
    rows = {"tube_sweep_rollouts_per_sec": (scenarios / t, "rollouts/s")}

    # Host-fed variant: the C++ ScenarioStream generates each sweep's
    # disturbance batch in worker threads (double-buffered ring) while the
    # device solves the previous one — jax's async dispatch overlaps the
    # device_put + solve with the next batch's RNG, so the sweep never
    # stalls on host generation (runtime/src/scenario_stream.cpp).
    from numpower_tpu.runtime.stream import ScenarioStream

    solve = jax.jit(lambda qp, x0, w: tube_mpc_solve(
        qp, A, B, Q, R, x0, w, -1.0, 1.0).tube_radius[0])
    n_batches = 8
    with ScenarioStream(batch=scenarios, shape=(20, 12), seed=0,
                        dist="normal", scale=0.002) as stream:
        w0 = jnp.asarray(next(stream))
        float(jax.device_get(solve(qp, x0, w0)))  # compile + warm
        t0 = time.perf_counter()
        outs = []
        for _, wb in zip(range(n_batches), stream):
            outs.append(solve(qp, x0, jnp.asarray(wb)))
        for o in outs:
            float(jax.device_get(o))
        dt = (time.perf_counter() - t0) / n_batches
        mb = w0.size * 4 / 1e6
        _log(
            f"[config5] host-fed sweep ({'native' if stream.native else 'numpy'}"
            f" stream, {n_batches} batches of {mb:.1f} MB): {dt*1e3:.3f} "
            f"ms/sweep wall -> {scenarios/dt:,.0f} scenario-rollouts/s "
            f"end-to-end ({mb/dt/1e3:.2f} GB/s host->device; through the "
            f"remote relay this is link-bound, not stream-bound)"
        )
    return rows


def bench_ab_admm(scenarios: int, horizon: int, iters: int, reps: int):
    """Reproducible s-form vs (z,y)-form ADMM kernel A/B (VERDICT r2 weak
    #7): the SAME fused kernel with only the iteration-loop form swapped
    (kernels/boxqp_admm._s_loop vs _zy_loop), interleaved pairs so relay
    drift hits both equally. Also reports both forms' fused residuals at
    the same schedule (the coarse-phase accuracy claim)."""
    import jax
    import jax.numpy as jnp

    from numpower_tpu.kernels.boxqp_admm import admm_mpc_pallas_res
    from numpower_tpu.models import condense, quadrotor12
    from numpower_tpu.models.condensed import admm_coarse_iters

    A, B = quadrotor12(0.02)
    Q = np.eye(12, dtype=np.float32)
    R = np.eye(4, dtype=np.float32) * 0.1
    QF = np.eye(12, dtype=np.float32) * 5.0
    qp = jax.jit(condense, static_argnums=5)(A, B, Q, R, QF, horizon)
    ai = admm_coarse_iters(qp, iters)
    rho = jnp.sqrt(qp.lipschitz * jnp.maximum(qp.mu, 1e-12))
    x0s = jnp.asarray(
        0.3 * np.random.default_rng(0).standard_normal((scenarios, 12)),
        jnp.float32)
    interp = jax.default_backend() not in ("tpu", "axon")

    def make_body(form):
        def body(qp, xs, rho, i):
            z, _, _ = admm_mpc_pallas_res(
                qp.H, qp.Sx.T, qp.SuTQ.T, xs + i * 1e-6, jnp.float32(-1.0),
                jnp.float32(1.0), rho, iters=iters, coarse_iters=ai,
                interpret=interp, form=form)
            return z[0, 0]
        return body

    K_ab = 32 if scenarios <= 512 else 512
    def t_once(form):
        return _device_time_per_call(make_body(form), (qp, x0s, rho), K=K_ab,
                                     reps=reps)

    pairs = [(t_once("s"), t_once("zy")) for _ in range(3)]
    t_s = float(np.median([p[0] for p in pairs]))
    t_zy = float(np.median([p[1] for p in pairs]))
    _log(
        f"[ab-admm] s-form {t_s*1e6:.1f} us vs (z,y)-form {t_zy*1e6:.1f} us "
        f"per {scenarios}-batch -> {t_zy/t_s:.2f}x "
        f"(median of 3 interleaved pairs, K={K_ab}, schedule {ai} bf16 + "
        f"{iters-ai} fp32)"
    )
    for form in ("s", "zy"):
        _, rp, rd = admm_mpc_pallas_res(
            qp.H, qp.Sx.T, qp.SuTQ.T, x0s, jnp.float32(-1.0),
            jnp.float32(1.0), rho, iters=iters, coarse_iters=ai,
            interpret=interp, form=form)
        _log(f"[ab-admm] {form:>2}-form residuals: primal {float(rp):.2e} "
             f"dual {float(rd):.2e}")


def bench_micro(reps: int):
    """Initializer micro-benchmarks mirroring the reference's phpbench suite
    (/root/reference/benchmarks/initializers/*, shapes up to 1000x10000) —
    the only benchmark harness the reference ships."""
    import jax
    import jax.numpy as jnp

    from numpower_tpu import ops

    shapes = [(1000, 1, 1), (500, 1000, 1), (1000, 10000, 1)]
    # each entry: (label-shape description, thunk)
    cases = []
    for s in shapes:
        cases.append((f"zeros{s}", lambda i, s=s: ops.zeros(s) + i))
        cases.append((f"ones{s}", lambda i, s=s: ops.ones(s) * i))
        cases.append((f"full{s}", lambda i, s=s: ops.full(s, 7.0) + i))
    cases.append(("identity(1000)", lambda i: ops.identity(1000) + i))
    cases.append(("arange(10_000_000)", lambda i: ops.arange(10_000_000.0) + i))
    for label, fn in cases:
        t = _device_time_per_call(
            lambda i, fn=fn: jnp.sum(fn(i)), (), K=64, reps=max(2, reps // 3)
        )
        _log(f"[micro] {label}: {t*1e6:.1f} us (incl. consuming reduce)")


def bench_serving(scenarios: int, horizon: int, reps: int):
    """Production serving shape: receding-horizon warm-started closed-loop
    ticks (MPCController) — tick latency is the real-time number."""
    import jax
    import jax.numpy as jnp

    from numpower_tpu.models import MPCController, quadrotor12

    A, B = quadrotor12(0.02)
    ctrl = MPCController(
        A, B, np.eye(12, dtype=np.float32), np.eye(4, dtype=np.float32) * 0.1,
        np.eye(12, dtype=np.float32) * 5.0, horizon=horizon,
        u_lo=-1.0, u_hi=1.0, iters=20,
    )
    state0 = ctrl.init(scenarios)
    x0 = jnp.asarray(
        0.3 * np.random.default_rng(0).standard_normal((scenarios, 12)), jnp.float32
    )
    A_j, B_j = jnp.asarray(A), jnp.asarray(B)

    def tick(carry, i):
        state, x = carry
        u0, state, _ = ctrl._step_impl(ctrl.qp, state, x + i * 1e-7)
        x_next = x @ A_j.T + u0 @ B_j.T
        return (state, x_next), None

    import jax as _jax
    from jax import lax

    # 512 ticks/window: ~25 ms of device work per rep — matches the
    # flagship's K=512 methodology. On stall-heavy relay days a spurious
    # ~200 ms readback divides down to ~0.4 us/tick contamination at this
    # window instead of the ~0.8 us a 256-tick window leaves (observed
    # IQR 225 us on a 47 us quantity, 2026-08-21)
    K = 32 if scenarios <= 512 else 512

    @_jax.jit
    def rep(state, x):
        (state, x), _ = lax.scan(tick, (state, x), jnp.arange(K, dtype=jnp.float32))
        return x[0, 0]

    @_jax.jit
    def rep0(state, x):
        return x[0, 0]

    # median + IQR like every other section (VERDICT r2 weak #4: the old
    # best-of timing made round-over-round serving numbers pure relay noise)
    def run_times(r):
        float(jax.device_get(r(state0, x0)))  # compile + warm
        ts = []
        for _ in range(max(5, reps)):
            t = time.perf_counter()
            float(jax.device_get(r(state0, x0)))
            ts.append(time.perf_counter() - t)
        return np.asarray(ts)

    baseline = float(np.median(run_times(rep0)))
    per_tick_samples = np.maximum((run_times(rep) - baseline) / K, 1e-9)
    per_tick = float(np.median(per_tick_samples))
    q25, q75 = np.percentile(per_tick_samples, [25, 75])
    _log(
        f"[serving] {scenarios}-scenario warm-started controller tick "
        f"(20 iters): {per_tick*1e6:.1f} us/tick median "
        f"(IQR {(q75-q25)*1e6:.1f} us) -> {scenarios/per_tick:,.0f} "
        f"control updates/s"
    )
    rows = {"serving_fista_tick_us": (per_tick * 1e6, "us")}

    # ADMM serving tick (the faster solver family; warm-started z iterate)
    ctrl_a = MPCController(
        A, B, np.eye(12, dtype=np.float32), np.eye(4, dtype=np.float32) * 0.1,
        np.eye(12, dtype=np.float32) * 5.0, horizon=horizon,
        u_lo=-1.0, u_hi=1.0, iters=20, solver="admm",
    )
    state0_a = ctrl_a.init(scenarios)

    def tick_a(carry, i):
        state, x = carry
        u0, state, _ = ctrl_a._step_impl(ctrl_a.qp, state, x + i * 1e-7)
        x_next = x @ A_j.T + u0 @ B_j.T
        return (state, x_next), None

    @_jax.jit
    def rep_a(state, x):
        (state, x), _ = lax.scan(tick_a, (state, x),
                                 jnp.arange(K, dtype=jnp.float32))
        return x[0, 0]

    def run_times_a(r):
        float(jax.device_get(r(state0_a, x0)))
        ts = []
        for _ in range(max(5, reps)):
            t = time.perf_counter()
            float(jax.device_get(r(state0_a, x0)))
            ts.append(time.perf_counter() - t)
        return np.asarray(ts)

    per_a = np.maximum((run_times_a(rep_a) - baseline) / K, 1e-9)
    med_a = float(np.median(per_a))
    q25a, q75a = np.percentile(per_a, [25, 75])
    _log(
        f"[serving] {scenarios}-scenario ADMM warm-started tick (20 iters): "
        f"{med_a*1e6:.1f} us/tick median (IQR {(q75a-q25a)*1e6:.1f} us) -> "
        f"{scenarios/med_a:,.0f} control updates/s"
    )
    rows["serving_admm_tick_us"] = (med_a * 1e6, "us")
    return rows


def bench_shardmap_overhead(scenarios: int, horizon: int, iters: int, reps: int):
    """shard_map-over-1-device vs the direct fused kernel: the sharded DP
    solver must keep single-chip Pallas throughput (<10% overhead) — the
    'done' bar for routing the kernels through the sharded solvers."""
    import jax
    import jax.numpy as jnp

    from numpower_tpu.kernels.boxqp_fista import fista_mpc_pallas
    from numpower_tpu.models import condense, quadrotor12
    from numpower_tpu.models.condensed import default_coarse_iters
    from numpower_tpu.parallel import make_mesh, solve_mpc_boxqp_dp

    A, B = quadrotor12(0.02)
    Q = np.eye(12, dtype=np.float32)
    R = np.eye(4, dtype=np.float32) * 0.1
    QF = np.eye(12, dtype=np.float32) * 5.0
    qp = jax.jit(condense, static_argnums=5)(A, B, Q, R, QF, horizon)
    ci = default_coarse_iters(qp, iters)
    x0s = jnp.asarray(
        0.3 * np.random.default_rng(0).standard_normal((scenarios, 12)), jnp.float32
    )

    # Relay noise at these absolute times (~50 us/call) swamps small-K
    # measurements (K=128 still produced a below-speed-of-light "direct"
    # reading) — use a large K and alternate the two paths so drift hits
    # both equally.
    interp = jax.default_backend() not in ("tpu", "axon")
    K = 512

    def t_direct_once():
        return _device_time_per_call(
            lambda qp, xs, i: fista_mpc_pallas(
                qp.H, qp.Sx.T, qp.SuTQ.T, xs + i * 1e-6, jnp.float32(-1.0),
                jnp.float32(1.0), qp.lipschitz, iters=iters, coarse_iters=ci,
                interpret=interp,
            )[0][0, 0],
            (qp, x0s), K=K, reps=reps,
        )

    mesh = make_mesh((1, 1), devices=jax.devices()[:1])

    def t_sharded_once():
        return _device_time_per_call(
            lambda qp, xs, i: solve_mpc_boxqp_dp(
                qp, xs + i * 1e-6, -1.0, 1.0, mesh, iters=iters,
                method="pallas", coarse_iters=ci,
            ).U[0, 0],
            (qp, x0s), K=K, reps=reps,
        )

    pairs = [(t_direct_once(), t_sharded_once()) for _ in range(3)]
    t_direct = float(np.median([p[0] for p in pairs]))
    t_sharded = float(np.median([p[1] for p in pairs]))
    _log(
        f"[shardmap] direct kernel {t_direct*1e6:.1f} us vs shard_map(1dev) "
        f"{t_sharded*1e6:.1f} us -> overhead {100*(t_sharded/t_direct-1):+.1f}% "
        f"(median of 3 interleaved pairs, K={K})"
    )
    return {"shardmap_overhead_pct": (100 * (t_sharded / t_direct - 1),
                                      "%")}


def bench_scaling(scenarios: int, reps: int):
    """Scaling sweep: DP box-QP solves/s at 1..D devices (BASELINE: >=85%
    efficiency at 2+ hosts). On a virtual CPU mesh this validates the
    sharded program + harness; real efficiency numbers require a pod."""
    import jax
    import jax.numpy as jnp

    from numpower_tpu.models import condense, quadrotor12
    from numpower_tpu.parallel import make_mesh, shard_batch, solve_mpc_boxqp_dp
    from numpower_tpu.utils.profiler import time_compiled

    A, B = quadrotor12(0.02)
    Q = np.eye(12, dtype=np.float32)
    R = np.eye(4, dtype=np.float32) * 0.1
    QF = np.eye(12, dtype=np.float32) * 5.0
    qp = jax.jit(condense, static_argnums=5)(A, B, Q, R, QF, 16)

    D = jax.device_count()
    widths = [w for w in (1, 2, 4, 8, 16, 32) if w <= D]
    base_rate = None
    for w in widths:
        mesh = make_mesh((w, 1), devices=jax.devices()[:w])
        x0s = shard_batch(
            jnp.asarray(
                0.3 * np.random.default_rng(0).standard_normal((scenarios, 12)),
                jnp.float32,
            ),
            mesh,
        )
        fn = lambda qp, x0s: solve_mpc_boxqp_dp(qp, x0s, -1.0, 1.0, mesh, iters=30).U
        dt, iqr = time_compiled(fn, qp, x0s, reps=max(3, reps // 3),
                                return_stats=True)
        rate = scenarios / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * w)
        _log(
            f"[scaling] devices={w}: {rate:,.0f} solves/s "
            f"(median, IQR {iqr/dt*100:.0f}%; efficiency vs linear-from-1: "
            f"{eff:.2f})"
        )


def run_verify(scenarios: int, horizon: int):
    """On-TPU verification pass (VERDICT r2 missing #1/#2): executes the
    COMPILED Mosaic kernels (not interpret mode), the sharded solvers over a
    real-chip mesh, jitted eig via pure_callback, and the serving
    donation/no-retrace contract on the ACTIVE backend, checking semantics
    against the XLA/host references. No timing. Also runs under --quick on
    CPU, where Pallas falls back to interpret mode (the suite's usual path).
    Results land in BASELINE.md per round."""
    import jax
    import jax.numpy as jnp

    results = []

    def check(name, fn):
        # One retry per check (VERDICT r4 #3): a relay flake (stalled
        # readback, transient Mosaic launch failure) must not record a
        # bare False — and when a check REALLY fails, the exception text
        # must survive into the JSON, not just a stderr line that scrolls
        # out of the driver's 2000-char tail window.
        t0 = time.perf_counter()
        first_err = None
        for attempt in (1, 2):
            try:
                detail = fn()
                results.append((name, {
                    "ok": True,
                    "err": None if attempt == 1 else
                    f"retry ok; first: {first_err}",
                }))
                note = "" if attempt == 1 else " [passed on retry]"
                _log(f"[verify] PASS {name}: {detail}{note} "
                     f"({time.perf_counter()-t0:.1f}s)")
                return
            except Exception as e:  # noqa: BLE001 — report, never crash
                err = f"{type(e).__name__}: {e}"
                _log(f"[verify] FAIL {name} (attempt {attempt}): {err} "
                     f"({time.perf_counter()-t0:.1f}s)")
                if first_err is None:
                    first_err = err[:300]
        results.append((name, {"ok": False, "err": first_err}))

    interp = jax.default_backend() not in ("tpu", "axon")
    mode = "interpret(CPU)" if interp else "COMPILED(TPU)"
    _log(f"[verify] kernel mode: {mode}")

    from numpower_tpu.models import condense, quadrotor12

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        A, B = quadrotor12(0.02)
        qp = condense(A, B, jnp.eye(12), jnp.eye(4) * 0.1, jnp.eye(12) * 5.0,
                      horizon)
    N = min(scenarios, 1024)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(0.3 * rng.standard_normal((N, 12)), jnp.float32)

    def v_fista():
        from numpower_tpu.kernels.boxqp_fista import fista_mpc_pallas_res
        from numpower_tpu.models.boxqp import solve_mpc_boxqp
        from numpower_tpu.models.condensed import default_coarse_iters

        args = (qp.H, qp.Sx.T, qp.SuTQ.T, x0s, jnp.float32(-1.0),
                jnp.float32(1.0), qp.lipschitz)
        U_k, _ = fista_mpc_pallas_res(*args, iters=60, coarse_iters=0,
                                      interpret=interp)
        ref = solve_mpc_boxqp(qp, x0s, -1.0, 1.0, iters=60, method="fista",
                              coarse_iters=0)
        d_exact = float(jnp.max(jnp.abs(U_k - ref.U)))
        assert d_exact < 1e-4, f"all-fp32 kernel vs XLA: {d_exact:.2e}"
        ci = default_coarse_iters(qp, 60)
        U_m, _ = fista_mpc_pallas_res(*args, iters=60, coarse_iters=ci,
                                      interpret=interp)
        d_mix = float(jnp.max(jnp.abs(U_m - U_k)))
        assert d_mix < 1e-4, f"bf16 schedule vs all-fp32 kernel: {d_mix:.2e}"
        return f"fp32-vs-XLA {d_exact:.1e}, bf16({ci})-vs-fp32 {d_mix:.1e}"

    def v_admm():
        from numpower_tpu.kernels.boxqp_admm import admm_mpc_pallas_res
        from numpower_tpu.models.admm import solve_mpc_boxqp_admm
        from numpower_tpu.models.condensed import admm_coarse_iters

        rho = jnp.sqrt(qp.lipschitz * jnp.maximum(qp.mu, 1e-12))
        args = (qp.H, qp.Sx.T, qp.SuTQ.T, x0s, jnp.float32(-1.0),
                jnp.float32(1.0), rho)
        z_k, rp, rd = admm_mpc_pallas_res(*args, iters=60, coarse_iters=0,
                                          interpret=interp)
        ref = solve_mpc_boxqp_admm(qp, x0s, -1.0, 1.0, iters=60, method="xla")
        d_exact = float(jnp.max(jnp.abs(z_k - ref.U)))
        assert d_exact < 1e-4, f"all-fp32 kernel vs XLA: {d_exact:.2e}"
        ai = admm_coarse_iters(qp, 60)
        z_m, _, _ = admm_mpc_pallas_res(*args, iters=60, coarse_iters=ai,
                                        interpret=interp)
        d_mix = float(jnp.max(jnp.abs(z_m - z_k)))
        assert d_mix < 1e-4, f"bf16 schedule vs all-fp32 kernel: {d_mix:.2e}"
        z_zy, _, _ = admm_mpc_pallas_res(*args, iters=60, coarse_iters=ai,
                                         interpret=interp, form="zy")
        d_form = float(jnp.max(jnp.abs(z_zy - z_m)))
        assert d_form < 1e-4, f"zy-form vs s-form: {d_form:.2e}"
        return (f"fp32-vs-XLA {d_exact:.1e}, bf16({ai})-vs-fp32 {d_mix:.1e}, "
                f"zy-vs-s {d_form:.1e}")

    def v_small_matrix_kernels():
        from numpower_tpu.kernels.cholesky import (
            cholesky_batched, psd_solve_batched,
        )
        from numpower_tpu.kernels.riccati import riccati_batched_fused
        from numpower_tpu.models import riccati_scan_per_scenario

        a = rng.standard_normal((64, 12, 12)).astype(np.float32)
        spd = jnp.asarray(a @ a.transpose(0, 2, 1)
                          + 8 * np.eye(12, dtype=np.float32))
        L = cholesky_batched(spd, interpret=interp)
        d1 = float(jnp.max(jnp.abs(L - jnp.linalg.cholesky(spd))))
        assert d1 < 1e-3, f"cholesky: {d1:.2e}"
        b = jnp.asarray(rng.standard_normal((64, 12, 4)).astype(np.float32))
        X = psd_solve_batched(spd, b, interpret=interp)
        d2 = float(jnp.max(jnp.abs(
            jnp.einsum("nij,njk->nik", spd, X) - b)))
        assert d2 < 5e-3, f"psd_solve residual: {d2:.2e}"
        As = jnp.asarray(np.tile(np.asarray(A), (16, 1, 1))
                         + 0.01 * rng.standard_normal((16, 12, 12)).astype(np.float32))
        Bs = jnp.broadcast_to(jnp.asarray(B), (16, 12, 4))
        Ks_f, P0_f = riccati_batched_fused(
            As, Bs, np.eye(12, dtype=np.float32),
            np.eye(4, dtype=np.float32) * 0.1,
            np.eye(12, dtype=np.float32) * 5.0, 20, interpret=interp)
        Ks_r, P0_r = riccati_scan_per_scenario(
            As, Bs, np.eye(12, dtype=np.float32),
            np.eye(4, dtype=np.float32) * 0.1,
            np.eye(12, dtype=np.float32) * 5.0, 20, method="xla")
        d3 = float(jnp.max(jnp.abs(Ks_f - Ks_r)))
        assert d3 < 5e-3, f"riccati gains: {d3:.2e}"
        return f"cholesky {d1:.1e}, psd_solve {d2:.1e}, riccati {d3:.1e}"

    def v_ilqr_backward():
        # Compare ONE backward pass's gains (deterministic, fp32-tight) —
        # NOT end-to-end solve costs: 6 line-searched iterations on the
        # unstable cartpole amplify fp-level gain differences chaotically
        # (first on-TPU run of this check measured a 0.74 relative cost
        # deviation while the gains agreed to ~1e-6 relative).
        from numpower_tpu.kernels.ilqr_backward import ilqr_backward_fused
        from numpower_tpu.models import (
            cartpole_step, linearize_trajectory, rollout_nonlinear,
        )
        from numpower_tpu.models.ilqr import _backward_pass

        Nb, Tb = 4, 10
        Qc = jnp.eye(4)
        Rc = jnp.eye(1) * 0.01
        QFc = jnp.eye(4) * 10.0
        xg = jnp.zeros(4)
        x0b = jnp.asarray(0.3 * rng.standard_normal((Nb, 4)), jnp.float32)
        usb = jnp.asarray(0.1 * rng.standard_normal((Nb, Tb, 1)), jnp.float32)
        xsb = jax.vmap(
            lambda x0, u: rollout_nonlinear(cartpole_step, x0, u))(x0b, usb)
        As, Bs = jax.vmap(
            lambda x, u: linearize_trajectory(cartpole_step, x, u))(xsb, usb)
        ks_ref, Ks_ref = jax.vmap(
            lambda A, B, x, u: _backward_pass(A, B, x, u, Qc, Rc, QFc, xg,
                                              1e-3))(As, Bs, xsb, usb)
        lxs = 2.0 * (xsb[:, :Tb] - xg) @ Qc.T
        lus = 2.0 * usb @ Rc.T
        lxT = 2.0 * (xsb[:, Tb] - xg) @ QFc.T
        ks_f, Ks_f = ilqr_backward_fused(As, Bs, lxs, lus, 2 * Qc, 2 * Rc,
                                         lxT, 2 * QFc, reg=1e-3,
                                         interpret=interp)
        scale = float(jnp.max(jnp.abs(ks_ref))) + 1.0
        d1 = float(jnp.max(jnp.abs(ks_f - ks_ref))) / scale
        d2 = float(jnp.max(jnp.abs(Ks_f - Ks_ref))) / scale
        assert d1 < 1e-4 and d2 < 1e-4, f"gain rel-dev k {d1:.2e} K {d2:.2e}"
        return f"fused backward gains rel-dev k {d1:.1e}, K {d2:.1e}"

    def v_sharded():
        from numpower_tpu.kernels.boxqp_fista import fista_mpc_pallas_res
        from numpower_tpu.models.condensed import (
            admm_coarse_iters, default_coarse_iters,
        )
        from numpower_tpu.parallel import (
            make_mesh, shard_batch, solve_mpc_boxqp_admm_dp,
            solve_mpc_boxqp_dp,
        )

        D = 1 if not interp else min(jax.device_count(), 8)
        mesh = make_mesh((D, 1), devices=jax.devices()[:D])
        xs = shard_batch(x0s, mesh)
        ci = default_coarse_iters(qp, 40)
        r_dp = solve_mpc_boxqp_dp(qp, xs, -1.0, 1.0, mesh, iters=40,
                                  method="pallas", coarse_iters=ci)
        U_direct, _ = fista_mpc_pallas_res(
            qp.H, qp.Sx.T, qp.SuTQ.T, x0s, jnp.float32(-1.0),
            jnp.float32(1.0), qp.lipschitz, iters=40, coarse_iters=ci,
            interpret=interp)
        d1 = float(jnp.max(jnp.abs(r_dp.U - U_direct)))
        assert d1 < 1e-5, f"DP shard_map vs direct kernel: {d1:.2e}"
        ai = admm_coarse_iters(qp, 40)
        r_admm = solve_mpc_boxqp_admm_dp(qp, xs, -1.0, 1.0, mesh, iters=40,
                                         method="pallas", coarse_iters=ai)
        d2 = float(jnp.max(jnp.abs(r_admm.U - r_dp.U)))
        assert d2 < 2e-3, f"ADMM-DP vs FISTA-DP solutions: {d2:.2e}"
        return f"mesh {D}dev: dp-vs-direct {d1:.1e}, admm-vs-fista {d2:.1e}"

    def v_jit_eig():
        from numpower_tpu import ops

        a = jnp.asarray(rng.standard_normal((8, 8)).astype(np.float32))
        w_ref = np.sort(np.real(np.linalg.eig(np.asarray(a))[0]))
        try:
            w, _ = jax.jit(ops.eig)(a)
            d = float(np.max(np.abs(np.sort(np.asarray(w)) - w_ref)))
            assert d < 1e-3, f"jit eig eigenvalues: {d:.2e}"
            return f"jit(eig) WORKS on this runtime, dev {d:.1e}"
        except Exception as e:  # noqa: BLE001
            # The documented relay limitation (ops/linalg.py eig_complex
            # docstring): the axon PJRT lacks host callbacks, so jit(eig)
            # cannot run — the EAGER path must still work (the guard).
            w, _ = ops.eig(a)
            d = float(np.max(np.abs(np.sort(np.asarray(w)) - w_ref)))
            assert d < 1e-3, f"eager eig eigenvalues: {d:.2e}"
            return (f"jit(eig) unavailable on this runtime "
                    f"({type(e).__name__} — documented relay limitation, "
                    f"ops/linalg.py), eager path verified, dev {d:.1e}")

    def v_serving():
        from numpower_tpu.models import MPCController

        ctrl = MPCController(
            A, B, np.eye(12, dtype=np.float32),
            np.eye(4, dtype=np.float32) * 0.1,
            np.eye(12, dtype=np.float32) * 5.0, horizon=horizon,
            u_lo=-1.0, u_hi=1.0, iters=20)
        st = ctrl.init(N)
        old_buf = st.U_prev
        u0, st = ctrl.step(st, x0s)
        for _ in range(2):
            u0, st = ctrl.step(st, x0s)
        jax.block_until_ready(u0)
        assert ctrl.compile_cache_size() == 1, "tick retraced"
        assert old_buf.is_deleted(), "warm-start buffer not donated"
        return "3 ticks, cache=1, donation live"

    # --- r3-verdict #3: the round-3 XLA fast paths, executed COMPILED on
    # the active backend (they were semantically verified only on CPU;
    # on-TPU fp32 rounding and argmax tie behavior were unchecked) -----

    def v_smallmat_unrolled():
        from numpower_tpu.utils.smallmat import lu_solve_unrolled, solve_small

        nn = 12
        # diagonally-dominant batch: a raw standard_normal + 2I batch of
        # 256 includes near-singular draws where ANY fp32 LU diverges
        # from fp64 — dominance keeps every kappa small so the check
        # isolates the kernel, not the conditioning
        a = jnp.asarray(
            0.3 * rng.standard_normal((256, nn, nn)).astype(np.float32)
            + 4 * np.eye(nn, dtype=np.float32))
        b = jnp.asarray(rng.standard_normal((256, nn, 4)).astype(np.float32))
        X = jax.jit(lu_solve_unrolled)(a, b)
        scale = float(jnp.max(jnp.abs(X))) + 1.0
        d1 = float(jnp.max(jnp.abs(X - jnp.linalg.solve(a, b)))) / scale
        res = float(jnp.max(jnp.abs(
            jnp.einsum("nij,njk->nik", a, X) - b)))
        assert d1 < 1e-4 and res < 1e-3, \
            f"batch vs XLA LU rel {d1:.2e}, residual {res:.2e}"
        # permutation-requiring: cyclic permutation matrix (zero leading
        # pivot at every step — only real pivoting survives)
        Pm = np.zeros((nn, nn), np.float32)
        Pm[np.arange(nn), (np.arange(nn) + 1) % nn] = 1.0
        Xp = jax.jit(lu_solve_unrolled)(jnp.asarray(Pm[None]), b[:1])
        d2 = float(jnp.max(jnp.abs(Xp - jnp.linalg.solve(Pm[None], b[:1]))))
        assert d2 < 1e-5, f"permutation case: {d2:.2e}"
        # ill-conditioned (kappa ~ 1e5) vs fp64 host reference
        rng2 = np.random.default_rng(5)
        Uq, _ = np.linalg.qr(rng2.standard_normal((nn, nn)))
        Vq, _ = np.linalg.qr(rng2.standard_normal((nn, nn)))
        s = np.logspace(0, -5, nn)
        M = (Uq * s) @ Vq.T
        bb = rng2.standard_normal((nn, 3))
        x64 = np.linalg.solve(M, bb)
        x32 = np.asarray(jax.jit(solve_small)(
            jnp.asarray(M, jnp.float32), jnp.asarray(bb, jnp.float32)),
            np.float64)
        d3 = float(np.max(np.abs(x32 - x64)) / np.max(np.abs(x64)))
        assert d3 < 5e-3, f"kappa=1e5 vs fp64: {d3:.2e}"
        return f"batch {d1:.1e}, permutation {d2:.1e}, kappa1e5 {d3:.1e}"

    def v_riccati_associative():
        from numpower_tpu.models.lqr import riccati_associative, riccati_scan

        Tq = 512
        Qq = jnp.eye(12)
        Rq = jnp.eye(4) * 0.1
        QFq = jnp.eye(12) * 5.0
        Aj, Bj = jnp.asarray(A), jnp.asarray(B)
        Ks_a, Ps_a = jax.jit(riccati_associative, static_argnums=5)(
            Aj, Bj, Qq, Rq, QFq, Tq)
        Ks_s, Ps_s = jax.jit(riccati_scan, static_argnums=5)(
            Aj, Bj, Qq, Rq, QFq, Tq)
        d1 = float(jnp.max(jnp.abs(Ks_a - Ks_s)))
        d2 = float(jnp.max(jnp.abs(Ps_a - Ps_s)) / jnp.max(jnp.abs(Ps_s)))
        assert d1 < 1e-3 and d2 < 1e-4, f"gains {d1:.2e}, P rel {d2:.2e}"
        # the bench's timed path opts into the unpivoted combine — verify
        # it compiled on this backend too (well-conditioned regime)
        Ks_n, _ = jax.jit(riccati_associative,
                          static_argnums=(5, 6))(Aj, Bj, Qq, Rq, QFq, Tq,
                                                 True)
        d3 = float(jnp.max(jnp.abs(Ks_n - Ks_s)))
        assert d3 < 1e-3, f"nopivot gains {d3:.2e}"
        return f"T={Tq} gains {d1:.1e}, P rel {d2:.1e}, nopivot {d3:.1e}"

    def v_kalman_associative():
        from numpower_tpu.models.estimation import (
            kalman_filter, kalman_filter_associative, kalman_smoother,
            kalman_smoother_associative,
        )

        Tk = 512
        Ak = jnp.asarray([[1.0, 0.1], [0.0, 1.0]])
        Ck = jnp.asarray([[1.0, 0.0]])
        Qk = jnp.eye(2) * 1e-3
        Rk = jnp.eye(1) * 1e-2
        x0k = jnp.asarray([1.0, 0.0])
        P0k = jnp.eye(2) * 0.1
        ysk = jnp.asarray(rng.standard_normal((Tk, 1)).astype(np.float32))
        seq = jax.jit(kalman_filter)(Ak, Ck, Qk, Rk, x0k, P0k, ysk)
        par = jax.jit(kalman_filter_associative)(Ak, Ck, Qk, Rk, x0k, P0k,
                                                 ysk)
        d1 = float(jnp.max(jnp.abs(par.means - seq.means)))
        dll = abs(float(par.log_likelihood - seq.log_likelihood)) / (
            abs(float(seq.log_likelihood)) + 1.0)
        sm_s = jax.jit(kalman_smoother)(Ak, seq)
        sm_a = jax.jit(kalman_smoother_associative)(Ak, seq)
        d2 = float(jnp.max(jnp.abs(sm_a.means - sm_s.means)))
        assert d1 < 1e-3, f"filter means: {d1:.2e}"
        assert dll < 1e-4, f"log-likelihood rel: {dll:.2e}"
        assert d2 < 1e-3, f"smoother means: {d2:.2e}"
        return f"T={Tk} filter {d1:.1e}, ll rel {dll:.1e}, RTS {d2:.1e}"

    def v_kalman_batched_fast_path():
        from numpower_tpu.models.estimation import (
            kalman_filter, kalman_filter_batched,
        )

        Ak = jnp.asarray([[1.0, 0.1], [0.0, 1.0]])
        Ck = jnp.asarray([[1.0, 0.0]])
        Qk = jnp.eye(2) * 1e-3
        Rk = jnp.eye(1) * 1e-2
        P0k = jnp.eye(2) * 0.1
        Nk, Tk = 256, 50
        x0sk = jnp.asarray(rng.standard_normal((Nk, 2)).astype(np.float32))
        yssk = jnp.asarray(
            rng.standard_normal((Nk, Tk, 1)).astype(np.float32))
        fast = jax.jit(kalman_filter_batched)(Ak, Ck, Qk, Rk, x0sk, P0k,
                                              yssk)
        ref = jax.jit(jax.vmap(
            lambda x0, ys: kalman_filter(Ak, Ck, Qk, Rk, x0, P0k, ys)))(
            x0sk, yssk)
        d1 = float(jnp.max(jnp.abs(fast.means - ref.means)))
        d2 = float(jnp.max(jnp.abs(fast.log_likelihood -
                                   ref.log_likelihood)))
        d3 = float(jnp.max(jnp.abs(fast.covs - ref.covs)))
        # batched RTS smoother (r5): fused backward kernel vs the vmapped
        # sequential smoother, same compiled-on-backend contract
        from numpower_tpu.models.estimation import (
            kalman_smoother, kalman_smoother_batched,
        )

        sm = jax.jit(lambda f: kalman_smoother_batched(Ak, f))(fast)
        sm_ref = jax.jit(jax.vmap(lambda m, c, pm, pc, ll: kalman_smoother(
            Ak, type(ref)(m, c, pm, pc, ll))))(*ref)
        d4 = float(jnp.max(jnp.abs(sm.means - sm_ref.means)))
        assert d1 < 1e-4 and d2 < 1e-2 and d3 < 1e-5 and d4 < 1e-4, \
            f"means {d1:.2e}, ll {d2:.2e}, covs {d3:.2e}, rts {d4:.2e}"
        return (f"N={Nk} T={Tk} means {d1:.1e}, ll {d2:.1e}, "
                f"covs {d3:.1e}, rts {d4:.1e}")

    def v_pf_resampling():
        # the PRODUCTION one-hot slot-boundary construction (r4: no
        # scatter, no gather — models/particle._systematic_resample) vs
        # the searchsorted definition, element-exact, compiled on backend
        import jax.random as jrandom

        Np = 4096
        w = jrandom.dirichlet(jrandom.key(2),
                              jnp.ones((Np,), jnp.float32) * 0.3)

        @jax.jit
        def both(w, u0):
            cum = jnp.cumsum(w)
            cum = cum / cum[-1]
            m = jnp.clip(jnp.floor(Np * cum - u0).astype(jnp.int32) + 1,
                         0, Np)
            m_prev = jnp.concatenate([jnp.zeros((1,), m.dtype), m[:-1]])
            i_idx = jnp.arange(Np)
            oh = jnp.logical_and(i_idx[:, None] >= m_prev[None, :],
                                 i_idx[:, None] < m[None, :])
            # each one-hot row selects exactly one particle
            idx_oh = oh.astype(jnp.int32) @ jnp.arange(Np, dtype=jnp.int32)
            rowsum = jnp.sum(oh.astype(jnp.int32), axis=1)
            pos = (jnp.arange(Np, dtype=w.dtype) + u0) / Np
            idx_ref = jnp.searchsorted(cum, pos)
            return idx_oh, rowsum, idx_ref

        mism = bad_rows = 0
        for u0 in (0.0, 0.25, 0.5, 0.999):
            i_s, rs, i_r = both(w, jnp.float32(u0))
            mism += int(jnp.sum(i_s != i_r))
            bad_rows += int(jnp.sum(rs != 1))
        assert mism == 0 and bad_rows == 0, \
            f"{mism} index mismatches, {bad_rows} non-one-hot rows"
        return f"N={Np}, 4 offsets, one-hot rows exact vs searchsorted"

    def v_sampling_dp():
        # sharded sampling families executed on the ACTIVE backend's mesh
        # (1 device on TPU — the same program the multi-chip dryrun runs
        # at 8; here the point is compiled-on-TPU execution + parity)
        from numpower_tpu.models import (
            mppi_solve_batched, particle_filter, pendulum_step,
            quadratic_mppi_cost,
        )
        from numpower_tpu.parallel import (
            make_mesh, mppi_solve_dp, particle_filter_dp, shard_batch,
        )

        Dv = 1 if not interp else min(jax.device_count(), 4)
        mesh = make_mesh((Dv, 1), devices=jax.devices()[:Dv])
        Qp = jnp.diag(jnp.asarray([1.0, 0.1], jnp.float32))
        Rp = jnp.eye(1, dtype=jnp.float32) * 0.01
        QFp = jnp.diag(jnp.asarray([100.0, 10.0], jnp.float32))
        cost_fn = quadratic_mppi_cost(Qp, Rp, QFp, jnp.zeros(2))
        x0sp = jnp.asarray(
            np.random.default_rng(3).uniform(-1, 1, (8 * Dv, 2)),
            jnp.float32)
        keyv = jax.random.key(0)
        r_dp = mppi_solve_dp(pendulum_step, shard_batch(x0sp, mesh),
                             cost_fn, 10, keyv, mesh, samples=32, iters=3,
                             m=1, u_lo=-2.0, u_hi=2.0)
        r_ref = mppi_solve_batched(pendulum_step, x0sp, cost_fn, 10, keyv,
                                   samples=32, iters=3, m=1, u_lo=-2.0,
                                   u_hi=2.0)
        d1 = float(jnp.max(jnp.abs(r_dp.us - r_ref.us)))
        assert d1 < 1e-3, f"MPPI dp vs batched: {d1:.2e}"
        ysp = jnp.asarray(
            0.3 * np.random.default_rng(4).standard_normal((8, 1)),
            jnp.float32)
        usp = jnp.zeros((8, 1), jnp.float32)
        p_dp = particle_filter_dp(
            pendulum_step, lambda x: x[:1], jnp.eye(2) * 1e-3,
            jnp.eye(1) * 1e-2, jnp.zeros(2), jnp.eye(2) * 0.1, ysp, usp,
            keyv, mesh, n_particles=64 * Dv, axis=mesh.axis_names[0])
        p_ref = particle_filter(
            pendulum_step, lambda x: x[:1], jnp.eye(2) * 1e-3,
            jnp.eye(1) * 1e-2, jnp.zeros(2), jnp.eye(2) * 0.1, ysp, usp,
            keyv, n_particles=64 * Dv)
        d2 = float(jnp.max(jnp.abs(p_dp.means - p_ref.means)))
        assert d2 < 1e-3, f"PF dp vs single: {d2:.2e}"
        return f"mesh {Dv}dev: MPPI {d1:.1e}, PF {d2:.1e}"

    def v_mppi_kernel():
        # r5 fused whole-solve MPPI kernel (kernels/mppi.py) vs the
        # vmapped XLA path, SAME key stream, compiled on the backend.
        # iters=2: the full-depth iteration is chaotic under the
        # argmin-sharp softmax (near-tied samples flip on fp
        # reassociation — scripts/mppi_ab.py), so exact parity gates at
        # low depth and the full-depth objective is checked relatively.
        from numpower_tpu.models import (
            mppi_solve_batched, pendulum_step, quadratic_mppi_cost,
        )

        Qp = jnp.diag(jnp.asarray([1.0, 0.1], jnp.float32))
        Rp = jnp.eye(1, dtype=jnp.float32) * 0.01
        QFp = jnp.diag(jnp.asarray([100.0, 10.0], jnp.float32))
        cost_fn = quadratic_mppi_cost(Qp, Rp, QFp, jnp.zeros(2))
        x0sm = jnp.asarray(
            np.random.default_rng(8).uniform(-np.pi, np.pi, (16, 2)),
            jnp.float32)
        keym = jax.random.key(0)
        kwm = dict(samples=128, m=1)
        r2 = mppi_solve_batched(pendulum_step, x0sm, cost_fn, 20, keym,
                                method="xla", iters=2, **kwm)
        p2 = mppi_solve_batched(pendulum_step, x0sm, cost_fn, 20, keym,
                                method="pallas", iters=2, **kwm)
        d1 = float(jnp.max(jnp.abs(p2.us - r2.us)))
        r8 = mppi_solve_batched(pendulum_step, x0sm, cost_fn, 20, keym,
                                method="xla", iters=8, **kwm)
        p8 = mppi_solve_batched(pendulum_step, x0sm, cost_fn, 20, keym,
                                method="pallas", iters=8, **kwm)
        d2 = float(jnp.max(jnp.abs(p8.cost - r8.cost)
                           / (1.0 + jnp.abs(r8.cost))))
        assert d1 < 2e-3 and d2 < 5e-2, \
            f"iters=2 us {d1:.2e}, iters=8 cost rel {d2:.2e}"
        return f"iters=2 us {d1:.1e}, iters=8 cost rel {d2:.1e}"

    check("fista_kernel_compiled", v_fista)
    check("admm_kernel_compiled", v_admm)
    check("small_matrix_kernels", v_small_matrix_kernels)
    check("ilqr_backward", v_ilqr_backward)
    check("sharded_solvers_on_mesh", v_sharded)
    check("serving_no_retrace_donation", v_serving)
    check("smallmat_unrolled_lu", v_smallmat_unrolled)
    check("riccati_associative", v_riccati_associative)
    check("kalman_associative_rts", v_kalman_associative)
    check("kalman_batched_fast_path", v_kalman_batched_fast_path)
    check("pf_resampling_indices", v_pf_resampling)
    check("sampling_dp_on_mesh", v_sampling_dp)
    check("mppi_kernel_compiled", v_mppi_kernel)
    # last: a relay PJRT without host callbacks could stall rather than
    # raise on the traced path — keep every other verdict printed first
    check("jit_eig", v_jit_eig)

    n_pass = sum(r["ok"] for _, r in results)
    _log(f"[verify] {n_pass}/{len(results)} checks passed ({mode})")
    return n_pass == len(results), dict(results)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="tiny shapes (CPU smoke)")
    ap.add_argument("--full", action="store_true", help="run all BASELINE configs")
    ap.add_argument("--scaling", action="store_true", help="DP scaling sweep over devices")
    ap.add_argument("--micro", action="store_true",
                    help="initializer micro-benchmarks (reference phpbench parity)")
    ap.add_argument("--ab-admm", action="store_true",
                    help="s-form vs (z,y)-form ADMM kernel A/B (interleaved)")
    ap.add_argument("--verify", action="store_true",
                    help="on-TPU verification pass (compiled kernels, "
                         "sharded solvers, jit(eig), no-retrace) — no timing")
    ap.add_argument("--skip-certify", action="store_true",
                    help="flagship only: skip the default certification "
                         "pass (all sections + verify folded into the "
                         "final JSON)")
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

    # Open the device->host channel early: the first D2H through a tunneled
    # TPU can stall for minutes; paying it here keeps the timed sections sane.
    import jax.numpy as jnp

    t0 = time.perf_counter()
    float(jnp.ones((1,))[0])
    _log(f"D2H channel warm in {time.perf_counter()-t0:.1f}s")

    if args.verify:
        ok, _ = run_verify(scenarios if args.quick else 1024, args.horizon)
        print(json.dumps({
            "metric": "on_tpu_verify_pass",
            "value": 1.0 if ok else 0.0,
            "unit": "bool",
            "vs_baseline": 1.0 if ok else 0.0,
        }))
        sys.exit(0 if ok else 1)

    # Flagship, plausibility-gated like every section (VERDICT r4 #2: the
    # r4 driver capture recorded a 266%-of-speed-of-light flagship row).
    artifacts: dict = {}
    gate_on = dev.platform in ("tpu", "axon")  # bands are TPU-calibrated
    _flag_state = {}

    def _run_flagship():
        s, p, r = bench_flagship(scenarios, args.horizon, args.iters, reps)
        _flag_state["headline"] = (s, p)
        return r

    all_rows = _gated_section("flagship", _run_flagship, artifacts, gate_on)
    solves_per_sec, p50 = _flag_state["headline"]

    # Certification pass (r3 verdict next-round #1): the driver's plain
    # `python bench.py` must capture the WHOLE round — every table row
    # BASELINE.md claims plus the verify verdicts land in the final JSON,
    # so no number is builder-session-only. Sections are fault-isolated:
    # one relay stall cannot zero the capture. --skip-certify restores
    # the flagship-only run; --quick keeps CPU smoke fast unless --full.
    verify_info = None
    run_sections = (not args.skip_certify) and (not args.quick or args.full)
    if run_sections:
        # Wall-clock budget: the certify pass must NEVER cost the round
        # its headline — if the driver's (unknown) timeout fires before
        # the final JSON prints, nothing is recorded. Sections are
        # skipped (and marked) once the budget is spent; the verify pass
        # gets a reserved slice. Override with NPTPU_CERTIFY_BUDGET_S.
        budget_s = float(os.environ.get("NPTPU_CERTIFY_BUDGET_S", 1800))
        t_start = time.perf_counter()
        certify_reps = min(reps, 5)
        sections = [
            ("lqr", lambda: bench_lqr(args.horizon, certify_reps)),
            ("ilqr", lambda: bench_ilqr(certify_reps)),
            ("tube", lambda: bench_tube(
                min(scenarios * 4, 16384) if not args.quick else 512,
                certify_reps)),
            ("serving", lambda: bench_serving(
                scenarios, args.horizon, certify_reps)),
            ("solvers_extra", lambda: bench_solvers_extra(
                scenarios, args.horizon, args.iters, certify_reps)),
            ("estimation", lambda: bench_estimation(scenarios, certify_reps)),
            ("shardmap", lambda: bench_shardmap_overhead(
                scenarios, args.horizon, args.iters, certify_reps)),
        ]
        verify_reserve = 420.0  # the verify pass's historical ~6-7 min
        for name, fn in sections:
            spent = time.perf_counter() - t_start
            if spent > budget_s - verify_reserve:
                _log(f"[certify] BUDGET exhausted ({spent:.0f}s of "
                     f"{budget_s:.0f}s incl. {verify_reserve:.0f}s verify "
                     f"reserve) — skipping section {name}")
                all_rows[f"{name}_skipped_budget"] = (spent, "s")
                continue
            t0 = time.perf_counter()
            try:
                all_rows.update(_gated_section(name, fn, artifacts, gate_on))
            except Exception as e:  # noqa: BLE001 — capture, don't crash
                _log(f"[certify] SECTION FAILED {name}: "
                     f"{type(e).__name__}: {e}")
                all_rows[f"{name}_failed"] = (0.0, "error")
            _log(f"[certify] section {name} done in "
                 f"{time.perf_counter()-t0:.0f}s")
        try:
            ok, checks = run_verify(1024 if not args.quick else scenarios,
                                    args.horizon)
            verify_info = {"pass": ok, "checks": checks}
        except Exception as e:  # noqa: BLE001
            _log(f"[certify] VERIFY PASS CRASHED: {type(e).__name__}: {e}")
            verify_info = {"pass": False, "checks": {}}

    if args.full and not run_sections:
        bench_lqr(args.horizon, reps)
        bench_ilqr(reps)
        bench_tube(min(scenarios * 4, 16384) if not args.quick else 512, reps)
        bench_serving(scenarios, args.horizon, reps)
        bench_solvers_extra(scenarios, args.horizon, args.iters, reps)
        bench_estimation(scenarios, reps)
        bench_shardmap_overhead(scenarios, args.horizon, args.iters, reps)

    if args.scaling:
        bench_scaling(scenarios, reps)

    if args.ab_admm:
        bench_ab_admm(scenarios, args.horizon, args.iters, reps)

    if args.micro:
        bench_micro(reps)

    target = 10_000.0  # BASELINE north star: solves/s/chip

    # Headline = best flagship path whose row survived the plausibility
    # gate; if both paths are artifact-flagged, say so rather than print
    # an impossible number as the round's result.
    plausible = [
        float(all_rows[k][0])
        for k in ("fista_flagship_solves_per_sec",
                  "admm_flagship_solves_per_sec")
        if k in all_rows and k not in artifacts
    ]
    headline_artifact = bool(all_rows) and not plausible
    if plausible:
        solves_per_sec = max(plausible)

    full = {
        "metric": "mpc_solves_per_sec_per_chip",
        "value": round(solves_per_sec, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_sec / target, 3),
    }
    if all_rows:
        rows_json = {}
        for k, (v, u) in all_rows.items():
            entry = {"value": round(float(v), 3), "unit": u}
            if k in artifacts:
                entry["artifact"] = True
                entry["band"] = artifacts[k]
            rows_json[k] = entry
        full["rows"] = rows_json
    if verify_info is not None:
        full["verify_pass"] = bool(verify_info["pass"])
        full["verify"] = verify_info["checks"]

    # Capture contract (VERDICT r4 #1): round 4's all-rows-in-one-line JSON
    # outgrew the driver's 2000-char stdout tail window — the driver parsed
    # NOTHING. The full certify payload now goes to CERTIFY.json (committed
    # repo artifact) and stderr; stdout's LAST line is a compact (<400 char)
    # summary the tail window always contains.
    try:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "CERTIFY.json")
        with open(path, "w") as f:
            json.dump(full, f, indent=1)
            f.write("\n")
        _log(f"[certify] full payload -> CERTIFY.json "
             f"({len(full.get('rows', {}))} rows, "
             f"{len(artifacts)} artifact-flagged)")
    except OSError as e:  # read-only checkout must not kill the capture
        _log(f"[certify] could not write CERTIFY.json: {e}")
    _log("[certify] full JSON: " + json.dumps(full))

    compact = {
        "metric": "mpc_solves_per_sec_per_chip",
        "value": round(solves_per_sec, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_sec / target, 3),
    }
    if headline_artifact:
        compact["artifact"] = True
    if verify_info is not None:
        checks = verify_info["checks"]
        n_ok = sum(c["ok"] for c in checks.values())
        compact["verify_pass"] = bool(verify_info["pass"])
        compact["verify_checks"] = f"{n_ok}/{len(checks)}"
        failed = [n for n, c in checks.items() if not c["ok"]]
        if failed:
            compact["verify_failed"] = failed[:4]
    if all_rows:
        compact["rows_file"] = "CERTIFY.json"
        compact["rows_n"] = len(all_rows)
        compact["artifact_rows"] = len(artifacts)
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
