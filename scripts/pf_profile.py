#!/usr/bin/env python
"""Particle-filter bottleneck decomposition (r4 roofline follow-up: the
PF reads ~0% of any roofline — find out where the 326 ms/batch goes).

Times four ablations of the batched bootstrap PF body (B=256 x N=1024
particles x T=50 pendulum), interleaved:

  full         — the shipping filter
  no-resample  — cond/select branch removed entirely (isolates the
                 systematic-resampling cost under vmap, where lax.cond
                 lowers to a computed-both select)
  no-weights   — propagation + RNG only (isolates the weighting /
                 moments / logsumexp block)
  plant-only   — vmapped plant eval + noise draw alone (the irreducible
                 physics + RNG floor)

TPU: python scripts/pf_profile.py    CPU smoke: --quick
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
    B = 16 if args.quick else 256
    Np = 256 if args.quick else 1024
    T = 50
    reps = 2 if args.quick else args.reps

    import jax.numpy as jnp
    from jax import lax

    from bench import _device_time_per_call, _log
    from numpower_tpu.models import particle_filter_batched, pendulum_step
    from numpower_tpu.models.particle import _systematic_resample

    dev = jax.devices()[0]
    _log(f"device: {dev.platform}:{dev.device_kind}  B={B} N={Np} T={T}")
    float(jnp.ones((1,))[0])

    rng = np.random.default_rng(0)
    Q = jnp.eye(2) * 1e-4
    R = jnp.eye(1) * 2.5e-3
    P0 = jnp.eye(2)
    h = lambda x: x[:1]
    ys = jnp.asarray(rng.standard_normal((B, T, 1)).astype(np.float32))
    us = jnp.zeros((B, T, 1), jnp.float32)
    x0s = jnp.asarray(0.3 * rng.standard_normal((B, 2)).astype(np.float32))
    key = jax.random.key(0)

    def t_full():
        return _device_time_per_call(
            lambda x0s, ys, us, k, i: jnp.sum(particle_filter_batched(
                pendulum_step, h, Q, R, x0s + i * 1e-6, P0, ys, us, k,
                n_particles=Np).log_likelihood),
            (x0s, ys, us, key), K=4, reps=reps)

    # hand-rolled ablation filter (same math, pieces removable)
    from numpower_tpu.models.estimation import _psd_sqrt

    L0 = _psd_sqrt(P0)
    Lq = _psd_sqrt(Q)
    Lr = jnp.linalg.cholesky(R)
    log_norm = float(-np.log(np.asarray(Lr)[0, 0]) - 0.5 * np.log(2 * np.pi))

    def make_filter(resample: bool, weights: bool):
        def one(x0, ys1, us1, k):
            k, k_init = jax.random.split(k)
            parts = x0 + jax.random.normal(k_init, (Np, 2)) @ L0.T
            logw = jnp.full((Np,), -jnp.log(float(Np)))

            def step(carry, inp):
                parts, logw, ll, k = carry
                y, u = inp
                k, k_prop, k_res = jax.random.split(k, 3)
                parts = jax.vmap(lambda s: pendulum_step(s, u))(parts) + (
                    jax.random.normal(k_prop, (Np, 2)) @ Lq.T)
                if weights:
                    v = y - parts[:, :1]
                    logp = log_norm - 0.5 * jnp.sum(
                        (v / Lr[0, 0]) ** 2, axis=1)
                    inc = jax.scipy.special.logsumexp(logw + logp)
                    logw = logw + logp - inc
                    w = jnp.exp(logw)
                    ess = 1.0 / jnp.sum(w * w)
                    ll = ll + inc
                else:
                    ess = jnp.asarray(float(Np))
                if resample:
                    parts2, logw2 = _systematic_resample(k_res, parts, logw)
                    do = ess < 0.5 * Np
                    parts = jnp.where(do, parts2, parts)
                    logw = jnp.where(do, logw2, logw)
                return (parts, logw, ll, k), None

            (parts, logw, ll, _), _ = lax.scan(
                step, (parts, logw, jnp.float32(0.0), k), (ys1, us1))
            # particle-dependent output so the weights-off ablation's
            # whole propagation chain cannot be dead-code-eliminated
            return ll + jnp.sum(parts) * 1e-12

        def batched(x0s, ys, us, k, i):
            keys = jax.random.split(k, B)
            return jnp.sum(jax.vmap(one)(x0s + i * 1e-6, ys, us, keys))

        return batched

    def t_abl(resample, weights):
        return _device_time_per_call(
            make_filter(resample, weights), (x0s, ys, us, key), K=4,
            reps=reps)

    results = {}
    for _ in range(2):
        results.setdefault("full", []).append(t_full())
        results.setdefault("ablation-full", []).append(t_abl(True, True))
        results.setdefault("no-resample", []).append(t_abl(False, True))
        results.setdefault("plant-only", []).append(t_abl(False, False))
    for k in ("full", "ablation-full", "no-resample", "plant-only"):
        t = float(np.median(results[k]))
        _log(f"[pf] {k:14s}: {t*1e3:8.2f} ms/batch "
             f"({B*Np*T/t/1e6:,.0f}M particle-steps/s)")


if __name__ == "__main__":
    main()
