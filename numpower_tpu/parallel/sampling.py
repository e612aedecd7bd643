"""Sharded sampling solvers: DP MPPI and the particle filter (r3 verdict
weak #6 / next-round #5 — mesh coverage for the sampling families).

Both are built to be MESH-SHAPE-INVARIANT: every random draw is generated
from the same key stream as the single-device solver (the full array is
generated per device — counter-based Threefry makes this cheap VPU work —
and each device slices its rows), so

    sharded(mesh(1,1)) == sharded(mesh(D,1)) == single-device solver

up to collective reduction order (~1e-6 fp32). That turns multi-chip
correctness into an exact parity test instead of a statistical one
(tests/test_parallel.py), the same bar the QP/KF DP solvers meet
(parallel/sharding.py).

Reference parity: the reference has NO sampling solvers and no
distributed execution at all (SURVEY.md §2.5); these are TPU-native
additions on the op surface it provides (matmul/cholesky/exp/cumsum,
/root/reference/src/ndmath/).

  - MPPI: scenarios over the `data` axis (embarrassing), samples over the
    `model` axis — the softmax normalizer, ESS, and the weighted
    perturbation update become pmax/psum collectives riding ICI
    (SURVEY.md §2.5 DP row: "4096+ scenarios per chip").
  - Particle filter: particles sharded; weights/ESS/moments are psum'd;
    systematic resampling all_gathers the cloud (N*n fp32 — ~8 KB at
    n=2, N=1024), reconstructs the global index map redundantly per
    device, and keeps only the local slice.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from numpower_tpu.models.mppi import MPPIResult, _trajectory_cost
from numpower_tpu.models.particle import ParticleFilterResult
from numpower_tpu.models.rollout import rollout_nonlinear


def mppi_solve_dp(
    f: Callable,
    x0s: jax.Array,          # (N, n) scenario batch, sharded on data axis
    cost_fn: Callable,
    horizon: int,
    key: jax.Array,
    mesh: Mesh,
    samples: int = 1024,
    iters: int = 8,
    lam: float = 1.0,
    sigma: float = 1.0,
    u_lo: Optional[float] = None,
    u_hi: Optional[float] = None,
    m: int = 1,
    shard_samples: bool = True,
) -> MPPIResult:
    """Data-parallel MPPI: scenarios over `data`, K samples over `model`.

    Matches models/mppi.mppi_solve_batched's math exactly (same keyed
    draws — the (K, T, m) perturbation tensor is generated fully per
    device and row-sliced, so the stream is identical at any mesh shape;
    softmax max-shift/normalizer/ESS/update are pmax/psum over the model
    axis). shard_samples=False keeps all samples per device (pure
    scenario DP). baseline_mix/us_init are not supported here — cold
    nominal only (warm starts shard with the scenarios if ever needed).
    """
    data_ax = mesh.axis_names[0]
    samp_ax = mesh.axis_names[1] if (shard_samples
                                     and len(mesh.axis_names) > 1) else None
    n_samp = mesh.shape[samp_ax] if samp_ax else 1
    K, T = samples, horizon
    if K % n_samp:
        raise ValueError(f"samples={K} not divisible by model axis {n_samp}")
    K_loc = K // n_samp
    dt = x0s.dtype
    sigma_arr = jnp.broadcast_to(jnp.asarray(sigma, dt), (m,))
    inv_sig2 = 1.0 / (sigma_arr * sigma_arr)

    def clipc(u):
        if u_lo is None and u_hi is None:
            return u
        return jnp.clip(u, u_lo, u_hi)

    keys = jax.random.split(key, x0s.shape[0])      # per-scenario streams

    def per_scenario(x0, sc_key, my_samp):
        def iteration(us_nom, it_key):
            eps_full = jax.random.normal(it_key, (K, T, m), dt) * sigma_arr
            eps = lax.dynamic_slice_in_dim(eps_full, my_samp * K_loc,
                                           K_loc, axis=0)
            cand = clipc(us_nom[None] + eps)
            eps_eff = cand - us_nom[None]

            def one_rollout(u_seq):
                xs = rollout_nonlinear(f, x0, u_seq)
                return _trajectory_cost(cost_fn, xs, u_seq)

            costs = jax.vmap(one_rollout)(cand)               # (K_loc,)
            couple = lam * jnp.einsum("ktm,tm->k", eps_eff,
                                      inv_sig2 * us_nom)
            S = costs + couple
            # softmax(-S/lam) stabilizer is the MINIMUM cost (the best
            # sample gets e=1); shifting by the max would overflow good
            # samples and turn inf costs into inf-inf = NaN
            S_min = jnp.min(S)
            if samp_ax:
                S_min = -lax.pmax(-S_min, samp_ax)
            e = jnp.exp(-(S - S_min) / lam)
            Z = jnp.sum(e)
            upd = jnp.einsum("k,ktm->tm", e, eps_eff)
            w2 = jnp.sum(e * e)
            if samp_ax:
                Z = lax.psum(Z, samp_ax)
                upd = lax.psum(upd, samp_ax)
                w2 = lax.psum(w2, samp_ax)
            ess = Z * Z / w2
            us_new = clipc(us_nom + upd / Z)
            return us_new, ess

        it_keys = jax.random.split(sc_key, iters)
        us0 = jnp.zeros((T, m), dt)
        us_f, esses = lax.scan(iteration, us0, it_keys)
        xs_f = rollout_nonlinear(f, x0, us_f)
        cost_f = _trajectory_cost(cost_fn, xs_f, us_f)
        return us_f, xs_f, cost_f, esses[-1]

    def per_device(x0_shard, key_shard):
        my_samp = lax.axis_index(samp_ax) if samp_ax else 0
        return jax.vmap(lambda x0, k: per_scenario(x0, k, my_samp))(
            x0_shard, key_shard)

    # check_vma=False: the rollout scan's carry starts data-varying (x0)
    # and becomes (data, model)-varying once the sample-sharded
    # perturbations enter; the psum'd update makes outputs model-unvarying
    # again, which the static vma checker cannot see through the scan.
    mapped = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(data_ax), P(data_ax)),
        out_specs=(P(data_ax), P(data_ax), P(data_ax), P(data_ax)),
        check_vma=False,
    )
    us, xs, cost, ess = jax.jit(mapped)(x0s, keys)
    return MPPIResult(us=us, xs=xs, cost=cost, ess=ess)


def particle_filter_dp(
    f: Callable, h: Callable, Q: jax.Array, R: jax.Array,
    x0: jax.Array,           # (n,) single-trajectory prior mean
    P0: jax.Array,
    ys: jax.Array,           # (T, p)
    us: jax.Array,           # (T, m)
    key: jax.Array,
    mesh: Mesh,
    n_particles: int = 1024,
    resample_threshold: float = 0.5,
    axis: Optional[str] = None,
    resample_method: str = "auto",
) -> ParticleFilterResult:
    """Bootstrap particle filter with the particle cloud sharded over one
    mesh axis (default: the first/data axis).

    Exact-parity construction vs models/particle.particle_filter: every
    device carries the SAME key chain, generates each full (N, n) draw,
    and slices its row block — so moments/ESS/log-likelihood match the
    single-device filter to psum reduction order. Weights, ESS, mean and
    covariance are psum'd; resampling all_gathers (parts, logw) and
    rebuilds the global slot boundaries redundantly per device (the cloud
    is N*n fp32, tiny next to the per-step plant work).
    Unlike the single-device filter's lax.cond, the resample branch is
    computed every step and `where`-selected (a cond around collectives
    would diverge per device; the vmapped single-device filter lowers to
    the same select anyway — models/particle.py docstring).

    resample_method follows models/particle._systematic_resample's
    envelope, adjusted for the sharding: each device's one-hot block is
    (N/D, N) — a 1/D slice of the quadratic term — so "auto" keeps the
    one-hot while N <= RESAMPLE_ONEHOT_MAX_N * sqrt(D) (the point where
    the per-device block matches the single-device crossover's work) and
    uses the sliced gather construction past it.
    """
    ax = axis or mesh.axis_names[0]
    D = mesh.shape[ax]
    n = x0.shape[0]
    p = ys.shape[1]
    dt = x0.dtype
    N = int(n_particles)
    if N % D:
        raise ValueError(f"n_particles={N} not divisible by axis {ax}={D}")
    N_loc = N // D

    from numpower_tpu.models.estimation import _psd_sqrt

    L0 = _psd_sqrt(P0)
    Lq = _psd_sqrt(Q)
    Lr = jnp.linalg.cholesky(0.5 * (R + R.T))
    log_norm = (-jnp.sum(jnp.log(jnp.diagonal(Lr)))
                - 0.5 * p * jnp.log(2.0 * jnp.pi)).astype(dt)
    thr = jnp.asarray(resample_threshold * N, dt)
    logN = jnp.log(jnp.asarray(N, dt))

    def per_device(L0_r, Lq_r, Lr_r, x0_r, ys_r, us_r, key_r):
        dev = lax.axis_index(ax)
        row0 = dev * N_loc

        def slice_rows(full):
            return lax.dynamic_slice_in_dim(full, row0, N_loc, axis=0)

        key0, k_init = jax.random.split(key_r)
        parts0 = x0_r + slice_rows(
            jax.random.normal(k_init, (N, n), dt)) @ L0_r.T
        logw0 = jnp.full((N_loc,), -logN)

        def resample_global(k_res, parts, logw):
            # gather the cloud, rebuild the GLOBAL slot boundaries exactly
            # as models/particle._systematic_resample, then each device
            # produces only ITS row block — as a one-hot contraction (the
            # r4 MXU formulation) inside the envelope, or a sliced gather
            # past it (see docstring; models/particle envelope note)
            from numpower_tpu.models.particle import (
                RESAMPLE_ONEHOT_MAX_N, _resample_slots,
            )

            parts_g = lax.all_gather(parts, ax, tiled=True)   # (N, n)
            logw_g = lax.all_gather(logw, ax, tiled=True)     # (N,)
            mh = _resample_slots(k_res, logw_g, N)
            m_prev = jnp.concatenate([jnp.zeros((1,), mh.dtype), mh[:-1]])
            method = resample_method
            if method == "auto":
                method = ("onehot"
                          if N * N_loc <= RESAMPLE_ONEHOT_MAX_N ** 2
                          else "gather")
            if method == "gather":
                hits = jnp.zeros((N,), jnp.int32).at[m_prev].add(
                    1, mode="drop")
                idx = jnp.cumsum(hits) - 1
                idx_loc = lax.dynamic_slice_in_dim(idx, row0, N_loc)
                return parts_g[idx_loc], jnp.full((N_loc,), -logN)
            i_loc = row0 + jnp.arange(N_loc)                  # global rows
            oh = jnp.logical_and(i_loc[:, None] >= m_prev[None, :],
                                 i_loc[:, None] < mh[None, :])
            return oh.astype(parts_g.dtype) @ parts_g, jnp.full(
                (N_loc,), -logN)

        def step(carry, inputs):
            parts, logw, ll, key = carry
            y, u = inputs
            key, k_prop, k_res = jax.random.split(key, 3)
            parts = jax.vmap(lambda s: f(s, u))(parts) + slice_rows(
                jax.random.normal(k_prop, (N, n), dt)) @ Lq_r.T
            v = y - jax.vmap(h)(parts)                          # (N_loc, p)
            alpha = jax.scipy.linalg.solve_triangular(Lr_r, v.T, lower=True)
            logp = log_norm - 0.5 * jnp.sum(alpha * alpha, axis=0)
            # global logsumexp increment: pmax shift + psum
            s = logw + logp
            s_max = lax.pmax(jnp.max(s), ax)
            inc = s_max + jnp.log(lax.psum(jnp.sum(jnp.exp(s - s_max)), ax))
            logw = s - inc
            w = jnp.exp(logw)
            ess = 1.0 / lax.psum(jnp.sum(w * w), ax)
            mean = lax.psum(w @ parts, ax)
            d = parts - mean
            cov = lax.psum((w[:, None] * d).T @ d, ax)
            parts_r, logw_r = resample_global(k_res, parts, logw)
            do = ess < thr
            parts = jnp.where(do, parts_r, parts)
            logw = jnp.where(do, logw_r, logw)
            return (parts, logw, ll + inc, key), (mean, cov, ess)

        (parts, logw, ll, _), (means, covs, esss) = lax.scan(
            step, (parts0, logw0, jnp.asarray(0.0, dt), key0), (ys_r, us_r))
        return means, covs, esss, ll, parts, logw

    mapped = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(),) * 7,
        out_specs=(P(), P(), P(), P(), P(ax), P(ax)),
        check_vma=False,  # replicated carries + per-shard cloud outputs
    )
    means, covs, esss, ll, parts, logw = jax.jit(mapped)(
        L0, Lq, Lr, x0, ys, us, key)
    return ParticleFilterResult(means=means, covs=covs, ess=esss,
                                log_likelihood=ll, particles=parts,
                                log_weights=logw)
